"""Deterministic generator for the DBLP-shaped `publications` fixture.

Schema and required distribution features per FIXTURES.md §A: one row
per publication record, repeated XML fields as array<string>, with
targeted edge-case coverage for each reference query (SURVEY.md §2.1):

- Q1: per-venue publication-count ties at rank 10;
- Q2: per-author year sets with runs >= 10, runs broken by gaps, and
  duplicate years inside runs (the reference's streak-reset bug,
  Homework2.scala:217-221);
- Q3/Q4: per-venue author-count ties at the max; empty titles;
- Q5/Q6: solo-only authors, mixed authors, never-solo authors;
- fallback paths: editors-only rows (Homework2.scala:53-57), empty
  venue rows (Homework2.scala:136), unknown kinds -> "No venue
  available" (Homework2.scala:50), 0-author-0-editor rows
  (Homework2.scala:381), www keys with 3+ '/'-segments
  (Homework2.scala:49).

Seed fixed at 42; regenerating produces byte-identical parquet.
Run: python fixtures/make_publications.py

Full-DTD surface: beyond the 14 queried columns, every remaining
``%field;`` from dblp.dtd:36 (address, volume, number, month, url,
cdrom, cite, note, isbn, series, chapter, publnr) is carried too —
filled in a post-pass as pure functions of (row id, kind), NEVER from
the shared rng, so adding fields cannot perturb the order-sensitive
draws behind the Q1 rank-10 tie / Q2 streak constructions.
"""

from __future__ import annotations

import datetime
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "publications.parquet")

JOURNALS = [f"J. Syst. {i:02d}" for i in range(20)]
CONFS = [f"CONF {i:02d}" for i in range(20)]
PUBLISHERS = [f"Pub House {i}" for i in range(5)]
SCHOOLS = [f"Univ {i}" for i in range(5)]
AUTHOR_POOL = [f"Author {i:03d}" for i in range(800)]

WORDS = (
    "adaptive distributed query engine stream window join index hash sort "
    "columnar vectorized parallel optimizer graph learning scalable approximate "
    "incremental robust"
).split()


def _title(rng: random.Random) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 8))).capitalize()


def _mdate(rng: random.Random) -> datetime.date:
    return datetime.date(2000 + rng.randint(0, 25), rng.randint(1, 12), rng.randint(1, 28))


def _base_row(rng: random.Random, i: int) -> dict:
    return {
        "key": f"rec/x/{i:06d}",
        "kind": "article",
        "title": _title(rng),
        "authors": [],
        "editors": [],
        "year": 1936 + rng.randint(0, 90),
        "journal": "",
        "booktitle": "",
        "publisher": "",
        "school": "",
        "pages": f"{rng.randint(1, 400)}-{rng.randint(401, 800)}",
        "ee": [f"https://doi.org/10.1000/{i}"] if rng.random() < 0.6 else [],
        "crossref": "",
        "mdate": _mdate(rng),
    }


MONTHS = (
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
)


def _enrich_full_dtd_fields(rows: list[dict]) -> None:
    """Fill the non-queried dblp.dtd fields deterministically from
    (row index, kind) only — absent = '' / [] (the fixture-wide
    convention), sparse like real DBLP. No rng: see module docstring."""
    for rid, row in enumerate(rows):
        kind = row["kind"]
        is_vol_kind = kind in ("article", "incollection")
        row["address"] = (
            f"City {rid % 8}" if kind in ("proceedings", "book") and rid % 2 == 0 else ""
        )
        row["volume"] = str(1 + rid % 60) if is_vol_kind and rid % 2 == 0 else ""
        row["number"] = str(1 + rid % 12) if kind == "article" and rid % 3 == 0 else ""
        row["month"] = MONTHS[rid % 12] if rid % 4 == 0 else ""
        row["url"] = [f"db/{kind}/v{rid % 60}/{row['key'].rsplit('/', 1)[-1]}.html"] if rid % 5 == 0 else []
        row["cdrom"] = f"CDROM/ix/{rid}" if rid % 53 == 0 else ""
        row["cite"] = (
            [f"rec/x/{(rid * 7 + k) % 4000:06d}" for k in range(1 + rid % 3)]
            if rid % 29 == 0
            else []
        )
        row["note"] = f"Curation note {rid}" if rid % 37 == 0 else ""
        row["isbn"] = (
            f"978-{rid % 10}-{1000 + rid % 9000:04d}-{rid % 100:02d}-{rid % 10}"
            if kind in ("book", "proceedings")
            else ""
        )
        row["series"] = (
            f"Series Vol. {rid % 500}"
            if kind in ("proceedings", "incollection") and rid % 6 == 0
            else ""
        )
        row["chapter"] = str(1 + rid % 20) if kind == "incollection" else ""
        row["publnr"] = f"p{rid}" if rid % 211 == 0 else ""


def main() -> None:
    rng = random.Random(SEED)
    rows: list[dict] = []
    rid = 0

    def add(**overrides) -> None:
        nonlocal rid
        row = _base_row(rng, rid)
        row.update(overrides)
        rows.append(row)
        rid += 1

    def article(venue: str, authors: list[str], year: int, **kw) -> None:
        add(kind="article", journal=venue, authors=authors, year=year, **kw)

    # --- Q2 streak authors (distinct-year runs, gaps, duplicates) ---
    streaker = AUTHOR_POOL[0]  # run 1990..2005 (16) WITH duplicate year 1995
    for y in range(1990, 2006):
        article(JOURNALS[3], [streaker], y)
    article(JOURNALS[4], [streaker], 1995)  # duplicate year inside the run
    exact10 = AUTHOR_POOL[1]  # run of exactly 10: 2001..2010
    for y in range(2001, 2011):
        article(JOURNALS[3], [exact10], y)
    gapped = AUTHOR_POOL[2]  # 9-run, gap, 12-run -> longest 12
    for y in range(1970, 1979):
        article(JOURNALS[5], [gapped], y)
    for y in range(1985, 1997):
        article(JOURNALS[5], [gapped], y)
    nine_only = AUTHOR_POOL[3]  # 9-run only -> excluded from Q2
    for y in range(1950, 1959):
        article(JOURNALS[6], [nine_only], y)

    # --- Q1 rank-10 ties in venue JOURNALS[0] ---
    # authors 10..21: counts 12,11,10,9,8,7,6,5,5,5,5,4 -> four-way tie at
    # count 5 straddling the rank-10 boundary.
    tie_counts = [12, 11, 10, 9, 8, 7, 6, 5, 5, 5, 5, 4]
    for j, cnt in enumerate(tie_counts):
        a = AUTHOR_POOL[10 + j]
        for _ in range(cnt):
            article(JOURNALS[0], [a], 1980 + rng.randint(0, 40))

    # --- Q4 max-author ties in venue CONFS[0] ---
    big_team = AUTHOR_POOL[30:37]  # 7 authors, twice -> tie at the max
    add(kind="inproceedings", booktitle=CONFS[0], authors=list(big_team),
        year=2015, title="Team effort one")
    add(kind="inproceedings", booktitle=CONFS[0], authors=list(big_team[:3]) + AUTHOR_POOL[40:44],
        year=2016, title="Team effort two")
    for _ in range(20):  # background smaller pubs in the same venue
        add(kind="inproceedings", booktitle=CONFS[0], year=2010 + rng.randint(0, 10),
            authors=rng.sample(AUTHOR_POOL[50:100], rng.randint(1, 4)))

    # --- Q5/Q6 author classes ---
    solo_only = AUTHOR_POOL[100:120]  # publish only alone
    for j, a in enumerate(solo_only):
        for _ in range(3 + j % 5):
            article(JOURNALS[1 + j % 5], [a], 1990 + rng.randint(0, 30))
    mixed = AUTHOR_POOL[120:130]  # solo AND co-authored -> excluded from Q6
    for a in mixed:
        article(JOURNALS[2], [a], 2000 + rng.randint(0, 20))
        add(kind="inproceedings", booktitle=CONFS[1], year=2005,
            authors=[a, rng.choice(AUTHOR_POOL[200:300])])
    never_solo = AUTHOR_POOL[130:140]
    for a in never_solo:
        add(kind="inproceedings", booktitle=CONFS[2], year=2010,
            authors=[a, rng.choice(AUTHOR_POOL[200:300])])

    # --- fallback / garbage paths ---
    for _ in range(15):  # editors-only rows (proceedings)
        add(kind="proceedings", publisher=rng.choice(PUBLISHERS), authors=[],
            editors=rng.sample(AUTHOR_POOL[300:350], rng.randint(1, 3)),
            year=1995 + rng.randint(0, 25))
    for _ in range(20):  # 0 authors, 0 editors (guard path)
        add(kind="article", journal=rng.choice(JOURNALS), authors=[], editors=[])
    for _ in range(30):  # empty venue: article with no journal/booktitle
        add(kind="article", journal="", booktitle="",
            authors=[rng.choice(AUTHOR_POOL)])
    for i in range(10):  # unknown kinds -> "No venue available"
        add(kind=rng.choice(["person", "data"]),
            authors=[rng.choice(AUTHOR_POOL[350:400])], title=f"Misc {i}")
    for i in range(20):  # www rows: venue = first 3 key segments
        add(kind="www", key=f"homepages/{i % 7:02d}/{i}/extra",
            authors=[rng.choice(AUTHOR_POOL[400:450])])
    for _ in range(8):  # empty titles (garbage-filter path)
        add(kind="inproceedings", booktitle=CONFS[3], title="",
            authors=[rng.choice(AUTHOR_POOL)])
    for _ in range(10):  # theses
        add(kind=rng.choice(["phdthesis", "mastersthesis"]),
            school=rng.choice(SCHOOLS), authors=[rng.choice(AUTHOR_POOL[450:500])],
            year=2000 + rng.randint(0, 25))
    for _ in range(10):  # books with publisher fallback exercised
        add(kind="book", publisher="", booktitle=CONFS[4],
            authors=[rng.choice(AUTHOR_POOL[500:520])])

    # --- Zipfian background mass (~4000 rows) ---
    # JOURNALS[0] is reserved for the Q1 rank-10 tie construction; the
    # background must not perturb its counts.
    bg_journals = JOURNALS[1:]
    venue_weights = [1.0 / (i + 1) for i in range(20)]
    bg_weights = venue_weights[1:]
    for _ in range(4000):
        kind = rng.choices(
            ["article", "inproceedings", "incollection", "book", "proceedings"],
            weights=[50, 35, 5, 5, 5],
        )[0]
        n_auth = rng.choices([1, 2, 3, 4, 5, 6], weights=[30, 30, 20, 10, 6, 4])[0]
        # Zipfian author reuse; indices < 140 are reserved for the
        # targeted Q1/Q2/Q5/Q6 constructions above and must not pick up
        # stray co-authorships here.
        auth_idx = set()
        while len(auth_idx) < n_auth:
            auth_idx.add(min(140 + int(rng.paretovariate(1.2)) + rng.randint(0, 640), 799))
        authors = [AUTHOR_POOL[i] for i in sorted(auth_idx)]
        year = 1960 + min(int(rng.expovariate(0.05)), 65)
        if kind == "article":
            add(kind=kind, journal=rng.choices(bg_journals, weights=bg_weights)[0],
                authors=authors, year=year)
        elif kind in ("inproceedings", "incollection"):
            add(kind=kind, booktitle=rng.choices(CONFS, weights=venue_weights)[0],
                authors=authors, year=year)
        else:
            add(kind=kind, publisher=rng.choice(PUBLISHERS), authors=authors,
                editors=[], year=year)

    _enrich_full_dtd_fields(rows)

    schema = pa.schema(
        [
            pa.field("key", pa.string(), nullable=False),
            pa.field("kind", pa.string(), nullable=False),
            pa.field("title", pa.string()),
            pa.field("authors", pa.list_(pa.string())),
            pa.field("editors", pa.list_(pa.string())),
            pa.field("year", pa.int32()),
            pa.field("journal", pa.string()),
            pa.field("booktitle", pa.string()),
            pa.field("publisher", pa.string()),
            pa.field("school", pa.string()),
            pa.field("pages", pa.string()),
            pa.field("ee", pa.list_(pa.string())),
            pa.field("crossref", pa.string()),
            pa.field("mdate", pa.date32()),
            pa.field("address", pa.string()),
            pa.field("volume", pa.string()),
            pa.field("number", pa.string()),
            pa.field("month", pa.string()),
            pa.field("url", pa.list_(pa.string())),
            pa.field("cdrom", pa.string()),
            pa.field("cite", pa.list_(pa.string())),
            pa.field("note", pa.string()),
            pa.field("isbn", pa.string()),
            pa.field("series", pa.string()),
            pa.field("chapter", pa.string()),
            pa.field("publnr", pa.string()),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {table.num_rows} rows -> {OUT}")


if __name__ == "__main__":
    main()
