"""Generate a repeat-inflated ~Nx fixture set for the scaling bench.

Round-3 verdict #4: bench at the largest feasible scale to produce an
empirical scaling curve (the reference's own anchor is a single 2.5 GB
ingest run, dblpXMLparser.scala:24).  The driver testdata tops out at
sf0.1, so this tool key-shift-replicates it FACTOR times (default 10)
into fixtures/sf1/ — the standard way to scale a star schema:

- fixed dimensions (region, nation) are copied verbatim, as TPC-H
  itself holds them constant across scale factors;
- every fact/dim surrogate key (custkey, orderkey, partkey, suppkey,
  event/user/doc/vec ids) gets +copy*STRIDE so each replica joins
  within itself — join fan-out, group cardinality, and key skew scale
  the way a genuinely larger SF would;
- document text gets a copy tag injected every TAG_EVERY tokens (copy
  0 untouched), so replicas are near-dup-distinct across copies: the
  planted intra-copy near-dup structure is preserved while cross-copy
  shingle Jaccard collapses, i.e. the corpus behaves like 10x more
  documents, not 10x exact duplicates (which would quadratically
  inflate LSH pair expansion and measure a different workload).

Deterministic (no RNG, pure function of the input parquet).  Output is
gitignored; regenerate any time with:

    python tools/make_scale_fixtures.py [--factor 10] [--out fixtures/sf1]
"""

from __future__ import annotations

import argparse
import json
import os

import duckdb


def table_digest(con: "duckdb.DuckDBPyConnection", path: str) -> tuple[int, str]:
    """Row count + order-insensitive 60-bit content digest of a parquet
    file (xor of per-row hashes over the rows' text form, masked to 60
    bits — the repo's hash60 convention).  Recomputable by the scale
    tests to detect a stale fixture dir."""
    n, d = con.sql(
        f"SELECT count(*), coalesce(bit_xor(hash(t::VARCHAR)), 0) "
        f"FROM read_parquet('{path}') t"
    ).fetchone()
    return int(n), format(int(d) & ((1 << 60) - 1), "x")

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000  # far above any sf0.1 key (max 600k)
TAG_EVERY = 8  # tokens between copy tags in document text

# table -> columns to key-shift by copy*STRIDE (empty = copy verbatim)
KEYED = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}


def tag_text(text: str, tag: str) -> str:
    toks = text.split(" ")
    out = []
    for j, t in enumerate(toks):
        if j and j % TAG_EVERY == 0:
            out.append(tag)
        out.append(t)
    return " ".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "sf1"))
    ap.add_argument("--src", default=SRC)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list of tables to generate (default: all) — the "
        "round-12 scale-exponent probe builds a documents-only dir at "
        "--factor 30 this way, skipping the fact tables it never reads",
    )
    args = ap.parse_args()
    known = {*KEYED, "documents", "publications"}
    # Normalize before validating (round-14 ADVICE): strip whitespace
    # and drop empty segments so "documents, publications" or a
    # trailing comma doesn't fail with a confusing [''] / [' name']
    # unknown-table error when the intent is valid.
    if args.tables:
        wanted = {t.strip() for t in args.tables.split(",") if t.strip()}
        if not wanted:
            raise SystemExit(
                "--tables was given but named no tables; "
                f"known tables: {sorted(known)}"
            )
    else:
        wanted = known
    # Fail loudly on a typo'd table name (round-13 ADVICE): an unknown
    # name would otherwise silently generate nothing and could stamp an
    # empty-but-valid MANIFEST.json into a fresh dir, deferring the
    # failure to a confusing downstream parquet-read error in the probe.
    unknown = wanted - known
    if unknown:
        raise SystemExit(
            f"unknown --tables value(s) {sorted(unknown)}; "
            f"known tables: {sorted(known)}"
        )
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    for table, keys in KEYED.items():
        if table not in wanted:
            continue
        src = f"read_parquet('{args.src}/{table}.parquet')"
        if not keys:
            sel = f"SELECT * FROM {src}"
        else:
            shifted = ", ".join(
                f"{k} + c.i * {STRIDE} AS {k}" for k in keys)
            others = ", ".join(
                f'"{c[0]}"' for c in
                con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()
                if c[0] not in keys)
            sel = (f"SELECT {shifted}, {others} FROM {src} "
                   f"CROSS JOIN (SELECT unnest(range({args.factor})) AS i) c")
        con.sql(f"COPY ({sel}) TO '{args.out}/{table}.parquet' (FORMAT parquet)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{args.out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")

    if "documents" in wanted:
        # documents: python-side text perturbation (50k rows, trivial)
        rows = con.sql(
            f"SELECT doc_id, text, lang, source FROM "
            f"read_parquet('{args.src}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
        out_rows = []
        for i in range(args.factor):
            tag = f"copyd{i}"
            for doc_id, text, lang, source in rows:
                t = text if i == 0 else tag_text(text, tag)
                out_rows.append((doc_id + i * STRIDE, t, lang, source, len(t)))
        import pyarrow as pa
        import pyarrow.parquet as pq
        cols = list(zip(*out_rows))
        pq.write_table(
            pa.table(
                {"doc_id": pa.array(cols[0], pa.int64()),
                 "text": pa.array(cols[1], pa.string()),
                 "lang": pa.array(cols[2], pa.string()),
                 "source": pa.array(cols[3], pa.string()),
                 "n_chars": pa.array(cols[4], pa.int64())}),
            f"{args.out}/documents.parquet")
        print(f"documents: {len(out_rows)} rows")

    if "publications" in wanted:
        # publications (DBLP fixture): author/editor names get a per-copy
        # suffix so the coauthor graph replicates as FACTOR disjoint
        # components (how a larger DBLP actually behaves); record keys get
        # a per-copy SUFFIX — venue derivation reads the LEADING key
        # segments (www kind: first 3 '/'-segments), so the copy tag must
        # trail the venue-bearing segments for venues to stay shared and
        # per-venue author counts to grow the way a larger corpus would.
        pubs_src = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures", "publications.parquet")
        pub_cols = [c[0] for c in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{pubs_src}')").fetchall()]

        def pub_select(i: int) -> str:
            if i == 0:
                return f"SELECT * FROM read_parquet('{pubs_src}')"
            exprs = []
            for c in pub_cols:
                if c == "key":
                    exprs.append(f"key || '/c{i}' AS key")
                elif c in ("authors", "editors"):
                    exprs.append(
                        f"list_transform({c}, x -> x || ' C{i}') AS {c}")
                else:
                    exprs.append(f'"{c}"')
            return f"SELECT {', '.join(exprs)} FROM read_parquet('{pubs_src}')"

        union = " UNION ALL ".join(pub_select(i) for i in range(args.factor))
        con.sql(f"COPY ({union}) TO '{args.out}/publications.parquet' (FORMAT parquet)")
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{args.out}/publications.parquet')"
        ).fetchone()[0]
        print(f"publications: {n} rows")

    # Pin the build's identity (round-4 verdict #8): row count + an
    # order-insensitive content digest per table, asserted by the scale
    # tests so a silently stale fixture dir cannot weaken their checks.
    # With --tables the manifest MERGES into an existing one (round-12
    # ADVICE: a subset refresh used to overwrite it with only the
    # regenerated tables, silently dropping the other tables' pins —
    # and the digest-keyed green cache uses MANIFEST.json as its
    # fixture-bytes proxy, so the dropped tables' drift became
    # undetectable).  Factor must match: a mixed-factor dir is not a
    # coherent scale point.
    all_tables = [*KEYED, "documents", "publications"]
    manifest_path = os.path.join(args.out, "MANIFEST.json")
    manifest = {"factor": args.factor, "tables": {}}
    if args.tables and os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            existing = json.load(fh)
        if existing.get("factor") != args.factor:
            raise SystemExit(
                f"refusing to merge into {manifest_path}: existing factor "
                f"{existing.get('factor')} != --factor {args.factor} "
                "(a mixed-factor fixture dir is not a coherent scale point)"
            )
        manifest["tables"].update(existing.get("tables", {}))
    for table in all_tables:
        if table not in wanted:
            continue
        n, digest = table_digest(con, f"{args.out}/{table}.parquet")
        manifest["tables"][table] = {"rows": n, "digest": digest}
    # Never write a manifest that leaves on-disk parquet unpinned: the
    # scale tests iterate manifest entries, so an unmanifested table's
    # drift would be invisible.
    unpinned = sorted(
        t for t in all_tables
        if os.path.exists(f"{args.out}/{t}.parquet")
        and t not in manifest["tables"]
    )
    if unpinned:
        raise SystemExit(
            f"refusing to write a partial MANIFEST.json into {args.out}: "
            f"{unpinned} present on disk but unpinned — rerun without "
            "--tables, or include them"
        )
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    print(f"MANIFEST.json: {len(manifest['tables'])} tables")


if __name__ == "__main__":
    main()
