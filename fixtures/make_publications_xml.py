"""Render publications.parquet as DBLP-style line records.

One trimmed XML element per line — the exact intermediate format the
reference's ingestion produces (dblpXMLparser.scala:96 appends
``trim(child).toString() + "\n"`` per record) and its six jobs consume
(Homework2.scala:547 TextInputFormat). The engine's XML source
(map_reduce_for_dbpl_dataset_spark/sources/xml.py) parses this file
back; the roundtrip is oracle-checked against the parquet original.

Deterministic: rows sorted by key, fields in fixed order, no
timestamps. Empty strings / empty arrays are omitted (DBLP-style:
absent field, not empty element).
"""

from __future__ import annotations

import os
from xml.sax.saxutils import escape, quoteattr

import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))

# dblp.dtd:36 %field; order (author..publnr), tag -> parquet column
FIELD_ORDER = (
    ("author", "authors"),
    ("editor", "editors"),
    ("title", "title"),
    ("booktitle", "booktitle"),
    ("pages", "pages"),
    ("year", "year"),
    ("address", "address"),
    ("journal", "journal"),
    ("volume", "volume"),
    ("number", "number"),
    ("month", "month"),
    ("url", "url"),
    ("ee", "ee"),
    ("cdrom", "cdrom"),
    ("cite", "cite"),
    ("publisher", "publisher"),
    ("note", "note"),
    ("crossref", "crossref"),
    ("isbn", "isbn"),
    ("series", "series"),
    ("school", "school"),
    ("chapter", "chapter"),
    ("publnr", "publnr"),
)


def render(row: dict) -> str:
    parts = [f"<{row['kind']} key={quoteattr(row['key'])}"]
    if row["mdate"] is not None:
        parts.append(f" mdate={quoteattr(row['mdate'].isoformat())}")
    parts.append(">")
    for tag, col in FIELD_ORDER:
        v = row[col]
        if v is None or v == "" or v == []:
            continue
        if isinstance(v, list):
            parts.extend(f"<{tag}>{escape(str(x))}</{tag}>" for x in v)
        else:
            parts.append(f"<{tag}>{escape(str(v))}</{tag}>")
    parts.append(f"</{row['kind']}>")
    return "".join(parts)


def main() -> None:
    table = pq.read_table(os.path.join(HERE, "publications.parquet"))
    rows = sorted(table.to_pylist(), key=lambda r: r["key"])
    out = os.path.join(HERE, "publications.xml")
    with open(out, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(render(r) + "\n")
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main()
