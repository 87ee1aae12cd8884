"""PySpark-native analytics engine with the query surface of
huynhptr/Map-Reduce-for-DBPL-dataset, re-expressed Spark-first.

The reference (see /root/reference, surveyed in SURVEY.md) is a fixed
pipeline of six Hadoop MapReduce jobs over a DBLP publication record
file plus a DOM-based XML ingester. This package decomposes those
computations into generic, reusable DataFrame-native operators and
grows them into a general engine:

- ``sources``   — parquet/text/XML ingestion and sinks
- ``functions`` — scalar expression library (venue derivation,
                  author coalesce, text analysis, vector math)
- ``operators`` — relational building blocks (top-k per group,
                  gaps-and-islands runs, group argmax, dedup families,
                  similarity search, as-of joins)
- ``queries``   — named query registry: the six reference queries,
                  the generic operator inventory over the TPC-H-ish
                  fixtures, and LLM-pipeline extension queries
- ``streaming`` — Structured Streaming windowed aggregations
- ``plans``     — plan inspection / assertion helpers

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, partial aggregation, and AQE handles skew — no custom
execution layer (SURVEY.md §4).
"""

__version__ = "0.1.0"
