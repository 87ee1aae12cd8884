"""Correctness at the SCALE point, not just timing: run a slice of the
registry's heaviest table-backed queries against their own DuckDB
oracles over the ~10x inflated fixtures (fixtures/sf1, built by
tools/make_scale_fixtures.py / auto-built by bench.py). The driver's
differential gate runs at sf0.01; this proves the same Spark-vs-oracle
hash identity survives a 10x-of-bench-scale input — partitioning,
AQE re-plans, and the two-regime LSH path included.

Only queries whose oracles read the fixture TABLES qualify (the dblp
oracles pin the committed publications fixture by absolute path, so
at the scale dir their oracle would see different data than the
query). Skipped when the scale fixtures are absent.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SCALE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "sf1"
)

# heavy + representative: scan/agg/join, window, LSH dedup (two-regime
# path), PPJoin exact twin proof, sampling, curation
SCALE_QUERIES = [
    "tpch_pricing_summary",
    "tpch_revenue_by_nation",
    "tpch_window_ntile",
    "llm_dedup_minhash_lsh",
    "llm_ngram_jaccard_prefix",
    "llm_mixture_sample",
    "llm_token_rarity",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    return f"{v:.6g}" if isinstance(v, float) else ("\\N" if v is None else str(v))


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir(SCALE_DIR), reason="scale fixtures not built"
)
@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_oracle_holds_at_scale_point(spark, name):
    import __spark_entry__ as entrymod

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SCALE_DIR}/{t}.parquet')"
        )
    sdf = qs[name](spark, SCALE_DIR)
    rel = con.sql(osql[name])
    assert sorted(sdf.columns) == sorted(rel.columns)
    s = sorted(sorted(map(_norm, r)) for r in map(tuple, sdf.collect()))
    o = sorted(sorted(map(_norm, r)) for r in rel.fetchall())
    assert len(s) == len(o) > 0
    assert s == o
