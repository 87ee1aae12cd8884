"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``map_reduce_for_dbpl_dataset_spark``; this
module only adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_for_dbpl_dataset_spark import queries as _registry
from map_reduce_for_dbpl_dataset_spark.queries.tpch import q_revenue_by_nation

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by (region, nation): a five-table join pipeline with
    broadcast dimensions and a decimal-exact aggregate — exercises
    scan, pushdown, broadcast join, shuffle join, hash agg, sort.
    """
    return q_revenue_by_nation(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased to match ``oracle_sql``.
    """
    return _registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each entry in ``queries()``.

    Views pre-registered by the driver: region nation customer
    supplier part orders lineitem events documents embeddings. The
    DBLP-family oracles read the deterministic publications fixture
    (fixtures/publications.parquet) via read_parquet() — the six
    reference queries need the DBLP-shaped table (FIXTURES.md §A),
    which is not part of the sf dirs. Entries without SQL get the
    driver's weaker rows-only check.
    """
    return _registry.all_oracle_sql()
