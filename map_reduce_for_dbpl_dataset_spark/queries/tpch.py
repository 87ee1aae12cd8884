"""Generic operator inventory over the TPC-H-ish fixtures (SURVEY.md
§2.2 + build-plan step 4).

The reference's six queries exercise only scan/filter/project/
group-agg/top-k; the engine exposes the full relational surface —
joins of every type, distinct/rollup/cube aggregation, window frames,
set ops, scalar function families, subqueries — each as a named query
with a DuckDB oracle.

Determinism rules used throughout (so value hashes match the oracle):
- money arithmetic goes through DECIMAL(18,2)/(38,4) so sums are
  exact and order-insensitive, then casts back to double;
- every aggregate/computed column is aliased identically in Spark and
  SQL; array outputs are sorted.

Scale notes are attached per query; the common ones:
- dimension joins (region/nation/supplier/customer at TPC-H ratios)
  are marked broadcast() — no shuffle of the fact side;
- aggregations benefit from Catalyst partial aggregation; no
  collect()-and-loop anywhere;
- top-k is TakeOrderedAndProject, per-group top-k WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table

D = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- flagship: revenue by nation/region (join pipeline + agg + order) --------
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region,
    revenue = sum(extendedprice * (1 - discount)) per (region, nation).

    Scale: customer/nation/region are broadcast — the only shuffle is
    lineitem⋈orders (both huge, co-partitioned on orderkey by AQE) and
    the final 25-group aggregate, whose partial aggregation reduces
    each task's output to <= 25 rows before the exchange.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    rev = (F.col("l_extendedprice").cast(D) * (F.lit(1).cast(D) - F.col("l_discount").cast(D))).alias("rev")
    return (
        lineitem.select("l_orderkey", rev)
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("rev").cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("region", "nation")
    )


SQL_REVENUE_BY_NATION = """
SELECT r_name AS region, n_name AS nation,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY region, nation
"""


# --- pricing summary (TPC-H Q1 shape: filter + multi-agg) --------------------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical scan→filter→hash-agg pipeline. The
    shipdate filter and 7-column projection reach the parquet scan
    (PushedFilters/ReadSchema); partial aggregation leaves <= 6 rows
    per task before the single exchange.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(D) * (F.lit(1).cast(D) - F.col("l_discount").cast(D))
    charge = disc_price * (F.lit(1).cast(D) + F.col("l_tax").cast(D))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(D)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(D)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.avg(F.col("l_quantity").cast(D)), 6).cast("double").alias("avg_qty"),
            F.round(F.avg(F.col("l_discount").cast(D)), 6).cast("double").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(18,2))), 6) AS DOUBLE) AS avg_qty,
  CAST(ROUND(AVG(CAST(l_discount AS DECIMAL(18,2))), 6) AS DOUBLE) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


QUERIES = {
    "tpch_revenue_by_nation": q_revenue_by_nation,
    "tpch_pricing_summary": q_pricing_summary,
}

ORACLE_SQL = {
    "tpch_revenue_by_nation": SQL_REVENUE_BY_NATION,
    "tpch_pricing_summary": SQL_PRICING_SUMMARY,
}
