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

    Scale: the three dimensions are PRE-JOINED into one broadcast
    (customer ⋈ nation ⋈ region — dimension-side joins touch only the
    15k-row customer stream), so the fact stream passes TWO joins
    instead of four: lineitem⋈orders (both huge, co-partitioned on
    orderkey by AQE) and one broadcast probe into the flattened dim.
    Measured ~2.7x faster cold and ~10% faster steady-state than the
    four-chained-broadcast form at sf0.1 — per-fact-row join work is
    what dominates at 100 TB. Partial aggregation reduces each task's
    output to <= 25 rows before the final exchange.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    dims = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "n_name", "r_name")
    )
    rev = (F.col("l_extendedprice").cast(D) * (F.lit(1).cast(D) - F.col("l_discount").cast(D))).alias("rev")
    return (
        lineitem.select("l_orderkey", rev)
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        # no forced hint on dims: it scales with |customer|, so the
        # broadcast-vs-shuffle decision belongs to the size threshold +
        # AQE (broadcasts at bench scale, degrades safely at 100 TB —
        # a forced hint would OOM there). nation/region above are
        # constant-size and safely hinted.
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
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


# ---------------------------------------------------------------------------
# Scan / filter / projection (F1-F4, P2: pushdown must reach the scan)
# ---------------------------------------------------------------------------
def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushdown demo: .explain shows PushedFilters
    on l_shipdate/l_quantity and a 4-column ReadSchema — the reference
    does this by hand with early mapper returns (Homework2.scala:164-166).
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


SQL_SCAN_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
  AND l_quantity > 45
"""


# ---------------------------------------------------------------------------
# Aggregation family: distinct aggs, rollup, cube, grouping sets, pivot
# ---------------------------------------------------------------------------
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) — absent from the reference (SURVEY.md §2.2
    checklist); Spark expands it to a two-phase partial-distinct
    aggregate, no single-node bottleneck."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


SQL_DISTINCT_AGG = """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority): subtotal rows carry NULL group keys in
    both engines; money through DECIMAL so totals hash-match."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(D)).cast("double").alias("total"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


SQL_ROLLUP_ORDERS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast(D)).cast("double").alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_CUBE_LINEITEM = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via spark.sql — the SQL front-end is part of the
    engine surface (registry queries are DataFrame or SQL alike)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
"""


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never inferred — inference
    would scan the fact table twice and break plan stability)."""
    o = _t(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .orderBy("o_orderpriority")
    )
    return out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c}") for c in ("O", "F", "P")],
    )


SQL_PIVOT_STATUS = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_O,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_F,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Join family: left, semi, anti, full outer, non-equi, as-of
# ---------------------------------------------------------------------------
def q_join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customers LEFT JOIN orders, then the
    distribution of per-customer order counts (zero included)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("n_custs")).orderBy("c_count")


SQL_JOIN_LEFT_ORDER_COUNTS = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS n_custs FROM per_cust GROUP BY c_count ORDER BY c_count
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers holding at least one open order — the probe
    side streams, the build side deduplicates inside the join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


SQL_JOIN_SEMI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
ORDER BY c_custkey
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (TPC-H Q22 shape): customers with no orders at all."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER over per-nation customer/supplier counts."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.withColumnRenamed("nationkey", "c_nk")
        .join(s.withColumnRenamed("nationkey", "s_nk"), F.col("c_nk") == F.col("s_nk"), "full_outer")
        .select(
            F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


SQL_JOIN_FULL_OUTER = """
WITH c AS (SELECT c_nationkey AS c_nk, count(*) AS n_cust FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS s_nk, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(c_nk, s_nk) AS nationkey,
       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c_nk = s_nk
ORDER BY nationkey
"""


def q_join_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + non-equi residual: lineitems shipped > 60 days after
    the order date. The equi key keeps this a hash join; the range
    predicate evaluates as a post-join filter — no nested loop."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"))
        .orderBy("o_orderpriority")
    )


SQL_JOIN_NONEQUI = """
SELECT o_orderpriority, count(*) AS n_late
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True non-equi band join: parts bucketed into price bands.
    The bands side is tiny and broadcast — a BroadcastNestedLoopJoin
    over 3 rows, which is the right physical plan; at scale the fact
    side never shuffles."""
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [(0.0, 500.0, "low"), (500.0, 1200.0, "mid"), (1200.0, 1e9, "high")],
        "lo double, hi double, band string",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= F.col("lo")) & (p.p_retailprice < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast(D)).cast("double").alias("sum_price"),
        )
        .orderBy("band")
    )


SQL_JOIN_RANGE_BANDS = """
SELECT band, count(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM part
JOIN (VALUES (0.0, 500.0, 'low'), (500.0, 1200.0, 'mid'), (1200.0, 1e9, 'high'))
     AS bands(lo, hi, band)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band ORDER BY band
"""


def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each event picks up the user's
    most recent order as of the event time. Right side is pre-deduped
    to one row per (key, time) so the match is deterministic."""
    from ..operators.asof import asof_join

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    return asof_join(
        events,
        orders,
        on=["user_id"],
        left_time="ts",
        right_time="o_orderdate",
        payload=["last_orderkey"],
        how="inner",
    ).select("event_id", "user_id", "last_orderkey")


SQL_ASOF_LATEST_ORDER = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS last_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT event_id, e.user_id AS user_id, last_orderkey
FROM events e ASOF JOIN o ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
"""


# ---------------------------------------------------------------------------
# Window functions: frames, lag/lead, ntile/percentiles, per-group top-k
# ---------------------------------------------------------------------------
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running + moving-window frames (rowsBetween), decimal-exact."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(D)).over(run).cast("double").alias("running_total"),
        F.round(F.avg(F.col("o_totalprice").cast(D)).over(mov), 6).cast("double").alias("moving_avg3"),
    )


SQL_WINDOW_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_run AS DOUBLE) AS running_total,
  CAST(ROUND(AVG(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_mov, 6) AS DOUBLE) AS moving_avg3
FROM orders
WINDOW
  w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  w_mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): days between a customer's consecutive orders."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date")).alias("days_since_prev"),
    )


SQL_WINDOW_LAG_GAP = """
SELECT o_custkey, o_orderkey,
  date_diff('day',
            CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
            CAST(o_orderdate AS DATE)) AS days_since_prev
FROM orders
"""


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking analytics: quartile, percent_rank, cume_dist over
    customer balances (deterministic tie-break on custkey).

    NOT ``Window.orderBy`` with no partition key (that plans a
    single-partition WindowExec — every row through ONE task): the
    two-pass global rank in operators/global_rank.py range-partitions
    on the order keys, broadcasts per-partition offsets, and derives
    all three analytics as pure expressions over (row_number, n). The
    oracle keeps the canonical window-function SQL, so the hash match
    proves the decomposition."""
    from ..operators.global_rank import global_row_number, ntile_from_rn

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked, n = global_row_number(
        c, [F.desc("c_acctbal"), F.asc("c_custkey")], out_col="_rn"
    )
    rn = F.col("_rn")
    pct = F.lit(0.0) if n <= 1 else (rn - 1) / F.lit(float(n - 1))
    return ranked.select(
        "c_custkey",
        ntile_from_rn(rn, n, 4).alias("quartile"),
        F.round(pct, 6).alias("pct_rank"),
        F.round(rn / F.lit(float(n)), 6).alias("cume"),
    )


SQL_WINDOW_NTILE = """
SELECT c_custkey,
  ntile(4) OVER w AS quartile,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey ASC)
"""


def q_top3_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k on fixtures via operators/topk.py: Spark >= 3.5
    plans WindowGroupLimit, so each task keeps <= 3 rows per customer
    before the exchange — the distributed version of the reference's
    min-eviction map (Homework2.scala:92-126)."""
    from ..operators.topk import top_k_per_group

    o = _t(spark, sf_dir, "orders")
    return top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )


SQL_TOP3_ORDERS_PER_CUST = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice FROM ranked WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------
def q_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT over nation keys that have
    customers vs suppliers, tagged by provenance."""
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cn.intersect(sn).withColumn("tag", F.lit("both"))
    c_only = cn.subtract(sn).withColumn("tag", F.lit("customer_only"))
    s_only = sn.subtract(cn).withColumn("tag", F.lit("supplier_only"))
    return both.unionByName(c_only).unionByName(s_only).orderBy("tag", "nationkey")


SQL_SET_OPS_NATIONS = """
WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS tag FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
UNION ALL
SELECT nationkey, 'customer_only' AS tag FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
UNION ALL
SELECT nationkey, 'supplier_only' AS tag FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
ORDER BY tag, nationkey
"""


# ---------------------------------------------------------------------------
# Scalar function families (string / date / math / conditional / json / array)
# ---------------------------------------------------------------------------
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%bolt%"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("uname"),
            F.substring("p_type", 1, 4).alias("type4"),
            F.length("p_name").alias("name_len"),
            F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        )
        .orderBy("p_partkey")
    )


SQL_SCALAR_STRING = r"""
SELECT p_partkey, upper(p_name) AS uname, substring(p_type, 1, 4) AS type4,
       length(p_name) AS name_len,
       CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INT) AS brand_num,
       concat_ws('/', p_brand, p_type) AS brand_type,
       replace(p_name, ' ', '_') AS snake
FROM part WHERE p_name LIKE '%bolt%' ORDER BY p_partkey
"""


def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mon"),
        (F.dayofweek(d) - 1).alias("dow"),  # normalize: 0=Sunday in both engines
        # date outputs rendered ISO: Spark DATE -> pandas datetime.date
        # ('1995-01-31') but DuckDB DATE -> datetime64 ('1995-01-31
        # 00:00:00'), so raw dates can never hash-match under the
        # driver's pandas canonicalization.
        F.trunc(d, "month").cast("string").alias("month_start"),
        F.date_add(d, 30).cast("string").alias("due_date"),
        F.last_day(d).cast("string").alias("eom"),
    )


SQL_SCALAR_DATE = """
SELECT o_orderkey,
       year(CAST(o_orderdate AS DATE)) AS yr,
       quarter(CAST(o_orderdate AS DATE)) AS qtr,
       month(CAST(o_orderdate AS DATE)) AS mon,
       dayofweek(CAST(o_orderdate AS DATE)) AS dow,
       strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom
FROM orders
"""


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.ceil("l_discount" ).cast("bigint").alias("disc_ceil"),
        (F.col("l_partkey") % 7).alias("pk_mod7"),
        F.round(F.pow("l_tax", 2), 8).alias("tax_sq"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
    )


SQL_SCALAR_MATH = """
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_extendedprice), 6) AS sqrt_price,
       round(ln(l_extendedprice), 6) AS ln_price,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_discount) AS BIGINT) AS disc_ceil,
       l_partkey % 7 AS pk_mod7,
       round(pow(l_tax, 2), 8) AS tax_sq,
       abs(l_quantity - 25) AS qty_dev
FROM lineitem
"""


def q_case_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "fast")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "normal")
        .otherwise("slow")
    )
    return (
        o.select(tier.alias("tier"), "o_totalprice")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(D)).cast("double").alias("total"),
        )
        .orderBy("tier")
    )


SQL_CASE_TIERS = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'fast'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'normal'
            ELSE 'slow' END AS tier,
       count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY 1 ORDER BY tier
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_JSON_EXTRACT = """
SELECT event_type, count(*) AS n_events,
       SUM(CAST(json_extract_string(props, '$.k') AS INT))::BIGINT AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + predicates: per-user sorted distinct event
    types, arity, membership test. The array itself is serialized with
    '|' in the output — the driver's pandas canonicalization cannot
    sort list cells — while size/contains still exercise the array
    ops on the unserialized column."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types_arr"))
        .select(
            "user_id",
            F.array_join("types_arr", "|").alias("types"),
            F.size("types_arr").alias("n_types"),
            F.array_contains("types_arr", "purchase").alias("has_purchase"),
        )
        .orderBy("user_id")
    )


SQL_ARRAY_OPS = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types,
       len(list(DISTINCT event_type)) AS n_types,
       list_contains(list(DISTINCT event_type), 'purchase') AS has_purchase
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery: Catalyst rewrites to a left-semi hash join."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        ORDER BY o_orderkey
        """
    )


SQL_SUBQUERY_IN = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
ORDER BY o_orderkey
"""


def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: suppliers richer than their nation's
    average — decorrelated by Catalyst into an aggregate + join."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s1
        WHERE s_acctbal > (SELECT avg(s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s1.s_nationkey)
        ORDER BY s_suppkey
        """
    )


SQL_SUBQUERY_CORRELATED = """
SELECT s_suppkey, s_name
FROM supplier s1
WHERE s_acctbal > (SELECT avg(s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = s1.s_nationkey)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Event-time windows (batch form; streaming twin in streaming/)
# ---------------------------------------------------------------------------
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows over event time."""
    e = _t(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D)).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type")
    )


SQL_EVENTS_TUMBLING = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event lands in exactly
    two windows; Spark's window() enumerates them without self-join."""
    e = _t(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


SQL_EVENTS_SLIDING = """
WITH ex AS (
  SELECT make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - off) * 1000000 AS BIGINT)) AS window_start
  FROM events, (VALUES (0), (1800)) AS t(off)
)
SELECT window_start, count(*) AS n_events
FROM ex GROUP BY 1 ORDER BY window_start
"""


def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user — Spark's
    session_window works identically in batch and streaming; oracle is
    the classic gaps-and-islands rewrite."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D)).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events", "sum_value")
        .orderBy("user_id", "session_start")
    )


SQL_EVENTS_SESSION = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT min(ts) AS session_start, user_id, count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
"""


QUERIES.update(
    {
        "tpch_scan_filter_project": q_scan_filter_project,
        "tpch_distinct_agg": q_distinct_agg,
        "tpch_rollup_orders": q_rollup_orders,
        "tpch_cube_lineitem": q_cube_lineitem,
        "tpch_grouping_sets": q_grouping_sets,
        "tpch_pivot_status": q_pivot_status,
        "tpch_join_left_order_counts": q_join_left_order_counts,
        "tpch_join_semi": q_join_semi,
        "tpch_join_anti": q_join_anti,
        "tpch_join_full_outer": q_join_full_outer,
        "tpch_join_nonequi": q_join_nonequi,
        "tpch_join_range_bands": q_join_range_bands,
        "tpch_asof_latest_order": q_asof_latest_order,
        "tpch_window_running_total": q_window_running_total,
        "tpch_window_lag_gap": q_window_lag_gap,
        "tpch_window_ntile": q_window_ntile,
        "tpch_top3_orders_per_cust": q_top3_orders_per_cust,
        "tpch_set_ops_nations": q_set_ops_nations,
        "tpch_scalar_string": q_scalar_string,
        "tpch_scalar_date": q_scalar_date,
        "tpch_scalar_math": q_scalar_math,
        "tpch_case_tiers": q_case_tiers,
        "tpch_json_extract": q_json_extract,
        "tpch_array_ops": q_array_ops,
        "tpch_subquery_in": q_subquery_in,
        "tpch_subquery_correlated": q_subquery_correlated,
        "tpch_events_tumbling": q_events_tumbling,
        "tpch_events_sliding": q_events_sliding,
        "tpch_events_session": q_events_session,
    }
)

ORACLE_SQL.update(
    {
        "tpch_scan_filter_project": SQL_SCAN_FILTER_PROJECT,
        "tpch_distinct_agg": SQL_DISTINCT_AGG,
        "tpch_rollup_orders": SQL_ROLLUP_ORDERS,
        "tpch_cube_lineitem": SQL_CUBE_LINEITEM,
        "tpch_grouping_sets": SQL_GROUPING_SETS,
        "tpch_pivot_status": SQL_PIVOT_STATUS,
        "tpch_join_left_order_counts": SQL_JOIN_LEFT_ORDER_COUNTS,
        "tpch_join_semi": SQL_JOIN_SEMI,
        "tpch_join_anti": SQL_JOIN_ANTI,
        "tpch_join_full_outer": SQL_JOIN_FULL_OUTER,
        "tpch_join_nonequi": SQL_JOIN_NONEQUI,
        "tpch_join_range_bands": SQL_JOIN_RANGE_BANDS,
        "tpch_asof_latest_order": SQL_ASOF_LATEST_ORDER,
        "tpch_window_running_total": SQL_WINDOW_RUNNING_TOTAL,
        "tpch_window_lag_gap": SQL_WINDOW_LAG_GAP,
        "tpch_window_ntile": SQL_WINDOW_NTILE,
        "tpch_top3_orders_per_cust": SQL_TOP3_ORDERS_PER_CUST,
        "tpch_set_ops_nations": SQL_SET_OPS_NATIONS,
        "tpch_scalar_string": SQL_SCALAR_STRING,
        "tpch_scalar_date": SQL_SCALAR_DATE,
        "tpch_scalar_math": SQL_SCALAR_MATH,
        "tpch_case_tiers": SQL_CASE_TIERS,
        "tpch_json_extract": SQL_JSON_EXTRACT,
        "tpch_array_ops": SQL_ARRAY_OPS,
        "tpch_subquery_in": SQL_SUBQUERY_IN,
        "tpch_subquery_correlated": SQL_SUBQUERY_CORRELATED,
        "tpch_events_tumbling": SQL_EVENTS_TUMBLING,
        "tpch_events_sliding": SQL_EVENTS_SLIDING,
        "tpch_events_session": SQL_EVENTS_SESSION,
    }
)


# --- statistical aggregates (exact-decimal moment formulas) ------------------
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (stddev, variance, correlation) per
    return flag, computed from EXACT decimal power sums and only then
    converted to double — so the result is order-insensitive and
    hash-stable, unlike streaming float stddev/corr whose partial-
    aggregation order varies run to run. This sum-of-moments shape is
    also the distributed-friendly form: one partial-aggregable pass.
    """
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast(D)
    p = F.col("l_extendedprice").cast(D)
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(q * q).alias("sq2"),
        F.sum(p).alias("sp"),
        F.sum(p * p).alias("sp2"),
        F.sum(q * p).alias("sqp"),
    )
    n = F.col("n").cast("double")
    sq = F.col("sq").cast("double")
    sq2 = F.col("sq2").cast("double")
    sp = F.col("sp").cast("double")
    sp2 = F.col("sp2").cast("double")
    sqp = F.col("sqp").cast("double")
    var_q = (n * sq2 - sq * sq) / (n * (n - F.lit(1.0)))
    var_p = (n * sp2 - sp * sp) / (n * (n - F.lit(1.0)))
    corr = (n * sqp - sq * sp) / F.sqrt((n * sq2 - sq * sq) * (n * sp2 - sp * sp))
    f6 = lambda c: F.floor(c * F.lit(1000000.0)) / F.lit(1000000.0)  # noqa: E731
    return g.select(
        "l_returnflag",
        "n",
        f6(F.sqrt(var_q)).alias("stddev_qty"),
        f6(var_p / F.lit(1000000.0)).alias("var_price_m"),
        f6(corr).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


SQL_STATS_AGG = """
WITH g AS (
  SELECT l_returnflag, count(*) AS n,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sq2,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sp2,
         sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sqp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  floor(sqrt((n::DOUBLE * sq2::DOUBLE - sq::DOUBLE * sq::DOUBLE) / (n::DOUBLE * (n::DOUBLE - 1.0))) * 1000000.0) / 1000000.0 AS stddev_qty,
  floor(((n::DOUBLE * sp2::DOUBLE - sp::DOUBLE * sp::DOUBLE) / (n::DOUBLE * (n::DOUBLE - 1.0))) / 1000000.0 * 1000000.0) / 1000000.0 AS var_price_m,
  floor(((n::DOUBLE * sqp::DOUBLE - sq::DOUBLE * sp::DOUBLE)
        / sqrt((n::DOUBLE * sq2::DOUBLE - sq::DOUBLE * sq::DOUBLE) * (n::DOUBLE * sp2::DOUBLE - sp::DOUBLE * sp::DOUBLE))) * 1000000.0) / 1000000.0 AS corr_qty_price
FROM g ORDER BY l_returnflag
"""


# --- map-type operations ------------------------------------------------------
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a per-user map event_type -> count
    (map_from_entries over sorted collected structs), then read it
    back with size() and element_at() lookups. Output is scalar
    columns so the oracle stays engine-neutral; absent keys surface
    as NULL (element_at contract)."""
    e = _t(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.element_at("m", "click").alias("n_click"),
        F.element_at("m", "purchase").alias("n_purchase"),
    ).orderBy("user_id")


SQL_MAP_OPS = """
SELECT user_id,
       count(DISTINCT event_type) AS n_types,
       nullif(count(*) FILTER (event_type = 'click'), 0) AS n_click,
       nullif(count(*) FILTER (event_type = 'purchase'), 0) AS n_purchase
FROM events GROUP BY user_id ORDER BY user_id
"""


# --- deterministic hash sampling ---------------------------------------------
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample: md5-hash the key, keep hash % 100 < 5.
    TABLESAMPLE is engine/seed-dependent; hash-gating is the portable,
    repeatable form — and the right pattern at 100 TB, where a sample
    must be consistent across reruns and across engines (the filter
    also pushes past column pruning: only o_orderkey is hashed)."""
    o = _t(spark, sf_dir, "orders")
    h = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10).cast("long")
    return (
        o.filter(h % 100 < 5)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("o_totalprice").cast(D)).cast("double").alias("sampled_price"),
        )
        .orderBy("o_orderstatus")
    )


SQL_HASH_SAMPLE = """
SELECT o_orderstatus, count(*) AS n_sampled,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sampled_price
FROM orders
WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 100 < 5
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


QUERIES.update(
    {
        "tpch_stats_agg": q_stats_agg,
        "tpch_map_ops": q_map_ops,
        "tpch_hash_sample": q_hash_sample,
    }
)

ORACLE_SQL.update(
    {
        "tpch_stats_agg": SQL_STATS_AGG,
        "tpch_map_ops": SQL_MAP_OPS,
        "tpch_hash_sample": SQL_HASH_SAMPLE,
    }
)


# --- skew: salted two-phase aggregation --------------------------------------
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregate over lineitem's 3-value l_returnflag — the
    canonical hot-key shape (at 100 TB each flag would funnel ~33% of
    all rows through ONE reducer). operators/skew.py spreads phase 1
    over 16 salts; the result is bit-identical to the plain aggregate
    (which is what the oracle computes)."""
    from ..operators.skew import salted_sum_count

    li = _t(spark, sf_dir, "lineitem")
    out = salted_sum_count(
        li,
        keys=["l_returnflag"],
        sums={
            "sum_qty": F.col("l_quantity").cast(D),
            "sum_price": F.col("l_extendedprice").cast(D),
        },
        salt=F.col("l_orderkey"),
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
        "n_rows",
    ).orderBy("l_returnflag")


SQL_SALTED_AGG = """
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- bucketed co-located join ------------------------------------------------
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-pruned shuffle-free join: orders and lineitem are written
    ONCE as tables bucketed+sorted by orderkey; the subsequent
    sort-merge join reads co-located buckets and needs NO exchange on
    either side (the 100 TB pattern for repeated fact-fact joins:
    amortize the shuffle into the layout). The final aggregate is the
    only shuffle in the plan."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    to_name, tl_name = f"mrdbpl_ob_{tag}", f"mrdbpl_lb_{tag}"
    catalog = spark.catalog
    if not catalog.tableExists(to_name):
        (
            _t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .option("path", f"/tmp/mrdbpl_bucketed/{to_name}")
            .saveAsTable(to_name)
        )
    if not catalog.tableExists(tl_name):
        (
            _t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .option("path", f"/tmp/mrdbpl_bucketed/{tl_name}")
            .saveAsTable(tl_name)
        )
    o = spark.table(to_name)
    li = spark.table(tl_name)
    rev = (F.col("l_extendedprice").cast(D) * (F.lit(1).cast(D) - F.col("l_discount").cast(D)))
    # merge hint: at fixture scale the broadcast planner would otherwise
    # hide the bucketing; at real scale SMJ is what the planner picks.
    joined = li.join(o.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        joined.groupBy("o_orderstatus")
        .agg(F.sum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("o_orderstatus")
    )


SQL_BUCKETED_JOIN = """
SELECT o_orderstatus,
       sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe equi-join (operators/skew.py:salted_join): customer's
    25-value c_nationkey is the canonical hot join key (at 100 TB each
    nation funnels ~4% of ALL customers through one task in a plain
    shuffle join). The big side is salted by c_custkey and the 25-row
    nation side replicated 16x, so each hot key spreads over 16 tasks;
    the joined rows then aggregate per nation. Row-identical to the
    plain join the oracle computes — the salting is invisible in the
    result, visible in the task distribution."""
    from ..operators.skew import salted_join

    c = _t(spark, sf_dir, "customer")
    # shuffle_hash hint: at fixture scale Spark would broadcast the
    # 400-row replicated side, which has no skew problem and would
    # demonstrate nothing — the hint pins the shuffled (key, salt)
    # plan that a just-over-broadcast-threshold side gets at 100 TB
    n = (
        _t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("c_nationkey"), "n_name")
        .hint("shuffle_hash")
    )
    joined = salted_join(c, n, key="c_nationkey", salt=F.col("c_custkey"), n_salts=16)
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(D)).cast("double").alias("sum_acctbal"),
        )
        .orderBy("n_name")
    )


SQL_SALTED_JOIN = """
SELECT n.n_name, count(*) AS n_customers,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
"""


def q_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning (InjectRuntimeFilter): the
    selective predicate on the orders (creation) side is compiled into
    a bloom_filter_agg subquery whose might_contain(xxhash64(key))
    predicate lands on the lineitem side BEFORE its shuffle — at
    100 TB the fact stream drops ~80% of its rows pre-exchange
    instead of shuffling them to die in the join. This is the
    shuffle-join counterpart of dynamic partition pruning: DPP prunes
    directories, the Bloom filter prunes rows of unpartitioned keys.

    Conf scoping: Spark only injects the filter when the application
    side scans >10 GB (the bloom build costs one extra pass over the
    dim), so at fixture scale the threshold is lowered — and
    autoBroadcastJoinThreshold disabled, since sf0.01's orders would
    broadcast and a broadcast join needs no runtime filter. The
    physical plan is FORCED while the overrides are set (QueryExecution
    caches it), then every conf is restored, so no other registry
    query is affected; at real scale the defaults fire on their own.

    tools/plan_audit.py asserts might_contain + bloom_filter_agg.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        dim = o.filter(F.col("o_orderpriority") == "1-URGENT")
        rev = F.col("l_extendedprice").cast(D) * (
            F.lit(1).cast(D) - F.col("l_discount").cast(D)
        )
        df = (
            li.join(dim, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(rev).cast("double").alias("revenue"),
            )
            .orderBy("l_returnflag")
        )
        # materialize the physical plan under the scoped confs; the
        # cached QueryExecution is what collect()/explain() reuse
        df._jdf.queryExecution().executedPlan()  # noqa: SLF001
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    return df


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-weighted order sample (operators/sampling.py, A-ES):
    200 orders drawn with probability ~ o_totalprice in ONE pass,
    deterministically (hash-derived uniforms, not rand()), planned as
    TakeOrderedAndProject — the distributed reservoir. High-value
    orders dominate the sample, which the output makes visible by
    aggregating the sample per status against its full-population
    counterpart: avg_sampled_price >> avg_all_price.

    The oracle reproduces key = ln(u)/w formula-for-formula (u is an
    exact rational of the md5 hash; ln is the one transcendental —
    IEEE-identical across both engines at these magnitudes)."""
    from ..operators.sampling import weighted_sample

    o = _t(spark, sf_dir, "orders")
    s = weighted_sample(o, "o_orderkey", "o_totalprice", k=200)
    return (
        s.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("o_totalprice").cast(D)).cast("double").alias("sampled_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderstatus")
    )


SQL_WEIGHTED_SAMPLE = """
WITH keyed AS (
  SELECT *,
         ln(((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 1000000) + 1)
            / 1000001.0) / o_totalprice AS k
  FROM orders
),
s AS (SELECT * FROM keyed ORDER BY k DESC, o_orderkey ASC LIMIT 200)
SELECT o_orderstatus, count(*) AS n_sampled,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sampled_price,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
FROM s GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via Spark's
    hll_sketch_agg/hll_union_agg): distinct customers are sketched
    PER ORDER-YEAR, then the year sketches are UNIONED into the
    all-time estimate — the incremental-rollup pattern where a 100 TB
    history is never rescanned: each new partition contributes a
    KB-sized sketch and distinct counts over any year range come from
    sketch unions (exact distinct does not compose; sketches do).

    Oracle strategy: DuckDB cannot evaluate DataSketches, so the
    estimates are exported as deterministic BOOLEAN claims the oracle
    states as literals — (a) per-year |estimate - exact|/exact < 6%
    (lgK=12 HLL at these cardinalities), (b) the UNION-of-year-
    sketches estimate is within 6% of the exact all-time distinct.
    (The union is not bit-equal to the single-pass sketch — merging
    promotes sparse sketches to the dense HLL_8 representation with a
    slightly different estimator: measured 1488 vs 1492 vs exact 1500
    at sf0.01 — so the deterministic claim is the error bound, not
    equality.) The exact per-year distinct count rides along and is
    hash-checked as a hard value; everything is a fixed function of
    the input, so a red row means the sketch path broke, not a flaky
    tolerance."""
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), "o_custkey"
    )
    per_year = o.groupBy("yr").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.countDistinct("o_custkey").alias("n_exact"),
    )
    yearly = per_year.select(
        "yr",
        "n_exact",
        F.hll_sketch_estimate("sk").alias("est"),
        "sk",
    )
    merged = yearly.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    total = o.agg(F.countDistinct("o_custkey").alias("n_total"))
    flags = merged.join(total).select(
        (
            F.abs(F.col("merged_est") - F.col("n_total")) / F.col("n_total") < 0.06
        ).alias("merged_within_6pct")
    )
    return (
        yearly.join(F.broadcast(flags))
        .select(
            "yr",
            "n_exact",
            (
                F.abs(F.col("est") - F.col("n_exact"))
                / F.col("n_exact")
                < 0.06
            ).alias("est_within_6pct"),
            "merged_within_6pct",
        )
        .orderBy("yr")
    )


SQL_HLL_INCREMENTAL = """
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       count(DISTINCT o_custkey) AS n_exact,
       TRUE AS est_within_6pct,
       TRUE AS merged_within_6pct
FROM orders GROUP BY 1 ORDER BY yr
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal containment join WITHOUT a nested loop
    (operators/intervals.py): each order opens a 14-day window
    [o_orderdate, +14d]; count the lineitems (of ANY order — no key
    relation) shipped inside each window, rolled up by order month.
    The bin equi-join plans as a hash join on bin id (plan-audited:
    no BroadcastNestedLoopJoin, no cartesian) instead of the
    quadratic point-vs-interval scan a raw BETWEEN join produces.

    The point side is PARTIAL-AGGREGATED to per-date counts BEFORE
    the containment join (round-6): a count-shaped containment query
    never needs the raw pairs — sum of date-counts == count of raw
    pairs, and an order matches iff some nonempty date falls in its
    window, so n_orders is identical.  This is the difference
    between joining ~2.4k date rows and enumerating every
    (point, window) pair: the raw form materialized ~540M pairs at
    the sf1 point (>10 min; at 100 TB pair count grows as
    |points| x window_len — a non-starter), the aggregated form is
    seconds and scales with distinct dates x windows.  The oracle
    mirrors the same derivation (its raw IEJoin form took 402 s in
    DuckDB at sf1), and the hash match proves the binned plan meets
    every nonempty date-window containment exactly once with exact
    multiplicities."""
    from ..operators.intervals import point_in_interval_join

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("w_start"),
        F.date_add(F.to_date("o_orderdate"), 14).alias("w_end"),
    )
    ld = (
        _t(spark, sf_dir, "lineitem")
        .select(F.to_date("l_shipdate").alias("ship_d"))
        .groupBy("ship_d")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    joined = point_in_interval_join(ld, o, "ship_d", "w_start", "w_end", bin_days=14)
    return (
        joined.groupBy(F.date_format("w_start", "yyyy-MM").alias("month"))
        .agg(
            F.sum("_c").alias("n_pairs"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("month")
    )


SQL_INTERVAL_JOIN = """
WITH ld AS (
  SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS c FROM lineitem GROUP BY 1
)
SELECT strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS month,
       sum(ld.c)::BIGINT AS n_pairs,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM orders o JOIN ld
  ON ld.d >= CAST(o.o_orderdate AS DATE)
 AND ld.d <= CAST(o.o_orderdate AS DATE) + 14
GROUP BY 1 ORDER BY month
"""


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (operators/sketch.py): the
    event stream collapses to a depth*width=4x256-row sketch in ONE
    partial-aggregated shuffle (per-task state is bounded by the
    sketch size, not the key cardinality), then candidate users probe
    the BROADCAST sketch and keep those whose estimate >= 80 events.
    At 100 TB this is the play when the key is too high-cardinality to
    aggregate exactly: the sketch never grows, and the estimate is
    within (e/width)*N of truth w.p. 1-(1/e)^depth.

    The exact per-user count is joined alongside (n_exact) so the
    result exhibits est >= exact; the DuckDB oracle rebuilds the SAME
    md5-hashed sketch relationally, so the hash match proves the
    sketch, probes, and min-estimate bit-for-bit — not just the final
    filter."""
    from ..operators.sketch import cms_build, cms_estimate

    e = _t(spark, sf_dir, "events")
    sketch = cms_build(e, "user_id")
    cand = e.select(F.col("user_id").cast("string").alias("user_id")).distinct()
    est = cms_estimate(sketch, cand, "user_id")
    exact = (
        e.select(F.col("user_id").cast("string").alias("user_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return (
        est.join(exact, "user_id")
        .filter(F.col("est") >= 80)
        .select("user_id", F.col("est").alias("cms_estimate"), "n_exact")
        .orderBy("user_id")
    )


SQL_CMS_HEAVY_HITTERS = """
WITH r AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
sketch AS (
  SELECT d, (('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || k), 1, 15))::BIGINT) % 256 AS bucket,
         count(*) AS c
  FROM r CROSS JOIN ds GROUP BY 1, 2
),
cand AS (SELECT DISTINCT k FROM r),
est AS (
  SELECT cand.k, min(sketch.c) AS est
  FROM cand CROSS JOIN ds
  JOIN sketch ON sketch.d = ds.d
   AND sketch.bucket = (('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':' || cand.k), 1, 15))::BIGINT) % 256
  GROUP BY cand.k
),
exact AS (SELECT k, count(*) AS n_exact FROM r GROUP BY k)
SELECT est.k AS user_id, est.est AS cms_estimate, exact.n_exact
FROM est JOIN exact ON est.k = exact.k
WHERE est.est >= 80
ORDER BY user_id
"""


SQL_BLOOM_FILTER_JOIN = """
SELECT l_returnflag, count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES.update(
    {
        "tpch_salted_agg": q_salted_agg,
        "tpch_salted_join": q_salted_join,
        "tpch_bucketed_join": q_bucketed_join,
        "tpch_bloom_filter_join": q_bloom_filter_join,
        "tpch_cms_heavy_hitters": q_cms_heavy_hitters,
        "tpch_interval_join": q_interval_join,
        "tpch_hll_incremental": q_hll_incremental,
        "tpch_weighted_sample": q_weighted_sample,
    }
)

ORACLE_SQL.update(
    {
        "tpch_salted_agg": SQL_SALTED_AGG,
        "tpch_salted_join": SQL_SALTED_JOIN,
        "tpch_bucketed_join": SQL_BUCKETED_JOIN,
        "tpch_bloom_filter_join": SQL_BLOOM_FILTER_JOIN,
        "tpch_cms_heavy_hitters": SQL_CMS_HEAVY_HITTERS,
        "tpch_interval_join": SQL_INTERVAL_JOIN,
        "tpch_hll_incremental": SQL_HLL_INCREMENTAL,
        "tpch_weighted_sample": SQL_WEIGHTED_SAMPLE,
    }
)


# --- hierarchical rollup from partial aggregates -----------------------------
def q_events_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsampling hierarchy (the hypertable/materialized-rollup
    pattern): aggregate events to hour-level partials, then produce the
    day level by RE-AGGREGATING the partials — never rescanning raw
    data. The oracle computes day-level directly from raw events, so
    the hash match proves partial re-aggregation is lossless (counts
    and decimal sums are decomposable)."""
    e = _t(spark, sf_dir, "events")
    hour = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(D)).alias("sv"),
        )
    )
    day = (
        hour.groupBy(F.date_trunc("day", "h").alias("day"), "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
        )
    )
    return day.orderBy("day", "event_type")


SQL_EVENTS_ROLLUP_HIERARCHY = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""


# --- NULL semantics: NULL groups + null-safe join ----------------------------
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: a derived nullable key (nullif) grouped
    (NULL forms its own group, SQL semantics) and joined back with
    NULL-SAFE equality (<=>) — a plain equi-join would drop the NULL
    group; eqNullSafe keeps it, matching IS NOT DISTINCT FROM."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "prio_nn", F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    )
    grouped = o.groupBy("prio_nn").agg(F.count(F.lit(1)).alias("n_orders"))
    dims = o.select("prio_nn").distinct().withColumn(
        "tag", F.coalesce(F.col("prio_nn"), F.lit("(medium)"))
    )
    joined = grouped.join(
        dims, grouped.prio_nn.eqNullSafe(dims.prio_nn)
    ).select(grouped.prio_nn.alias("priority_or_null"), "tag", "n_orders")
    return joined.orderBy(F.asc_nulls_first("priority_or_null"))


SQL_NULL_SEMANTICS = """
WITH o AS (SELECT nullif(o_orderpriority, '3-MEDIUM') AS prio_nn FROM orders),
g AS (SELECT prio_nn, count(*) AS n_orders FROM o GROUP BY prio_nn),
d AS (SELECT DISTINCT prio_nn, coalesce(prio_nn, '(medium)') AS tag FROM o)
SELECT g.prio_nn AS priority_or_null, d.tag, g.n_orders
FROM g JOIN d ON g.prio_nn IS NOT DISTINCT FROM d.prio_nn
ORDER BY priority_or_null NULLS FIRST
"""


QUERIES.update(
    {
        "tpch_events_rollup_hierarchy": q_events_rollup_hierarchy,
        "tpch_null_semantics": q_null_semantics,
    }
)

ORACLE_SQL.update(
    {
        "tpch_events_rollup_hierarchy": SQL_EVENTS_ROLLUP_HIERARCHY,
        "tpch_null_semantics": SQL_NULL_SEMANTICS,
    }
)


# --- exact percentiles --------------------------------------------------------
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) per order status —
    Spark `percentile` and DuckDB `quantile_cont` share the linear-
    interpolation definition, so values match bit-for-bit after the
    floor6 guard. At 100 TB switch to approx_percentile (t-digest) and
    drop the oracle to bounds-checking; the exact form is the
    correctness anchor."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("_med"),
            F.percentile(F.col("o_totalprice"), F.lit(0.9)).alias("_p90"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            (F.floor(F.col("_med") * 1e6) / 1e6).alias("median_price"),
            (F.floor(F.col("_p90") * 1e6) / 1e6).alias("p90_price"),
            "n_orders",
        )
        .orderBy("o_orderstatus")
    )


SQL_PERCENTILES = """
SELECT o_orderstatus,
       floor(quantile_cont(o_totalprice, 0.5) * 1000000.0) / 1000000.0 AS median_price,
       floor(quantile_cont(o_totalprice, 0.9) * 1000000.0) / 1000000.0 AS p90_price,
       count(*) AS n_orders
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# --- unionByName with missing columns ----------------------------------------
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two projections with different column
    sets combined by NAME (allowMissingColumns fills NULL) — the
    pattern for unioning corpus snapshots whose schemas drifted."""
    o = _t(spark, sf_dir, "orders")
    old_snap = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus"
    )
    new_snap = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    u = old_snap.unionByName(new_snap, allowMissingColumns=True)
    return (
        u.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


SQL_UNION_BY_NAME = """
WITH old_snap AS (
  SELECT o_orderkey, o_orderstatus, NULL AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
),
new_snap AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
),
u AS (SELECT * FROM old_snap UNION ALL SELECT * FROM new_snap)
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM u GROUP BY 1, 2 ORDER BY o_orderstatus, o_orderpriority
"""


QUERIES.update(
    {
        "tpch_percentiles": q_percentiles,
        "tpch_union_by_name": q_union_by_name,
    }
)

ORACLE_SQL.update(
    {
        "tpch_percentiles": SQL_PERCENTILES,
        "tpch_union_by_name": SQL_UNION_BY_NAME,
    }
)


# --- SQL front-end (spark.sql over registered views) -------------------------
def q_sql_api_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's second front-end: the same catalog the DataFrame
    queries scan, registered as temp views and queried with spark.sql
    (CTE + window + dense_rank). Identical Catalyst pipeline underneath
    — this entry exists to pin the SQL surface, not a separate engine
    path."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        WITH spend AS (
          SELECT o_custkey,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_spend,
                 count(*) AS n_orders
          FROM v_orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT *, dense_rank() OVER (ORDER BY total_spend DESC) AS rnk
          FROM spend
        )
        SELECT o_custkey AS custkey, CAST(total_spend AS DOUBLE) AS total_spend,
               n_orders, rnk
        FROM ranked WHERE rnk <= 20
        ORDER BY rnk, custkey
        """
    )


SQL_SQL_API_TOP_SPENDERS = """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_spend,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT *, dense_rank() OVER (ORDER BY total_spend DESC) AS rnk
  FROM spend
)
SELECT o_custkey AS custkey, CAST(total_spend AS DOUBLE) AS total_spend,
       n_orders, rnk
FROM ranked WHERE rnk <= 20
ORDER BY rnk, custkey
"""


QUERIES["tpch_sql_api_top_spenders"] = q_sql_api_top_spenders
ORACLE_SQL["tpch_sql_api_top_spenders"] = SQL_SQL_API_TOP_SPENDERS


# --- cogrouped-pandas as-of (cross-validates operators/asof.py) --------------
def q_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as tpch_asof_latest_order, implemented
    with the remaining Arrow-Python surface: groupBy().cogroup()
    .applyInPandas — both sides of a key arrive as aligned pandas
    frames and pandas merge_asof does the point-in-time match. Shares
    the native query's oracle, so the two implementations are proven
    equivalent. The closure is self-contained (imports inside), so it
    needs no package shipping.

    Scale: cogroup shuffles BOTH sides by key and materializes each
    key's rows in worker memory — fine for bounded per-key volumes;
    the union-tag-window asof (operators/asof.py) is the streaming-
    friendly form when single keys are huge."""
    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )

    def merge(le, ri):
        import pandas as pd

        cols = ["event_id", "user_id", "last_orderkey"]
        if le.empty or ri.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        le = le.sort_values("ts").copy()
        ri = ri.sort_values("o_orderdate")[["o_orderdate", "last_orderkey"]].copy()
        le["ts"] = le["ts"].astype("datetime64[ns]")
        ri["o_orderdate"] = ri["o_orderdate"].astype("datetime64[ns]")
        m = pd.merge_asof(
            le, ri, left_on="ts", right_on="o_orderdate", direction="backward"
        )
        m = m.dropna(subset=["last_orderkey"])
        return m[cols].astype({c: "int64" for c in cols})

    return (
        events.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(merge, schema="event_id long, user_id long, last_orderkey long")
    )


QUERIES["tpch_asof_cogroup"] = q_asof_cogroup
ORACLE_SQL["tpch_asof_cogroup"] = SQL_ASOF_LATEST_ORDER


# --- time-range window frame --------------------------------------------------
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time (vs the ROWS frames elsewhere):
    per customer, how many orders landed in the 30 days up to and
    including each order. Ordering on epoch seconds keeps the frame
    arithmetic numeric and portable; Spark's rangeBetween and DuckDB's
    RANGE BETWEEN see identical bounds."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").withColumn(
        "epoch_s", F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_s")
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_last_30d"),
    )


SQL_WINDOW_RANGE_FRAME = """
SELECT o_orderkey, o_custkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_last_30d
FROM orders
"""


QUERIES["tpch_window_range_frame"] = q_window_range_frame
ORACLE_SQL["tpch_window_range_frame"] = SQL_WINDOW_RANGE_FRAME


# --- Python UDTF (lateral table function) ------------------------------------
def q_udtf_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark >= 3.5 `udtf`), the
    modern replacement for the reference's Mapper-as-extension surface
    (SURVEY.md §2.2 U1): one input row yields many output rows,
    applied via a SQL LATERAL join. The UDTF here emits the running
    triangular series 1..n per region.

    Scale: UDTFs execute on the executors row-partition-wise like any
    Python UDF (no shuffle introduced by the lateral itself); the
    closed-form oracle (i·(i+1)/2) cross-checks the stateful loop."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="i int, cum bigint")
    class SeriesSum:
        def eval(self, n):
            s = 0
            for i in range(1, (n or 0) + 1):
                s += i
                yield i, s

    spark.udtf.register("series_sum", SeriesSum)
    _t(spark, sf_dir, "region").createOrReplaceTempView("_udtf_region")
    return spark.sql(
        """
        SELECT r_name, t.i, t.cum
        FROM _udtf_region, LATERAL series_sum(CAST(r_regionkey AS INT) + 3) t
        """
    ).orderBy("r_name", "i")


SQL_UDTF_SERIES = """
SELECT r_name, CAST(gs.i AS INT) AS i, gs.i * (gs.i + 1) // 2 AS cum
FROM region r
CROSS JOIN LATERAL (SELECT unnest(range(1, r.r_regionkey + 4)) AS i) gs
ORDER BY r_name, i
"""

QUERIES["tpch_udtf_series"] = q_udtf_series
ORACLE_SQL["tpch_udtf_series"] = SQL_UDTF_SERIES


# --- posexplode (ordinal-preserving flatten) ---------------------------------
def q_lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: flatten an array keeping each element's ordinal —
    the generator-with-ordinality piece of the UDTF surface that the
    plain explode queries don't cover. Narrow generate, no shuffle;
    at scale the fan-out multiplies rows before the first exchange, so
    it composes with pushed filters on the parent row."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", F.split("p_name", " ").alias("l")
    )
    return p.select(
        "p_partkey", F.posexplode("l").alias("pos", "word")
    ).orderBy("p_partkey", "pos")


SQL_LATERAL_POSEXPLODE = """
WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS l FROM part)
SELECT p_partkey, CAST(u.i - 1 AS INT) AS pos, l[u.i] AS word
FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) u
ORDER BY p_partkey, pos
"""

QUERIES["tpch_lateral_posexplode"] = q_lateral_posexplode
ORACLE_SQL["tpch_lateral_posexplode"] = SQL_LATERAL_POSEXPLODE


# --- unpivot / melt (inverse of tpch_pivot_status) ---------------------------
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot (df.unpivot / SQL UNPIVOT): wide per-status measures to
    long (measure, value) rows — the inverse of tpch_pivot_status.
    Money goes through DECIMAL then floor so the long values are exact
    integers on both engines. The unpivot itself is a narrow
    expression (Expand node), zero extra shuffles after the agg."""
    g = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.floor(F.sum(F.col("o_totalprice").cast(D))).cast("long").alias("sum_price_fl"),
            F.floor(F.max("o_totalprice")).cast("long").alias("max_price_fl"),
        )
    )
    return g.unpivot(
        ["o_orderstatus"],
        ["n_orders", "sum_price_fl", "max_price_fl"],
        "measure",
        "value",
    ).orderBy("o_orderstatus", "measure")


SQL_UNPIVOT_MELT = """
WITH g AS (
  SELECT o_orderstatus,
         count(*) AS n_orders,
         CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,2)))) AS BIGINT) AS sum_price_fl,
         CAST(floor(max(o_totalprice)) AS BIGINT) AS max_price_fl
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'n_orders' AS measure, n_orders AS value FROM g
UNION ALL
SELECT o_orderstatus, 'sum_price_fl', sum_price_fl FROM g
UNION ALL
SELECT o_orderstatus, 'max_price_fl', max_price_fl FROM g
ORDER BY o_orderstatus, measure
"""

QUERIES["tpch_unpivot_melt"] = q_unpivot_melt
ORACLE_SQL["tpch_unpivot_melt"] = SQL_UNPIVOT_MELT


# --- merge / upsert (SCD1) ----------------------------------------------------
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert without a table format: apply a delta batch
    (updates for every 10th customer, inserts of new ids) onto the
    customer dimension via one full-outer join — the portable core of
    MERGE INTO (Delta/Iceberg implement exactly this join + file
    rewrite underneath).

    Scale: one shuffle on the merge key. With a real table format the
    join is pruned to touched files; expressed relationally, AQE
    handles the (delta << base) size asymmetry by broadcasting the
    delta side."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    upd = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", "c_name", (F.col("c_acctbal") + 100.0).alias("c_acctbal")
    )
    ins = c.filter(F.col("c_custkey") < 50).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("new-"), "c_name").alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    delta = upd.unionAll(ins)
    b, d = c.alias("b"), delta.alias("d")
    return (
        b.join(d, F.col("b.c_custkey") == F.col("d.c_custkey"), "full_outer")
        .select(
            F.coalesce(F.col("d.c_custkey"), F.col("b.c_custkey")).alias("c_custkey"),
            F.coalesce(F.col("d.c_name"), F.col("b.c_name")).alias("c_name"),
            F.coalesce(F.col("d.c_acctbal"), F.col("b.c_acctbal")).alias("c_acctbal"),
            F.when(F.col("b.c_custkey").isNull(), F.lit("inserted"))
            .when(F.col("d.c_custkey").isNull(), F.lit("unchanged"))
            .otherwise(F.lit("updated"))
            .alias("merge_action"),
        )
        .orderBy("c_custkey")
    )


SQL_MERGE_UPSERT = """
WITH delta AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'new-' || c_name, 0.0 FROM customer WHERE c_custkey < 50
)
SELECT coalesce(d.c_custkey, b.c_custkey) AS c_custkey,
       coalesce(d.c_name, b.c_name) AS c_name,
       coalesce(d.c_acctbal, b.c_acctbal) AS c_acctbal,
       CASE WHEN b.c_custkey IS NULL THEN 'inserted'
            WHEN d.c_custkey IS NULL THEN 'unchanged'
            ELSE 'updated' END AS merge_action
FROM customer b FULL OUTER JOIN delta d ON b.c_custkey = d.c_custkey
ORDER BY c_custkey
"""

QUERIES["tpch_merge_upsert"] = q_merge_upsert
ORACLE_SQL["tpch_merge_upsert"] = SQL_MERGE_UPSERT


# --- approximate distinct (HLL sketch) ---------------------------------------
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog) next to the exact count —
    the sketch path a 100 TB profiler uses (fixed-size state, one
    pass, mergeable across partitions — no distinct shuffle). Each
    engine checks its OWN sketch against the exact value (the compared
    column is the deterministic within-10% verdict, not the
    engine-specific estimate).  rsd = 0.02, not the 0.05 default
    neighborhood: at the sf1 scale point (~130k distinct keys per
    group) Spark's estimator at rsd=0.05 lands 11.9% off — OUTSIDE
    the 10% verdict band — while rsd=0.02 stays at 3.3% (measured;
    the scale test pins this).  The sketch is still fixed-size, just
    a larger register file — the knob a profiler actually turns when
    a verdict band must hold at any cardinality."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact_n"),
            F.approx_count_distinct("o_custkey", 0.02).alias("_approx"),
        )
        .select(
            "o_orderpriority",
            "exact_n",
            (F.abs(F.col("_approx") - F.col("exact_n")) <= 0.1 * F.col("exact_n")).alias(
                "approx_ok"
            ),
        )
        .orderBy("o_orderpriority")
    )


SQL_APPROX_DISTINCT = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS exact_n,
       abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
         <= 0.1 * count(DISTINCT o_custkey) AS approx_ok
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["tpch_approx_distinct"] = q_approx_distinct
ORACLE_SQL["tpch_approx_distinct"] = SQL_APPROX_DISTINCT


# --- VARIANT semi-structured path (Spark 4) ----------------------------------
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): a JSON document built
    by explicit string concat (so both engines parse the IDENTICAL
    text), parsed once with parse_json into a VARIANT, then typed
    variant_get extractions including an array index. VARIANT is the
    100 TB answer to schema-drifting payloads: parse once at ingest,
    store the binary-encoded variant column, extract with pushdown-
    friendly typed paths instead of re-parsing JSON text per query
    (the get_json_object form in tpch_json_extract re-parses every
    call)."""
    o = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast(D) * 100).cast("long")
    doc = F.concat(
        F.lit('{"status":"'),
        F.col("o_orderstatus"),
        F.lit('","cents":'),
        cents.cast("string"),
        F.lit(',"items":['),
        (F.col("o_custkey") % 7).cast("string"),
        F.lit(","),
        (F.col("o_custkey") % 11).cast("string"),
        F.lit("]}"),
    )
    v = F.parse_json(doc)
    return o.select(
        "o_orderkey",
        F.variant_get(v, "$.status", "string").alias("status_x"),
        F.variant_get(v, "$.cents", "long").alias("cents_x"),
        F.variant_get(v, "$.items[1]", "int").alias("item1_x"),
    )


SQL_VARIANT_JSON = """
WITH j AS (
  SELECT o_orderkey,
         '{"status":"' || o_orderstatus || '","cents":'
           || (CAST(o_totalprice AS DECIMAL(18,2)) * 100)::BIGINT::VARCHAR
           || ',"items":[' || (o_custkey % 7)::VARCHAR || ','
           || (o_custkey % 11)::VARCHAR || ']}' AS doc
  FROM orders
)
SELECT o_orderkey,
       json_extract_string(doc, '$.status') AS status_x,
       CAST(json_extract(doc, '$.cents') AS BIGINT) AS cents_x,
       CAST(json_extract(doc, '$.items[1]') AS INT) AS item1_x
FROM j
"""

QUERIES["tpch_variant_json"] = q_variant_json
ORACLE_SQL["tpch_variant_json"] = SQL_VARIANT_JSON


# --- fixed-width histogram ----------------------------------------------------
HIST_LO = 0.0
HIST_HI = 600000.0
HIST_N = 24


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: bucket index by explicit
    floor arithmetic (identical IEEE double ops in both engines — the
    builtin width_bucket variants differ in edge rounding between
    engines, so the portable formula is spelled out), one
    partial-aggregated groupBy. The profiling primitive for 100 TB
    data exploration: single pass, constant output."""
    o = _t(spark, sf_dir, "orders")
    w = (HIST_HI - HIST_LO) / HIST_N
    b = F.least(
        F.greatest(F.floor((F.col("o_totalprice") - HIST_LO) / w), F.lit(0)),
        F.lit(HIST_N - 1),
    ).cast("int")
    return (
        o.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("lo_edge", (F.lit(HIST_LO) + F.col("bucket") * F.lit(w)))
        .orderBy("bucket")
    )


SQL_HISTOGRAM = f"""
WITH b AS (
  SELECT CAST(least(greatest(floor((o_totalprice - {HIST_LO}) / (({HIST_HI} - {HIST_LO}) / {HIST_N})), 0), {HIST_N - 1}) AS INT) AS bucket
  FROM orders
)
SELECT bucket, count(*) AS n_orders,
       {HIST_LO} + bucket * (({HIST_HI} - {HIST_LO}) / {HIST_N}) AS lo_edge
FROM b GROUP BY bucket ORDER BY bucket
"""

QUERIES["tpch_histogram"] = q_histogram
ORACLE_SQL["tpch_histogram"] = SQL_HISTOGRAM


# --- correlated NOT EXISTS (decorrelation to anti-join) -----------------------
def q_subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS through the SQL front-end: customers with
    no order on/after 2001-01-01. Catalyst decorrelates the subquery
    into a left-anti hash join — no per-row re-execution (the
    classical correlated-subquery trap); the date predicate is pushed
    into the orders scan before the join. Complements tpch_subquery_in
    (IN) and tpch_subquery_correlated (correlated scalar)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_ne_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_ne_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM _ne_customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM _ne_orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= DATE '2001-01-01'
        )
        ORDER BY c_custkey
        """
    )


SQL_SUBQUERY_NOT_EXISTS = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '2001-01-01')
ORDER BY c_custkey
"""

QUERIES["tpch_subquery_not_exists"] = q_subquery_not_exists
ORACLE_SQL["tpch_subquery_not_exists"] = SQL_SUBQUERY_NOT_EXISTS


# --- TPC-H Q8-shaped national market share -----------------------------------
MKT_REGION = "AMERICA"
MKT_NATION = "NATION_1"  # numerator: supplier nation
MKT_PTYPE = "ECONOMY"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: the widest classic star — lineitem joined to
    part, supplier, orders, customer, nation x2, region — computing
    the numerator nation's share of yearly volume sold into one
    region's market, for one part type.

    Scale: every dimension path collapses BEFORE touching the fact
    stream.  part is filtered to one type then joined (AQE picks
    broadcast at bench scale; part scales with SF so no forced hint),
    supplier pre-joins its nation into a (s_suppkey, nation) map, and
    customer pre-joins nation+region and is filtered to the target
    region so the fact stream sees a SEMI-shaped probe, not a 4-deep
    dim chain.  The per-year numerator/denominator collapse map-side
    (partial agg to <= 7 rows/task); the share ratio is one
    IEEE-double division per year row — portable bit-for-bit, same
    contract as the rest of the family."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    target_parts = part.filter(F.col("p_type") == MKT_PTYPE).select("p_partkey")
    supp_nation = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust_in_region = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                region.filter(F.col("r_name") == MKT_REGION).select("r_regionkey")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    rev = (
        F.col("l_extendedprice").cast(D)
        * (F.lit(1).cast(D) - F.col("l_discount").cast(D))
    ).alias("rev")
    vol = (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey", rev)
        .join(target_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == MKT_NATION, F.col("rev")).otherwise(
            F.lit(0).cast(D)
        )
    )
    den = F.sum("rev")
    return (
        vol.groupBy("o_year")
        .agg(
            num.cast("double").alias("nation_volume"),
            den.cast("double").alias("total_volume"),
        )
        .withColumn(
            "mkt_share_micro",
            F.floor(F.col("nation_volume") * F.lit(1000000.0) / F.col("total_volume")).cast("long"),
        )
        .orderBy("o_year")
    )


SQL_MARKET_SHARE = f"""
WITH vol AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey AND p_type = '{MKT_PTYPE}'
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    WHERE r_name = '{MKT_REGION}')
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{MKT_NATION}' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
       CAST(SUM(rev) AS DOUBLE) AS total_volume,
       CAST(floor(CAST(SUM(CASE WHEN supp_nation = '{MKT_NATION}' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                  * 1000000.0
                  / CAST(SUM(rev) AS DOUBLE)) AS BIGINT) AS mkt_share_micro
FROM vol GROUP BY o_year ORDER BY o_year
"""

QUERIES["tpch_market_share"] = q_market_share
ORACLE_SQL["tpch_market_share"] = SQL_MARKET_SHARE


# --- strict-sequence funnel analysis -----------------------------------------
FUNNEL_STEPS = ("view", "click", "purchase")


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel over the event stream: per user, the first
    'view', the first 'click' AFTER that view, and the first
    'purchase' AFTER that click — the standard product-analytics
    funnel where each step must follow the previous step's first
    occurrence.

    Scale shape: three CASCADED conditional-min aggregations, each
    partial-aggregated map-side and joined back on user_id (AQE picks
    the strategy; at 100 TB these are co-partitioned hash joins on
    the same key, so the exchanges reuse).  Deliberately NOT a
    whole-user-partition window: per-user windows put every hot
    user's full history in one task buffer, while the conditional-min
    agg collapses each step to one row per user before anything
    shuffles."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    users = e.select("user_id").distinct()
    s1 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .withColumn(
            "furthest_step",
            F.when(F.col("t_purchase").isNotNull(), F.lit(3))
            .when(F.col("t_click").isNotNull(), F.lit(2))
            .when(F.col("t_view").isNotNull(), F.lit(1))
            .otherwise(F.lit(0)),
        )
        .select("user_id", "t_view", "t_click", "t_purchase", "furthest_step")
        .orderBy("user_id")
    )


SQL_EVENTS_FUNNEL = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
s1 AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t_view
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t_click
  GROUP BY e.user_id
)
SELECT u.user_id, t_view, t_click, t_purchase,
       CASE WHEN t_purchase IS NOT NULL THEN 3
            WHEN t_click IS NOT NULL THEN 2
            WHEN t_view IS NOT NULL THEN 1
            ELSE 0 END AS furthest_step
FROM users u
LEFT JOIN s1 ON u.user_id = s1.user_id
LEFT JOIN s2 ON u.user_id = s2.user_id
LEFT JOIN s3 ON u.user_id = s3.user_id
ORDER BY u.user_id
"""

QUERIES["tpch_events_funnel"] = q_events_funnel
ORACLE_SQL["tpch_events_funnel"] = SQL_EVENTS_FUNNEL


# --- weekly cohort retention -------------------------------------------------
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention grid: users cohorted by the ISO week of their
    first 'signup' event, counted as active in each subsequent week
    they emit ANY event — the funnel's companion product-analytics
    query (tpch_events_funnel).

    Scale shape: the cohort map is one partial-agg'd min per user;
    activity joins it back on user_id (co-partitioned with the
    cohort agg's exchange under AQE); the distinct-user count per
    (cohort, offset) cell is the standard two-phase distinct
    (partial_count(distinct ..)), never a collect_set.  Week math is
    Monday-anchored date_trunc in both engines, so offsets are exact
    integers (day deltas are multiples of 7 by construction).  The
    cohort week is emitted as an ISO 'yyyy-MM-dd' STRING: a DATE
    column reaches pandas as datetime.date from Spark but
    datetime64 from DuckDB, rendering differently under the
    driver's string hash."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    cohort = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_ts"))
    )
    act = (
        e.join(cohort, "user_id")
        .select(
            "user_id",
            F.date_format("cohort_ts", "yyyy-MM-dd").alias("cohort_week"),
            F.expr(
                "CAST(datediff(to_date(date_trunc('week', ts)), to_date(cohort_ts)) div 7 AS INT)"
            ).alias("week_offset"),
        )
        .filter(F.col("week_offset") >= 0)
    )
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


SQL_EVENTS_RETENTION = """
WITH cohort AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
act AS (
  SELECT e.user_id,
         strftime(c.cohort_ts, '%Y-%m-%d') AS cohort_week,
         CAST(datediff('day', CAST(c.cohort_ts AS DATE),
                       CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INTEGER)
           AS week_offset
  FROM events e JOIN cohort c ON e.user_id = c.user_id
)
SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_users
FROM act WHERE week_offset >= 0
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""

QUERIES["tpch_events_retention"] = q_events_retention
ORACLE_SQL["tpch_events_retention"] = SQL_EVENTS_RETENTION
