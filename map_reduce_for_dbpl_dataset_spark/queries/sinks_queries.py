"""Sink roundtrip queries (SURVEY.md §2.2 S4/S6).

Each query WRITES through the engine sink and READS the result back,
returning the re-read data — so the driver's oracle hash checks the
full write→read path, not just an in-memory plan. Scratch output goes
to a deterministic /tmp dir per sf_dir (overwritten every run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ..sources.sinks import (
    read_csv,
    sink_dir,
    write_csv,
    write_ordered_single_text,
    write_partitioned_parquet,
)

D = "decimal(18,2)"


def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink with '|' separator (the reference's task-3 separator,
    Homework2.scala:628): aggregate orders per (status, priority),
    write delimited text, read back with an explicit schema. Decimal
    money survives text roundtrip exactly — no float reformatting.
    """
    orders = load_table(spark, sf_dir, "orders")
    agg = (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(D)).alias("total_price"),
        )
    )
    path = sink_dir("csv", sf_dir)
    write_csv(agg, path, sep="|")
    back = read_csv(
        spark,
        path,
        "o_orderstatus string, o_orderpriority string, n_orders long, total_price decimal(28,2)",
        sep="|",
    )
    # decimal survives the text roundtrip exactly; the OUTPUT casts to
    # double because the driver canonicalizes through pandas, where
    # Spark Decimal('4319.80') and DuckDB float64 4319.8 render apart.
    return back.withColumn("total_price", F.col("total_price").cast("double"))


SQL_SINK_CSV_ROUNDTRIP = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY o_orderstatus, o_orderpriority
"""


def q_sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + pruned scan: write lineitem slices
    partitioned by l_returnflag, read back ONE partition (the filter
    becomes a PartitionFilter — only that directory is scanned) and
    aggregate it.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    path = sink_dir("part_parquet", sf_dir)
    write_partitioned_parquet(li, path, "l_returnflag")
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return (
        back.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast(D)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(D)).cast("double").alias("sum_price"),
        )
    )


SQL_SINK_PARTITIONED_PARQUET = """
SELECT l_linestatus, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem WHERE l_returnflag = 'R'
GROUP BY l_linestatus
"""


def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink/source roundtrip (the interchange format most
    LLM-corpus pipelines land in): aggregate, write .jsonl part files,
    read back with an explicit schema — no inference pass, which at
    100 TB would double the scan."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    agg = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    path = sink_dir("json", sf_dir)
    agg.write.mode("overwrite").json(path)
    return spark.read.schema("n_name string, n_customers long").json(path)


SQL_SINK_JSON_ROUNDTRIP = """
SELECT n_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source roundtrip — the second columnar format Spark
    ships natively; typed columns (decimal included) survive exactly."""
    p = load_table(spark, sf_dir, "part")
    agg = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p_retailprice").cast(D)).alias("retail_sum"),
    )
    path = sink_dir("orc", sf_dir)
    agg.write.mode("overwrite").orc(path)
    return spark.read.orc(path).withColumn(
        "retail_sum", F.col("retail_sum").cast("double")
    )


SQL_SINK_ORC_ROUNDTRIP = """
SELECT p_brand, count(*) AS n_parts,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS retail_sum
FROM part GROUP BY p_brand
"""


QUERIES = {
    "tpch_sink_csv_roundtrip": q_sink_csv_roundtrip,
    "tpch_sink_partitioned_parquet": q_sink_partitioned_parquet,
    "tpch_sink_json_roundtrip": q_sink_json_roundtrip,
    "tpch_sink_orc_roundtrip": q_sink_orc_roundtrip,
}

ORACLE_SQL = {
    "tpch_sink_csv_roundtrip": SQL_SINK_CSV_ROUNDTRIP,
    "tpch_sink_partitioned_parquet": SQL_SINK_PARTITIONED_PARQUET,
    "tpch_sink_json_roundtrip": SQL_SINK_JSON_ROUNDTRIP,
    "tpch_sink_orc_roundtrip": SQL_SINK_ORC_ROUNDTRIP,
}


def q_sink_text_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered single-file text sink roundtrip (the reference's merge
    flow, dblpXMLparser.scala:65-82): aggregate customers per nation,
    write ONE '|'-separated text file in (count desc, name asc) order,
    read it back and attach each line's PHYSICAL position. The oracle
    computes line numbers with row_number() over the same total order,
    so the hash match proves the file is byte-ordered — not just that
    the rows survive. Single-writer by design; small results only."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    agg = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    path = sink_dir("text_ordered", sf_dir)
    write_ordered_single_text(
        agg, path, [F.desc("n_customers"), F.asc("n_name")], sep="|"
    )
    back = spark.read.text(path).coalesce(1)
    parts = F.split("value", "[|]")
    return back.select(
        F.monotonically_increasing_id().alias("line_no"),
        parts.getItem(0).alias("n_name"),
        parts.getItem(1).cast("long").alias("n_customers"),
    )


SQL_SINK_TEXT_ORDERED = """
WITH g AS (
  SELECT n_name, count(*) AS n_customers
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT row_number() OVER (ORDER BY n_customers DESC, n_name ASC) - 1 AS line_no,
       n_name, n_customers
FROM g
"""

QUERIES["tpch_sink_text_ordered"] = q_sink_text_ordered
ORACLE_SQL["tpch_sink_text_ordered"] = SQL_SINK_TEXT_ORDERED


# --- custom Python DataSource (partitioned synthetic source) -----------------
PYSRC_ROWS = 300
PYSRC_PARTS = 8
_PYSRC_RPP = -(-PYSRC_ROWS // PYSRC_PARTS)


def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python DataSource (sources/pysource.py)
    — Spark 4's pluggable source API, the engine's generalization of
    the reference's hand-threaded XML loader (dblpXMLparser.scala:
    37-59): N independent InputPartitions scheduled as tasks instead
    of one driver-side DOM + thread pool. The DuckDB range() oracle
    reproduces the deterministic shard/payload/hash layout exactly."""
    from ..session import ship_package
    from ..sources.pysource import FORMAT_NAME, register

    ship_package(spark)
    register(spark)
    return (
        spark.read.format(FORMAT_NAME)
        .option("n_rows", PYSRC_ROWS)
        .option("n_parts", PYSRC_PARTS)
        .load()
        .orderBy("id")
    )


SQL_PYTHON_DATASOURCE = f"""
SELECT i AS id,
       CAST(i // {_PYSRC_RPP} AS INT) AS shard,
       'doc-' || i::VARCHAR AS payload,
       ('0x' || substr(md5('doc-' || i::VARCHAR), 1, 15))::BIGINT AS h
FROM range(0, {PYSRC_ROWS}) t(i)
ORDER BY id
"""

QUERIES["src_python_datasource"] = q_python_datasource
ORACLE_SQL["src_python_datasource"] = SQL_PYTHON_DATASOURCE


def q_python_datasource_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same custom source with an id-range predicate: the reader's
    pushFilters absorbs both bounds, partitions() plans ONLY the
    overlapping shards, and read() clamps the generated range — scan
    work is proportional to the selected range, not the table
    (tests/test_sources_and_new_ops.py asserts the pruned partition
    count; correctness never depends on the pushdown because Spark
    re-applies any filter the reader declines)."""
    from ..session import ship_package
    from ..sources.pysource import FORMAT_NAME, register

    ship_package(spark)
    register(spark)
    # planning-time conf gating Python-source pushFilters; runtime-settable
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return (
        spark.read.format(FORMAT_NAME)
        .option("n_rows", PYSRC_ROWS)
        .option("n_parts", PYSRC_PARTS)
        .load()
        .filter((F.col("id") >= 37) & (F.col("id") < 141))
        .orderBy("id")
    )


SQL_PYTHON_DATASOURCE_PRUNED = f"""
SELECT i AS id,
       CAST(i // {_PYSRC_RPP} AS INT) AS shard,
       'doc-' || i::VARCHAR AS payload,
       ('0x' || substr(md5('doc-' || i::VARCHAR), 1, 15))::BIGINT AS h
FROM range(0, {PYSRC_ROWS}) t(i)
WHERE i >= 37 AND i < 141
ORDER BY id
"""

QUERIES["src_python_datasource_pruned"] = q_python_datasource_pruned
ORACLE_SQL["src_python_datasource_pruned"] = SQL_PYTHON_DATASOURCE_PRUNED


# --- dynamic partition pruning (join-driven scan reduction) ------------------
def q_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: orders lands partitioned by
    o_orderpriority; the probe joins it to a FILTERED dim whose
    surviving keys are only known at runtime, so Catalyst injects a
    dynamicpruning subquery into the fact scan's PartitionFilters —
    at 100 TB the fact reads 2 of 5 directories instead of all of
    them, without any literal filter on the fact side. The broadcast
    of the dim is reused as the pruning subquery (no extra job).

    tools/plan_audit.py asserts `dynamicpruning#` appears in the fact
    scan's PartitionFilters."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = sink_dir("dpp_parquet", sf_dir)
    write_partitioned_parquet(o, path, "o_orderpriority")
    fact = spark.read.parquet(path)
    # canonical DPP shape: a scan-backed dim (priority, enabled) with
    # the selective filter on the NON-key column. A filter on the join
    # key itself (or any expression of it) is propagated by constraint
    # inference to the fact scan as a STATIC partition filter, which
    # would prune without DPP and demonstrate nothing; `enabled` has no
    # functional relation to the key in the plan, so the 2-of-5
    # pruning can come only from the dynamicpruning subquery. (A
    # LocalRelation VALUES dim doesn't trigger DPP either — the build
    # side must be a scan.)
    dim_path = sink_dir("dpp_dim", sf_dir)
    spark.createDataFrame(
        [
            ("1-URGENT", 1),
            ("2-HIGH", 1),
            ("3-MEDIUM", 0),
            ("4-NOT SPECIFIED", 0),
            ("5-LOW", 0),
        ],
        "p string, enabled int",
    ).write.mode("overwrite").parquet(dim_path)
    # `enabled = 1` is an int comparison: DPP's likely-selective
    # heuristic recognizes BinaryComparison/In/Like predicates — a
    # boolean flag would simplify to a bare attribute, which it skips
    dim = spark.read.parquet(dim_path).filter(F.col("enabled") == 1).select("p")
    return (
        fact.join(F.broadcast(dim), fact["o_orderpriority"] == dim["p"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(D)).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


SQL_DYNAMIC_PARTITION_PRUNING = """
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["tpch_dynamic_partition_pruning"] = q_dynamic_partition_pruning
ORACLE_SQL["tpch_dynamic_partition_pruning"] = SQL_DYNAMIC_PARTITION_PRUNING


# --- Z-order clustering (multi-column data skipping) -------------------------
def q_zorder_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered layout (operators/zorder.py): orders lands
    sorted by the Morton interleave of (o_custkey, o_totalprice/16),
    then a 2-D range predicate scans it back. With linear sort only
    ONE of the two predicates can skip row groups via min/max stats;
    on the Morton layout both are locally clustered, so both reach
    the scan as PushedFilters over tight stats (plan-audited) and at
    100 TB the scan reads ~(sel_x * sel_y) of the files instead of
    min(sel_x, sel_y). The oracle filters the UNCLUSTERED table —
    the hash match proves clustering is a pure layout change.

    The /16 scaling folds o_totalprice (< 600k) into the 16-bit
    Morton domain with a fixed expression; the production recipe is a
    min/max pass then proportional scaling (see operator docstring)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    from ..operators.zorder import write_zordered

    path = sink_dir("zorder", sf_dir)
    write_zordered(
        o,
        path,
        [F.col("o_custkey"), F.floor(F.col("o_totalprice") / 16).cast("long")],
    )
    back = spark.read.parquet(path)
    sel = back.filter(
        F.col("o_custkey").between(100, 400)
        & F.col("o_totalprice").between(50000.0, 150000.0)
    )
    return (
        sel.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(D)).cast("double").alias("sum_price"),
            F.min("o_orderkey").alias("min_orderkey"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
        .orderBy("o_orderstatus")
    )


SQL_ZORDER_RANGE_SCAN = """
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       min(o_orderkey) AS min_orderkey, max(o_orderkey) AS max_orderkey
FROM orders
WHERE o_custkey BETWEEN 100 AND 400
  AND o_totalprice BETWEEN 50000.0 AND 150000.0
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

QUERIES["tpch_zorder_range_scan"] = q_zorder_range_scan
ORACLE_SQL["tpch_zorder_range_scan"] = SQL_ZORDER_RANGE_SCAN
