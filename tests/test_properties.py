"""Property-style checks (SURVEY.md §5.3): results verified against an
independent recomputation or an invariant, not a golden file."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_for_dbpl_dataset_spark.operators.runs import longest_consecutive_run
from map_reduce_for_dbpl_dataset_spark.queries import dblp


def _longest_run_python(years: list[int]) -> int:
    ys = sorted(set(years))
    best = cur = 1
    for a, b in zip(ys, ys[1:]):
        cur = cur + 1 if b == a + 1 else 1
        best = max(best, cur)
    return best


def test_runs_agree_with_python_rescan(spark):
    import random

    rng = random.Random(7)
    rows = []
    expected = {}
    for k in range(40):
        years = [rng.randint(1990, 2020) for _ in range(rng.randint(1, 30))]
        rows += [(f"k{k}", y) for y in years]
        expected[f"k{k}"] = _longest_run_python(years)
    df = spark.createDataFrame(rows, "k string, year int")
    got = {r.k: r.longest_run for r in longest_consecutive_run(df, ["k"], "year").collect()}
    assert got == expected


def test_q6_disjoint_from_multi_author_records(spark, sf_dir):
    from map_reduce_for_dbpl_dataset_spark.functions.exprs import authors_or_editors
    from map_reduce_for_dbpl_dataset_spark.sources.parquet import publications

    solo = {r.author for r in dblp.q6_solo_only_authors(spark, sf_dir).collect()}
    multi = {
        r.author
        for r in publications(spark)
        .select(F.explode(authors_or_editors()).alias("author"), F.size(authors_or_editors()).alias("n"))
        .filter(F.col("n") > 1)
        .select("author")
        .distinct()
        .collect()
    }
    assert not solo & multi


def test_q1_counts_match_direct_recount(spark, sf_dir):
    # every (venue, author, n_pubs) in the top-10 must equal the true
    # count computed independently
    from map_reduce_for_dbpl_dataset_spark.functions.exprs import authors_or_editors, venue_expr
    from map_reduce_for_dbpl_dataset_spark.sources.parquet import publications

    top = dblp.q1_top_authors_per_venue(spark, sf_dir)
    truth = (
        publications(spark)
        .withColumns({"venue": venue_expr(), "aus": authors_or_editors()})
        .select("venue", F.explode("aus").alias("author"))
        .filter((F.col("venue") != "") & (F.col("author") != ""))
        .groupBy("venue", "author")
        .count()
    )
    joined = top.join(truth, ["venue", "author"], "left")
    bad = joined.filter(
        F.col("count").isNull() | (F.col("count") != F.col("n_pubs"))
    ).count()
    assert bad == 0
