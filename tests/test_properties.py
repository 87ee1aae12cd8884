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


def test_ppjoin_filters_lossless_vs_naive(spark):
    """The PPJoin prefix/length/positional filters are exact-theory
    prunes — on a seeded random corpus engineered to put many pairs
    near the threshold, the filtered join must return EXACTLY the
    naive all-pairs join's result (ids and jaccard values)."""
    import random

    from map_reduce_for_dbpl_dataset_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    base_sets = []
    for d in range(30):
        if base_sets and rng.random() < 0.5:
            # perturb an earlier doc: drop/add a few shingles so the
            # pair's jaccard lands near the 0.8 boundary
            src = list(rng.choice(base_sets))
            k = rng.randint(1, 4)
            for _ in range(k):
                if rng.random() < 0.5 and len(src) > 5:
                    src.pop(rng.randrange(len(src)))
                else:
                    src.append(rng.choice(vocab) + f"x{rng.randint(0, 9)}")
            sset = src
        else:
            sset = [rng.choice(vocab) + f"s{rng.randint(0, 99)}" for _ in range(rng.randint(8, 25))]
        base_sets.append(sset)
        rows.append((d, sset))
    df = spark.createDataFrame(rows, "doc_id long, shingles array<string>")

    def norm(out):
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in out.collect()
        )

    naive = norm(ngram_jaccard_pairs(df, "doc_id", "shingles", threshold=0.8))
    pp = norm(ngram_jaccard_pairs_prefix(df, "doc_id", "shingles", threshold=0.8))
    assert len(naive) > 0  # the perturbation must actually create pairs
    assert pp == naive


def test_ppjoin_exact_threshold_boundary(spark):
    """Deterministic boundary cases for the PPJoin exactness contract:
    pairs at EXACTLY J = t must survive every filter. The (4,5)-size
    pair doubles as a regression test for the FP-ceil fix — t*|B| =
    4.0 exactly, and a ceil that rounds the double product up would
    over-tighten the length filter and drop the pair."""
    from map_reduce_for_dbpl_dataset_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    rows = [
        # J(1,2) = 8/10 = 0.8 exactly (sizes 9, 9)
        (1, [f"w{i}" for i in range(8)] + ["only_a"]),
        (2, [f"w{i}" for i in range(8)] + ["only_b"]),
        # J(3,4) = 4/5 = 0.8 exactly (sizes 4, 5; t*sz integer both ways)
        (3, ["a", "b", "c", "d"]),
        (4, ["a", "b", "c", "d", "e"]),
        # J(5,6) = 7/11 < 0.8: must be pruned/dropped
        (5, [f"u{i}" for i in range(7)] + ["p", "q"]),
        (6, [f"u{i}" for i in range(7)] + ["r", "s"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<string>")

    def norm(out):
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in out.collect()
        )

    expected = [(1, 2, 0.8), (3, 4, 0.8)]
    assert norm(ngram_jaccard_pairs(df, "doc_id", "shingles", 0.8)) == expected
    assert norm(ngram_jaccard_pairs_prefix(df, "doc_id", "shingles", 0.8)) == expected
