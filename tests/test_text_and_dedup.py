"""Text expression + dedup/similarity operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_for_dbpl_dataset_spark.functions.text import (
    fingerprint,
    langid_expr,
    normalize_text,
    tokens,
    word_shingles,
)
from map_reduce_for_dbpl_dataset_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_values,
)


def test_word_shingles_short_input_guard(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",), ("",)], "t string")
    out = df.select(word_shingles(tokens(F.col("t")), 3).alias("s")).collect()
    assert out[0].s == []
    assert out[1].s == ["a b c", "b c d"]
    assert out[2].s == []


def test_normalize_and_fingerprint_whitespace_case_invariant(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world ",)], "t string")
    fps = [r.fp for r in df.select(fingerprint(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[1]
    norm = df.select(normalize_text(F.col("t")).alias("n")).collect()
    assert norm[0].n == "hello world"


def test_langid_prefers_marker_majority(spark):
    df = spark.createDataFrame(
        [("the cat is on the mat",), ("el gato que en los arboles y se fue",)], "t string"
    )
    out = [r.l for r in df.select(langid_expr(tokens(F.col("t"))).alias("l")).collect()]
    assert out == ["en", "es"]


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "Same  Text"), (3, "other")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.keep_id, r.n_copies, r.is_canonical) for r in exact_dedup(df, "doc_id", "text").collect()}
    assert out[1] == (1, 2, True)
    assert out[2] == (1, 2, False)
    assert out[3] == (3, 1, True)


def _shingled(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select("doc_id", word_shingles(tokens(F.col("text")), 3).alias("shingles"))


def test_minhash_identical_docs_identical_signatures(spark):
    sh = _shingled(spark, [(1, "a b c d e f g h"), (2, "a b c d e f g h")])
    sigs = minhash_signatures(sh, "doc_id", "shingles").collect()
    s1, s2 = (tuple(r)[1:] for r in sorted(sigs, key=lambda r: r.doc_id))
    assert s1 == s2


def test_minhash_lsh_finds_near_duplicate(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words everywhere nothing shared at all here now ok"
    sh = _shingled(spark, [(1, base), (2, near), (3, far)])
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(sh, "doc_id", "shingles", threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_lsh_hot_bucket_self_join_matches_small_path(spark):
    """Adversarial hot bucket: every doc shares every band key. With
    hot_bucket forced below the bucket size the self-join regime must
    emit exactly the same C(n,2) pairs as the collect_list regime."""
    from map_reduce_for_dbpl_dataset_spark.operators.dedup import (
        N_PERM,
        lsh_candidate_pairs,
    )

    n = 60
    sigs = spark.createDataFrame(
        [(i, *[7] * N_PERM) for i in range(n)],
        "doc_id long, " + ", ".join(f"sig_{k} long" for k in range(N_PERM)),
    )
    expected = {(a, b) for a in range(n) for b in range(a + 1, n)}
    hot = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", hot_bucket=8).collect()
    }
    small = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", hot_bucket=10_000).collect()
    }
    assert hot == expected
    assert small == expected


def test_lsh_mixed_hot_and_small_buckets(spark):
    """One hot bucket (ids 0..29 identical sigs) + one small bucket
    (ids 100,101) + a singleton (id 200): the two regimes partition the
    buckets and their union is exactly the brute-force pair set."""
    from map_reduce_for_dbpl_dataset_spark.operators.dedup import (
        N_PERM,
        lsh_candidate_pairs,
    )

    rows = [(i, *[7] * N_PERM) for i in range(30)]
    rows += [(100, *[11] * N_PERM), (101, *[11] * N_PERM), (200, *[13] * N_PERM)]
    sigs = spark.createDataFrame(
        rows, "doc_id long, " + ", ".join(f"sig_{k} long" for k in range(N_PERM))
    )
    got = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", hot_bucket=8).collect()
    }
    expected = {(a, b) for a in range(30) for b in range(a + 1, 30)} | {(100, 101)}
    assert got == expected


def test_ngram_jaccard_exact_values(spark):
    sh = _shingled(spark, [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")])
    out = ngram_jaccard_pairs(sh, "doc_id", "shingles", threshold=0.5).collect()
    assert len(out) == 1 and out[0].id_a == 1 and out[0].id_b == 2 and out[0].jaccard == 1.0


def test_simhash_identical_equal_disjoint_differs(spark):
    sh = _shingled(
        spark,
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v w x y z")],
    )
    sims = {r.doc_id: r.simhash for r in simhash_values(sh, "doc_id", "shingles").collect()}
    assert sims[1] == sims[2]
    assert sims[1] != sims[3]
