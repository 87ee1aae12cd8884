"""Third-batch curation operators: line-level boilerplate removal,
stratified quality selection, incremental snapshot dedup."""

from __future__ import annotations

import re

from map_reduce_for_dbpl_dataset_spark.queries.pipeline import (
    LINE_MIN_DF,
    LINE_TOKENS,
    QUALITY_PCT,
    q_boilerplate_lines,
    q_dedup_incremental,
    q_quality_select,
)


def _norm_tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _doc_lines(text: str, source: str) -> list[str]:
    t = _norm_tokens(text)
    chunks = [
        " ".join(t[i * LINE_TOKENS : (i + 1) * LINE_TOKENS])
        for i in range((len(t) + LINE_TOKENS - 1) // LINE_TOKENS)
    ]
    return ["corpus shared boilerplate header line", *chunks, f"footer of {source}"]


def test_boilerplate_lines_matches_python_rescan(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )
    df_count: dict[str, set] = {}
    per_doc = {}
    for r in docs:
        lines = _doc_lines(r.text, r.source)
        per_doc[r.doc_id] = lines
        for ln in lines:
            df_count.setdefault(ln, set()).add(r.doc_id)
    expected = {}
    for doc_id, lines in per_doc.items():
        kept = [ln for ln in lines if len(df_count[ln]) < LINE_MIN_DF]
        expected[doc_id] = (len(kept), len(lines) - len(kept))

    got = {
        r.doc_id: (r.n_kept, r.n_dropped)
        for r in q_boilerplate_lines(spark, sf_dir).collect()
    }
    assert got == expected
    # the injected corpus-wide header must be dropped from EVERY doc
    assert all(n_dropped >= 1 for _, n_dropped in got.values())


def test_quality_select_fraction_and_threshold(spark, sf_dir):
    rows = q_quality_select(spark, sf_dir).collect()
    n_sources = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources  # every source keeps at least one doc
    for r in rows:
        assert 1 <= r.n_selected <= r.n_total
        # >= thr filter keeps roughly the top (1 - QUALITY_PCT); exact
        # fraction depends on ties/interpolation, so bound it loosely
        assert r.n_selected <= max(1, int(r.n_total * (1 - QUALITY_PCT) * 3))
        assert r.selected_tokens > 0


def test_dedup_incremental_against_python_sets(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    fp = {r.doc_id: re.sub(r"\s+", " ", r.text.lower()).strip() for r in docs}
    snapshot = {fp[i] for i in fp if i % 2 == 0}
    incoming = {i: fp[i] for i in fp if i % 2 == 1}
    first_of = {}
    for i in sorted(incoming):
        first_of.setdefault(incoming[i], i)

    out = {r.doc_id: r for r in q_dedup_incremental(spark, sf_dir).collect()}
    assert set(out) == set(incoming)
    for i, r in out.items():
        assert r.is_new == (incoming[i] not in snapshot)
        assert r.batch_keep_id == first_of[incoming[i]]
        assert r.survives == (r.is_new and i == first_of[incoming[i]])
    assert any(r.survives for r in out.values())


# --- round-4 batch: semdedup, overlapping chunking, mixture sampling ---------


def test_semdedup_keep_semantics(spark):
    """Synthetic corpus with a known answer: two far-apart centroid
    seeds, one exact duplicate of seed 0, one near-duplicate, one
    unrelated vector. SemDeDup must drop exactly the higher-id members
    of within-cluster near-dup groups."""
    from pyspark.sql import functions as F

    from map_reduce_for_dbpl_dataset_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid A
        (1, [0.0, 1.0, 0.0, 0.0]),   # centroid B
        (2, [1.0, 0.0, 0.0, 0.0]),   # exact dup of 0 -> dropped
        (3, [1.0, 0.015625, 0.0, 0.0]),  # cos ~0.9999 vs 0 -> dropped
        (4, [0.5, 0.8, 0.0, 0.0]),   # cluster B, unrelated -> kept
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = {
        r["vec_id"]: (r["cluster"], r["kept"])
        for r in semdedup(corpus, "vec_id", "embedding", [0, 1], threshold=0.95).collect()
    }
    assert out[0] == (0, True)
    assert out[1] == (1, True)
    assert out[2] == (0, False)  # dominated by 0
    assert out[3] == (0, False)  # dominated by 0 (and 2)
    assert out[4][0] == 1 and out[4][1]  # cluster B, no near neighbor


def test_chunk_overlap_invariants(spark, sf_dir):
    """Every chunk except a doc's last has exactly CHUNK_W tokens;
    consecutive chunks overlap by CHUNK_W - CHUNK_S; chunk 0 exists for
    every document; rebuilding token counts from chunk starts covers
    the whole document."""
    from pyspark.sql import functions as F

    from map_reduce_for_dbpl_dataset_spark.queries.pipeline import (
        CHUNK_S,
        CHUNK_W,
        q_chunk_overlap,
    )

    out = q_chunk_overlap(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("n")
    )
    per_doc = (
        out.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_id").alias("max_id"),
            F.min("n_chunk_tokens").alias("min_len"),
            F.max("n_chunk_tokens").alias("max_len"),
        )
    ).join(docs, "doc_id")
    bad = per_doc.filter(
        (F.col("n_chunks") != F.col("max_id") + 1)
        | (F.col("max_len") > CHUNK_W)
        # full coverage: last chunk starts at max_id*CHUNK_S and must
        # reach the document's end
        | (F.col("max_id") * CHUNK_S + F.col("max_len") < F.col("n"))
    )
    assert bad.count() == 0
    # non-final chunks are full-width
    w = out.join(per_doc.select("doc_id", "max_id"), "doc_id").filter(
        (F.col("chunk_id") < F.col("max_id")) & (F.col("n_chunk_tokens") != CHUNK_W)
    )
    assert w.count() == 0


def test_mixture_sample_apportionment(spark, sf_dir):
    """Targets sum exactly to MIX_TOTAL, every source's selection meets
    its target (no source can under-fill on this fixture), and the
    per-source target is within 1 of the exact real-valued sqrt-share."""
    import math

    from pyspark.sql import functions as F

    from map_reduce_for_dbpl_dataset_spark.queries.pipeline import (
        MIX_TOTAL,
        q_mixture_sample,
    )

    out = q_mixture_sample(spark, sf_dir)
    per_src = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sel"),
        F.max("target").alias("target"),
        F.max("n_total").alias("n_total"),
    ).collect()
    assert sum(r["n_sel"] for r in per_src) == MIX_TOTAL
    assert all(r["n_sel"] == r["target"] for r in per_src)
    tot_fw = sum(math.isqrt(r["n_total"]) for r in per_src)
    for r in per_src:
        exact = MIX_TOTAL * math.isqrt(r["n_total"]) / tot_fw
        assert abs(r["target"] - exact) <= 1
