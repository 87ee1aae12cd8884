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
