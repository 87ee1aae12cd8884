"""Golden tests for the six reference queries over the publications
fixture — asserting the *intended* semantics on the planted edge cases
(FIXTURES.md §C, fixture constructions in fixtures/make_publications.py).
"""

from __future__ import annotations

import pytest

from map_reduce_for_dbpl_dataset_spark.queries import dblp


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    return {name: fn(spark, sf_dir) for name, fn in dblp.QUERIES.items()}


def test_q2_duplicate_year_does_not_reset_streak(q):
    # Author 000: 1990..2005 (16 consecutive years) WITH a duplicate
    # 1995 row — the reference's literal scan would truncate at 1995
    # (Homework2.scala:217-221); intended semantics yields 16.
    runs = {r.author: r.longest_run for r in q["dblp_q2_consecutive_years"].collect()}
    assert runs["Author 000"] == 16
    assert runs["Author 001"] == 10  # exactly at the >=10 boundary
    assert runs["Author 002"] == 12  # 9-run + gap + 12-run -> 12
    assert "Author 003" not in runs  # 9-run only


def test_q1_topk_shape_and_ties(q):
    import collections

    rows = q["dblp_q1_top_authors_per_venue"].collect()
    per_venue = collections.defaultdict(list)
    for r in rows:
        per_venue[r.venue].append(r)
    for venue, rs in per_venue.items():
        assert len(rs) <= 10, venue
        counts = [r.n_pubs for r in rs]
        assert counts == sorted(counts, reverse=True), venue
    # J. Syst. 00: counts 12,11,10,9,8,7,6,5,5,5,5,4 -> rank-10 boundary
    # inside the four-way tie at 5; row_number keeps exactly 10 with
    # author-asc tie-break.
    j0 = sorted(per_venue["J. Syst. 00"], key=lambda r: (-r.n_pubs, r.author))
    assert len(j0) == 10
    assert [r.n_pubs for r in j0] == [12, 11, 10, 9, 8, 7, 6, 5, 5, 5]


def test_q4_global_argmax_keeps_both_tied_teams(q):
    rows = [r for r in q["dblp_q4_max_authors_per_venue"].collect() if r.venue == "CONF 00"]
    titles = {r.title for r in rows}
    assert titles == {"Team effort one", "Team effort two"}
    assert all(r.n_authors == 7 for r in rows)


def test_q6_solo_only_excludes_mixed_authors(q, spark, sf_dir):
    solo = {r.author for r in q["dblp_q6_solo_only_authors"].collect()}
    # planted solo-only authors are indices 100..119
    assert {f"Author {i:03d}" for i in range(100, 120)} <= solo
    # mixed authors (120..129) and never-solo (130..139) excluded
    assert not solo & {f"Author {i:03d}" for i in range(120, 140)}


def test_q5_weight_is_full_author_count(q):
    # reference semantics: weight = size(authors) including self
    # (Homework2.scala:383-386)
    vols = {r.author: r.coauthor_volume for r in q["dblp_q5_top_coauthor_volume"].collect()}
    assert len(vols) == 100
    assert all(v >= 1 for v in vols.values())


def test_q3_titles_sorted_and_pipe_joined(q):
    rows = q["dblp_q3_solo_titles_per_venue"].collect()
    assert rows
    for r in rows:
        titles = r.titles.split("|")
        assert titles == sorted(titles), r.venue
        assert "" not in titles


def test_venue_rules_cover_www_and_unknown(spark, sf_dir):
    from pyspark.sql import functions as F

    from map_reduce_for_dbpl_dataset_spark.functions.exprs import venue_expr
    from map_reduce_for_dbpl_dataset_spark.sources.parquet import publications

    pubs = publications(spark).withColumn("venue", venue_expr())
    www = pubs.filter(F.col("kind") == "www").select("key", "venue").collect()
    for r in www:
        assert r.venue == "/".join(r.key.split("/")[:3])
    unk = pubs.filter(F.col("kind").isin("person", "data")).select("venue").distinct().collect()
    assert [r.venue for r in unk] == ["No venue available"]
