"""Self-check for the re-certification rotation policy
(queries/__init__.py): the grading driver verifies only the FIRST 50
registry entries per round, so the ordering must always put the
weakest correctness signal first.  These invariants make the policy
self-checking — a forgotten per-round fold of CORRECTNESS_r{N}.json,
a typo'd query name in the bookkeeping maps, or an ordering bug
between queries() and oracle_sql() fails fast here instead of
silently aging green rows (round-4 verdict #7).

No SparkSession needed; this only inspects the registry ordering.
"""

from __future__ import annotations

from map_reduce_for_dbpl_dataset_spark import queries as reg

# The driver's per-round differential-check window size.
WINDOW = 50


def test_bookkeeping_names_are_real_queries():
    names = set(reg.all_queries())
    # A fold that keeps a renamed/deleted query, or records a typo,
    # would silently distort the rotation — every bookkeeping name
    # must be a registered query.
    assert set(reg._LAST_CHECKED) <= names
    assert set(reg._CHANGED) <= names


def test_window_prioritizes_weakest_signal():
    names = list(reg.all_queries())
    assert len(names) == len(set(names))
    lc, changed = reg._LAST_CHECKED, set(reg._CHANGED)
    window = set(names[:WINDOW])

    # Tier 1: never-driver-checked queries all make the window
    # (unless there are somehow more than WINDOW of them).
    never = [n for n in names if n not in lc]
    if len(never) <= WINDOW:
        assert set(never) <= window

    # Tier 2: materially-changed queries re-enter the window.
    if len(never) + len(changed) <= WINDOW:
        assert changed <= window

    # Tier 3: staleness is monotone across the window boundary — no
    # excluded row may be staler than an included one.
    inside = [lc[n] for n in names[:WINDOW] if n in lc and n not in changed]
    outside = [lc[n] for n in names[WINDOW:] if n in lc and n not in changed]
    if inside and outside:
        assert max(inside) <= min(outside)

    # The stalest tier is refreshed wholesale when it fits.
    if lc:
        stalest = min(lc.values())
        stale_rows = [n for n in lc if lc[n] == stalest and n not in changed]
        if len(never) + len(changed) + len(stale_rows) <= WINDOW:
            assert set(stale_rows) <= window


def test_queries_and_oracles_share_one_order():
    # The driver zips queries() with oracle_sql() positionally when
    # selecting its window; the two surfaces must agree exactly.
    q = list(reg.all_queries())
    o = list(reg.all_oracle_sql())
    assert [n for n in q if n in set(o)] == o
