"""Per-query cost ledger for the sf1 scale net (round-11 verdict
item 8): measure, for every row of tests/test_scale_correctness.py's
SCALE_QUERIES, what that row actually costs the pytest budget — Spark
seconds (collect included, exactly as the test pays it), DuckDB
oracle seconds, and output rows — and write the committed COSTS.md.

Why a generated ledger: sf1 admission/exclusion decisions and
pytest-budget rebalancing have so far re-measured candidates ad hoc
each round (the per-round "(N+M s)" comment blocks in SCALE_QUERIES).
COSTS.md makes the full distribution visible at once: the next
admission candidate is compared against the measured spread instead
of a fresh one-off, and the "which rows dominate the suite" question
(round-10/11 verdict item: full-suite wall time <= ~20 min) is
answered by sorting one table.

Measurement conditions match the suite exactly — same session shape
(cpus/shuffle_partitions imported from tests/conftest.py), same collect
+ fetchall endpoints, same publications-path rewrite.  Numbers are
environment-sensitive (the bench docstring's noise-floor and
attribution notes apply); the ledger records the measurement date and
is regenerated with `python tools/cost_ledger.py --write`, not gated
for freshness (timings are nondeterministic — a staleness gate would
flap; regenerate when the net's membership changes).

The measured-and-excluded table is pinned from the round-9..12
admission measurements (each number was produced by the same
Spark+oracle methodology when its exclusion was decided); re-measure
one with `--include-excluded` (slow: llm_dedup_clusters' recursive
CTE oracle alone is ~160 s).
"""

from __future__ import annotations

import argparse
import datetime
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# tests/ on sys.path for main()'s `from test_scale_correctness import
# SCALE_QUERIES` (the conftest import below does NOT rely on it — see
# _suite_shape).
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb


@functools.lru_cache(maxsize=1)
def _suite_shape() -> tuple[int, int]:
    """(SUITE_CPUS, SUITE_SHUFFLE_PARTITIONS) from tests/conftest.py —
    the single source of truth for the measurement session's shape
    (round 15: a hard-coded cpus twin here could silently drift from
    the fixture's values; reading the suite's own constants makes
    COSTS.md's "the pytest suite's shape" claim true by construction).

    Loaded by EXPLICIT path, not `from conftest import ...` (round-15
    ADVICE: a bare-name import binds whichever conftest.py happens to
    resolve first on sys.path — or breaks under a pytest import-mode
    that registers tests/conftest.py under another module name), and
    DEFERRED to call time so `from cost_ledger import EXCLUDED` (the
    COSTS.md membership gate's import) stays import-light — conftest
    transitively imports pyspark via the session module.

    MEMOIZED (round-16 ADVICE): measure() and render() each call this,
    so an un-cached --write run would exec conftest.py — its module
    body includes a sys.path.insert and the pyspark import — twice per
    process; lru_cache bounds that to once.
    """
    import importlib.util

    path = os.path.join(REPO, "tests", "conftest.py")
    spec = importlib.util.spec_from_file_location("_suite_conftest", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SUITE_CPUS, mod.SUITE_SHUFFLE_PARTITIONS

SCALE_DIR = os.path.join(REPO, "fixtures", "sf1")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# name -> (pinned "spark+oracle sec" or dominant cost, exclusion reason)
# — every row was measured with this tool's methodology in the round
# that decided its exclusion (rationale comments in SCALE_QUERIES).
EXCLUDED: dict[str, tuple[str, str]] = {
    "tpch_window_lag_gap": (
        "1.5M-row output",
        "python-side tuple compare dominates, engines would idle (r6)",
    ),
    "tpch_asof_latest_order": (
        "~1M-row output",
        "same tuple-compare rationale (r9)",
    ),
    "tpch_events_session": (
        "~1M-row output",
        "same tuple-compare rationale (r9)",
    ),
    "tpch_asof_cogroup": (
        "27 s Spark, 1M-row output",
        "same tuple-compare rationale (r10)",
    ),
    "llm_dedup_clusters": (
        "160 s oracle",
        "recursive-CTE over the full shingle self-join; covered by the "
        "sf0.1 union-find replay test instead (r9)",
    ),
    "dblp_coauthor_components": (
        "47 s oracle",
        "recursive-CTE cost; CC operator hash-proven at sf1 via the "
        "star variant (r9)",
    ),
    "llm_dedup_levenshtein": (
        "hours (oracle)",
        "DuckDB has no threshold levenshtein — full O(len^2) DP per "
        "blocked pair; covered by the sf1 contract test instead (r6)",
    ),
    "stream_session_parity": (
        "14.3 s Spark, 954,650-row output",
        "tuple-compare rationale; session-window state covered by the "
        "driver rotation + the sliding/tumbling sf1 rows (r12)",
    ),
    "llm_leakage_free_split": (
        "~3 min oracle",
        "recursive-CTE shingle self-join; covered by the sf1 contract "
        "test instead (r6)",
    ),
}


def measure(names: list[str]) -> dict[str, dict]:
    from map_reduce_for_dbpl_dataset_spark.session import get_spark
    from map_reduce_for_dbpl_dataset_spark.sources.parquet import PUBLICATIONS_PATH

    import __spark_entry__ as entrymod

    suite_cpus, suite_shuffle = _suite_shape()
    spark = get_spark(
        "cost-ledger",
        cpus=suite_cpus,
        shuffle_partitions=suite_shuffle,
    )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SCALE_DIR}/{t}.parquet')"
        )
    # session warm-up so the first row doesn't absorb init cost
    spark.read.parquet(os.path.join(SCALE_DIR, "region.parquet")).count()

    out: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        rows = qs[name](spark, SCALE_DIR).collect()
        spark_sec = round(time.time() - t0, 1)
        sql = osql[name].replace(
            PUBLICATIONS_PATH, os.path.join(SCALE_DIR, "publications.parquet")
        )
        t0 = time.time()
        orows = con.sql(sql).fetchall()
        oracle_sec = round(time.time() - t0, 1)
        out[name] = {
            "spark_sec": spark_sec,
            "oracle_sec": oracle_sec,
            "rows": len(rows),
            "oracle_rows": len(orows),
        }
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    spark.stop()
    return out


def render(measured: dict[str, dict]) -> str:
    suite_cpus, suite_shuffle = _suite_shape()
    total_spark = round(sum(m["spark_sec"] for m in measured.values()), 1)
    total_oracle = round(sum(m["oracle_sec"] for m in measured.values()), 1)
    lines = [
        "# COSTS — sf1 scale-net per-query ledger (generated)",
        "",
        f"Generated by `python tools/cost_ledger.py --write` on "
        f"{datetime.date.today().isoformat()}; session cpus={suite_cpus} / "
        f"shuffle_partitions={suite_shuffle} (the pytest "
        "suite's shape, imported from tests/conftest.py), collect/"
        "fetchall endpoints included — these are the seconds each row "
        "charges the suite, not pure engine time.  Sorted most "
        "expensive first.  Regenerate when the net's membership "
        "changes; treat round-over-round deltas per bench.py's "
        "noise-floor and attribution notes.",
        "",
        f"**Net totals: {total_spark} s Spark + {total_oracle} s oracle "
        f"across {len(measured)} rows.**",
        "",
        "| query | spark s | oracle s | rows |",
        "|---|---:|---:|---:|",
    ]
    for name, m in sorted(
        measured.items(), key=lambda kv: -(kv[1]["spark_sec"] + kv[1]["oracle_sec"])
    ):
        lines.append(
            f"| `{name}` | {m['spark_sec']} | {m['oracle_sec']} | {m['rows']} |"
        )
    lines += [
        "",
        "## Measured and excluded",
        "",
        "Each was measured with the same methodology in the round that",
        "decided its exclusion; re-measure with `--include-excluded`.",
        "",
        "| query | measured cost | why excluded |",
        "|---|---|---|",
    ]
    for name, (cost, why) in sorted(EXCLUDED.items()):
        lines.append(f"| `{name}` | {cost} | {why} |")
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="write COSTS.md at the repo root")
    ap.add_argument("--include-excluded", action="store_true",
                    help="also measure the EXCLUDED table fresh (slow)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="measure only these query names")
    args = ap.parse_args()

    # tests/ is already on sys.path from the module-level insert
    from test_scale_correctness import SCALE_QUERIES

    names = list(args.only) if args.only else list(SCALE_QUERIES)
    if args.include_excluded:
        # never auto-run the levenshtein oracle: DuckDB pays the full
        # unbanded DP per blocked pair — hours at sf1 (its exclusion
        # note); pass it via --only deliberately if you must
        names += [
            n for n in EXCLUDED
            if n not in names and n != "llm_dedup_levenshtein"
        ]
    measured = measure(names)
    report = render(measured)
    if args.write:
        with open(os.path.join(REPO, "COSTS.md"), "w") as fh:
            fh.write(report)
        print(f"wrote COSTS.md ({len(measured)} rows)")
    else:
        print(report)


if __name__ == "__main__":
    main()
