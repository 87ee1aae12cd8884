"""Scale-exponent probe for the two pair-stage champions (round-11
verdict item 7): measure how ``llm_winnow_pairs`` and
``llm_substring_spans`` — the repo's two heaviest
``spread_for_pair_join`` callers — actually scale between the 10x
point (fixtures/sf1) and a 30x documents-only point
(fixtures/sf3docs, built on first use by tools/make_scale_fixtures.py
with ``--factor 30 --tables documents`` — both queries read only the
documents table), turning the "subquadratic" claim the bench slots
track into a measured exponent:

    exponent = log(t_30x / t_10x) / log(3)

Both scale points use the SAME key-shift replication discipline
(copy tags keep replicas near-dup-distinct, so shingle-sharing — and
with it pair-stage work — grows the way a genuinely larger corpus
grows, not quadratically as exact duplication would).  An exponent
near 1 means the pair stage costs linearly in corpus size; 2 would
mean the candidate join degraded to all-pairs.  The probe times the
full query plan with a ``.count()`` endpoint (no driver collect of
row data), best-of-2 at both scale points, and checks
rows only — the 10x point's full oracle-hash identity lives in
tests/test_scale_correctness.py.  Row-count expectations differ by
query: substring spans have no df-cap, so more key-shifted copies
means more shingle-sharing spans (count grows); winnow's count FALLS
at 30x by design, because a fingerprint shared by every copy of a
doc reaches df ~ factor*5 and WINNOW_MAX_DF=50 drops it once
replication crosses the cap — that regime shift is exactly the
hot-key discipline the probe exists to exercise.

Timing endpoint (changed round 13, round-12 ADVICE): ``.count()`` on
the full plan, best-of-2 at BOTH scale points — the old shape (noop
sink + a separate untimed .count() per point for rows) re-executed
each heavy query twice extra just to count rows, and its single timed
30x run vs best-of-2 at 10x biased the exponent upward one-sidedly.
Endpoints differ by one final agg; the exponent is a ratio, so the
change cancels, but compare raw seconds only within an endpoint era.

MEASURED (round 12, noop endpoint, local[32], fixtures built, warmed):

    llm_substring_spans  t_10x 6.89 s  t_30x 15.74 s  ratio 2.28
                         exponent 0.75   rows 2,328 -> 6,988
    llm_winnow_pairs     t_10x 31.79 s  t_30x 87.79 s  ratio 2.76
                         exponent 0.92   rows 38,933 -> 3,493

Both exponents are ~linear-in-corpus — the subquadratic claim the
bench slots track, now a measured number (an all-pairs regression
would read 2.0).  Treat reruns per bench.py's noise notes; the
wrapper's red line is 1.8, far above both measurements.

Printed JSON is consumed by tests/test_scale_stress.py's opt-in
wrapper (SPARK_GRAFT_SCALE_PROBE=1), which asserts every measured
exponent stays under 1.8 — a red line between "subquadratic with
noise headroom" and "the spread/candidate discipline regressed".

Usage:  python tools/scale_probe.py
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.path.join(REPO, "fixtures", "sf1")
SF30_DIR = os.path.join(REPO, "fixtures", "sf3docs")
PROBE_QUERIES = ["llm_substring_spans", "llm_winnow_pairs"]


def ensure_fixture(out_dir: str, factor: int, tables: str | None) -> None:
    """Build a fixture dir on first use (build-into-temp-then-rename,
    same partial-build protection as bench.py)."""
    if os.path.isdir(out_dir):
        return
    tmp = out_dir.rstrip("/") + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "make_scale_fixtures.py"),
        "--factor", str(factor), "--out", tmp,
    ]
    if tables:
        cmd += ["--tables", tables]
    subprocess.run(cmd, check=True)
    os.rename(tmp, out_dir)


def main() -> None:
    ensure_fixture(SF1_DIR, 10, None)
    ensure_fixture(SF30_DIR, 30, "documents")

    from map_reduce_for_dbpl_dataset_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("scale-probe")
    qs = entrymod.queries()

    def timed(name: str, sf_dir: str, n_runs: int) -> tuple[float, int]:
        """Best-of-N full-plan execution with ``.count()`` as the
        endpoint, returning (seconds, rows).  Round-12 ADVICE: the old
        shape (noop-sink timing + separate .count() for rows) re-ran
        each heavy query once more per scale point just to count rows
        (~2 min extra for winnow alone), and its single 30x run vs
        best-of-2 at 10x biased the exponent upward on a noisy machine.
        ``.count()`` on these computed plans executes the same joins /
        aggregations the noop sink did (no metadata shortcut exists for
        a non-scan plan), and both points now take best-of-N."""
        best, rows = float("inf"), -1
        for _ in range(n_runs):
            t0 = time.time()
            rows = qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return round(best, 2), rows

    # warm the session + parquet datasource so the first timed run
    # doesn't absorb init cost (same rationale as bench.py)
    spark.read.parquet(os.path.join(SF1_DIR, "documents.parquet")).count()
    spark.read.parquet(os.path.join(SF30_DIR, "documents.parquet")).count()

    out: dict[str, dict] = {}
    for name in PROBE_QUERIES:
        t10, rows10 = timed(name, SF1_DIR, 2)
        t30, rows30 = timed(name, SF30_DIR, 2)
        out[name] = {
            "t_10x_sec": t10,
            "t_30x_sec": t30,
            "ratio": round(t30 / t10, 2),
            "exponent": round(math.log(t30 / t10) / math.log(3), 2),
            "rows_10x": rows10,
            "rows_30x": rows30,
        }
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
