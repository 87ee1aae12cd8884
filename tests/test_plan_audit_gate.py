"""Gate: the physical-plan audit must pass at head, and the committed
PLANS.md must be the report of THAT run.

Why this test exists: rounds 5 and 6 both ended with
``python tools/plan_audit.py`` exiting 1 while ``pytest tests/``
stayed green — a lineage-cut refactor hid an audited subtree from its
needle, and the committed PLANS.md (regenerated earlier) kept showing
the property ✅, so the repo shipped an all-green report that a fresh
run contradicted.  The plan properties are the 100-TB design contract
(no cartesian pair stages, partial aggregation, pinned joins, spread
pair fan-outs); a silent regression is exactly what they exist to
catch, so the audit's exit code is asserted here, CI-style.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_plan_audit_exits_green_and_report_is_current():
    proc = subprocess.run(
        [sys.executable, "tools/plan_audit.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    tail = (proc.stdout[-4000:] or "") + (proc.stderr[-2000:] or "")
    assert proc.returncode == 0, f"plan audit red at head:\n{tail}"

    # The committed report must list exactly the property rows the
    # fresh run produced (all ✅, same queries, same properties) — a
    # check edit or plan change without `--write` fails here.
    fresh_rows = [ln for ln in proc.stdout.splitlines() if ln.startswith("| `")]
    committed_rows = [
        ln
        for ln in (REPO / "PLANS.md").read_text().splitlines()
        if ln.startswith("| `")
    ]
    assert fresh_rows, "audit printed no property rows — output format drifted"
    assert fresh_rows == committed_rows, (
        "PLANS.md is stale: regenerate with `python tools/plan_audit.py --write`"
    )
