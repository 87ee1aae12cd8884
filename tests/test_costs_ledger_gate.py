"""Gate: the committed COSTS.md ledger must cover exactly the sf1
scale net — no more, no fewer, no drift.

Why this test exists (round-12 verdict item 2): COSTS.md is generated
by ``tools/cost_ledger.py --write`` but regeneration is manual
("regenerate on net-membership change"), so — unlike PLANS.md, which
``tests/test_plan_audit_gate.py`` keeps honest — the ledger could
silently rot the next time a row is admitted to or dropped from
``SCALE_QUERIES`` or the measured-and-excluded list.  This gate is
membership-only by design: the ledger's *seconds* are load-sensitive
measurements (the bench noise-floor notes apply) and gating on them
would flap, but the *row set* is a deterministic function of two
in-repo sources (``SCALE_QUERIES`` + ``cost_ledger.EXCLUDED``), so a
mismatch is always a real staleness bug, never noise.

Cheap and always-on: pure text parsing plus two imports, no Spark —
kept true by cost_ledger deferring its tests/conftest.py load (which
transitively imports pyspark) into ``_suite_shape()``, called only by
``measure()``/``render()``, never at import time (round-15 ADVICE).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
# tests/ too: `from test_scale_correctness import ...` below otherwise
# resolves only under pytest's prepend import mode (round-13 ADVICE) —
# with --import-mode=importlib, or imported outside pytest, it fails.
sys.path.insert(0, str(REPO / "tests"))

_ROW = re.compile(r"^\| `([a-z0-9_]+)` \|")


def _ledger_sections() -> tuple[set[str], set[str]]:
    """Parse COSTS.md into (net rows, measured-and-excluded rows)."""
    text = (REPO / "COSTS.md").read_text()
    head, _, excluded_part = text.partition("## Measured and excluded")
    assert excluded_part, "COSTS.md lost its 'Measured and excluded' section"
    net = {m.group(1) for line in head.splitlines() if (m := _ROW.match(line))}
    excl = {
        m.group(1)
        for line in excluded_part.splitlines()
        if (m := _ROW.match(line))
    }
    return net, excl


def test_costs_ledger_matches_scale_net_membership():
    from cost_ledger import EXCLUDED
    from test_scale_correctness import SCALE_QUERIES

    net_rows, excluded_rows = _ledger_sections()

    assert net_rows == set(SCALE_QUERIES), (
        "COSTS.md net table drifted from SCALE_QUERIES — regenerate with "
        "`python tools/cost_ledger.py --write` (on a quiet machine). "
        f"ledger-only: {sorted(net_rows - set(SCALE_QUERIES))}, "
        f"net-only: {sorted(set(SCALE_QUERIES) - net_rows)}"
    )
    assert excluded_rows == set(EXCLUDED), (
        "COSTS.md measured-and-excluded table drifted from "
        "cost_ledger.EXCLUDED — regenerate with `--write`. "
        f"ledger-only: {sorted(excluded_rows - set(EXCLUDED))}, "
        f"EXCLUDED-only: {sorted(set(EXCLUDED) - excluded_rows)}"
    )


def test_scale_net_and_excluded_are_disjoint_registry_rows():
    """The two membership sources must themselves be coherent: a query
    cannot be both admitted and measured-and-excluded, and every name
    must be a real registry row (a rename would otherwise leave a
    ghost ledger entry that still 'matches')."""
    from cost_ledger import EXCLUDED
    from test_scale_correctness import SCALE_QUERIES

    overlap = set(SCALE_QUERIES) & set(EXCLUDED)
    assert not overlap, f"rows both admitted and excluded: {sorted(overlap)}"

    from map_reduce_for_dbpl_dataset_spark import queries as registry

    names: set[str] = set()
    for fam in registry._FAMILIES:
        names.update(fam.QUERIES)
    ghosts = (set(SCALE_QUERIES) | set(EXCLUDED)) - names
    assert not ghosts, f"ledger names not in the registry: {sorted(ghosts)}"
