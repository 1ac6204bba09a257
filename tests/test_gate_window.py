"""Gate-budget alternation health check.

The driver's correctness gate records ~50 rows per round in CATALOG
iteration order; `_gate_priority_order` ranks never-gated first, then
CHANGED_SINCE_GATE, then stalest-first. These invariants hold
deterministically from the committed CORRECTNESS_r*.json files, so
this test fails LOUDLY at registration time — not judge time — if a
catalog addition or a priority bug would push any query 2+ rounds
stale under a 50-row budget (the round-8 verdict's freshness rule).
"""

from __future__ import annotations

import json
import pathlib
import re

BUDGET = 50
ROOT = pathlib.Path(__file__).resolve().parent.parent


def _last_gated() -> tuple[dict[str, int], int]:
    last: dict[str, int] = {}
    newest = 0
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        for name in json.loads(f.read_text()):
            last[name] = max(last.get(name, 0), rnd)
    return last, newest


def test_gate_window_keeps_every_query_fresh():
    from formula1_data_pipeline_spark.queries import (
        CATALOG,
        CHANGED_SINCE_GATE,
    )

    order = list(CATALOG)
    window = set(order[:BUDGET])
    last, newest = _last_gated()

    # never-gated and changed-since-gate queries must sit inside the
    # budget window — their old rows (if any) prove nothing. A
    # CHANGED entry already gated in the NEWEST recorded round is
    # fresh (the newest CORRECTNESS file verified the changed code):
    # the driver drops CORRECTNESS_r{N}.json AFTER the round's final
    # commit, so without this carve-out the just-verified diff would
    # steal window slots at judge time (bit in round 10 on q73).
    for name in order:
        if name not in last:
            assert name in window, f"never-gated {name} outside window"
    for name in CHANGED_SINCE_GATE:
        if last.get(name, 0) >= newest:
            continue
        assert name in window, f"changed {name} outside window"

    # alternation health: if the driver gates exactly the window this
    # round, nothing may end 2+ rounds stale — every query OUTSIDE
    # the window must have been gated in the newest recorded round
    for name in order:
        if name not in window:
            assert last.get(name, 0) >= newest, (
                f"{name} (last gated r{last.get(name, 0)}) would go "
                f"2+ rounds stale outside the {BUDGET}-row window — "
                "the catalog has outgrown the alternation; ride a "
                "composite gate instead of registering a new row "
                "(CHANGELOG round-9 landing plan)"
            )
