"""Scale-regression gate over the latest tools/scale_bench.py replay.

The replay (sf0.1 vs the 10x replica) writes SCALE.json at the repo
root; this test asserts every query's 10x-over-1x wall-time ratio
stays inside its budget class (default 4x; LINEAR_OK scan-shaped
queries 12x — linear plus headroom, see tools/scale_bench.py's module
doc for the class rationale). Skips when no replay artifact exists —
the replay is a per-round tool run, not a per-test cost."""

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "SCALE.json")


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="no scale replay artifact; run "
                           "tools/scale_bench.py first")
def test_no_query_over_scale_budget():
    with open(ARTIFACT) as f:
        art = json.load(f)
    over = {k: (r["ratio"], r["budget"])
            for k, r in art["queries"].items()
            if r["ratio"] is not None and r["ratio"] > r["budget"]}
    assert not over, (
        f"queries over their 10x scale budget: {over} — a plan "
        "regressed (new shuffle, lost broadcast, lost pushdown?); "
        "diff .explain('formatted') against PLANS.md")


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="no scale replay artifact")
def test_scale_artifact_covers_headline_set():
    """The replay must cover the whole bench HEADLINE set — partial
    replays would silently shrink the evidence the 100 TB claims
    rest on."""
    import sys
    sys.path.insert(0, ROOT)
    from bench import HEADLINE
    with open(ARTIFACT) as f:
        art = json.load(f)
    missing = [q for q in HEADLINE if q not in art["queries"]]
    assert not missing, f"HEADLINE queries absent from replay: {missing}"
