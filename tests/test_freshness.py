"""Staleness floor over the query inventory (VERDICT r5 #5).

Every ``queries()`` entry must carry verification evidence that is at
most 3 driver rounds old OR be green in the committed local full-gate
artifact (LOCAL_GATE.json — the same oracles and compare as the
driver's window, run over the whole inventory). This turns the
"quietly rotting query" failure mode into a red test: adding a query
without gate evidence, or letting the local artifact lapse while the
driver window rotates elsewhere, fails here.

No Spark session needed — pure artifact accounting.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tools.freshness import load_evidence  # noqa: E402


def _names():
    import __spark_entry__ as entrymod
    return sorted(entrymod.queries().keys())


def test_every_query_has_fresh_verification_evidence():
    driver, local, _meta, latest = load_evidence()
    stale = []
    for name in _names():
        dr = driver.get(name)
        if dr is not None and latest - dr <= 3:
            continue
        if name in local:
            continue
        stale.append(name)
    assert not stale, (
        f"{len(stale)} queries have no driver-green row within 3 "
        f"rounds of r{latest} and no green LOCAL_GATE.json entry: "
        f"{stale} — rerun `python tools/check_correctness.py "
        "/root/testdata/sf0.01 --json LOCAL_GATE.json` (and "
        "tools/freshness.py) or fix the query.")


def test_freshness_report_is_current():
    """FRESHNESS.md must mention every inventory query — a committed
    report that predates the inventory is stale documentation."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FRESHNESS.md")
    assert os.path.exists(path), "run tools/freshness.py"
    with open(path) as f:
        body = f.read()
    missing = [n for n in _names() if f"| {n} |" not in body]
    assert not missing, f"FRESHNESS.md missing rows: {missing} — " \
                        "rerun tools/freshness.py"
