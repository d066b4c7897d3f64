"""Two-decade scaling probe: scan-shaped queries at sf0.1, the 10x
replica, AND a 100x replica — the strongest small-machine evidence
that the plans' cost tracks data volume across TWO orders of
magnitude, not just one (a fixed overhead can hide a superlinear term
at a single 10x step; it cannot hide it across 100x).

Scope is deliberately the SCAN-SHAPED tier: full-table scans,
map-side-combined aggregates, zero-shuffle column passes, and the one
32-byte-key dedup shuffle. The candidate-bounded dedup/ANN families
are excluded — the 100x replica built with cycled text permutations
repeats near-dup structure across decades (see build_sf1.py), which
would measure an adversarial duplicate workload instead of corpus
growth; their 10x rows in SCALE.json remain the scale evidence of
record.

Usage: python tools/scale100.py  (expects /tmp/sf1 and /tmp/sf10;
build with tools/build_sf1.py <src> <out> <factor>).
Writes SCALE100.json: per-query seconds at each decade plus the
per-decade ratios; a scan-linear query should show ratios ~= the data
growth with sublinearity from fixed overheads at the small end.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import _hygiene  # noqa: E402
from pydin_spark import get_session, register_tables  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

#: scan-shaped tier only (see module doc)
QUERIES = [
    "q1_pricing_summary",      # lineitem scan + partial agg
    "q6_forecast_revenue",     # pure lineitem scan
    "q_rollup_status",         # orders scan + ROLLUP
    "rollup_hourly",           # events scan + bucket agg
    "q_sessionize",            # events scan + one user shuffle
    "text_quality",            # whole-corpus column pass
    "dedup_exact",             # corpus scan + 32-byte-key shuffle
    "curation_profile",        # one-pass scan aggregate
    "emb_project",             # per-row arithmetic scan
    "rollup_group_median",     # per-group windows, group-distributed
]

TIERS = [("sf0.1", "/root/testdata/sf0.1"),
         ("sf1", "/tmp/sf1"),
         ("sf10", "/tmp/sf10")]


def timed(fn) -> float:
    fn()
    samples = []
    for _ in range(REPS):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def consume(df) -> None:
    """Force FULL materialization of every output column via the noop
    writer. ``count()`` (bench.py's consume, kept there for
    round-over-round comparability) lets Catalyst prune computed
    columns out of pure-projection queries — a 100x run would then
    time a parquet row count, not the operator (observed:
    text_quality flat at 0.19 s across two decades under count())."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    src = TIERS[0][1]
    if not os.path.isdir(src):
        raise SystemExit(f"missing source dataset {src} (the driver-"
                         "generated sf0.1 fixture — not buildable)")
    for _, d in TIERS[1:]:
        if not os.path.isdir(d):
            raise SystemExit(
                f"missing replica dir {d} — build it with "
                f"tools/build_sf1.py {src} {d} <factor>")
    spark = get_session("scale100",
                        extra_conf={"spark.driver.memory": "32g"})
    queries = entrymod.queries()
    rows: dict[str, dict] = {}
    for name, sf_dir in TIERS:
        register_tables(spark, sf_dir)
        for q in QUERIES:
            fn = queries[q]
            t = timed(lambda: consume(fn(spark, sf_dir)))
            rows.setdefault(q, {})[name] = t
            _hygiene(spark)
            print(f"# {q} @ {name}: {t}s", file=sys.stderr)
        spark.catalog.clearCache()
    out = {}
    for q, t in rows.items():
        out[q] = {**t,
                  "ratio_10x": round(t["sf1"] / t["sf0.1"], 2)
                  if t["sf0.1"] else None,
                  "ratio_100x": round(t["sf10"] / t["sf0.1"], 2)
                  if t["sf0.1"] else None}
    path = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "SCALE100.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("| query | sf0.1 | 10x | 100x | r10 | r100 |")
    print("|---|---|---|---|---|---|")
    for q, v in out.items():
        print(f"| {q} | {v['sf0.1']} s | {v['sf1']} s | "
              f"{v['sf10']} s | {v['ratio_10x']}x | "
              f"{v['ratio_100x']}x |")


if __name__ == "__main__":
    main()
