"""Full-inventory scaling replay: every headline + dedup/ANN/stored
operator timed at sf0.1 AND at the 10x replica, every round.

This institutionalizes the per-round scale evidence the 100 TB claims
rest on (VERDICT r4 top item): correctness gates prove the PLANS are
right at small SF; this replay proves the plans' COST tracks data the
way the design says it should — scan-shaped work ~linearly, candidate-
bounded work with pair density, state-backed work with the batch.

Usage:  python tools/scale_bench.py [sf01_dir] [sf1_dir]

- Builds the sf1 replica via tools/build_sf1.py semantics if the
  directory is missing (keys shifted per replica, document text
  permuted so replicas are near-dup-disjoint, embeddings rotated —
  see build_sf1.py's docstring for why verbatim copies would measure
  an adversarial workload instead of corpus growth).
- Each query is the SAME ``__spark_entry__.queries()`` callable the
  correctness gate verifies — no separate benchmark-only code path.
- Methodology matches bench.py: one untimed warm-up then the median
  of REPS timed runs, cache-clear + GC hygiene between samples.
- Writes ``SCALE.json`` at the repo root: per-query small/big medians
  and the ratio. ``tests/test_scale_regression.py`` asserts the
  ratios against the per-class budgets below, so a scale regression
  fails the suite on the next pytest run after a replay.

Budget classes (the assertion thresholds, mirrored in the test):
- default: ratio <= 4.0 at 10x data. Most operators here are
  candidate-bounded or aggregate to tiny results; at these absolute
  sizes fixed per-stage overheads amortize and the ratio sits ~1-2.
- LINEAR_OK: full-scan-shaped queries whose correct asymptote IS the
  data volume (fact-table scans, whole-corpus rewrites). Budget 12x —
  linear plus noise headroom; a superlinear blow-up still fails.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE, _hygiene  # noqa: E402
from pydin_spark import get_session  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

#: the dedup/ANN/stored-state family beyond bench.py's HEADLINE —
#: everything whose 100 TB story is a specific shuffle/candidate shape
EXTRA = [
    "dedup_simhash",
    "dedup_survivors",
    "dedup_clusters",
    "dedup_incremental",
    "dedup_semantic",
    "dedup_semantic_graph",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_knn_graph",
    "sim_knn_graph_ivf",
    "sim_mutual_knn",
    "rollup_bloom_filter",
    "curation_bloom_decontam",
    "curation_profile",
    "curation_linear_scorer",
    "text_line_dedup",
    "text_line_dedup_incr",
    "text_normalize",
    "rollup_bloom_stored",
]

#: full-scan-shaped: cost correctly tracks data volume (see module doc)
LINEAR_OK = {
    "q1_pricing_summary",       # lineitem scan + partial agg
    "q3_shipping_priority",     # lineitem scan dominates
    "q5_local_supplier_volume",  # fact scan, all dims broadcast
    "q6_forecast_revenue",      # pure lineitem scan
    "q_sessionize",             # events scan + one user shuffle
    "q_tumbling_hour",          # events scan
    "q_rollup_status",          # orders scan
    "q_asof_join",              # events scan + one key shuffle
    "q_window_top_orders",      # orders scan + one key shuffle
    "text_quality",             # whole-corpus column pass
    "text_language_id",         # whole-corpus column pass
    "text_normalize",           # whole-corpus Arrow rewrite
    "text_line_dedup",          # whole-corpus explode + regroup
    "text_line_dedup_incr",     # same, via state
    "curation_profile",         # one-pass scan aggregate
    "curation_linear_scorer",   # whole-corpus n-gram scoring scan
    "rollup_bloom_filter",      # vocab explode + probe scan
    "curation_bloom_decontam",  # corpus n-gram scan vs broadcast
    "rollup_bloom_stored",      # events scan per refresh
    "dedup_exact",              # corpus scan + one 32-byte-key shuffle
    "sim_knn_graph",            # O(n^2/B) by construction: exact tier
    "sim_mutual_knn",           # built on the exact graph here
    "sim_cosine_dup",           # block-matrix candidates grow ~n^2/B
    "dedup_ngram_jaccard",      # posting lists grow with corpus+dups
    "dedup_minhash_lsh",        # signatures linear; verify with pairs
}

DEFAULT_BUDGET = 4.0
LINEAR_BUDGET = 12.0


def timed(fn) -> float:
    fn()  # warm-up: plan compile, codegen, JIT
    samples = []
    for _ in range(REPS):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def run_suite(spark, sf_dir: str, names) -> dict[str, float]:
    from pydin_spark import register_tables
    register_tables(spark, sf_dir)
    queries = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        out[name] = timed(lambda: fn(spark, sf_dir).count())
        _hygiene(spark)
        print(f"#   {name} @ {os.path.basename(sf_dir)}: {out[name]}s",
              file=sys.stderr)
    return out


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    if not os.path.isdir(sf1):
        print(f"# building 10x replica at {sf1}", file=sys.stderr)
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "build_sf1.py"), sf01, sf1],
                       check=True)
    names = HEADLINE + [q for q in EXTRA if q not in HEADLINE]
    spark = get_session("scale-bench",
                        extra_conf={"spark.driver.memory": "32g"})
    print(f"# suite: {len(names)} queries", file=sys.stderr)
    small = run_suite(spark, sf01, names)
    spark.catalog.clearCache()
    big = run_suite(spark, sf1, names)
    rows = {}
    for k in names:
        ratio = round(big[k] / small[k], 2) if small[k] else None
        rows[k] = {"small_sec": small[k], "big_sec": big[k],
                   "ratio": ratio,
                   "budget": LINEAR_BUDGET if k in LINEAR_OK
                   else DEFAULT_BUDGET}
    artifact = {"small_dir": sf01, "big_dir": sf1, "factor": 10,
                "reps": REPS, "queries": rows}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALE.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print("\n| query | sf0.1 | sf1 (10x) | ratio | budget |")
    print("|---|---|---|---|---|")
    bad = []
    for k in names:
        r = rows[k]
        mark = " **OVER**" if r["ratio"] and r["ratio"] > r["budget"] \
            else ""
        if mark:
            bad.append(k)
        print(f"| {k} | {r['small_sec']:.2f} s | {r['big_sec']:.2f} s "
              f"| {r['ratio']}x | {r['budget']}x{mark} |")
    print(f"\n{len(bad)} over budget" + (f": {bad}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
