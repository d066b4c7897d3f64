"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall seconds across the headline query set (each
executed once, materialized via count so driver transfer costs don't
dominate the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from pydin_spark import get_session  # noqa: E402

#: headline set: the scan/join/agg/window relational core + the heavier
#: LLM-data operators — the ones whose plans matter at 100 TB
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q_window_top_orders",
    "q_sessionize",
    "q_tumbling_hour",
    "q_rollup_status",
    "q_asof_join",
    "q_watermark_orders",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_quality",
    "text_language_id",
    "sim_topk_bruteforce",
    "sim_cosine_dup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_session("bench", extra_conf={"spark.driver.memory": "90g"})
    # warm up: register views + trigger codegen/JVM warmup outside timings
    from pydin_spark import register_tables
    register_tables(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM region").collect()
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        # inter-query hygiene (untimed): operators persist intermediates
        # (shingle frames, LSH buckets) that are garbage once the query
        # materialized — leaving them cached slowed LATER queries up to
        # 10x (measured; see PERF.md round-2 notes). Each query is
        # measured from parquet, never from a predecessor's cache.
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
