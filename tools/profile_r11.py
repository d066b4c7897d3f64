"""Round-10 optimization profiler: isolate headline queries with the
noop sink (guide §1.4) and capture ``explain("formatted")``.

Usage:
  python tools/profile_r11.py plans [sf_dir] [query ...]
      Write plans/r11/<query>_<tag>.txt for each query (tag via
      $PROFILE_TAG, default "before").
  python tools/profile_r11.py time [sf_dir] [query ...]
      Time each query with the noop sink, reps via $SPARK_GRAFT_REPS
      (default 3), after one warm-up. Prints per-rep + median JSON.

Unlike bench.py (the driver contract, count()-materialized), this
tool materializes every column via the noop sink so the computation —
not the sink or column pruning — is what's timed.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pydin_spark import get_session  # noqa: E402


def _hygiene(spark):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.3)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    qs = entrymod.queries()
    if not names:
        import bench
        names = list(bench.HEADLINE)
    spark = get_session("profile-r11",
                        extra_conf={"spark.driver.memory": "32g"})
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    tag = os.environ.get("PROFILE_TAG", "before")

    if mode == "plans":
        for name in names:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)")
        return

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        qs[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        _hygiene(spark)
        samples = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            _hygiene(spark)
        results[name] = {"median": round(statistics.median(samples), 3),
                         "raw": samples}
        print(f"# {name}: {results[name]}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
