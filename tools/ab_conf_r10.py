"""A/B a session-conf override over a set of entry queries.

One PROCESS per variant (fresh JVM — codegen/JIT state can't leak
between arms): run this script twice, once with $AB_CONF set
(e.g. "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m")
and once without. Times each query with the noop sink (guide §1.4),
reps via $SPARK_GRAFT_REPS (default 3) after one warm-up, prints one
JSON line. Row-count of every query is printed too so arms can be
checked for identical results at a glance.

Usage: [AB_CONF=k=v[,k=v...]] python tools/ab_conf_r10.py sf_dir q1 q2 ...
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
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    conf = {}
    for kv in filter(None, os.environ.get("AB_CONF", "").split(",")):
        k, _, v = kv.partition("=")
        conf[k.strip()] = v.strip()
    conf["spark.driver.memory"] = "32g"
    spark = get_session("ab-conf-r10", extra_conf=conf)
    qs = entrymod.queries()
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        df = qs[name](spark, sf_dir)
        rows = df.count()
        df.write.format("noop").mode("overwrite").save()
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
                         "raw": samples, "rows": rows}
    # calibration probe so arms measured in different host windows
    # are readable
    t0 = time.time()
    spark.range(0, 10_000_000, 1, 32).selectExpr(
        "sum(id * 2) AS s", "count(*) AS n").collect()
    cal = round(time.time() - t0, 3)
    print(json.dumps({"conf": conf, "calibration": cal,
                      "results": results}))


if __name__ == "__main__":
    main()
