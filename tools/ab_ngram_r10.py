"""A/B the ngram_jaccard regression: guard on vs guard off vs staged
timing breakdown. Usage: python tools/ab_ngram_r10.py [sf_dir] [reps]"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydin_spark import get_session, register_tables  # noqa: E402
from pydin_spark.operators import dedup  # noqa: E402


def hygiene(spark):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("ab-ngram", extra_conf={"spark.driver.memory": "32g"})
    register_tables(spark, sf_dir)
    docs = spark.table("documents")

    def run_guard_on():
        return dedup.ngram_jaccard_pairs(docs, threshold=0.2,
                                         max_shingle_freq=100).count()

    def run_guard_off():
        return dedup.ngram_jaccard_pairs(docs, threshold=0.2,
                                         max_shingle_freq=100,
                                         max_projected_pairs=None).count()

    # warm-up both once
    for fn in (run_guard_on, run_guard_off):
        fn(); hygiene(spark)
    for tag, fn in (("guard_on", run_guard_on),
                    ("guard_off", run_guard_off)):
        for r in range(reps):
            t0 = time.time()
            n = fn()
            print(f"{tag} rep{r}: {time.time()-t0:.3f}s rows={n}",
                  flush=True)
            hygiene(spark)


if __name__ == "__main__":
    main()
