"""Catch the 30-80s stall in the act: run ngram_jaccard reps; a
watchdog thread jstacks the JVM if a rep exceeds THRESH seconds.
Usage: python tools/spike_catch_r10.py [sf_dir] [reps]"""
from __future__ import annotations

import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydin_spark import get_session, register_tables  # noqa: E402
from pydin_spark.operators import dedup  # noqa: E402

THRESH = 12.0


def jvm_pid():
    out = subprocess.run(["pgrep", "-f", "pyspark-shell"],
                         capture_output=True, text=True)
    pids = [p for p in out.stdout.split() if p.strip()]
    return pids[0] if pids else None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_session("spike-catch",
                        extra_conf={"spark.driver.memory": "32g"})
    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    pid = jvm_pid()
    print(f"jvm pid: {pid}", flush=True)

    for r in range(reps):
        done = threading.Event()

        def watchdog(rep=r):
            if not done.wait(THRESH) and pid:
                import faulthandler
                with open(f"/tmp/spike_pystack_rep{rep}.txt", "w") as f:
                    faulthandler.dump_traceback(file=f)
                for i in range(2):
                    with open(f"/tmp/spike_jstack_rep{rep}_{i}.txt",
                              "w") as f:
                        subprocess.run(["jstack", pid], stdout=f,
                                       stderr=subprocess.STDOUT)
                    # also sample once more 3s later
                    time.sleep(3)
                with open(f"/tmp/spike_top_rep{rep}.txt", "w") as f:
                    subprocess.run(
                        ["top", "-b", "-n", "1", "-H", "-p", pid],
                        stdout=f, stderr=subprocess.STDOUT)

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        n = dedup.ngram_jaccard_pairs(docs, threshold=0.2,
                                      max_shingle_freq=100).count()
        dt = time.time() - t0
        done.set()
        print(f"rep{r}: {dt:.3f}s rows={n}", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
