"""Lakehouse layout job: Z-order clustering + file-stats data
skipping end-to-end — the nightly maintenance that turns a 100 TB
events table from "every dashboard query scans everything" into
"point queries open three files".

  1. LAYOUT: ``zorder_write`` clusters events on (user_id, ts) —
     one min/max aggregate + one range shuffle, the whole job cost.
  2. INDEX: ``file_stats`` collects per-file min/max in ONE
     column-pruned scan; the result is files-count-sized.
  3. SERVE: ``read_skipping`` answers a (user band × time band)
     rectangle opening only overlapping files, exact residual filter
     on top — the result is IDENTICAL to a full scan (oracle-gated
     as ``layout_skip_read``), at a fraction of the I/O.
  4. VERIFY: ``table_fingerprint`` proves the relaid table holds
     exactly the source's content — the order-independent mergeable
     fingerprint matches before/after the rewrite (and would match
     shard-by-shard on a sharded export).

Usage: python examples/lakehouse_layout.py [sf_dir]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from pydin_spark import get_session, register_tables  # noqa: E402
from pydin_spark.functions.maintenance import (  # noqa: E402
    file_stats, prune_files, read_skipping, zorder_write)
from pydin_spark.operators.curation import table_fingerprint  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("lakehouse-layout")
    register_tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_layout_") + "/events_z"

    ev = (spark.table("events")
          .select("event_id", "user_id",
                  F.col("ts").cast("long").alias("ts_sec"), "value"))
    n = ev.count()
    print(f"# events: {n} rows @ {os.path.basename(sf_dir)}")

    # 1. the layout job
    t0 = time.time()
    n_files = max(8, n // 25_000)
    zorder_write(ev, path, ["user_id", "ts_sec"], n_files=n_files)
    print(f"# z-ordered into {n_files} files: {time.time() - t0:.1f}s")

    # 2. the stats index (files-count-sized; persist it in production)
    t0 = time.time()
    stats = file_stats(spark, path, ["user_id", "ts_sec"]).cache()
    stats.count()
    print(f"# stats index built: {time.time() - t0:.1f}s")

    # 3. a dashboard rectangle: a user band x a 3-day window
    b = ev.agg(F.min("user_id"), F.max("user_id"),
               F.min("ts_sec"), F.max("ts_sec")).first()
    u0 = b[0] + (b[1] - b[0]) // 2
    t0_sec = b[2] + (b[3] - b[2]) // 2
    ranges = {"user_id": (u0, u0 + max(1, (b[1] - b[0]) // 20)),
              "ts_sec": (t0_sec, t0_sec + 3 * 86400)}
    kept = prune_files(stats, ranges)
    t0 = time.time()
    got = read_skipping(spark, path, stats, ranges)
    agg = got.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("value").alias("s")).first()
    print(f"# skipping read: {len(kept)}/{n_files} files opened, "
          f"{agg['n']} rows in {time.time() - t0:.1f}s")
    full = ev.where(
        (F.col("user_id").between(*ranges["user_id"]))
        & (F.col("ts_sec").between(*ranges["ts_sec"]))).count()
    assert agg["n"] == full, "skipping must not change the answer"
    print(f"# verified: {full} rows == full-scan filter")

    # 4. content fingerprint: the relaid table IS the source table
    cols = ["event_id", "user_id", "ts_sec", "value"]
    fp_src = table_fingerprint(ev, cols).first()
    fp_dst = table_fingerprint(spark.read.parquet(path), cols).first()
    assert (fp_src["n_rows"], fp_src["fp"]) == \
        (fp_dst["n_rows"], fp_dst["fp"]), "rewrite lost/changed rows"
    print(f"# fingerprint match: n={fp_src['n_rows']} "
          f"fp={fp_src['fp']} (order-independent)")


if __name__ == "__main__":
    main()
