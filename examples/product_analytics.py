"""Product analytics over the event stream — the dashboard-feeding
batch (engine extension composing the relational/rollup operators).

Run:  python examples/product_analytics.py [out_dir]

One nightly pass produces every table a product dashboard reads:
conversion funnel, daily cohort retention, top user journeys, a
gap-filled per-user activity series, frequent-user summaries served
from stored Misra-Gries state, and the continuous rollup the
time-series charts read. Every stage is a keyed aggregate/window —
the same plan shapes at 100 TB of events.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pydin_spark import get_session, load_table
from pydin_spark.operators.relational import (event_paths, fill_gaps_locf,
                                              funnel, retention_cohorts)
from pydin_spark.operators.rollup import ContinuousRollup, StoredHeavyHitters

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_session("product-analytics", master="local[8]")
    ev = load_table(spark, SF_DIR, "events")

    # 1. conversion funnel (first-completion, strictly-after chaining)
    fun = funnel(ev, ["view", "click", "purchase"])
    fun.write.mode("overwrite").parquet(f"{out}/funnel")

    # 2. daily cohort retention matrix
    retention_cohorts(ev, bucket="1 day") \
        .write.mode("overwrite").parquet(f"{out}/retention")

    # 3. top first-journeys
    event_paths(ev, max_len=5, k=20) \
        .write.mode("overwrite").parquet(f"{out}/paths")

    # 4. gap-filled per-user hourly activity (sparkline source)
    fill_gaps_locf(ev, bucket="1 hour") \
        .write.mode("overwrite").parquet(f"{out}/activity")

    # 5. stored state the INCREMENTAL nightly run refreshes instead of
    # rescanning history: hourly rollup + per-bucket heavy hitters
    roll = ContinuousRollup(f"{out}/rollup_hourly", bucket="1 hour",
                            distinct_col="user_id")
    roll.refresh(ev)
    hh = StoredHeavyHitters(f"{out}/hh_hourly", "user_id",
                            bucket="1 hour", group_cols=("event_type",))
    hh.refresh(ev)
    top = hh.serve(spark, k=5)          # global top users per type

    # 6. new-vs-returning from membership state: yesterday's StoredBloom
    # answers "seen before?" for today's events with a broadcast probe —
    # no join against the raw user history. Split on time to simulate
    # the two nightly runs.
    from pyspark.sql import functions as F

    from pydin_spark.operators.rollup import StoredBloom
    cut = ev.selectExpr(
        "percentile(unix_timestamp(ts), 0.5) AS c").first()["c"]
    seen = StoredBloom(f"{out}/seen_users", "user_id", bucket="1 day")
    seen.refresh(ev.where(F.unix_timestamp("ts") <= F.lit(cut)))
    today = ev.where(F.unix_timestamp("ts") > F.lit(cut))
    flagged = seen.contains(today.select("user_id").distinct(), "user_id")
    n_new = flagged.where("NOT maybe_seen").count()
    n_ret = flagged.where("maybe_seen").count()
    seen.refresh(ev)  # fold today in for tomorrow's run

    f = {r.step: (r.n_users, round(r.conversion, 3))
         for r in fun.collect()}
    print(f"funnel: {f}")
    print(f"retention rows: "
          f"{spark.read.parquet(f'{out}/retention').count()}; "
          f"paths: {spark.read.parquet(f'{out}/paths').count()}; "
          f"activity points: "
          f"{spark.read.parquet(f'{out}/activity').count()}")
    print(f"rollup buckets: {roll.read(spark).count()}; "
          f"heavy-hitter rows served: {top.count()}")
    print(f"second-half users: {n_new} new / {n_ret} returning "
          f"(membership from stored bloom, no history join)")
    print(f"outputs at {out}")


if __name__ == "__main__":
    main()
