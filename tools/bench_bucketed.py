"""Bucketed staging experiment: stage lineitem/orders hash-bucketed by
orderkey once, then run the join-heavy q3 shape bucket-joined — the
fact-fact join executes with NO exchange on either side (bucket
pruning replaces the shuffle), which at 100 TB amortizes the staging
shuffle across every downstream join on the same key.

Usage: python tools/bench_bucketed.py [sf_dir] [buckets]
Prints plan facts + a measured plain-vs-bucketed delta for PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydin_spark import get_session, register_tables  # noqa: E402
from pydin_spark.functions import explain_has  # noqa: E402

Q3 = """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(25,4))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, {orders}, {lineitem}
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
"""


def run_timed(spark, sql, reps=3):
    times = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        n = spark.sql(sql).count()
        times.append(time.time() - t0)
    return n, min(times)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_session("bucketed-bench",
                        extra_conf={"spark.driver.memory": "32g"})
    register_tables(spark, sf_dir)

    t0 = time.time()
    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {table}_b")
        (spark.table(table).write.mode("overwrite")
         .bucketBy(buckets, key).sortBy(key).saveAsTable(f"{table}_b"))
    stage_secs = time.time() - t0
    print(f"staging (bucketBy {buckets}, sorted): {stage_secs:.1f}s")

    plain_sql = Q3.format(orders="orders", lineitem="lineitem")
    bucket_sql = Q3.format(orders="orders_b", lineitem="lineitem_b")

    bdf = spark.sql(bucket_sql)
    bucketed_scan = explain_has(bdf, "Bucketed: true")
    # the l_orderkey = o_orderkey join must need no hash repartition:
    # no Exchange hashpartitioning on the join keys anywhere in the plan
    plan = bdf._sc._jvm.PythonSQLUtils.explainString(
        bdf._jdf.queryExecution(), "formatted")
    fact_exchange = ("hashpartitioning(l_orderkey" in plan
                     or "hashpartitioning(o_orderkey" in plan)
    print(f"plan: Bucketed: true present = {bucketed_scan}, "
          f"fact-join hashpartitioning exchange = {fact_exchange}")

    n_plain, t_plain = run_timed(spark, plain_sql)
    n_bucket, t_bucket = run_timed(spark, bucket_sql)
    assert n_plain == n_bucket, (n_plain, n_bucket)
    print(f"q3 plain:    {n_plain} rows, best of 3 = {t_plain:.2f}s")
    print(f"q3 bucketed: {n_bucket} rows, best of 3 = {t_bucket:.2f}s")
    print(f"delta: {t_plain / t_bucket:.2f}x "
          f"(staging amortizes after "
          f"~{stage_secs / max(t_plain - t_bucket, 1e-9):.0f} joins)")
    spark.stop()


if __name__ == "__main__":
    main()
