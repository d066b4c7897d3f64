"""Skew handling demonstrated on a genuinely HOT-KEY fixture (one key
owning ~20% of the big side) — the case VERDICT r4 flagged as
untested: salted_join and AQE skew-split existed but were only ever
exercised on uniform fixtures.

Timing evidence lives in tools/skew_demo.py (PERF.md); these tests pin
the STRUCTURE deterministically: AQE marks and splits the skewed
partition, and salting provably spreads the hot key across reducers
while preserving the exact join result."""

import pytest
from pyspark.sql import functions as F

from pydin_spark.functions.skew import salted_join, top_keys

HOT = 7
N_BIG = 200_000
N_KEYS = 1_000


@pytest.fixture()
def skewed(spark):
    """Big side: 20% of rows on key HOT, the rest uniform over
    N_KEYS; small side: one row per key (too big to broadcast once
    the threshold is disabled)."""
    big = spark.range(N_BIG).select(
        F.when(F.col("id") % 5 == 0, F.lit(HOT))
        .otherwise(F.col("id") % N_KEYS).alias("k"),
        F.col("id").alias("v"))
    small = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    return big, small


def _restore(spark, saved):
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_aqe_skew_split_marks_the_hot_partition(spark, skewed):
    """With broadcast disabled (forcing the shuffle join AQE skew
    handling applies to), the executed plan must mark the join
    skew-handled — the runtime re-plan the engine's session defaults
    rely on for moderate skew at 100 TB."""
    big, small = skewed
    keys = ["spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin."
            "skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"]
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set(keys[0], "-1")
        spark.conf.set(keys[1], "true")
        # the test fixture is KB-sized; lower the byte thresholds so
        # the same relative skew (hot partition >> median) triggers
        # the split exactly as a TB-sized hot key would in production
        spark.conf.set(keys[2], "16KB")
        spark.conf.set(keys[3], "16KB")
        spark.conf.set(keys[4], "2")
        joined = big.join(small, "k")
        # materialize THIS DataFrame (count() would execute a separate
        # aggregate plan, leaving joined's own AQE plan non-final)
        n = len(joined.collect())
        assert n == N_BIG  # every big row matches exactly one small
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        _restore(spark, saved)


def test_salted_join_spreads_hot_key_and_preserves_result(
        spark, skewed):
    """salted_join on the hot fixture: (a) result row-identical to
    the plain join; (b) the hot key's rows actually spread across
    all `salt` buckets (each bucket within 2x of fair share) — the
    property that turns one overwhelmed reducer into `salt` busy
    ones."""
    big, small = skewed
    salt = 8
    assert top_keys(big, "k", n=1) == [HOT]
    plain = big.join(small, "k")
    salted = salted_join(big, small, on="k", salt=salt)
    assert salted.columns == plain.columns
    # exact multiset equality via per-row counts
    diff = (plain.groupBy("k", "v", "w").count()
            .exceptAll(salted.groupBy("k", "v", "w").count()))
    assert diff.count() == 0
    # reproduce the salting rule to inspect the hot key's spread
    hot_per_bucket = (
        big.where(F.col("k") == HOT)
        .withColumn("__salt", F.pmod(
            F.xxhash64(F.monotonically_increasing_id()),
            F.lit(salt)))
        .groupBy("__salt").count().collect())
    assert len(hot_per_bucket) == salt
    fair = (N_BIG // 5) / salt
    assert max(r["count"] for r in hot_per_bucket) < 2 * fair
