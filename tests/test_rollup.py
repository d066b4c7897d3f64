"""Continuous rollup: incremental refresh must equal full recompute."""

import pytest
from pyspark.sql import functions as F

from pydin_spark import load_table
from pydin_spark.operators.rollup import ContinuousRollup, rollup_aggregate


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _canon(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


def test_incremental_refresh_equals_full_recompute(spark, events,
                                                   tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rollup") / "hourly")
    cut = events.selectExpr("percentile(event_id, 0.5) AS c").first()["c"]
    first_half = events.where(F.col("event_id") <= cut)

    r = ContinuousRollup(path, bucket="1 hour")
    r.refresh(first_half)           # initial build from the first half
    out = r.refresh(events)         # fold in the rest

    full = rollup_aggregate(events, bucket="1 hour")
    assert _canon(out) == _canon(full)


def test_refresh_is_idempotent(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rollup") / "hourly")
    r = ContinuousRollup(path, bucket="1 hour")
    a = _canon(r.refresh(events))
    b = _canon(r.refresh(events))
    assert a == b


def test_lateness_window_recomputes_older_buckets(spark,
                                                  tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rollup") / "hourly")
    base = spark.createDataFrame(
        [(1, "2024-01-01 10:15:00", "click", 1.0),
         (2, "2024-01-01 11:20:00", "click", 2.0)],
        "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = ContinuousRollup(path, bucket="1 hour", lateness=1)
    r.refresh(base)

    # a late event for the 10:00 bucket (one bucket behind the
    # high-water mark) must be picked up because lateness=1
    late = base.union(spark.createDataFrame(
        [(3, "2024-01-01 10:45:00", "click", 4.0)],
        "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp")))
    out = {str(row["bucket_start"]): (row["n_events"], row["total_value"])
           for row in r.refresh(late).collect()}
    assert out["2024-01-01 10:00:00"] == (2, 5.0)
    assert out["2024-01-01 11:00:00"] == (1, 2.0)

    # with lateness=0 the closed 10:00 bucket would have been immutable
    path2 = str(tmp_path_factory.mktemp("rollup") / "strict")
    r2 = ContinuousRollup(path2, bucket="1 hour", lateness=0)
    r2.refresh(base)
    out2 = {str(row["bucket_start"]): row["n_events"]
            for row in r2.refresh(late).collect()}
    assert out2["2024-01-01 10:00:00"] == 1
