"""Stateful streaming operator tests: batch/stream equivalence of
running totals and anomaly flagging via applyInPandasWithState."""

from pydin_spark import load_table
from pydin_spark.streaming.stateful import flag_anomalies, running_totals


def test_running_totals_stream_matches_batch(spark, views, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (running_totals(stream).writeStream
         .format("memory").queryName("rt_out")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6))
           for r in spark.sql("SELECT * FROM rt_out").collect()}
    exp = {r["user_id"]: (r["n_events"], round(r["total_value"], 6))
           for r in running_totals(events).collect()}
    assert got == exp


def test_flag_anomalies_batch_semantics(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [(1, i, base + dt.timedelta(minutes=i), 10.0) for i in range(6)]
    rows.append((1, 6, base + dt.timedelta(minutes=6), 100.0))  # spike
    rows.append((1, 7, base + dt.timedelta(minutes=7), 10.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")
    out = {r["event_id"]: r["is_anomaly"]
           for r in flag_anomalies(df).collect()}
    assert out[6] is True                     # 100 > 3×10 after warm-up
    assert all(not out[i] for i in range(6))  # warm-up never flags
    assert out[7] is False


def test_flag_anomalies_stream_matches_batch(spark, views, sf_dir, tmp_path):
    events = (load_table(spark, sf_dir, "events")
              .select("user_id", "event_id", "ts", "value"))
    src = str(tmp_path / "src2")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (flag_anomalies(stream).writeStream
         .format("memory").queryName("an_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["event_id"]: r["is_anomaly"]
           for r in spark.sql("SELECT * FROM an_out").collect()}
    exp = {r["event_id"]: r["is_anomaly"]
           for r in flag_anomalies(events).collect()}
    assert len(got) == len(exp)
    # all-batch-in-one-trigger means identical prior-state per event
    diffs = [k for k in exp if got[k] != exp[k]]
    assert diffs == []
