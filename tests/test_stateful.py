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


def test_streaming_heavy_hitters_matches_batch(spark, views, sf_dir,
                                               tmp_path):
    """Stream ≡ batch for the stateful Misra-Gries: after the stream
    drains, the latest per-group top-k equals the batch operator's
    exact answer (capacity above distinct -> zero error)."""
    from pydin_spark.streaming.stateful import streaming_heavy_hitters

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "hh_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (streaming_heavy_hitters(stream, "user_id", k=5, capacity=4096,
                                 group_col="event_type")
         .writeStream.format("memory").queryName("hh_out")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "hh_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # keep only each group's final emission (multiple triggers emit
    # successively larger prefixes of the stream)
    rows = spark.sql("SELECT * FROM hh_out").collect()
    got = {}
    for r in rows:
        got.setdefault(r["grp"], {})[r["rank"]] = (r["item"],
                                                   r["est_count"],
                                                   r["err_ub"])
    want_rows = streaming_heavy_hitters(events, "user_id", k=5,
                                        capacity=4096,
                                        group_col="event_type").collect()
    want = {}
    for r in want_rows:
        want.setdefault(r["grp"], {})[r["rank"]] = (r["item"],
                                                    r["est_count"],
                                                    r["err_ub"])
    assert got == want
    assert all(v[2] == 0 for g in want.values() for v in g.values())


def test_streaming_heavy_hitters_resumes_from_checkpoint(spark, views,
                                                         sf_dir,
                                                         tmp_path):
    """The MG state must survive a full stop/restart of the stream:
    run over half the history, stop, append the rest, run a NEW query
    from the same checkpoint — the resumed top-k equals the batch
    answer over everything (state carried, not recomputed)."""
    from pyspark.sql import functions as F

    from pydin_spark.streaming.stateful import streaming_heavy_hitters

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    events.where("event_id % 2 = 0").write.parquet(src)
    schema = spark.read.parquet(src).schema

    def sink(batch_df, batch_id):
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    def run_pass():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (streaming_heavy_hitters(stream, "user_id", k=3,
                                     capacity=4096,
                                     group_col="event_type")
             .writeStream.foreachBatch(sink).outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_pass()
    events.where("event_id % 2 = 1").write.mode("append").parquet(src)
    spark.catalog.refreshByPath(src)
    run_pass()
    out = spark.read.parquet(out_dir)
    last = out.agg(F.max("batch_id")).collect()[0][0]
    got = {(r["grp"], r["rank"]): (r["item"], r["est_count"], r["err_ub"])
           for r in out.where(F.col("batch_id") == last).collect()}
    want = {(r["grp"], r["rank"]): (r["item"], r["est_count"], r["err_ub"])
            for r in streaming_heavy_hitters(
                events, "user_id", k=3, capacity=4096,
                group_col="event_type").collect()}
    assert got == want
