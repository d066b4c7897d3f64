"""Stream-stream interval join: batch equivalence and a real streaming
run with bounded state."""

from pyspark.sql import functions as F

from pydin_spark import load_table
from pydin_spark.streaming import interval_join


def test_interval_join_batch_semantics(spark, views):
    events = spark.table("events")
    purchases = events.where("event_type = 'purchase'") \
        .select("user_id", "ts", "event_id", "value")
    clicks = events.where("event_type = 'click'") \
        .select("user_id", "ts", "event_id")
    out = interval_join(purchases, clicks, within="30 minutes")
    n = out.count()
    expected = purchases.alias("p").join(
        clicks.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") <= F.col("p.ts"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 30 MINUTES"))
    ).count()
    assert n == expected > 0
    # range bound holds on every row
    bad = out.where(
        (F.col("r_ts") > F.col("l_ts"))
        | (F.col("r_ts") < F.col("l_ts") - F.expr("INTERVAL 30 MINUTES")))
    assert bad.count() == 0


def test_interval_join_streaming(spark, views, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    def stream():
        return spark.readStream.schema(schema).parquet(src)

    purchases = stream().where("event_type = 'purchase'") \
        .select("user_id", "ts", "event_id")
    clicks = stream().where("event_type = 'click'") \
        .select("user_id", "ts", "event_id")
    joined = interval_join(purchases, clicks, within="30 minutes")
    q = (joined.writeStream.format("memory").queryName("ij_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) FROM ij_out").first()[0]
    batch_purchases = events.where("event_type = 'purchase'") \
        .select("user_id", "ts", "event_id")
    batch_clicks = events.where("event_type = 'click'") \
        .select("user_id", "ts", "event_id")
    expected = interval_join(batch_purchases, batch_clicks,
                             within="30 minutes").count()
    assert got == expected
