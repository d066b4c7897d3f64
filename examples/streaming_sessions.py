"""Streaming sessionization — Structured Streaming over event data.

Run:  python examples/streaming_sessions.py [work_dir]

Stages the events table as a parquet stream source, runs session
windows + stateful running totals, and lands results through the
foreachBatch bridge into a batch Parquet sink model.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pydin_spark import Parquet, get_session, load_table
from pydin_spark.streaming import session_aggregate, write_foreach_batch
from pydin_spark.streaming.stateful import running_totals

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_session("streaming-sessions", master="local[4]")
    events = load_table(spark, SF_DIR, "events")
    src = f"{work}/stream_src"
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)

    sessions = session_aggregate(stream, gap="30 minutes",
                                 watermark="5 minutes")
    sink = Parquet(file_name="sessions.parquet", path=work)
    # session windows only support append mode (closed sessions emit
    # once the watermark passes)
    q1 = write_foreach_batch(sessions, sink, checkpoint=f"{work}/ck1",
                             output_mode="append")
    q1.awaitTermination(120)

    totals = running_totals(stream)
    sink2 = Parquet(file_name="totals.parquet", path=work)
    q2 = write_foreach_batch(totals, sink2, checkpoint=f"{work}/ck2")
    q2.awaitTermination(120)

    out = spark.read.parquet(f"{work}/sessions.parquet")
    print("sessions:", out.count())
    out.orderBy("user_id", "session_start").show(5, truncate=False)
    print("user totals:",
          spark.read.parquet(f"{work}/totals.parquet").count())


if __name__ == "__main__":
    main()
