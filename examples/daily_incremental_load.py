"""Daily incremental load — the reference's bread-and-butter job shape.

Run:  python examples/daily_incremental_load.py [work_dir]

Demonstrates: business-date window (inclusive BETWEEN from the run's
calendar day), incremental watermark (strict > max loaded key), lineage
key injection, idempotent recycle re-run.
"""

import datetime as dt
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pydin_spark import (Day, Pipeline, Select, Table, get_session,
                         register_tables)
from pydin_spark.sources import Filesystem, SourceRegistry

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_session("daily-load", master="local[4]")
    register_tables(spark, SF_DIR)
    reg = SourceRegistry(autoload=False)
    reg.register(Filesystem("lake", work))

    def build(process_id: int):
        return Pipeline(
            Select(text="SELECT event_id, ts, user_id, event_type, value "
                        "FROM events",
                   date_field="ts", value_field="event_id"),
            Table(source_name="lake", schema_name="mart",
                  table_name="events_daily", value_field="event_id",
                  key_field="process_id"),
            date=Day(dt.datetime(2024, 1, 2)), spark=spark, registry=reg,
            process_id=process_id)

    p1 = build(1001).run()
    print("run 1:", p1.summary()["steps"][0])

    # re-run for the same business date: recycle deletes run 1001's rows
    # first, so the load is idempotent
    p2 = build(1001).run(recycle=1001)
    out = spark.read.parquet(f"{work}/mart/events_daily")
    print("after recycle re-run:", out.count(), "rows",
          "(duplicates:", out.groupBy("event_id").count()
          .where("count > 1").count(), ")")


if __name__ == "__main__":
    main()
