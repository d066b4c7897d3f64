"""Lakehouse maintenance tests: partition pruning on date-partitioned
layouts, small-file compaction."""

from pyspark.sql import functions as F

from pydin_spark import load_table
from pydin_spark.functions.maintenance import (compact, dataset_stats,
                                               write_partitioned)


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_write_partitioned_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, "o_orderdate", granularity="month")
    scan = (spark.read.parquet(path)
            .where(F.col("pd_date") == "1996-03"))
    plan = plan_of(scan)
    assert "PartitionFilters" in plan
    assert "pd_date" in plan.split("PartitionFilters")[1].splitlines()[0]
    expected = orders.where(
        F.date_format("o_orderdate", "yyyy-MM") == "1996-03").count()
    assert scan.count() == expected > 0


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "many_files")
    docs.repartition(40).write.parquet(path)   # fragment on purpose
    before = dataset_stats(spark, path)
    assert before["files"] == 40
    result = compact(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert result["after"]["files"] < before["files"]
    assert spark.read.parquet(path).count() == docs.count()
