"""Regression tests for the round-1 adversarial-review findings."""

import pytest
from pyspark.sql import functions as F

from pydin_spark import (CSV, JSON, XML, ErrorLimitExceeded, FileManager,
                         Parquet, Pipeline, Select, SQL)


def test_diamond_graph_join_step_runs_once(spark, views, tmp_path):
    """A node fed by two branches must compile to ONE step with both
    upstreams, not one step per incoming edge."""
    src = Select(text="SELECT * FROM region")
    a = Parquet(file_name="a.parquet", path=str(tmp_path))
    b = Parquet(file_name="b.parquet", path=str(tmp_path))
    closing = SQL(text="SELECT 1 AS done")
    p = Pipeline(src, [a, b], closing, spark=spark)
    sql_steps = [s for s in p.steps if s.step_type == "EX"]
    assert len(sql_steps) == 1
    assert len(sql_steps[0].upstream) == 2
    p.run()
    assert p.status == "D"


def test_xml_recycle_preserves_other_runs(spark, views, tmp_path):
    sink = XML(file_name="r.xml", path=str(tmp_path))
    sink.pipeline = None
    df1 = spark.sql("SELECT r_regionkey FROM region") \
        .withColumn("pd_process_id", F.lit(1))
    df2 = spark.sql("SELECT r_regionkey FROM region LIMIT 2") \
        .withColumn("pd_process_id", F.lit(2))
    sink.load(df1)
    sink.load(df2)
    sink.recycle("pd_process_id", 1)
    back = XML(file_name="r.xml", path=str(tmp_path)).extract()
    assert back.count() == 2
    assert back.where("pd_process_id = '1'").count() == 0


def test_parquet_single_file_append_rejected():
    with pytest.raises(ValueError, match="byte-concatenable"):
        Parquet(file_name="x.parquet", path="/tmp", single_file=True)
    Parquet(file_name="x.parquet", path="/tmp", single_file=True,
            mode="overwrite")  # allowed


def test_json_directory_roundtrip(spark, views, tmp_path):
    sink = JSON(file_name="dirsink", path=str(tmp_path))
    sink.pipeline = None
    sink.load(spark.sql("SELECT n_nationkey, n_name FROM nation"))
    back = JSON(file_name="dirsink", path=str(tmp_path)).extract()
    assert back.count() == 25          # JSON-lines parts parsed per line


def test_csv_error_limit_with_inferred_schema(spark, tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("a;b\n1;2\n3;4\nbroken;x;y;z;5\n9;10\n")
    src = CSV(file_name="bad.csv", path=str(tmp_path), delimiter=";")
    dst = Parquet(file_name="out.parquet", path=str(tmp_path))
    with pytest.raises(ErrorLimitExceeded):
        Pipeline(src, dst, spark=spark, error_limit=1).run()
    p = Pipeline(CSV(file_name="bad.csv", path=str(tmp_path), delimiter=";"),
                 Parquet(file_name="ok.parquet", path=str(tmp_path)),
                 spark=spark, error_limit=10).run()
    assert p.records_error == 1
    assert spark.read.parquet(str(tmp_path / "ok.parquet")).count() == 3


def test_filemanager_move_without_destination_rejected(tmp_path):
    (tmp_path / "keep.txt").write_text("precious")
    with pytest.raises(ValueError, match="requires a destination"):
        FileManager(path=str(tmp_path), mask=r"\.txt$",
                    action="move").execute()
    assert (tmp_path / "keep.txt").exists()


def test_select_format_survives_literal_braces(spark, views):
    model = Select(text="SELECT '{' AS brace, r_regionkey FROM region")
    assert model.extract().count() == 5


def test_model_rejects_unknown_kwargs():
    import datetime
    from pydin_spark import Day
    with pytest.raises(TypeError, match="Pipeline"):
        Select(text="SELECT 1", date_field="ts",
               date=Day(datetime.datetime(2024, 1, 2)))
