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


def test_csv_columns_keep_error_budget(spark, tmp_path):
    """Explicit columns= must not drop _corrupt_record — the PERMISSIVE
    error budget has to keep counting malformed rows."""
    from pydin_spark import CSV, ErrorLimitExceeded, Parquet, Pipeline
    import pytest
    path = tmp_path / "dirty.csv"
    path.write_text("k;v\n1;a\n\"broken;unclosed\nquote;2;3;4\n2;b\n")
    src = CSV(file_name="dirty.csv", path=str(tmp_path), head=True,
              columns=["key", "val"])
    with pytest.raises(ErrorLimitExceeded):
        Pipeline(src, Parquet(file_name="out.parquet",
                              path=str(tmp_path / "out")),
                 spark=spark, error_limit=1).run()
    # with budget headroom the load succeeds, renamed and scrubbed
    src2 = CSV(file_name="dirty.csv", path=str(tmp_path), head=True,
               columns=["key", "val"])
    p = Pipeline(src2, Parquet(file_name="ok.parquet",
                               path=str(tmp_path / "ok")),
                 spark=spark, error_limit=10).run()
    assert p.records_error >= 1
    out = spark.read.parquet(str(tmp_path / "ok" / "ok.parquet"))
    assert set(out.columns) == {"key", "val"}


def test_parquet_recycle_null_partition(spark, tmp_path):
    """Recycling a run whose rows all sit in a NULL partition must
    delete Spark's __HIVE_DEFAULT_PARTITION__ directory, not a phantom
    'c=None' path."""
    import os
    from pydin_spark import Parquet
    base = str(tmp_path)
    df = spark.createDataFrame(
        [(1, None, 100), (2, "web", 100), (3, None, 200)],
        "id long, channel string, pd_process_id long")
    sink = Parquet(file_name="nulled", path=base,
                   partition_by=["channel"], mode="append")
    sink.pipeline = None
    sink._write(df)
    null_dir = os.path.join(sink.resolved_path,
                            "channel=__HIVE_DEFAULT_PARTITION__")
    assert os.path.isdir(null_dir)
    sink.recycle("pd_process_id", 200)
    spark.catalog.refreshByPath(sink.resolved_path)
    left = spark.read.parquet(sink.resolved_path)
    assert left.where("pd_process_id = 200").count() == 0
    assert left.count() == 2           # run 100 rows survive, incl. NULL
    sink.recycle("pd_process_id", 100)
    # no rows left at all => both partition dirs gone, incl. the NULL one
    assert not os.path.isdir(null_dir)


def test_salted_join_rejects_small_side_preserving():
    import pytest
    from pydin_spark.functions.skew import salted_join
    with pytest.raises(ValueError, match="right/full"):
        salted_join(None, None, "k", how="right")
    with pytest.raises(ValueError, match="right/full"):
        salted_join(None, None, "k", how="full")
