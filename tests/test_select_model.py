"""Select model details: schema discovery, variable interpolation,
column projection, SQL from file — reference models.py:755-936."""

import datetime as dt

from pydin_spark import Day, Pipeline, Select


def test_describe_discovers_schema_without_running(spark, views):
    model = Select(text="SELECT o_orderkey, o_totalprice FROM orders")
    schema = model.describe()
    assert [f.name for f in schema.fields] == ["o_orderkey", "o_totalprice"]


def test_variable_interpolation_calendar(spark, views):
    shell = Pipeline(date=Day(dt.datetime(2024, 1, 2)), spark=spark,
                     data={"limit_rows": 7})
    model = Select(text="SELECT event_id FROM events "
                        "WHERE ts >= TIMESTAMP '{calendar.start}' "
                        "LIMIT {vars.limit_rows}")
    model.pipeline = shell
    q = model.query
    assert "2024-01-02 00:00:00" in q and "LIMIT 7" in q
    assert model.extract().count() == 7


def test_explicit_columns_projection(spark, views):
    model = Select(text="SELECT * FROM customer",
                   columns=["c_custkey", "c_name"])
    df = model.extract()
    assert df.columns == ["c_custkey", "c_name"]


def test_sql_from_file(spark, views, tmp_path):
    f = tmp_path / "query.sql"
    f.write_text("SELECT r_regionkey FROM region")
    model = Select(path=str(f))
    assert model.extract().count() == 5
