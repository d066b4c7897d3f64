"""Real JDBC Table/Select tests against embedded Derby (ships in Spark's
jars) — closes the RDBMS quadrant of SURVEY §2.1 with a live endpoint."""

import pytest
from pyspark.sql import functions as F

from pydin_spark import Pipeline, Select, Table
from pydin_spark.sources import Database, SourceRegistry

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc_registry(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    reg = SourceRegistry(autoload=False)
    reg.register(Database(
        "warehouse", url=f"jdbc:derby:{db_dir};create=true",
        driver=DERBY_DRIVER))
    return reg


def test_table_jdbc_write_read_roundtrip(spark, views, jdbc_registry):
    src_df = spark.table("region")
    sink = Table(source_name="warehouse", table_name="REGION_COPY")
    sink.pipeline = None
    reg_pipeline = Pipeline(
        Select(text="SELECT r_regionkey, r_name FROM region"),
        Table(source_name="warehouse", table_name="REGION_COPY"),
        spark=spark, registry=jdbc_registry)
    reg_pipeline.run()
    back = Table(source_name="warehouse", table_name="REGION_COPY")
    back.pipeline = reg_pipeline
    out = back.extract()
    assert out.count() == src_df.count()
    assert {r["R_NAME"] if "R_NAME" in out.columns else r["r_name"]
            for r in out.collect()} == \
        {r["r_name"] for r in src_df.collect()}


def test_jdbc_watermark_and_query_pushdown(spark, views, jdbc_registry):
    p = Pipeline(
        Select(text="SELECT o_orderkey, o_totalprice FROM orders "
                    "WHERE o_orderkey <= 100"),
        Table(source_name="warehouse", table_name="ORDERS_INC",
              value_field="o_orderkey"),
        spark=spark, registry=jdbc_registry)
    p.run()
    sink = Table(source_name="warehouse", table_name="ORDERS_INC")
    sink.pipeline = p
    wm = sink.get_last_value("O_ORDERKEY" if "O_ORDERKEY" in
                             sink.extract().columns else "o_orderkey")
    expected = spark.sql("SELECT MAX(o_orderkey) FROM orders "
                         "WHERE o_orderkey <= 100").first()[0]
    assert wm == expected
    # Select with a pushed-down query against the JDBC source
    remote = Select(source_name="warehouse",
                    text='SELECT * FROM ORDERS_INC WHERE "o_orderkey" > 50')
    remote.pipeline = p
    n = remote.extract().count()
    assert n == spark.sql("SELECT 1 FROM orders WHERE o_orderkey <= 100 "
                          "AND o_orderkey > 50").count()


def test_jdbc_cleanup_truncate(spark, views, jdbc_registry):
    def run():
        Pipeline(Select(text="SELECT n_nationkey, n_name FROM nation"),
                 Table(source_name="warehouse", table_name="NATION_CP",
                       cleanup=True),
                 spark=spark, registry=jdbc_registry).run()
    run()
    run()
    back = Table(source_name="warehouse", table_name="NATION_CP")
    back.pipeline = Pipeline(spark=spark, registry=jdbc_registry)
    assert back.extract().count() == 25  # truncated, not doubled


def test_jdbc_recycle_deletes_prior_run(spark, views, jdbc_registry):
    def pipeline(pid):
        return Pipeline(
            Select(text="SELECT r_regionkey, r_name FROM region"),
            Table(source_name="warehouse", table_name="REGION_RC",
                  key_field="process_id"),
            spark=spark, registry=jdbc_registry, process_id=pid)

    pipeline(111).run()
    back = Table(source_name="warehouse", table_name="REGION_RC")
    back.pipeline = Pipeline(spark=spark, registry=jdbc_registry)
    assert back.extract().count() == 5
    # idempotent re-run for the same run key: delete-then-reload
    pipeline(111).run(recycle=111)
    assert back.extract().count() == 5
    # a different run appends
    pipeline(222).run()
    assert back.extract().count() == 10
