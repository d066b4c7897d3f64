"""Set-based ELT tests: Insert (INSERT..SELECT shape), SQL executable,
watermarked incremental Insert — reference models.py:939-1188 semantics."""

from pyspark.sql import functions as F

from pydin_spark import Insert, Pipeline, SQL
from pydin_spark.sources import Filesystem, SourceRegistry


def lake(tmp_path):
    reg = SourceRegistry(autoload=False)
    reg.register(Filesystem("lake", str(tmp_path)))
    return reg


def test_insert_select_elt(spark, views, tmp_path):
    reg = lake(tmp_path)
    ins = Insert(source_name="lake", schema_name="mart",
                 table_name="big_orders",
                 select="SELECT o_orderkey, o_totalprice FROM orders "
                        "WHERE o_totalprice > 100000")
    p = Pipeline(ins, spark=spark, registry=reg).run()
    n_expected = spark.sql(
        "SELECT 1 FROM orders WHERE o_totalprice > 100000").count()
    assert p.steps[0].result_value == n_expected
    out = spark.read.parquet(str(tmp_path / "mart/big_orders"))
    assert out.count() == n_expected


def test_insert_incremental_watermark(spark, views, tmp_path):
    reg = lake(tmp_path)
    median = int(spark.table("orders")
                 .approxQuantile("o_orderkey", [0.5], 0.0)[0])
    first = Insert(source_name="lake", schema_name="m", table_name="inc",
                   select=f"SELECT o_orderkey, o_totalprice FROM orders "
                          f"WHERE o_orderkey <= {median}",
                   value_field="o_orderkey")
    Pipeline(first, spark=spark, registry=reg).run()
    second = Insert(source_name="lake", schema_name="m", table_name="inc",
                    select="SELECT o_orderkey, o_totalprice FROM orders",
                    value_field="o_orderkey")
    p2 = Pipeline(second, spark=spark, registry=reg).run()
    out = spark.read.parquet(str(tmp_path / "m/inc"))
    assert out.count() == spark.table("orders").count()
    assert out.groupBy("o_orderkey").count().where("count > 1").count() == 0
    # second run only moved the strictly-greater delta
    assert p2.steps[0].result_value == spark.table("orders").where(
        F.col("o_orderkey") > median).count()


def test_sql_executable_ddl_dml(spark, views, tmp_path):
    p = Pipeline(
        SQL(text="SELECT o_orderstatus, COUNT(*) AS n FROM orders "
                 "GROUP BY o_orderstatus"),
        spark=spark).run()
    assert p.steps[0].result_value == 3  # P / O / F
