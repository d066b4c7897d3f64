"""Scale-helper tests: salted join equivalence, bucketed join with no
exchange, hot-key detection."""

from pyspark.sql import functions as F

from pydin_spark.functions import (bucketed_table, explain_has, salted_join,
                                   top_keys)


def test_salted_join_equals_plain_join(spark, views):
    lineitem = spark.table("lineitem").select("l_orderkey", "l_quantity")
    orders = spark.table("orders").select("o_orderkey", "o_orderpriority") \
        .withColumnRenamed("o_orderkey", "l_orderkey")
    plain = lineitem.join(orders, "l_orderkey")
    salted = salted_join(lineitem, orders, on="l_orderkey", salt=4)
    assert salted.count() == plain.count()
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.select(*plain.columns).collect()))
    assert a == b


def test_top_keys_finds_hot_keys(spark, views):
    keys = top_keys(spark.table("lineitem"), "l_returnflag", n=2)
    assert len(keys) == 2
    assert set(keys) <= {"A", "N", "R"}


def test_bucketed_join_no_exchange(spark, views, tmp_path):
    li = spark.table("lineitem").select("l_orderkey", "l_quantity")
    od = spark.table("orders").selectExpr("o_orderkey AS l_orderkey",
                                          "o_totalprice")
    bucketed_table(li, "b_li", "l_orderkey", buckets=8)
    bucketed_table(od, "b_od", "l_orderkey", buckets=8)
    # hint merge: at these sizes Catalyst prefers broadcast (which skips
    # bucketing entirely); at fact-table scale SMJ is the natural pick
    joined = (spark.table("b_li").hint("merge")
              .join(spark.table("b_od"), "l_orderkey"))
    assert explain_has(joined, "Bucketed: true")
    assert not explain_has(joined, "hashpartitioning"), \
        "bucketed join must not shuffle"
    assert joined.count() == li.join(od, "l_orderkey").count()
    spark.sql("DROP TABLE IF EXISTS b_li")
    spark.sql("DROP TABLE IF EXISTS b_od")
