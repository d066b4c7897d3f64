"""Regression tests for the round-3 advisor findings (ADVICE.md r3).

One test per finding:
- temperature_mixture scales to high-cardinality strata (broadcast
  rate join, not a per-stratum CASE chain) and keeps the exact keep
  set of the old formulation.
- keep_top_fraction(approx=True) no longer drops strata whose scores
  are all NULL.
- funnel reports NULL conversions (not 0.0) when nobody completes
  step 1.
- mutual_knn_pairs validates a supplied graph= against k.
"""

import pytest
from pyspark.sql import functions as F

from pydin_spark.operators import curation, similarity
from pydin_spark.operators.relational import funnel


def test_temperature_mixture_no_case_chain(spark):
    """High-cardinality strata must ride a broadcast join, not a
    chained CASE — the plan should contain a BroadcastHashJoin and no
    CaseWhen pile-up proportional to the stratum count."""
    df = spark.range(2000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 400)).alias("source"))
    out = curation.temperature_mixture(df, alpha=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # CASE WHEN count must not scale with the 400 strata
    assert plan.count("CASE WHEN") < 10
    # every kept row still belongs to the input and the smallest
    # stratum keeps everything (rate == 1)
    assert out.count() > 0
    assert out.join(df, ["doc_id", "source"], "left_anti").count() == 0


def test_temperature_mixture_keep_set_unchanged(spark):
    """The broadcast-join rewrite must reproduce the exact md5 keep
    set of the CASE formulation: same rate per stratum, same
    u < rate rule. Recompute the rule by hand and compare."""
    import math

    df = spark.range(300).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b").otherwise("c").alias("source"))
    out = {r["doc_id"] for r in
           curation.temperature_mixture(df, alpha=0.5).collect()}
    counts = {r["source"]: r["n"] for r in
              df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    cmin = min(counts.values())
    u = curation._hash_unit(F.col("doc_id").cast("string"), 42)
    kept = set()
    for r in df.select("doc_id", "source", u.alias("u")).collect():
        rate = math.sqrt(cmin / counts[r["source"]])
        if r["u"] < rate:
            kept.add(r["doc_id"])
    assert out == kept


def test_temperature_mixture_null_stratum_key(spark):
    """NULL stratum values must survive the null-safe join."""
    df = spark.createDataFrame(
        [("d%d" % i, None if i % 2 else "a") for i in range(100)],
        "doc_id string, source string")
    out = curation.temperature_mixture(df, alpha=0.5)
    srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert None in srcs and "a" in srcs


def test_keep_top_fraction_all_null_stratum_kept(spark):
    """A stratum whose scores are ALL NULL must keep its rows under
    approx=True (NULL percentile => keep-all), not vanish."""
    rows = ([("g%d" % i, "good", float(i)) for i in range(20)]
            + [("n%d" % i, "nullish", None) for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id string, source string, "
                               "score double")
    out = curation.keep_top_fraction(df, "score", 0.5,
                                     strata_col="source", approx=True)
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src.get("nullish") == 10  # kept, not dropped
    assert 0 < by_src.get("good", 0) < 20  # real cutoff still filters


def test_keep_top_fraction_mixed_nulls_drop_below_cutoff(spark):
    """In a stratum with a real cutoff, NULL scores sort lowest and
    are filtered by the approx path."""
    rows = ([("g%d" % i, float(i)) for i in range(10)]
            + [("n%d" % i, None) for i in range(5)])
    df = spark.createDataFrame(rows, "doc_id string, score double")
    out = curation.keep_top_fraction(df, "score", 0.4, approx=True)
    assert all(r["score"] is not None for r in out.collect())


def test_funnel_empty_base_null_conversion(spark):
    """Zero step-1 completers => conversion NULL everywhere, never a
    fabricated 0.0 for step 1 itself."""
    ev = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", "click"),
         ("u2", "2024-01-01 01:00:00", "purchase")],
        "user_id string, ts string, event_type string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = funnel(ev, ["view", "click", "purchase"]).collect()
    assert [r["n_users"] for r in out] == [0, 0, 0]
    assert all(r["conversion"] is None for r in out)


def test_funnel_step1_conversion_is_one(spark):
    ev = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", "view"),
         ("u1", "2024-01-01 01:00:00", "click")],
        "user_id string, ts string, event_type string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["step_no"]: r["conversion"]
           for r in funnel(ev, ["view", "click"]).collect()}
    assert out[1] == 1.0 and out[2] == 1.0


@pytest.fixture(scope="module")
def vecs(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mutual_knn_rejects_shallower_graph(spark, vecs):
    g3 = similarity.knn_graph(vecs, k=3)
    with pytest.raises(ValueError, match="built at k=3 but k=5"):
        similarity.mutual_knn_pairs(vecs, k=5, graph=g3)


def test_mutual_knn_trims_deeper_graph(spark, vecs):
    """A graph built at k'>k must yield exactly the k-graph's mutual
    edges (superset trim), not the k'-graph's."""
    g8 = similarity.knn_graph(vecs, k=8)
    via_trim = sorted((r["id_a"], r["id_b"]) for r in
                      similarity.mutual_knn_pairs(vecs, k=3,
                                                  graph=g8).collect())
    direct = sorted((r["id_a"], r["id_b"]) for r in
                    similarity.mutual_knn_pairs(vecs, k=3).collect())
    assert via_trim == direct
