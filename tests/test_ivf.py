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
