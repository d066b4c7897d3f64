"""Regression tests for the round-5 advisor findings (ADVICE.md r5).

One test per finding:
- StoredBigramLM overwrite crash-safety lives in
  tests/test_r6_operators.py (crashed-overwrite + refuse-collapse).
- IVFIndex.maintain detects PQ artifacts by ATTEMPTING the read, not
  os.path — a drift rebuild must republish codes even where local
  stat calls can't see the index path.
- IVFIndex.query_pq accepts a custom query id column, matching
  pq_topk's signature.
- project_embeddings fails loudly on ragged (too-short) vectors
  instead of silently emitting NULL components.
"""

import pytest
from pyspark.sql import functions as F

from pydin_spark.operators import similarity


def _corpus(spark, n=60, dim=8, shift=0.0):
    rows = [(i, [float((i * 7 + j * 3) % 11) / 11.0 + shift
                 for j in range(dim)]) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_query_pq_custom_query_id_col(spark, tmp_path):
    corpus = _corpus(spark)
    # max_iter=2: the assertions here are column/count/equality
    # contracts that hold for ANY centroid set — the default training
    # budget (20+10 k-means iterations) was pure test wall-clock
    idx = similarity.IVFIndex(str(tmp_path / "idx"), nlist=4,
                              max_iter=2)
    idx.build(corpus)
    idx.build_pq(spark, m=4, ksub=16, max_iter=2)
    queries = (corpus.limit(3)
               .select(F.col("vec_id").alias("probe_id"), "embedding"))
    out = idx.query_pq(spark, queries, k=3, query_id_col="probe_id")
    assert out.columns == ["probe_id", "nbr_id", "adist", "rnk"]
    assert out.count() == 9
    # and the default column name still works
    default_q = corpus.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    ref = idx.query_pq(spark, default_q, k=3)
    assert (sorted(map(tuple, out.collect()))
            == sorted(map(tuple, ref.collect())))
    # pruned serving path honors the custom name too
    pruned = idx.query_pq(spark, queries, k=3, nprobe=2,
                          query_id_col="probe_id")
    assert pruned.columns == ["probe_id", "nbr_id", "adist", "rnk"]
    assert pruned.select("probe_id").distinct().count() == 3


def test_maintain_drift_rebuild_republishes_pq(spark, tmp_path):
    """The drift-triggered rebuild must re-encode PQ codes with the
    remembered codebook — detected by READING the stored book (object
    store safe), not by os.path probing."""
    idx = similarity.IVFIndex(str(tmp_path / "idx"), nlist=4,
                              max_iter=2)
    idx.build(_corpus(spark))
    idx.build_pq(spark, m=4, ksub=16, max_iter=2)
    drifted = _corpus(spark, shift=5.0)
    out = idx.maintain(spark, corpus=drifted, drift_threshold=0.01)
    assert "rebuilt" in out
    assert "pq" in out  # codes republished on the new version
    q = drifted.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    assert idx.query_pq(spark, q, k=3).count() == 6


def test_project_embeddings_rejects_ragged_vectors(spark):
    ok = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [0.5, 0.25, 0.125, 1.0])],
        "vec_id long, embedding array<double>")
    good = similarity.project_embeddings(ok, out_dim=2, in_dim=4)
    assert good.count() == 2
    assert all(len(r["proj"]) == 2 and None not in r["proj"]
               for r in good.collect())
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [0.5])],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="shorter than in_dim"):
        similarity.project_embeddings(ragged, out_dim=2,
                                      in_dim=4).collect()
