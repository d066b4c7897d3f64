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
    vdir = served._version_path(served._current_vid(spark))
    scan = (spark.read.parquet(f"{vdir}/lists")
            .where(F.col("list_id").isin([0, 1])))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_ivf_rebuild_atomic_swap_and_drift(spark, tmp_path):
    """Index lifecycle: rebuild retrains on the grown corpus, flips the
    manifest atomically, serves the new version from a FRESH object,
    keeps the previous version's files for in-flight readers, and the
    drift metric actually falls after retraining on the drifted
    corpus."""
    import os

    from pydin_spark import load_table
    from pydin_spark.operators.similarity import IVFIndex, cosine_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    old = emb.where("vec_id < 60")
    path = str(tmp_path / "ivf")
    idx = IVFIndex(path, nlist=4)
    stats1 = idx.build(old)
    assert stats1["n_vectors"] == 60

    # corpus grows/drifts beyond the trained region
    grown = emb.where("vec_id < 140")
    before = idx.drift(grown)
    assert before["n_sampled"] == 140

    # a reader that resolved the serving version BEFORE the flip keeps
    # its files available after rebuild (keep_versions=2 grace)
    pre_vdir = idx._version_path(idx._current_vid(spark))

    stats2 = idx.rebuild(grown)
    assert stats2["vid"] != stats1["vid"]
    assert stats2["n_vectors"] == 140
    assert os.path.isdir(pre_vdir)          # old version still on disk

    # retraining on the drifted corpus reduces the residual: the new
    # baseline is below the drifted residual measured pre-rebuild
    after = idx.drift(grown)
    assert after["vid"] == stats2["vid"]
    assert after["current_residual"] <= before["current_residual"] + 1e-9
    assert after["drift_ratio"] <= 1.0 + 1e-9

    # a FRESH object over the same path serves the NEW version, and the
    # exhaustive operating point still equals brute force (the oracle
    # anchor sim_topk_ivf_stored relies on exactly this)
    served = IVFIndex(path, nlist=4)
    q = grown.where("vec_id < 5").selectExpr("vec_id AS query_id",
                                             "embedding")
    key = lambda df: sorted((r["query_id"], r["nbr_id"], r["rnk"])
                            for r in df.collect())
    assert key(served.query(q, k=3, nprobe=4)) \
        == key(cosine_topk(grown, q, k=3))

    # third flip GCs the first version (keep_versions=2)
    idx.rebuild(grown)
    assert not os.path.isdir(idx._version_path(stats1["vid"]))
    assert os.path.isdir(idx._version_path(stats2["vid"]))


def test_ivf_query_before_build_raises(spark, tmp_path):
    from pydin_spark.operators.similarity import IVFIndex
    import pytest

    idx = IVFIndex(str(tmp_path / "missing"))
    q = spark.createDataFrame([(1, [0.1, 0.2])],
                              "query_id long, embedding array<double>")
    with pytest.raises(FileNotFoundError, match="call build"):
        idx.query(q, k=1)


def test_ivf_maintenance_as_scheduler_job(spark, tmp_path):
    """ROADMAP: the drift→threshold→rebuild tick running as a REAL
    Scheduler job — the maintenance recipe from
    examples/ann_index_maintenance.py wired into the run machinery:
    the job measures drift, rebuilds past the threshold, records the
    decision in the run history, and serving stays exact through the
    swap."""
    from pydin_spark import load_table
    from pydin_spark.operators.similarity import IVFIndex, cosine_topk
    from pydin_spark.scheduler import History, Scheduler

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IVFIndex(str(tmp_path / "ivf"), nlist=4, max_iter=5)
    idx.build(emb.where("vec_id < 60"))
    v0 = idx.meta(spark)["vid"]

    decisions = []

    def maintenance(run):
        # threshold 0 forces the rebuild branch on the tiny fixture so
        # the swap itself is exercised deterministically
        d = idx.drift(emb, sample_fraction=1.0)
        if d["drift_ratio"] > 0.0:
            d["rebuilt"] = idx.rebuild(emb)
        decisions.append(d)
        run["data"] = {"drift_ratio": d["drift_ratio"],
                       "rebuilt": "rebuilt" in d}

    s = Scheduler(History())
    job_id = s.register("ann-maintenance", func=maintenance)
    run_id = s.run_job_now(job_id, wait=True)
    rec = s.history.run(run_id)
    assert rec["status"] == "D"
    assert decisions and "rebuilt" in decisions[0]
    assert idx.meta(spark)["vid"] != v0  # the swap happened

    # a serving object created before the rebuild resolves the new
    # version and the exhaustive operating point stays exact
    served = IVFIndex(str(tmp_path / "ivf"), nlist=4)
    q = emb.where("vec_id < 3").selectExpr("vec_id AS query_id",
                                           "embedding")
    got = sorted((r["query_id"], r["nbr_id"], r["rnk"])
                 for r in served.query(q, k=3, nprobe=4).collect())
    want = sorted((r["query_id"], r["nbr_id"], r["rnk"])
                  for r in cosine_topk(emb, q, k=3).collect())
    assert got == want


def test_stored_index_knn_graph_exhaustive(spark, tmp_path):
    """IVFIndex.knn_graph at nprobe=nlist equals the exact graph over
    the stored corpus — the no-retrain graph entry of the index
    lifecycle."""
    from pydin_spark import load_table
    from pydin_spark.operators.similarity import IVFIndex, knn_graph
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IVFIndex(str(tmp_path / "ivf"), nlist=4, max_iter=2)
    idx.build(emb)
    canon = lambda df: sorted(map(str, (tuple(r) for r in df.collect())))
    got = IVFIndex(str(tmp_path / "ivf")).knn_graph(spark, k=4,
                                                    nprobe=4)
    assert canon(got) == canon(knn_graph(emb, k=4))


def test_index_append_serves_new_vectors_exactly(spark, tmp_path):
    """append() is the no-retrain ingest path: after appending the
    second half of the corpus, the exhaustive query (nprobe=nlist)
    over the stored index equals brute force over the FULL corpus,
    and the stored-index graph covers appended ids."""
    from pydin_spark import load_table
    from pydin_spark.operators.similarity import (IVFIndex, cosine_topk,
                                                  knn_graph)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    first = emb.where("vec_id % 2 = 0")
    second = emb.where("vec_id % 2 = 1")
    idx = IVFIndex(str(tmp_path / "ivf"), nlist=4, max_iter=2)
    idx.build(first)
    out = idx.append(second)
    assert out["n_appended"] == second.count()

    q = emb.where("vec_id < 8").selectExpr("vec_id AS query_id",
                                           "embedding")
    served = IVFIndex(str(tmp_path / "ivf")).query(q, k=5, nprobe=4)
    brute = cosine_topk(emb, q, k=5)
    canon = lambda df: sorted(map(str, (tuple(r) for r in df.collect())))
    assert canon(served) == canon(brute)

    g = IVFIndex(str(tmp_path / "ivf")).knn_graph(spark, k=3, nprobe=4)
    assert canon(g) == canon(knn_graph(emb, k=3))
    # drift baseline untouched: still the build-time stats
    assert idx.meta(spark)["n_vectors"] == first.count()


def test_append_revalidates_after_rebuild_flip(spark, tmp_path,
                                               monkeypatch):
    """If a rebuild flips the serving version mid-append, append must
    re-apply the batch onto the NEW version (not leave it stranded in
    the superseded tree)."""
    from pydin_spark import load_table
    from pydin_spark.operators.similarity import IVFIndex, cosine_topk
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    first = emb.where("vec_id % 2 = 0")
    second = emb.where("vec_id % 2 = 1")
    idx = IVFIndex(str(tmp_path / "ivf"), nlist=4, max_iter=2)
    idx.build(first)

    # simulate the race: the first _current_vid resolution happens
    # BEFORE a concurrent rebuild flips the manifest
    real = IVFIndex._current_vid
    state = {"calls": 0}

    def racing(self, sp):
        vid = real(self, sp)
        state["calls"] += 1
        if state["calls"] == 1:
            idx2 = IVFIndex(str(tmp_path / "ivf"), nlist=4, max_iter=2)
            idx2.rebuild(first)          # flip mid-append
            return vid                   # stale resolution
        return real(self, sp)

    monkeypatch.setattr(IVFIndex, "_current_vid", racing)
    out = idx.append(second)
    monkeypatch.setattr(IVFIndex, "_current_vid", real)
    assert out["n_appended"] == second.count()
    # the serving version must contain the appended vectors
    q = emb.where("vec_id < 6").selectExpr("vec_id AS query_id",
                                           "embedding")
    canon = lambda df: sorted(map(str, (tuple(r) for r in df.collect())))
    served = IVFIndex(str(tmp_path / "ivf")).query(q, k=5, nprobe=4)
    assert canon(served) == canon(cosine_topk(emb, q, k=5))


def test_patched_graph_equals_full_rebuild(spark, tmp_path):
    """Stored-graph incremental maintenance: after append +
    patch_graph, the stored edges are IDENTICAL to a full graph
    rebuild at the same (k, nprobe) — including at pruned nprobe,
    since centers and cell membership are shared."""
    from pydin_spark import load_table
    from pydin_spark.operators.similarity import IVFIndex
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.where("vec_id < 480")
    batch = emb.where("vec_id >= 480")
    idx = IVFIndex(str(tmp_path / "ivf"), nlist=8, max_iter=3)
    idx.build(base)
    before = idx.build_graph(spark, k=4, nprobe=2)
    n_before = before.count()

    idx.append(batch)
    patched = idx.patch_graph(batch, k=4, nprobe=2)
    rebuilt = idx.knn_graph(spark, k=4, nprobe=2)
    canon = lambda df: sorted(map(str, (tuple(r) for r in df.collect())))
    assert canon(patched) == canon(rebuilt)
    # the appended sources are present in the patched graph
    assert patched.where("src_id >= 480").count() > 0
    # stored edges really were updated in place (read-back matches)
    assert canon(idx.read_graph(spark, k=4, nprobe=2)) == canon(rebuilt)
    assert n_before > 0
