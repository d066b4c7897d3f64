"""Unified stored-state maintenance: ONE scheduler-driven sweep
(`maintain_states`) covering all six stored-state families —
IncrementalDeduper, IncrementalLineDeduper, ContinuousRollup,
StoredHeavyHitters, StoredBloom, IVFIndex — asserting per family that
orphan rows/versions are swept, commit logs collapse, fragmentation
drops, and (the part that matters) every read/serve result is
bit-identical across the sweep."""

import pytest
from pyspark.sql import functions as F

from pydin_spark import load_table
from pydin_spark.functions.maintenance import maintain_states
from pydin_spark.operators import text
from pydin_spark.operators.dedup import IncrementalDeduper
from pydin_spark.operators.rollup import (ContinuousRollup,
                                          StoredBloom,
                                          StoredHeavyHitters)
from pydin_spark.operators.similarity import IVFIndex


def canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.fixture(scope="module", params=["plain", "file_uri"])
def fleet(spark, tmp_path_factory, request):
    """Build all six families small, fragmented, and with injected
    orphans — the worst realistic state a crash-prone high-cadence
    deployment leaves behind.

    Parametrized over path style: once with plain local paths, once
    with explicit-scheme ``file:///`` URIs. The URI leg routes every
    maintenance rename/delete/list through the Hadoop FileSystem
    helper (:mod:`pydin_spark.fs`) exactly as an ``hdfs://`` or
    ``s3a://`` deployment would — proving no driver-local ``os.*``
    call remains on any state path."""
    root = tmp_path_factory.mktemp("states")
    base = (f"file://{root}" if request.param == "file_uri"
            else str(root))
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    docs = spark.createDataFrame(
        [(i, f"common boilerplate line\nunique prose {i}")
         for i in range(8)], "doc_id long, text string")
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    dd = IncrementalDeduper(f"{base}/dedup", threshold=0.9)
    dd.ingest(docs.where("doc_id < 4"))
    dd.ingest(docs.where("doc_id >= 4"))

    ld = text.IncrementalLineDeduper(f"{base}/lines")
    ld.ingest(docs.where("doc_id < 4"))
    ld.ingest(docs.where("doc_id >= 4"))
    # orphan: an appended firsts file whose batch never committed
    # (crash between state append and commit row) — invisible to
    # readers, bytes reclaimed by the sweep
    spark.createDataFrame(
        [("ghost line", "99", 0, "orphan-batch")],
        "line string, doc_id string, pos int, batch string") \
        .write.mode("append").parquet(str(root / "lines" / "firsts"))

    cr = ContinuousRollup(f"{base}/rollup", bucket="1 day")
    cr.refresh(ev.where("event_id % 2 = 0"))
    cr.refresh(ev)

    hh = StoredHeavyHitters(f"{base}/hh", "user_id",
                            bucket="1 day", capacity=8)
    hh.refresh(ev.where("event_id % 2 = 0"))
    hh.refresh(ev)

    sb = StoredBloom(f"{base}/bloom", "user_id", bucket="1 day",
                     m_bits=8192)
    sb.refresh(ev.where("event_id % 2 = 0"))
    sb.refresh(ev)

    from pydin_spark.functions.maintenance import StatsIndex
    from pydin_spark.operators.buckets import StoredBuckets

    sbk = StoredBuckets(f"{base}/sbk", "event_id", buckets=2)
    sbk.stage(ev.select("event_id", "user_id", "value"))
    sbk.stage(ev.select("event_id", "user_id", "value"))  # stale v0

    si = StatsIndex(f"{base}/si", ["event_id"])
    ev.select("event_id", "value").write.parquet(f"{base}/si_ds")
    si.rebuild(spark, f"{base}/si_ds")
    si.rebuild(spark, f"{base}/si_ds")  # stale v0 for the sweep

    ivf = IVFIndex(f"{base}/ivf", nlist=4, max_iter=2,
                   keep_versions=1)
    ivf.build(emb.where("vec_id < 60"))
    ivf.rebuild(emb)  # leaves the old version for the sweep...
    # ...plus a crashed build: a version tree never published to the
    # manifest
    import os
    os.makedirs(str(root / "ivf" / "versions" / "orphanvid"),
                exist_ok=True)
    with open(str(root / "ivf" / "versions" / "orphanvid" / "x"),
              "w") as f:
        f.write("crashed build leftovers")

    return {"root": root, "dd": dd, "ld": ld, "cr": cr, "hh": hh,
            "sb": sb, "ivf": ivf, "sbk": sbk, "si": si,
            "docs": docs, "ev": ev, "emb": emb}


@pytest.fixture(scope="module")
def swept(spark, fleet):
    """Snapshot every family's served result, run ONE scheduler job
    over the whole fleet, return (before-snapshots, job results)."""
    from pydin_spark.scheduler import History, Scheduler
    before = {
        "ld_seen": canon(fleet["ld"].seen_lines(spark)),
        "cr": canon(fleet["cr"].read(spark)),
        "hh": canon(fleet["hh"].serve(spark, k=5)),
        "sb": canon(fleet["sb"].serve(spark)),
        "ivf_vid": fleet["ivf"].meta(spark)["vid"],
        "sbk": canon(fleet["sbk"].attach(spark, "sbk_sweep_t")),
        "si": canon(fleet["si"].read(spark)),
    }
    results = {}

    def sweep(run):
        res = maintain_states(
            spark,
            [fleet["dd"], fleet["ld"], fleet["cr"], fleet["hh"],
             fleet["sb"], fleet["ivf"], fleet["sbk"], fleet["si"]],
            max_files=0, checkpoint_above=1)
        results.update(res)
        run["data"] = {k: "error" not in str(v) for k, v in res.items()}

    s = Scheduler(History())
    job_id = s.register("state-maintenance", func=sweep)
    run_id = s.run_job_now(job_id, wait=True)
    rec = s.history.run(run_id)
    assert rec["status"] == "D"
    return before, results


def test_sweep_covers_all_eight_families_without_errors(swept):
    _, results = swept
    assert len(results) == 8
    errs = {k: v for k, v in results.items()
            if isinstance(v, dict) and "error" in v}
    assert not errs, errs


def test_buckets_and_stats_index_identical_across_sweep(spark, fleet,
                                                        swept):
    """The two round-10 families under the SAME scheduler sweep: the
    commit logs collapse to one version, stale dirs are swept, and
    the served results are bit-identical."""
    before, results = swept
    assert results[f"StoredBuckets[{fleet['sbk'].path}]"] \
        == {"kept": 1, "deleted": 1}
    assert results[f"StatsIndex[{fleet['si'].path}]"] \
        == {"kept": 1, "deleted": 1}
    assert canon(fleet["sbk"].attach(spark, "sbk_sweep_t2")) \
        == before["sbk"]
    assert canon(fleet["si"].read(spark)) == before["si"]
    for t in ("sbk_sweep_t", "sbk_sweep_t2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_line_dedup_orphan_swept_and_commit_log_collapsed(
        spark, fleet, swept):
    root = fleet["root"]
    firsts = spark.read.parquet(str(root / "lines" / "firsts"))
    assert firsts.where(F.col("batch") == "orphan-batch").count() == 0
    assert spark.read.parquet(
        str(root / "lines" / "commits")).count() == 1
    # decisions preserved: a re-ingest of known lines keeps nothing new
    out = fleet["ld"].ingest(spark.createDataFrame(
        [(100, "common boilerplate line\nunique prose 0")],
        "doc_id long, text string")).first()
    assert out["n_kept"] == 0


def test_line_dedup_state_identical_across_sweep(spark, fleet, swept):
    before, _ = swept
    assert canon(fleet["ld"].seen_lines(spark)) == before["ld_seen"]


def test_dedup_commit_log_collapsed_and_serving_preserved(
        spark, fleet, swept):
    root = fleet["root"]
    assert spark.read.parquet(
        str(root / "dedup" / "commits")).count() == 1
    # known near-dup of an ingested doc still dies against state
    out = fleet["dd"].ingest(spark.createDataFrame(
        [(200, "common boilerplate line\nunique prose 1")],
        "doc_id long, text string"))
    assert out.count() == 0


def test_rollup_families_compacted_and_identical(spark, fleet, swept):
    before, results = swept
    assert canon(fleet["cr"].read(spark)) == before["cr"]
    assert canon(fleet["hh"].serve(spark, k=5)) == before["hh"]
    assert canon(fleet["sb"].serve(spark)) == before["sb"]
    for key, res in results.items():
        if any(n in key for n in ("ContinuousRollup",
                                  "StoredHeavyHitters", "StoredBloom")):
            assert "after" in res, (key, res)
            assert res["after"]["files"] <= res["before"]["files"]


def test_ivf_orphan_and_old_versions_swept_serving_exact(
        spark, fleet, swept):
    import os
    before, _ = swept
    vroot = str(fleet["root"] / "ivf" / "versions")
    left = set(os.listdir(vroot))
    assert "orphanvid" not in left  # crashed build reclaimed
    assert left == {before["ivf_vid"]}  # keep_versions=1 honored
    # the surviving version serves exactly at the exhaustive point
    from pydin_spark.operators.similarity import cosine_topk
    emb = fleet["emb"]
    q = emb.where("vec_id < 3").selectExpr("vec_id AS query_id",
                                           "embedding")
    got = canon(fleet["ivf"].query(q, k=3, nprobe=4))
    want = canon(cosine_topk(emb, q, k=3))
    assert got == want
