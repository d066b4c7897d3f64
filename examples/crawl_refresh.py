"""Crawl-refresh pipeline: the round-7 operator chain end-to-end —
the monthly recrawl workflow every continuously-trained corpus runs.

  1. REGISTER: ``StoredSnapshot.apply(old)`` persists the corpus
     fingerprint registry (32 bytes/doc — the old text is never read
     again).
  2. DIFF: a fresh ``StoredSnapshot`` object diffs the recrawl
     against the stored registry — added / removed / changed /
     unchanged per id; whitespace-only churn reads UNCHANGED.
  3. SCREEN the delta only: ``extract_urls`` (domain blocklist) and
     ``quality_bundle`` (Gopher ∧ language ∧ exact-dup survivorship,
     with reasons) run over just the added+changed docs — the
     refresh-rate win: screening cost tracks the DELTA, not the
     corpus.
  4. COMMUNITIES: ``label_propagation`` over the kNN graph of the
     surviving docs' embeddings groups the delta semantically
     (per-community caps are one groupBy away).
  5. LAND: ``apply(new)`` advances the registry (tombstones for
     departures); ``maintain_states`` keeps the state compact.

Usage: python examples/crawl_refresh.py [sf_dir]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from pydin_spark import get_session, register_tables  # noqa: E402
from pydin_spark.functions.maintenance import maintain_states  # noqa: E402
from pydin_spark.operators import graph, similarity, text  # noqa: E402
from pydin_spark.operators.curation import StoredSnapshot  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("crawl-refresh")
    register_tables(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="crawl_refresh_") + "/registry"

    old = spark.table("documents").select("doc_id", "text")
    print(f"# corpus: {old.count()} docs @ {os.path.basename(sf_dir)}")

    # 1. register the current snapshot
    t0 = time.time()
    StoredSnapshot(state).apply(old)
    print(f"# registry built: {time.time() - t0:.1f}s at {state}")

    # the "recrawl": churn + departures + arrivals (synthetic here;
    # in production this is next month's crawl)
    new = spark.sql("""
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN concat(text, ' refreshed update')
                    WHEN doc_id % 3 = 0
                    THEN concat('  ', regexp_replace(text, ' ', '  '))
                    ELSE text END AS text
        FROM documents WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id + 100000, concat('brand new page ', doc_id)
        FROM documents WHERE doc_id % 11 = 0
    """)

    # 2. diff against STORED fingerprints (old corpus never reread)
    t0 = time.time()
    reg = StoredSnapshot(state)  # fresh object: state comes from disk
    delta = reg.diff(new).localCheckpoint(eager=True)
    by_status = {r["status"]: r["n"] for r in
                 delta.groupBy("status").agg(
                     F.count(F.lit(1)).alias("n")).collect()}
    print(f"# diff: {by_status}, {time.time() - t0:.1f}s")

    # 3. screen ONLY the added+changed docs
    t0 = time.time()
    fresh_ids = delta.where("status IN ('added', 'changed')") \
        .select("doc_id")
    fresh = new.join(fresh_ids, "doc_id")
    urls = text.extract_urls(fresh,
                             blocklist=["tracker.example.com"])
    n_blocked = urls.where("blocked").count()
    verdict = text.quality_bundle(fresh, langs=("en", "und"))
    kept = verdict.where("keep")
    reasons = (verdict.where("NOT keep")
               .groupBy("reasons").count().orderBy(F.desc("count"))
               .limit(5).collect())
    print(f"# screen delta ({fresh.count()} docs): "
          f"{kept.count()} kept, blocked urls {n_blocked}, "
          f"top drop reasons {[(r['reasons'], r['count']) for r in reasons]}, "
          f"{time.time() - t0:.1f}s")

    # 4. semantic communities of the surviving delta (kNN + LPA)
    t0 = time.time()
    emb = spark.table("embeddings").join(
        kept.select(F.col("doc_id").alias("vec_id")), "vec_id")
    if emb.count() >= 10:
        g = similarity.knn_graph(emb, k=3)
        comms = graph.label_propagation(
            g.select("src_id", "nbr_id"), src="src_id", dst="nbr_id",
            iterations=5)
        sizes = (comms.groupBy("label").count()
                 .orderBy(F.desc("count")).limit(5).collect())
        print(f"# communities: top-5 sizes "
              f"{[(r['label'], r['count']) for r in sizes]}, "
              f"{time.time() - t0:.1f}s")

    # 5. land the refresh + state upkeep
    t0 = time.time()
    counts = reg.apply(new)
    upkeep = maintain_states(spark, [reg])
    print(f"# landed: {counts}; upkeep {upkeep}; "
          f"{time.time() - t0:.1f}s")
    print(f"# live registry: {reg.current(spark).count()} docs")


if __name__ == "__main__":
    main()
