"""ANN index lifecycle — drift-triggered retrains from the scheduler.

Run:  python examples/ann_index_maintenance.py [workdir]

The production loop for a served ANN index over a growing embedding
corpus: a scheduled maintenance job measures centroid drift
(``IVFIndex.drift`` — current corpus residual vs the serving version's
build-time baseline) and rebuilds when it crosses the threshold. The
rebuild is a versioned atomic swap, so queries running concurrently
keep serving the version they resolved; the drift decision and both
version stats land in the run history for the operator to audit.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pydin_spark import get_session, load_table
from pydin_spark.operators.similarity import IVFIndex, cosine_topk

SF_DIR = "/root/testdata/sf0.01"
DRIFT_THRESHOLD = 1.2


def maintenance_tick(idx: IVFIndex, corpus, log) -> dict:
    """One scheduled maintenance pass: measure, decide, maybe rebuild.
    This is the body a Scheduler job (or any cron) runs on its cadence.
    """
    d = idx.drift(corpus, sample_fraction=0.5)
    log(f"drift check: ratio={d['drift_ratio']:.3f} "
        f"(built={d['built_residual']:.4f} "
        f"current={d['current_residual']:.4f} "
        f"sampled={d['n_sampled']})")
    if d["drift_ratio"] > DRIFT_THRESHOLD:
        stats = idx.rebuild(corpus)
        log(f"rebuilt: version={stats['vid'][:8]} "
            f"n={stats['n_vectors']} residual={stats['mean_residual']:.4f}")
        d["rebuilt"] = stats
    return d


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_session("ann-maintenance")
    emb = load_table(spark, SF_DIR, "embeddings")

    # day 0: the index is trained on the corpus as it exists
    early = emb.where("vec_id < 150")
    idx = IVFIndex(f"{work}/ivf", nlist=8, max_iter=5)
    built = idx.build(early)
    print(f"initial build: {built['n_vectors']} vectors, "
          f"residual {built['mean_residual']:.4f}")

    # serving: a FRESH object (another session/process) answers queries
    served = IVFIndex(f"{work}/ivf", nlist=8)
    q = emb.where("vec_id < 5").selectExpr("vec_id AS query_id",
                                           "embedding")
    print(f"serving sample: {served.query(q, k=3, nprobe=8).count()} rows")

    # the corpus grows between rebuilds: append assigns new vectors to
    # the EXISTING cells (no retrain, no rewrite) — queries and the
    # stored-index graph cover them immediately, while drift keeps
    # measuring them against the centroids that actually serve them
    arrived = emb.where("vec_id >= 150 AND vec_id < 300")
    idx.build_graph(spark, k=3, nprobe=4)       # stored edge frame
    appended = idx.append(arrived)
    print(f"appended {appended['n_appended']} vectors into the "
          f"serving version (no retrain)")
    # incremental maintenance: only sources probing touched cells
    # recompute; the stored edges still equal a full rebuild
    patched = idx.patch_graph(arrived, k=3, nprobe=4)
    assert patched.where("src_id >= 150").count() > 0, \
        "appended vectors must appear in the patched graph"
    key = lambda df: sorted((r["src_id"], r["nbr_id"], r["rnk"])
                            for r in df.collect())
    assert key(patched) == key(served.knn_graph(spark, k=3, nprobe=4)), \
        "patched graph must equal a full rebuild"

    # weeks later: the corpus grew/drifted; the scheduled tick decides
    grown = emb
    result = maintenance_tick(idx, grown, log=lambda m: print(f"  {m}"))
    if "rebuilt" not in result:
        # small fixtures may not drift past the threshold organically;
        # force one rebuild so the example always demonstrates the swap
        print("  (below threshold — forcing rebuild to show the swap)")
        result["rebuilt"] = idx.rebuild(grown)

    # the same serving object now resolves the NEW version — and the
    # exhaustive operating point still equals brute force
    out = served.query(q, k=3, nprobe=8)
    exact = cosine_topk(grown, q, k=3)
    key = lambda df: sorted((r["query_id"], r["nbr_id"], r["rnk"])
                            for r in df.collect())
    assert key(out) == key(exact), "post-rebuild serving must stay exact"
    print(f"post-rebuild serving verified exact "
          f"({out.count()} rows); meta: {idx.meta(spark)}")

    # memory tier: attach PQ codes to the serving version — ADC
    # queries then read m bytes/vector (partitioned by cell, so
    # nprobe prunes partitions of already-compressed data)
    pq_stats = idx.build_pq(spark, m=8, ksub=16)
    adc = served.query_pq(spark, q, k=3, nprobe=4)
    print(f"pq tier: {pq_stats['n_codes']} codes "
          f"(m={pq_stats['m']}, ksub={pq_stats['ksub']}); "
          f"ADC sample: {adc.count()} rows")


if __name__ == "__main__":
    main()
