"""Graph-centrality curation: rank a corpus by kNN-graph PageRank,
then export it curriculum-ordered.

The round-6 operator chain end-to-end, the density-aware sampling
pattern (high-centrality vectors sit in dense semantic neighborhoods
— the regions SemDeDup prunes hardest; low-centrality vectors are the
long-tail diversity a pretraining mix wants to keep):

  1. PROJECT: ``project_embeddings`` — seeded ±1 random projection
     64 -> 8 so every downstream distance computation is 8x cheaper
     (JL: neighborhoods survive projection in expectation; recall
     properties of the downstream graph live in tests/test_ann_recall).
  2. GRAPH: ``ivf_knn_graph`` over the PROJECTED vectors — the ANN
     scale tier (pruned probes), never the exact n² graph.
  3. RANK: ``pagerank`` — exact fixed-point BIGINT centrality, and a
     PERSONALIZED variant seeded with ten trusted ids (TrustRank
     shape: rank = proximity to the curated seed set).
  4. EXPORT: ``curriculum_order`` by ascending centrality — the
     training stream starts in the sparse long tail and densifies,
     with rerun-identical shard/pos assignments.

Usage: python examples/centrality_curation.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pydin_spark import get_session, register_tables  # noqa: E402
from pydin_spark.operators import graph, similarity  # noqa: E402
from pydin_spark.operators.curation import curriculum_order  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("centrality-curation")
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    n = emb.count()
    print(f"# corpus: {n} vectors @ {os.path.basename(sf_dir)}")

    # 1. project to 8 dims (pure codegen scan, no shuffle)
    t0 = time.time()
    proj = similarity.project_embeddings(emb, out_dim=8, in_dim=64)
    proj = proj.withColumnRenamed("proj", "embedding") \
        .localCheckpoint(eager=True)
    print(f"# project 64->8: {time.time() - t0:.1f}s")

    # 2. approximate kNN graph in the projected space
    t0 = time.time()
    g = similarity.ivf_knn_graph(
        proj, k=5, nlist=max(8, n // 128), nprobe=2, max_iter=3)
    edges = g.select("src_id", "nbr_id").localCheckpoint(eager=True)
    print(f"# ivf knn graph (k=5): {edges.count()} edges, "
          f"{time.time() - t0:.1f}s")

    # 3. centrality — global and personalized
    t0 = time.time()
    pr = graph.pagerank(edges, src="src_id", dst="nbr_id")
    stats = pr.selectExpr("min(pr_fp) lo", "max(pr_fp) hi",
                          "sum(pr_fp) mass").first()
    print(f"# pagerank: rank in [{stats['lo']}, {stats['hi']}] "
          f"(1e-12 units), mass {stats['mass']}/{graph.SCALE}, "
          f"{time.time() - t0:.1f}s")
    seeds = [r["vec_id"] for r in
             emb.select("vec_id").orderBy("vec_id").limit(10).collect()]
    ppr = graph.pagerank(edges, src="src_id", dst="nbr_id", seeds=seeds)
    near = ppr.orderBy(ppr.pr_fp.desc()).limit(5).collect()
    print("# trusted-set proximity top-5:",
          [(r["node"], r["pr_fp"]) for r in near])

    # 4. curriculum export: sparse tail first, dense core last
    t0 = time.time()
    curr = curriculum_order(pr, score_col="pr_fp", n_shards=8,
                            id_col="node")
    per_shard = curr.groupBy("shard").count().orderBy("shard").collect()
    print(f"# curriculum shards: "
          f"{[(r['shard'], r['count']) for r in per_shard]}, "
          f"{time.time() - t0:.1f}s")
    out = os.path.join("/tmp", "centrality_export")
    (curr.repartition(8, "shard")
     .sortWithinPartitions("shard", "pos")
     .write.mode("overwrite").partitionBy("shard").parquet(out))
    print(f"# exported ordered shards -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
