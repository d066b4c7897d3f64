"""Graph-structure quality audit + soft-dedup reweighting: the
round-8 operator chain end-to-end over the embedding kNN graph and
the document corpus.

The pattern: before any graph-based curation decision, PROFILE the
graph (degree histogram catches uncapped hubs / lost mutual edges),
then read three structure signals at increasing depth — local
clustering (triangle census: redundancy density), cohesion membership
(k-core: backbone vs periphery), and link roles (HITS: hubs vs
authorities) — and finally reweight the corpus with SoftDeDup instead
of deleting near-duplicates, so duplicate mass flattens while the
"this was heavily duplicated" signal survives as a column.

  1. PROFILE: ``degree_histogram`` — power-of-two degree buckets,
     exact counts; the one-glance sanity check.
  2. DENSITY: ``triangles`` — per-node triangle counts + local
     clustering coefficient; high-LCC nodes sit in redundant semantic
     regions (SemDeDup-prunable), low-LCC nodes are bridges worth
     oversampling.
  3. COHESION: ``kcore`` — fixed-round peel; survivors are the dense
     backbone (cap them), peeled nodes the sparse periphery (keep for
     diversity).
  4. ROLES: ``hits`` — integer fixed-point hubs & authorities over
     the DIRECTED kNN edges; authority-heavy nodes are pointed-at
     content, hub-heavy nodes are pointers.
  5. REWEIGHT: ``soft_dedup_weights`` — every document kept, sampling
     weight 1/cluster_size over the transitive near-dup closure.

Usage: python examples/graph_quality.py [sf_dir]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from pydin_spark import get_session, register_tables  # noqa: E402
from pydin_spark.operators import dedup, graph, similarity  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("graph-quality")
    register_tables(spark, sf_dir)
    emb = spark.table("embeddings")

    # ANN scale tier for the edges (the exact graph is the oracle
    # operating point, not the production path)
    g = similarity.ivf_knn_graph(emb, k=5, nlist=8, nprobe=2,
                                 max_iter=2)
    edges = g.select("src_id", "nbr_id").localCheckpoint(eager=True)

    print("== degree profile (power-of-two buckets) ==")
    (graph.degree_histogram(edges, src="src_id", dst="nbr_id")
     .orderBy("bucket").show())

    tri = graph.triangles(edges, src="src_id", dst="nbr_id")
    print("== densest neighborhoods (top LCC) ==")
    tri.orderBy(F.desc("lcc"), "node").show(5)

    core = graph.kcore(edges, k=4, rounds=8,
                       src="src_id", dst="nbr_id")
    n_core = core.count()
    n_all = tri.count()
    print(f"== 4-core backbone: {n_core}/{n_all} nodes ==")

    h = graph.hits(edges, src="src_id", dst="nbr_id", iterations=5)
    print("== top authorities (pointed-at vectors) ==")
    h.orderBy(F.desc("auth_fp"), "node").show(5)

    docs = spark.table("documents")
    w = dedup.soft_dedup_weights(docs, threshold=0.5,
                                 max_shingle_freq=100)
    stats = w.groupBy().agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("weight").alias("effective_docs"),
        F.max("cluster_size").alias("largest_cluster")).collect()[0]
    print(f"== soft dedup: {stats['docs']} docs -> "
          f"{stats['effective_docs']:.1f} effective "
          f"(largest cluster {stats['largest_cluster']}) ==")


if __name__ == "__main__":
    main()
