"""Recall floors for the PRUNED ANN operating points.

The oracle gate pins the exhaustive anchors (multiprobe=planes,
nprobe=nlist ≡ brute force) — zero pruning exercised. These tests pin
the pruned paths: recall@k against brute force must stay above a floor
at the documented defaults, and must be monotone in the probe fan-out.
Floors sit ~25% under the measured values on this fixture (synthetic
near-uniform embeddings — the ANN worst case, so real corpora with
cluster structure only do better); a bucketing/probing regression
(wrong band math, broken multi-probe mask set, mis-assigned IVF lists)
craters recall far below them. Curves: tools/ann_recall.py, PERF.md.
"""

import tempfile

import pytest

from pydin_spark import load_table
from pydin_spark.operators import similarity

K = 5
N_QUERIES = 20


@pytest.fixture(scope="module")
def corpus(spark):
    emb = load_table(spark, "/root/testdata/sf0.001",
                     "embeddings").persist()
    emb.count()
    yield emb
    emb.unpersist()


@pytest.fixture(scope="module")
def queries(corpus):
    q = corpus.where(f"vec_id < {N_QUERIES}").selectExpr(
        "vec_id AS query_id", "embedding").persist()
    q.count()
    yield q
    q.unpersist()


@pytest.fixture(scope="module")
def truth(corpus, queries):
    out = {}
    for r in similarity.cosine_topk(corpus, queries, k=K).collect():
        out.setdefault(r["query_id"], set()).add(r["nbr_id"])
    return out


def _recall(rows, truth):
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["nbr_id"])
    hits = sum(len(got.get(qid, set()) & t) for qid, t in truth.items())
    return hits / sum(len(t) for t in truth.values())


def test_lsh_multiprobe_recall_floor_and_monotone(corpus, queries, truth):
    by_mp = {
        mp: _recall(similarity.lsh_topk(corpus, queries, k=K, planes=8,
                                        multiprobe=mp).collect(), truth)
        for mp in (1, 2, 3)
    }
    # measured on this fixture: 0.09 / 0.27 / 0.66
    assert by_mp[2] >= 0.15, by_mp
    assert by_mp[3] >= 0.45, by_mp
    # probing strictly more buckets never loses neighbors on average
    assert by_mp[1] <= by_mp[2] + 1e-9 <= by_mp[3] + 2e-9, by_mp


def test_ivf_pruned_recall_floor_and_monotone(corpus, queries, truth):
    scratch = tempfile.mkdtemp(prefix="ann_floor_ivf_")
    idx = similarity.IVFIndex(f"{scratch}/ivf", nlist=16)
    idx.build(corpus)
    by_np = {
        nprobe: _recall(idx.query(queries, k=K, nprobe=nprobe).collect(),
                        truth)
        for nprobe in (2, 4, 8)
    }
    # measured on this fixture: 0.41 / 0.64 / 0.86
    assert by_np[4] >= 0.45, by_np     # the documented default nprobe
    assert by_np[8] >= 0.65, by_np
    assert by_np[2] <= by_np[4] + 1e-9 <= by_np[8] + 2e-9, by_np


def test_ivf_knn_graph_recall_and_exhaustive_equivalence(spark, corpus):
    """ivf_knn_graph at nprobe=nlist equals the exact graph for any
    centroid set; pruned probes keep recall above a floor on the
    clustered fixture."""
    from pydin_spark.operators.similarity import ivf_knn_graph, knn_graph
    exact = {(r.src_id, r.nbr_id)
             for r in knn_graph(corpus, k=5).collect()}
    full = {(r.src_id, r.nbr_id)
            for r in ivf_knn_graph(corpus, k=5, nlist=8, nprobe=8,
                                   max_iter=2).collect()}
    assert full == exact
    pruned = {(r.src_id, r.nbr_id)
              for r in ivf_knn_graph(corpus, k=5, nlist=8, nprobe=2,
                                     max_iter=10).collect()}
    recall = len(pruned & exact) / len(exact)
    assert recall >= 0.6, recall


def test_mutual_knn_pairs_symmetry(spark, corpus):
    """Mutual edges are exactly the intersection of the directed graph
    with its reverse, canonically ordered; reusing a prebuilt graph
    gives the same answer as building internally."""
    from pydin_spark.operators.similarity import (knn_graph,
                                                  mutual_knn_pairs)
    g = knn_graph(corpus, k=5).persist()
    directed = {(r.src_id, r.nbr_id) for r in g.collect()}
    mutual = mutual_knn_pairs(corpus, k=5, graph=g).collect()
    got = {(r.id_a, r.id_b) for r in mutual}
    want = {(min(a, b), max(a, b)) for (a, b) in directed
            if (b, a) in directed}
    assert got == want and got  # non-empty on the fixture
    built = {(r.id_a, r.id_b)
             for r in mutual_knn_pairs(corpus, k=5).collect()}
    assert built == got
    g.unpersist()


def test_semantic_cluster_dedup_policies(spark, corpus):
    """Graph-clustered dedup: survivors equal a driver-side union-find
    over the mutual edges (min-id policy), the quality policy keeps
    the best-scoring member per cluster, and untouched vectors pass
    through."""
    from pydin_spark.operators.similarity import (mutual_knn_pairs,
                                                  semantic_cluster_dedup)
    edges = [(r.id_a, r.id_b) for r in
             mutual_knn_pairs(corpus, k=5).where("cosine >= 0.4")
             .collect()]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_ids = [r.vec_id for r in corpus.select("vec_id").collect()]
    clustered = {x: find(x) for x in parent}
    want = {x for x in all_ids
            if x not in clustered or clustered[x] == x}
    got = {r.vec_id for r in
           semantic_cluster_dedup(corpus, k=5, threshold=0.4).collect()}
    assert got == want
    # quality policy: per cluster the max-score member survives
    from pyspark.sql import functions as F
    scored = corpus.withColumn("score",
                               (F.col("vec_id") * 37 % 101).cast("double"))
    got_q = {r.vec_id for r in
             semantic_cluster_dedup(scored, k=5, threshold=0.4,
                                    order_col="score").collect()}
    from collections import defaultdict
    clusters = defaultdict(list)
    for x in all_ids:
        clusters[clustered.get(x, x) if x in clustered else x].append(x)
    want_q = set()
    for rep, members in clusters.items():
        if len(members) == 1:
            want_q.add(members[0])
        else:
            want_q.add(max(members, key=lambda x: (x * 37 % 101, -x)))
    assert got_q == want_q


def test_semantic_cluster_dedup_graph_hook(spark, corpus):
    """graph= reuses a prebuilt graph (same survivors as building
    internally); centers= under method='exact' is refused instead of
    silently ignored."""
    import pytest
    from pydin_spark.operators.similarity import (knn_graph,
                                                  semantic_cluster_dedup)
    g = knn_graph(corpus, k=5).localCheckpoint(eager=True)
    canon = lambda df: sorted(r.vec_id for r in df.select("vec_id").collect())
    assert canon(semantic_cluster_dedup(corpus, k=5, threshold=0.4,
                                        graph=g)) == \
        canon(semantic_cluster_dedup(corpus, k=5, threshold=0.4))
    with pytest.raises(ValueError, match="centers="):
        semantic_cluster_dedup(corpus, k=5, centers=[[1.0, 0.0]])
