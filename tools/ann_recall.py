"""Recall/latency curves for the PRUNED ANN operating points.

The correctness gate pins the exhaustive anchors (multiprobe=planes,
nprobe=nlist ≡ brute force); this tool measures what the *pruning*
actually trades: recall@k against the brute-force oracle vs wall time,
per operating point, on the driver fixture embeddings. Output is the
markdown table PERF.md embeds; tests/test_ann_recall.py pins floors at
the documented defaults so a regression in bucketing/probing fails CI.

Usage: python tools/ann_recall.py [sf_dir] [k] [n_queries]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydin_spark import get_session, load_table  # noqa: E402
from pydin_spark.operators import similarity  # noqa: E402


def truth_sets(emb, q, k):
    exact = similarity.cosine_topk(emb, q, k=k)
    out: dict[int, set] = {}
    for r in exact.collect():
        out.setdefault(r["query_id"], set()).add(r["nbr_id"])
    return out


def recall(result_rows, truth) -> float:
    got: dict[int, set] = {}
    for r in result_rows:
        got.setdefault(r["query_id"], set()).add(r["nbr_id"])
    hits = sum(len(got.get(qid, set()) & t) for qid, t in truth.items())
    total = sum(len(t) for t in truth.values())
    return hits / total if total else 1.0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    spark = get_session("ann-recall")
    emb = load_table(spark, sf_dir, "embeddings").persist()
    n_corpus = emb.count()
    q = emb.where(f"vec_id < {n_q}").selectExpr(
        "vec_id AS query_id", "embedding").persist()
    q.count()

    truth = truth_sets(emb, q, k)
    t0 = time.time()
    similarity.cosine_topk(emb, q, k=k).collect()
    brute_s = time.time() - t0

    print(f"corpus={n_corpus} dim=64 queries={n_q} k={k} "
          f"brute-force={brute_s:.2f}s\n")
    print("| engine | operating point | recall@%d | wall s | vs brute |"
          % k)
    print("|---|---|---|---|---|")

    planes = 8
    for mp in (0, 1, 2, 3, planes):
        t0 = time.time()
        rows = similarity.lsh_topk(emb, q, k=k, planes=planes,
                                   multiprobe=mp).collect()
        dt = time.time() - t0
        tag = "exhaustive ≡ brute" if mp == planes else ""
        print(f"| lsh_topk | planes=8, multiprobe={mp} "
              f"| {recall(rows, truth):.3f} | {dt:.2f} "
              f"| {dt / brute_s:.2f}x {tag}|")

    nlist = 16
    scratch = tempfile.mkdtemp(prefix="ann_recall_ivf_")
    idx = similarity.IVFIndex(f"{scratch}/ivf", nlist=nlist)
    t0 = time.time()
    idx.build(emb)
    build_s = time.time() - t0
    for nprobe in (1, 2, 4, 8, nlist):
        t0 = time.time()
        rows = idx.query(q, k=k, nprobe=nprobe).collect()
        dt = time.time() - t0
        tag = "exhaustive ≡ brute" if nprobe == nlist else ""
        print(f"| IVFIndex | nlist=16, nprobe={nprobe} "
              f"| {recall(rows, truth):.3f} | {dt:.2f} "
              f"| {dt / brute_s:.2f}x {tag}|")
    print(f"\nIVF build (train+assign+write): {build_s:.2f}s")


if __name__ == "__main__":
    main()
