"""Classifier-in-the-loop curation at 10x scale (PERF.md evidence).

The CCNet/LLaMA-1 quality pipeline end-to-end, on the 10x document
replica (/tmp/sf1, 50k docs — build with tools/build_sf1.py):

  1. SEED: weak-label a small sample with the heuristic Gopher gate
     (keep = positive, reject = negative) — the standard bootstrap
     when no curated seed corpus exists.
  2. TRAIN: ``train_quality_classifier`` — distributed MLlib logistic
     regression over hashed bag-of-n-grams. Python touches only the
     seed (thousands of docs), never the corpus.
  3. SCORE: ``apply_linear_scorer`` over the FULL corpus — broadcast
     weight join + decimal dot product, pure column arithmetic (the
     plan-level no-Python guarantee is pinned by
     tests/test_r4_operators.py's scorer plan test).
  4. SELECT: ``keep_top_fraction`` at the margin percentile.

Measures scorer throughput against the heuristic gate it replaces —
the two candidate architectures for the 100 TB quality pass — and
prints a markdown table for PERF.md.

Usage: python examples/classifier_curation.py [big_dir]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pydin_spark import get_session, load_table
from pydin_spark.operators import curation, text

REPS = 3


def timed(fn):
    fn()
    samples = []
    for _ in range(REPS):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 2)


def main() -> None:
    big_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    if not os.path.isdir(big_dir):
        sys.exit(f"{big_dir} missing — run tools/build_sf1.py first")
    spark = get_session("classifier-curation",
                        extra_conf={"spark.driver.memory": "32g"})
    docs = load_table(spark, big_dir, "documents").localCheckpoint()
    n_docs = docs.count()

    # 1. weak-label a 10% seed with the heuristic gate
    seed = docs.sample(fraction=0.1, seed=7)
    gated = text.gopher_quality_filter(seed, min_tokens=5) \
        .select("doc_id", "keep")
    seed_lbl = seed.join(gated, "doc_id")
    pos = seed_lbl.where("keep").select("doc_id", "text")
    neg = seed_lbl.where("NOT keep").select("doc_id", "text")
    n_pos, n_neg = pos.count(), neg.count()
    print(f"# seed: {n_pos} pos / {n_neg} neg of {n_docs} docs",
          file=sys.stderr)

    # 2. train on the seed (distributed LBFGS; seed-sized Python)
    t0 = time.time()
    weights, intercept = curation.train_quality_classifier(
        pos, neg, n_buckets=4096, max_ngram=2, max_iter=30)
    t_train = round(time.time() - t0, 2)
    weights = weights.localCheckpoint()

    # 3+4. score the FULL corpus, keep the top half by margin
    def scored():
        return curation.apply_linear_scorer(
            docs, weights, intercept=intercept, n_buckets=4096,
            max_ngram=2)

    t_score = timed(lambda: scored().agg(F.sum(
        F.col("keep").cast("long"))).collect())
    kept = curation.keep_top_fraction(scored(), "margin", 0.5)
    n_kept = kept.count()

    # agreement with the weak labels it was trained on (sanity: the
    # linear model should reproduce most of the heuristic's verdicts)
    full_gate = text.gopher_quality_filter(docs, min_tokens=5) \
        .select("doc_id", F.col("keep").alias("heur_keep"))
    agree = (scored().join(full_gate, "doc_id")
             .agg(F.avg((F.col("keep") == F.col("heur_keep"))
                        .cast("double"))).first()[0])

    # heuristic gate over the same corpus — the baseline architecture
    t_heur = timed(lambda: text.gopher_quality_filter(
        docs, min_tokens=5).agg(F.sum(
            F.col("keep").cast("long"))).collect())

    print("\n| step | time | note |")
    print("|---|---|---|")
    print(f"| train (seed {n_pos + n_neg} docs) | {t_train} s | "
          "MLlib LBFGS, one-off |")
    print(f"| score {n_docs} docs (linear model) | {t_score} s | "
          "broadcast weights, no Python |")
    print(f"| heuristic Gopher gate, same docs | {t_heur} s | "
          "pure Column rules |")
    print(f"| top-50% selection | — | kept {n_kept} of {n_docs} |")
    print(f"| verdict agreement model vs heuristic | {agree:.1%} | "
          "weak-label recovery |")


if __name__ == "__main__":
    main()
