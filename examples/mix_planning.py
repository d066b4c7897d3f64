"""Pretraining mix planning end-to-end: the round-8 curation chain.

The pattern: fuse incomparable quality signals WITHOUT calibrating
them (reciprocal-rank fusion), split the corpus into CCNet-style
fluency tertiles, plan the per-source token budget in exact integer
shares — once against raw supply, once against DEDUP-EFFECTIVE supply
so a source that is one giant duplicate cluster cannot inflate its
share — and export the final stream mixture-scheduled.

  1. FUSE: ``rank_fusion`` over (length prior, token count) — only
     rankings enter, so the signals need no common scale.
  2. BUCKET: ``bigram_logprob(quantized=True)`` →
     ``curriculum_order(n_shards=3)`` — the head/middle/tail split
     CCNet filters on (run-deterministic integer score).
  3. PLAN: ``epoch_plan`` — target tokens and milli-epochs per source
     (>1000 = the source repeats, <1000 = subsampled).
  4. PLAN (dedup-aware): the same table over effective milli-tokens
     ``(ntok·1000) div cluster_size`` from ``soft_dedup_weights``.
  5. EXPORT: ``interleave_by_rates`` — every source at its planned
     rate in every prefix of the stream.

Usage: python examples/mix_planning.py [sf_dir]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from pydin_spark import get_session, register_tables  # noqa: E402
from pydin_spark.operators import curation, dedup, text  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("mix-planning")
    register_tables(spark, sf_dir)
    docs = spark.table("documents")

    # 1. fuse two incomparable signals by rank
    sig = docs.select(
        "doc_id", "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long")
        .alias("n_tokens"))
    fused = curation.rank_fusion(sig, ["n_chars", "n_tokens"], k=60)
    print("== rank fusion (top 5 fused) ==")
    fused.orderBy(F.desc("rrf"), "doc_id").show(5)

    # 2. CCNet fluency tertiles (deterministic integer LM score)
    scored = text.bigram_logprob(docs, quantized=True)
    buckets = curation.curriculum_order(
        scored.select("doc_id", "nlp_q"), score_col="nlp_q",
        n_shards=3, ascending=False)
    print("== CCNet tertile sizes (0 = head) ==")
    buckets.groupBy("shard").count().orderBy("shard").show()

    # 3. raw-supply epoch plan for five sources at weights 1..5
    weights = {f"src{i}": i + 1 for i in range(5)}
    plan = curation.epoch_plan(docs, weights, budget_tokens=100_000)
    print("== epoch plan (raw supply) ==")
    plan.orderBy("source").show()

    # 4. dedup-effective supply: a duplicate-heavy source plans small
    w = dedup.soft_dedup_weights(docs, threshold=0.2,
                                 max_shingle_freq=100)
    eff = (docs.join(w, "doc_id")
           .select("doc_id", "source",
                   F.expr("(size(split(text, ' ')) * 1000L) "
                          "div cluster_size").alias("eff_milli")))
    plan_eff = curation.epoch_plan(eff, weights,
                                   budget_tokens=100_000_000,
                                   token_col="eff_milli")
    print("== epoch plan (dedup-effective supply, milli-tokens) ==")
    plan_eff.orderBy("source").show()

    # 5. mixture-scheduled export at the planned integer weights
    out = curation.interleave_by_rates(
        docs.where(F.col("source").isin(list(weights))),
        weights, order_col="n_chars", n_shards=4)
    print("== export head (every source at its rate in every prefix) ==")
    out.orderBy("rk").select("rk", "source", "doc_id", "shard",
                             "pos").show(10)


if __name__ == "__main__":
    main()
