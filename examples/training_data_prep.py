"""Training-data preparation — the curation operator kit composed.

Run:  python examples/training_data_prep.py [out_dir]

documents → Gopher quality rules → bigram-LM fluency floor → PII
redaction → duplicate-substring span cutting → transitive near-dup
clustering (best-quality survivor per cluster) → deterministic
train/val/test hash split → decontamination of train against the held
-out split → mixture resampling to target source shares → sequence
packing; embeddings → L2 normalize → int8 quantize. Every stage is a
lazy DataFrame transform (no driver-side data), so the same script is
the 100 TB plan.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pydin_spark import get_session, load_table
from pydin_spark.operators import curation, dedup, redact, similarity, text

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_session("training-data-prep", master="local[8]",
                        extra_conf={"spark.driver.memory": "6g"})
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. quality gates: Gopher-style rules + a bigram-LM fluency floor
    keep = (text.gopher_quality_filter(docs)
            .where("keep").select("doc_id"))
    docs = docs.join(keep, "doc_id", "left_semi")
    fluent = (text.bigram_logprob(docs)
              .where("avg_logprob > -9").select("doc_id"))
    docs = docs.join(fluent, "doc_id", "left_semi")

    # 1b. fastText/CCNet-style learned quality gate: bootstrap labels
    # from the heuristic quality score (top quartile = positive seed,
    # bottom quartile = negative), train the linear classifier on the
    # hashed-n-gram bag, score EVERYTHING with pure column arithmetic
    # (broadcast weight join — the shape that scores 100 TB), keep
    # positive margins
    qs = text.quality_score(docs).select("doc_id", "quality")
    lab = docs.join(qs, "doc_id")
    hi = curation.keep_top_fraction(lab, "quality", 0.25)
    lo = curation.keep_top_fraction(
        lab.withColumn("quality", -F.col("quality")), "quality", 0.25)
    w, b = curation.train_quality_classifier(hi, lo, n_buckets=2048,
                                             max_iter=20)
    scored = curation.apply_linear_scorer(docs, w, intercept=b,
                                          n_buckets=2048)
    docs = docs.join(scored.where("keep").select("doc_id"),
                     "doc_id", "left_semi")

    # (On real multi-line corpora, text.line_dedup(sep="\n") would run
    # here — C4-style corpus-wide boilerplate-line removal. The
    # fixture texts are single-line word salad, where line dedup at
    # any grain guts the corpus, so this pipeline skips it.)

    # 2. PII masking (counts kept for the audit report)
    red = redact.redact_pii(docs)
    docs = (docs.drop("text")
            .join(red.select("doc_id", F.col("redacted").alias("text")),
                  "doc_id"))

    # 3. cut exact duplicate substrings (keep the corpus-first copy),
    # writing the span-level provenance next to the output — the audit
    # table that says which doc each cut span first appeared in.
    # Single-pass: one k-gram inventory serves both outputs; owned
    # frames are released after the final writes (bounded-cache
    # discipline — leaked persists slow every later stage).
    owned = []
    rewritten, provenance = text.rewrite_with_provenance(
        docs, k=20, owned_frames=owned)
    docs = (docs.drop("text")
            .join(rewritten.select("doc_id", "text"), "doc_id"))

    # plan hygiene: the dedup stages below branch over `docs` several
    # times — truncate the lineage so each branch starts from the
    # materialized redacted/cut frame instead of replaying stages 1-3
    docs = docs.localCheckpoint(eager=True)

    # 4. transitive near-dup clusters; keep the best-quality member
    quality = text.quality_score(docs).select("doc_id", "quality")
    scored = docs.join(quality, "doc_id")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    docs = dedup.pick_cluster_survivors(scored, pairs,
                                        order_col="quality")

    docs = docs.localCheckpoint(eager=True)

    # 5. deterministic split — append-consistent, eval set stays
    # frozen, and near-dup clusters move between splits as a UNIT so
    # the held-out set can't leak training text
    split = curation.leakage_safe_split(docs, threshold=0.5)
    train = split.where("split = 'train'").drop("split", "group_id")
    heldout = split.where("split != 'train'").drop("split", "group_id")

    # 5b. a size-guaranteed eval slice: exactly 25 docs per language
    # from the held-out split, stable across reruns (md5 rank order)
    eval_set = curation.sample_exact_k(heldout, k=25, strata_col="lang")

    # 6. decontaminate train against the held-out split — the Bloom
    # shape: the eval corpus compresses into a broadcast filter and
    # the train side stays a pure scan (zero train-side shuffle before
    # the per-doc containment aggregate)
    train = curation.decontaminate_bloom(train, heldout, threshold=0.5)

    # 7. resample to target source mixture (first 4 sources 4:3:2:1),
    # then temperature-smooth the language mixture (alpha=0.5 lifts
    # low-resource languages toward parity without drowning the head)
    train = curation.mixture_sample(
        train, {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        strata_col="source")
    train = curation.temperature_mixture(train, alpha=0.5,
                                         strata_col="lang")

    # 7b. percentile quality gate: keep the top 80% by quality score
    # within each source (the approx path needs no rank window and is
    # the shape that survives 100 TB)
    tq = text.quality_score(train).select(
        "doc_id", F.col("quality").alias("gate_score"))
    train = (train.join(tq, "doc_id")
             .transform(lambda d: curation.keep_top_fraction(
                 d, "gate_score", 0.8, strata_col="source", approx=True))
             .drop("gate_score"))

    # 8. domain targeting: DSIR importance resampling toward the
    # English slice as the target distribution (hashed-n-gram
    # likelihood ratios; deterministic Gumbel top-k)
    target = train.where("lang = 'en'")
    n_keep = max(int(train.count() * 0.8), 1)
    picked = curation.importance_resample(train, target, k=n_keep,
                                          owned_frames=owned)
    train = train.join(picked.select("doc_id"), "doc_id", "left_semi")

    # 9. context-window chunking of long documents, then pack the
    # chunks into fixed-capacity training sequences
    chunks = text.chunk_text(train, chunk_tokens=256, overlap=32)
    chunks = chunks.select(
        F.concat_ws("_", "doc_id", "chunk_id").alias("doc_id"),
        F.col("chunk").alias("text"))
    packed = curation.pack_sequences(chunks, capacity=512)

    # 10. embeddings: semantic near-dup scrub (cluster-bounded cosine
    # dominance), then normalize + int8 quantize for the ANN index
    emb = load_table(spark, SF_DIR, "embeddings")
    emb = similarity.semantic_dedup(emb, threshold=0.95, nlist=8,
                                    max_iter=3)
    q = similarity.quantize_int8(similarity.with_unit_norm(emb),
                                 vec_col="unit")

    # 11. monitoring: the per-column profile of the final train slice
    # (one full-scan aggregate — the before/after data-quality record)
    report = curation.profile(train)

    packed.write.mode("overwrite").parquet(f"{out_dir}/packed")
    report.write.mode("overwrite").parquet(f"{out_dir}/profile")
    eval_set.write.mode("overwrite").parquet(f"{out_dir}/eval_set")
    q.write.mode("overwrite").parquet(f"{out_dir}/vectors_int8")
    provenance.write.mode("overwrite").parquet(f"{out_dir}/cut_provenance")
    for frame in owned:
        frame.unpersist()

    spark.catalog.refreshByPath(f"{out_dir}/packed")
    n_packed = spark.read.parquet(f"{out_dir}/packed").count()
    n_bins = (spark.read.parquet(f"{out_dir}/packed")
              .select("bin_id").distinct().count())
    n_prov = spark.read.parquet(f"{out_dir}/cut_provenance").count()
    n_eval = spark.read.parquet(f"{out_dir}/eval_set").count()
    print(f"{n0} docs -> {n_packed} packed docs in {n_bins} bins; "
          f"vectors at {out_dir}/vectors_int8; "
          f"{n_prov} cut spans with provenance; "
          f"{n_eval}-doc fixed eval slice")


if __name__ == "__main__":
    main()
