"""Training-data preparation — the round-2 curation operators composed.

Run:  python examples/training_data_prep.py [out_dir]

documents → Gopher quality rules → PII redaction → decontamination
against a held-out eval split → deterministic sampling → sequence
packing; embeddings → L2 normalize → int8 quantize. Every stage is a
lazy DataFrame transform (no driver-side data), so the same script is
the 100 TB plan.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pydin_spark import get_session, load_table
from pydin_spark.operators import curation, redact, similarity, text

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_session("training-data-prep", master="local[8]")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. quality gate: Gopher-style rules, keep verdict only
    keep = (text.gopher_quality_filter(docs)
            .where("keep").select("doc_id"))
    docs = docs.join(keep, "doc_id", "left_semi")

    # 2. PII masking (counts kept for the audit report)
    red = redact.redact_pii(docs)
    docs = (docs.drop("text")
            .join(red.select("doc_id", F.col("redacted").alias("text")),
                  "doc_id"))

    # 3. decontaminate vs a held-out eval split (odd ids here)
    train = docs.where("doc_id % 2 = 0")
    evalset = docs.where("doc_id % 2 = 1")
    train = curation.decontaminate(train, evalset, threshold=0.5)

    # 4. deterministic stratified sample (downweight English)
    sampled = curation.sample_stratified(
        train, fraction=0.9, strata_col="lang", rates={"en": 0.5})

    # 5. pack into fixed-capacity training sequences
    packed = curation.pack_sequences(sampled, capacity=512)

    # 6. embeddings: normalize + int8 quantize for the ANN index
    emb = load_table(spark, SF_DIR, "embeddings")
    q = similarity.quantize_int8(similarity.with_unit_norm(emb),
                                 vec_col="unit")

    packed.write.mode("overwrite").parquet(f"{out_dir}/packed")
    q.write.mode("overwrite").parquet(f"{out_dir}/vectors_int8")

    spark.catalog.refreshByPath(f"{out_dir}/packed")
    n_packed = spark.read.parquet(f"{out_dir}/packed").count()
    n_bins = (spark.read.parquet(f"{out_dir}/packed")
              .select("bin_id").distinct().count())
    print(f"{n0} docs -> {n_packed} packed docs in {n_bins} bins; "
          f"vectors at {out_dir}/vectors_int8")


if __name__ == "__main__":
    main()
