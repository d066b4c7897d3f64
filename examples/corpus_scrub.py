"""LLM training-corpus scrub — the engine-extension pipeline.

Run:  python examples/corpus_scrub.py [out_dir]

documents → exact dedup → near-dup drop (n-gram Jaccard) → language ID
→ quality filter → token accounting → curated parquet, all as lazy
DataFrame stages Catalyst plans end-to-end.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pydin_spark import get_session, load_table
from pydin_spark.operators import dedup, text

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_session("corpus-scrub", master="local[8]")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. exact dedup on normalized-text fingerprint (one shuffle)
    survivors = dedup.exact_dedup(docs).select(
        F.col("keep_id").alias("doc_id"))
    docs = docs.join(survivors, "doc_id", "left_semi")

    # 2. near-dup scrub (inverted-index Jaccard, capped postings)
    docs = dedup.drop_near_dups(docs, threshold=0.5)
    n2 = docs.count()

    # 3. language + quality annotation (pure column math)
    lang = text.language_id(docs).select("doc_id", "pred_lang")
    quality = text.quality_score(docs).select("doc_id", "quality")
    tokens = text.bpe_token_count(docs).select("doc_id", "n_bpe_tokens")
    curated = (docs.join(lang, "doc_id").join(quality, "doc_id")
               .join(tokens, "doc_id")
               .where((F.col("quality") > 0.3)
                      & (F.col("pred_lang") != "und")))

    curated.write.mode("overwrite").parquet(f"{out_dir}/curated")
    result = spark.read.parquet(f"{out_dir}/curated")
    print(f"scrub: {n0} docs → {n2} after dedup → {result.count()} curated")
    print("tokens retained:",
          result.agg(F.sum("n_bpe_tokens")).first()[0])
    result.select("doc_id", "pred_lang", "quality", "n_bpe_tokens") \
        .show(5, truncate=False)


if __name__ == "__main__":
    main()
