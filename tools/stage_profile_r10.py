"""Stage-by-stage timing of the dedup headline paths (round 10).
Usage: python tools/stage_profile_r10.py [sf_dir]"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pydin_spark import get_session, register_tables  # noqa: E402
from pydin_spark.operators import dedup  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label}: {time.time()-t0:.3f}s", flush=True)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("stage-profile",
                        extra_conf={"spark.driver.memory": "32g"})
    register_tables(spark, sf_dir)
    docs = spark.table("documents")

    for rnd in range(2):
        print(f"== round {rnd} (0 = cold) ==", flush=True)
        spark.catalog.clearCache()

        # --- ngram path, staged ---
        sh_raw = dedup.word_shingles(docs, "doc_id", "text", 3,
                                     hashed=True).persist()
        t("ngram raw shingles materialize", lambda: noop(sh_raw))
        from pyspark.sql import Window
        w = Window.partitionBy("shingle")
        capped = (sh_raw.withColumn("df", F.count(F.lit(1)).over(w))
                  .where(F.col("df") <= 100))
        t("ngram window+cap pass (uncached)", lambda: noop(capped))
        capped_c = capped.persist()
        t("ngram budget agg (populates cap cache)",
          lambda: capped_c.agg(F.sum(F.col("df") - 1)).first())
        cap2 = capped_c.drop("df")
        sizes = cap2.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        t("ngram sizes agg from cache", lambda: noop(sizes))
        shared = dedup._shared_shingle_pairs(cap2, "doc_id")
        t("ngram pair join+agg", lambda: noop(shared))
        sa = sizes.select(F.col("doc_id").alias("id_a"),
                          F.col("sz").alias("sz_a"))
        sb = sizes.select(F.col("doc_id").alias("id_b"),
                          F.col("sz").alias("sz_b"))
        full = (shared.join(sa, "id_a").join(sb, "id_b")
                .withColumn("jaccard", F.col("shared") /
                            (F.col("sz_a") + F.col("sz_b")
                             - F.col("shared")))
                .where(F.col("jaccard") >= 0.2))
        t("ngram full (joins from caches)", lambda: noop(full))
        spark.catalog.clearCache()

        # --- current entry-point ngram, one shot ---
        t("ngram ENTRY one-shot", lambda: noop(
            dedup.ngram_jaccard_pairs(docs, threshold=0.2,
                                      max_shingle_freq=100)))
        spark.catalog.clearCache()

        # --- minhash path, staged ---
        sh2 = dedup.word_shingles(docs, "doc_id", "text", 3,
                                  hashed=True).persist()
        t("mh shingles materialize", lambda: noop(sh2))
        sig = dedup.minhash_signatures(docs, num_hashes=32, shingles=sh2)
        t("mh signatures", lambda: noop(sig))
        buckets = dedup._band_buckets(sig, "doc_id", 32, 8).persist()
        t("mh buckets materialize", lambda: noop(buckets))
        left = buckets.select(F.col("doc_id").alias("id_a"), "band", "bh")
        right = buckets.select(F.col("doc_id").alias("id_b"), "band", "bh")
        cand = (left.join(right, ["band", "bh"])
                .where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct())
        t("mh candidates", lambda: noop(cand))
        ver = dedup.jaccard_for_pairs(cand, docs, shingles=sh2) \
            .where(F.col("jaccard") >= 0.9)
        t("mh verify (from caches)", lambda: noop(ver))
        spark.catalog.clearCache()
        t("mh ENTRY one-shot", lambda: noop(
            dedup.minhash_lsh_pairs(docs, threshold=0.9, num_hashes=32,
                                    bands=8)))
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
