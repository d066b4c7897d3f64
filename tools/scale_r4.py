"""Scaling replay for the round-4 operators: sf0.1 vs the 10x replica.

Usage: python tools/scale_r4.py [sf01_dir] [sf1_dir]

Times each new operator at both scales (median of `REPS` after an
untimed warm-up, same methodology as bench.py) and prints a markdown
table for PERF.md. The interesting column is the ratio: scan-shaped
operators (bloom build/probe, scorer, profile, normalize) should track
data volume ~linearly; the state-backed ones (StoredBloom, incremental
line dedup) should track the BATCH, not the corpus.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pydin_spark import get_session, load_table  # noqa: E402
from pydin_spark.operators import curation, text  # noqa: E402
from pydin_spark.operators.rollup import (StoredBloom,  # noqa: E402
                                          bloom_build, bloom_contains)

REPS = 3


def timed(fn):
    fn()  # warm-up (plans compile, code gens, caches fill)
    samples = []
    for _ in range(REPS):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    return statistics.median(samples)


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    docs = load_table(spark, sf_dir, "documents").localCheckpoint()
    ev = load_table(spark, sf_dir, "events").localCheckpoint()
    out: dict[str, float] = {}

    def bloom_probe():
        vocab = docs.select(
            F.explode(F.split("text", " ")).alias("t"))
        bl = bloom_build(vocab, "t", m_bits=1 << 17)
        bloom_contains(vocab, bl, "t", m_bits=1 << 17) \
            .where("NOT maybe_in").count()

    out["bloom build+probe (vocab)"] = timed(bloom_probe)

    out["decontaminate_bloom"] = timed(
        lambda: curation.decontaminate_bloom(
            docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1"),
            threshold=0.5).count())

    out["line_dedup (word grain)"] = timed(
        lambda: text.line_dedup(docs, sep=" ", join_sep=" ")
        .agg(F.sum("n_kept")).collect())

    w = (docs.sparkSession.range(4096)
         .select(F.col("id").alias("bucket"),
                 (((F.col("id") % 13) - 6) / 1000.0).alias("w")))
    out["apply_linear_scorer"] = timed(
        lambda: curation.apply_linear_scorer(docs, w, n_buckets=4096)
        .where("keep").count())

    out["profile (exact distinct)"] = timed(
        lambda: curation.profile(docs, exact_distinct=True).collect())

    out["normalize_text (NFC)"] = timed(
        lambda: text.normalize_text(docs, collapse_whitespace=True)
        .agg(F.sum(F.length("text"))).collect())

    def stored_bloom():
        d = tempfile.mkdtemp(prefix="sb_")
        sb = StoredBloom(d + "/b", "user_id", bucket="1 day",
                         m_bits=1 << 17)
        sb.refresh(ev)
        sb.serve(ev.sparkSession).count()

    out["StoredBloom refresh+serve"] = timed(stored_bloom)

    def incr_line():
        d = tempfile.mkdtemp(prefix="il_")
        inc = text.IncrementalLineDeduper(d + "/st", sep=" ",
                                          join_sep=" ")
        inc.ingest(docs.where("doc_id % 2 = 0"))
        inc.ingest(docs.where("doc_id % 2 = 1")) \
            .agg(F.sum("n_kept")).collect()

    out["IncrementalLineDeduper 2-ingest"] = timed(incr_line)
    return out


def main():
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    spark = get_session("scale-r4", extra_conf={
        "spark.driver.memory": "32g"})
    small = run_suite(spark, sf01)
    spark.catalog.clearCache()
    big = run_suite(spark, sf1)
    print("\n| operator | sf0.1 | sf1 (10x) | ratio |")
    print("|---|---|---|---|")
    for k in small:
        r = big[k] / small[k] if small[k] else float("nan")
        print(f"| {k} | {small[k]:.2f} s | {big[k]:.2f} s | {r:.1f}x |")


if __name__ == "__main__":
    main()
