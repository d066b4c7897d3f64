"""Raw-web ingest — the front end the other pipelines assume.

Run:  python examples/web_ingest.py [out_dir]

Raw markup-bearing pages → ``strip_markup`` (tags/entities out, zero
Python) → ``c4_line_filter`` (the public C4 rule set) →
``top_ngrams`` boilerplate report → ``line_dedup`` (corpus-first
boilerplate-line cut) → ``deterministic_shuffle`` → ordered training
shards on disk. Every stage is a lazy DataFrame transform and the
shard write is ``partitionBy(shard)`` with within-shard order — the
same script IS the 100 TB plan: the only driver-side rows are the
top-ngram report (k rows).

``corpus_scrub.py`` / ``training_data_prep.py`` pick up from here
(dedup → quality → split → pack); this file is the markup-to-clean-
lines stage in front of them.

The fixture is single-space word soup, so the script first dresses it
as web pages (tags, entities, line structure, injected boilerplate
banner) — the same deterministic construction the oracle gate uses,
exercising every rule with verifiable expectations.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from pydin_spark import get_session, load_table
from pydin_spark.operators import curation, text

SF_DIR = "/root/testdata/sf0.01"
N_SHARDS = 8


def as_web_pages(docs):
    """Dress the word-soup fixture as markup-bearing web pages:
    8-word lines with terminal punctuation, a nav-banner boilerplate
    line on every page (the line_dedup target), tags around emphasis
    words, an entity-laden footer."""
    toks = F.split(F.col("text"), " ")
    nl = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.concat(
            F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
            F.lit(".")))
    body = F.array_join(lines, "\n")
    page = F.concat(
        F.lit("<html><body><p>home about products contact "
              "subscribe now please.</p>\n"),          # shared banner
        F.lit('<div class="content">'),
        F.replace(body, F.lit(" value "), F.lit(" <b>value</b> ")),
        F.lit("</div>\n<p>&copy; corp &amp; co. all rights "
              "reserved here.</p></body></html>"))
    return docs.select("doc_id", "lang", "source",
                       page.alias("text"))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_session("web-ingest", master="local[8]")
    pages = as_web_pages(load_table(spark, SF_DIR, "documents"))
    n0 = pages.count()

    # 1. markup out — tags/blocks/entities become clean text, but the
    #    LINE structure survives (strip_markup only collapses spaces
    #    when asked; newlines stay line separators here). The stray
    #    spaces stripped tags leave behind are c4_line_filter's
    #    problem — it trims each line before testing (C4 behavior)
    clean = text.strip_markup(pages, collapse_whitespace=False)
    clean = clean.withColumn(
        "text", F.regexp_replace("text", r"[ \t]+", " "))

    # 2. C4 rules: short/punctuation-less/javascript lines out,
    #    template-y pages out entirely
    kept = text.c4_line_filter(clean, min_lines=2)

    # 3. boilerplate report: what repeated trigrams dominate the
    #    corpus? (the banner should top this table)
    report = text.top_ngrams(kept, n=3, k=5).collect()

    # 4. corpus-first line dedup: the shared banner survives on ONE
    #    page and is cut from every other
    deduped = text.line_dedup(kept.select("doc_id", "text"),
                              min_tokens=3)

    # 5. reproducible shard assignment + ordered export: one shuffle,
    #    one ordered file per shard, identical layout on rerun
    sharded = curation.deterministic_shuffle(
        deduped.where(F.length("text") > 0), n_shards=N_SHARDS)
    # sort key leads with shard: the dynamic-partition writer needs
    # ordering by the partition column, and its own inserted Sort is
    # unstable under spill (would scramble pos within a shard)
    (sharded.repartition(N_SHARDS, "shard")
     .sortWithinPartitions("shard", "pos")
     .write.mode("overwrite").partitionBy("shard").parquet(out_dir))

    out = spark.read.parquet(out_dir)
    n_out = out.count()
    n_shards = out.select("shard").distinct().count()
    banner_docs = out.where(
        F.col("text").contains("home about products")).count()
    print(f"pages in:  {n0}")
    print(f"pages out: {n_out}  (C4 + line-dedup survivors)")
    print("top boilerplate trigrams:")
    for r in report:
        print(f"  {r['rank']:>2}. {r['ngram']!r}  in {r['doc_freq']} docs")
    print(f"banner survives in exactly {banner_docs} doc(s) "
          f"(corpus-first line dedup)")
    print(f"shards: {n_shards} ordered files under {out_dir}")
    assert n_shards == N_SHARDS and banner_docs == 1
    spark.stop()


if __name__ == "__main__":
    main()
