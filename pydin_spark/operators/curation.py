"""Corpus-curation operators: the selection/packing stages of an LLM
training-data pipeline (engine extension beyond the reference surface,
sitting on the text/dedup operators).

- :func:`sample_stratified` — deterministic hash sampling, optionally
  with per-stratum rates (downsample overrepresented languages /
  sources). Hash-based, so the sample is stable across runs, resumable,
  and needs NO shuffle — a filter, not a sort.
- :func:`pack_sequences` — concat-and-chunk sequence packing: documents
  are laid out on one token stream in id order and each doc is
  assigned the training chunk its first token lands in. Distributed
  two-phase prefix sum — per-partition subtotals (tiny driver
  aggregation, one row per partition) then a partition-local cumsum —
  so no global single-partition window at 100 TB.
- :func:`curate_corpus` — the composed pipeline: language filter →
  quality filter → near-dup scrub → survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup, text


def _hash_unit(col, seed: int):
    """Deterministic uniform double in [0,1) from md5 (md5 exists in
    DuckDB too, so oracles reproduce the exact sample): first 15 hex
    chars → 60-bit int / 2^60."""
    h = F.conv(F.substring(F.md5(F.concat_ws("#", col, F.lit(seed))),
                           1, 15), 16, 10).cast("double")
    return h / F.lit(float(1 << 60))


def sample_stratified(df: DataFrame, fraction: float | None = None,
                      id_col: str = "doc_id",
                      strata_col: str | None = None,
                      rates: dict[str, float] | None = None,
                      seed: int = 42) -> DataFrame:
    """Deterministic hash sample: keep rows whose md5-derived unit
    uniform is below the rate. With ``strata_col``+``rates``, each
    stratum gets its own rate (absent strata keep ``fraction``, or 0).

    Pure filter — no shuffle, no state, reproducible at any scale and
    under reruns (the decision depends only on the id and seed).
    """
    u = _hash_unit(F.col(id_col).cast("string"), seed)
    if strata_col is None:
        if fraction is None:
            raise ValueError("need fraction or (strata_col, rates)")
        return df.where(u < F.lit(float(fraction)))
    rate = F.lit(float(fraction if fraction is not None else 0.0))
    for value, r in (rates or {}).items():
        rate = F.when(F.col(strata_col) == value,
                      F.lit(float(r))).otherwise(rate)
    return df.where(u < rate)


def pack_sequences(df: DataFrame, capacity: int = 512,
                   id_col: str = "doc_id",
                   token_col: str | None = None,
                   text_col: str = "text") -> DataFrame:
    """Concat-and-chunk packing: documents concatenated in ``id_col``
    order onto one token stream; ``bin_id`` = which ``capacity``-token
    training chunk the document STARTS in (the standard pre-tokenization
    packing approximation). Output: (id, n_tokens, start_offset, bin_id).

    Scale shape: ``repartitionByRange(id)`` then a two-phase prefix sum —
    per-partition token subtotals come back to the driver (one row per
    partition), partition offsets go out with the next pass — instead of
    a global single-partition window. The driver never sees row data.
    """
    if token_col is None:
        counted = df.select(F.col(id_col),
                            F.size(F.split(F.col(text_col), " "))
                            .cast("long").alias("n_tokens"))
        token_col = "n_tokens"
    else:
        counted = df.select(F.col(id_col),
                            F.col(token_col).cast("long").alias("n_tokens"))
    spark = df.sparkSession
    nparts = spark.sparkContext.defaultParallelism
    part = (counted.repartitionByRange(nparts, F.col(id_col))
            .sortWithinPartitions(id_col)
            .withColumn("__pid", F.spark_partition_id())
            .persist())
    # phase 1: per-partition totals (tiny: one row per partition)
    totals = {r["__pid"]: r["t"] for r in
              part.groupBy("__pid").agg(F.sum("n_tokens").alias("t"))
              .collect()}
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]

    # phase 2: partition-local cumsum + global offset
    def add_bins(batches):
        import pandas as pd  # noqa: F401
        carry = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["__pid"].iloc[0])
            start = carry.get(pid, offsets.get(pid, 0))
            cum = pdf["n_tokens"].cumsum() + start
            pdf = pdf.assign(start_offset=cum - pdf["n_tokens"])
            carry[pid] = int(cum.iloc[-1])
            pdf["bin_id"] = pdf["start_offset"] // capacity
            yield pdf[[id_col, "n_tokens", "start_offset", "bin_id"]]

    out = part.mapInPandas(
        add_bins,
        schema=f"{id_col} long, n_tokens long, start_offset long, "
               "bin_id long")
    return out


def curate_corpus(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", language: str = "en",
                  min_quality: float = 0.5,
                  dedup_threshold: float = 0.5,
                  max_shingle_freq: int | None = 100) -> DataFrame:
    """The composed curation pipeline: keep documents in ``language``
    with quality >= ``min_quality``, then scrub near-duplicates
    (keep-lowest-id) — the canonical select-then-dedup ordering (filters
    first: they are shuffle-free and shrink the quadratic stage's
    input). Returns surviving documents with their quality score."""
    lang = (text.language_id(df, id_col, text_col)
            .where(F.col("pred_lang") == language).select(id_col))
    qual = (text.quality_score(df, id_col, text_col)
            .where(F.col("quality") >= min_quality)
            .select(id_col, "quality"))
    kept = (df.join(lang, id_col, "left_semi")
            .join(qual, id_col))
    survivors = dedup.drop_near_dups(
        kept, id_col, text_col, threshold=dedup_threshold,
        max_shingle_freq=max_shingle_freq, method="exact")
    return survivors.select(id_col, text_col, "quality")
