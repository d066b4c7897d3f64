"""Skew-aware join helpers and bucketing utilities.

At 100 TB the two join killers are (a) one hot key overwhelming a single
reducer and (b) re-shuffling the same fact table for every join. The
standard remedies, packaged:

- **salting** (``salted_join``): replicate the *small* side ``salt``
  times and spread the big side's hot keys across salt buckets — the hot
  key's rows now land on ``salt`` reducers instead of one. AQE's skew
  join handles moderate skew automatically (enabled in session defaults);
  salting is for the pathological keys AQE can't split (e.g. a single
  key bigger than an executor).
- **bucketing** (``bucketed_table``): write a table hash-bucketed by its
  join key so later joins/aggregations on that key read co-located
  buckets with NO exchange — the amortize-one-shuffle-forever play for
  fact tables joined repeatedly on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def top_keys(df: DataFrame, key: str, n: int = 10,
             min_count: int | None = None) -> list:
    """The n most frequent key values (candidates for salting)."""
    counts = (df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
              .orderBy(F.col("cnt").desc()).limit(n))
    rows = counts.collect()
    if min_count is not None:
        rows = [r for r in rows if r["cnt"] >= min_count]
    return [r[key] for r in rows]


def salted_join(big: DataFrame, small: DataFrame, on: str, salt: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join with the big side's keys salted across ``salt`` buckets.

    The big side gets a deterministic per-row salt
    (``pmod(xxhash64(monotonically_increasing_id), salt)``); the small
    side is exploded ``salt``× so every (key, salt) pair exists. Result
    equals ``big.join(small, on, how)`` row-for-row; the shuffle key is
    (key, salt) so a hot key spreads over ``salt`` reducers.

    Only big-side-preserving joins are supported (inner/left/left_semi/
    left_anti): for right/full the exploded small side would emit every
    unmatched small row ``salt``× — use a plain join there.

    Use when one side is small enough to replicate ``salt``× but too big
    to broadcast outright, and AQE skew-split isn't enough.
    """
    allowed = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only "
            f"({sorted(allowed)}), not {how!r}: the salted small side "
            "would duplicate unmatched rows for right/full joins")
    salt_col = "__salt"
    big_salted = big.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    small_exploded = small.withColumn(
        salt_col,
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(salt)])))
    out = big_salted.join(small_exploded, [on, salt_col], how)
    return out.drop(salt_col)


def bucketed_table(df: DataFrame, table_name: str, key: str,
                   buckets: int = 16, sort: bool = True) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) by ``key``.

    Subsequent joins between tables bucketed the same way on the same key
    execute with no Exchange on either side (verify with
    ``explain_has(joined, 'Exchange') == False``).
    """
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def explain_has(df: DataFrame, operator: str) -> bool:
    """Does the formatted physical plan contain ``operator``?"""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    return operator in plan


def bloom_prefilter_join(big: DataFrame, small: DataFrame, on: str,
                         how: str = "inner", m_bits: int = 1 << 20,
                         k_hashes: int = 3) -> DataFrame:
    """Equi-join with runtime row-level filtering: the big side is
    pre-filtered through a Bloom filter of the small side's keys
    BEFORE the join shuffle, so rows that can't possibly match never
    enter the exchange. The final exact join removes the filter's
    false positives, so the result is IDENTICAL to ``big.join(small,
    on, how)`` — the bloom only sheds shuffle bytes.

    When it pays: the small side is too big to broadcast (so the join
    must shuffle BOTH sides) but its key SET fits a filter — m_bits of
    2^20 is 128 KiB of packed words for ~100k keys at <2% FP (the
    16 KiB figure quoted for sketch state belongs to the 2^17
    default used elsewhere). The
    classic case is a fact table joined to a filtered dimension: 100 TB
    of facts shuffle in full under a plain SortMergeJoin, but only the
    ~matching fraction shuffles here. When the small side already
    broadcasts, skip this — the broadcast hash join is itself the
    filter. Spark's own runtime bloom rewrite
    (spark.sql.optimizer.runtime.bloomFilter.enabled) triggers on the
    same shape but only under selectivity heuristics; this helper is
    the explicit, always-on form with a filter you can also persist
    and reuse across jobs (see ``operators.rollup.StoredBloom``).

    ``how`` supports the join types where pre-filtering the big (left)
    side is semantics-preserving: inner / semi / right outer — NOT
    left/full outer (dropping a non-matching left row changes the
    result) and NOT anti (the filter would drop exactly the rows anti
    keeps).
    """
    allowed = {"inner", "semi", "left_semi", "leftsemi", "right",
               "right_outer", "rightouter"}
    if how.replace("_", "").lower() not in {
            a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"bloom_prefilter_join supports inner/semi/right joins; "
            f"{how!r} would change results when the big side is "
            "pre-filtered — use a plain join")
    from ..operators.rollup import bloom_build, bloom_contains

    bloom = bloom_build(small.select(on), on, m_bits=m_bits,
                        k_hashes=k_hashes)
    pref = (bloom_contains(big, bloom, on, m_bits=m_bits,
                           k_hashes=k_hashes, out_col="__maybe")
            .where("__maybe").drop("__maybe"))
    return pref.join(small, on, how)
