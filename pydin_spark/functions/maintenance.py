"""Lakehouse maintenance: small-file compaction and partitioned layout.

The silent killer of 100 TB tables is file-count explosion — thousands
of KB-sized part files from frequent incremental appends turn every scan
into a metadata storm. ``compact`` rewrites a parquet dataset into
size-targeted files; ``write_partitioned`` is the standard
date-partitioned layout so date-window queries partition-prune.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


def dataset_stats(spark: SparkSession, path: str) -> dict:
    """File count + byte size of a parquet dataset (driver-side walk for
    local paths; on HDFS/S3 use the FileSystem API the same way)."""
    n_files = 0
    n_bytes = 0
    for dirpath, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(".parquet"):
                n_files += 1
                n_bytes += os.path.getsize(os.path.join(dirpath, name))
    return {"files": n_files, "bytes": n_bytes}


def compact(spark: SparkSession, path: str,
            target_file_bytes: int = 128 * 1024 * 1024,
            partition_by: list[str] | None = None,
            row_filter=None) -> dict:
    """Rewrite a parquet dataset with size-targeted files.

    File count = ceil(total_bytes / target_file_bytes); data is
    round-robin repartitioned (or hash-partitioned by ``partition_by``
    for partitioned layouts) and rewritten atomically via a staging
    directory + rename. ``row_filter`` (a Column predicate) drops rows
    during the rewrite — used to sweep tombstoned/uncommitted rows in
    the same pass that fixes the file layout.
    """
    stats = dataset_stats(spark, path)
    n_out = max(1, -(-stats["bytes"] // target_file_bytes))
    df = spark.read.parquet(path)
    if row_filter is not None:
        df = df.where(row_filter)
    staging = path.rstrip("/") + ".__compact__"
    writer = df.repartition(n_out)
    if partition_by:
        writer = df.repartition(n_out, *partition_by)
    w = writer.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    backup = path.rstrip("/") + ".__old__"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    spark.catalog.refreshByPath(path)
    return {"before": stats, "after": dataset_stats(spark, path)}


def compact_if_fragmented(spark: SparkSession, path: str,
                          max_files: int = 64,
                          target_file_bytes: int = 128 * 1024 * 1024,
                          partition_by: list[str] | None = None,
                          row_filter=None) -> dict:
    """Compact a parquet dataset only when its file count exceeds
    ``max_files`` — the idempotent building block every stored-state
    ``maintain()`` shares (high refresh cadence appends/overwrites
    small files; reads degrade without a periodic rewrite, but
    rewriting a healthy table every tick is wasted IO). Returns
    ``{}`` when the dataset doesn't exist, ``{"skipped": stats}``
    when healthy, else ``compact``'s before/after stats."""
    try:
        stats = dataset_stats(spark, path)
        spark.read.parquet(path).schema
    except Exception:  # noqa: BLE001 - state not built yet
        return {}
    if stats["files"] <= max_files:
        return {"skipped": stats}
    return compact(spark, path, target_file_bytes=target_file_bytes,
                   partition_by=partition_by, row_filter=row_filter)


def maintain_states(spark: SparkSession, states, **kwargs) -> dict:
    """Run ``maintain()`` across every stored-state object in one
    sweep — the single scheduler-driven upkeep entry point for a
    deployment's whole state fleet (incremental dedupers, continuous
    rollups, heavy-hitter/bloom sketch stores, line-dedup state, IVF
    indexes). Each family's ``maintain`` is idempotent and bounded
    (compaction only past a file-count threshold, commit-log collapse
    only past a batch-count threshold, orphan sweep always safe), so
    the sweep can run on any cron cadence.

    ``states`` is an iterable of objects exposing
    ``maintain(spark, **kwargs)``; results key by ``ClassName[path]``.
    A family that raises doesn't abort its siblings — the error
    string lands in the result so the scheduler job can alarm on it
    (same error-tolerance philosophy as the pipeline's
    ``error_limit``)."""
    import inspect
    out: dict[str, object] = {}
    for st in states:
        key = f"{type(st).__name__}[{getattr(st, 'path', '?')}]"
        try:
            accepted = inspect.signature(st.maintain).parameters
            kw = {k: v for k, v in kwargs.items() if k in accepted}
            out[key] = st.maintain(spark, **kw)
        except Exception as exc:  # noqa: BLE001 - isolate families
            out[key] = {"error": f"{type(exc).__name__}: {exc}"}
    return out


def write_partitioned(df: DataFrame, path: str, date_col: str,
                      granularity: str = "day",
                      mode: str = "overwrite") -> None:
    """Write date-partitioned parquet (``pd_date=YYYY-MM-DD`` dirs) so
    date-window scans prune partitions instead of reading everything.
    """
    trunc = {"day": "yyyy-MM-dd", "month": "yyyy-MM",
             "hour": "yyyy-MM-dd-HH"}[granularity]
    (df.withColumn("pd_date", F.date_format(F.col(date_col), trunc))
     .write.mode(mode).partitionBy("pd_date").parquet(path))
