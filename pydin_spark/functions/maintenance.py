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
