"""Shared commit-log machinery for the stored-state families.

Every stored-state class (IncrementalLineDeduper, StoredBigramLM,
StoredSnapshot, StoredHistogram, …) keeps APPEND-only data batches
plus a ``commits/`` log written LAST, so a crashed writer's rows stay
invisible. The three primitives below are the identical-by-contract
pieces; each family keeps its own ``maintain()`` because collapse
semantics differ per state shape (what "one row per key" means), but
the log handling itself must never drift apart — it did once exist in
three near-verbatim copies (round-8 review finding).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def has_commit_state(spark, path: str) -> bool:
    """True iff a commit log exists under ``path``/commits.
    Classifies missing-path errors; anything else re-raises. A
    missing log self-heals first: if a maintenance swap crashed
    between its renames, the ``commits.__old__`` backup is restored
    before answering — otherwise the family would read as EMPTY,
    next_seq would reset to 0, and committed data dirs would become
    unreachable (ADVICE r8)."""
    try:
        spark.read.parquet(f"{path}/commits").schema
        return True
    except Exception as exc:  # noqa: BLE001 - classify, don't blanket
        msg = f"{type(exc).__name__}: {exc}"
        if ("PATH_NOT_FOUND" in msg or "Path does not exist" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg
                or "Unable to infer schema" in msg):
            from .. import fs as _fs
            if _fs.heal_replaced_dir(spark, f"{path}/commits"):
                spark.catalog.refreshByPath(f"{path}/commits")
                return has_commit_state(spark, path)
            return False
        raise


def next_seq(spark, path: str) -> int:
    """Next monotone sequence number for an apply/extend batch."""
    if not has_commit_state(spark, path):
        return 0
    row = spark.read.parquet(f"{path}/commits") \
        .agg(F.max("seq")).first()
    return 0 if row[0] is None else int(row[0]) + 1


def append_commit(spark, path: str, batch: str, seq: int,
                  refresh: tuple = ()) -> None:
    """Land the ONE commit row that makes a batch visible, then
    refresh reader caches for the named subdirs plus commits."""
    spark.createDataFrame([(batch, int(seq))],
                          "batch string, seq long") \
        .repartition(1).write.mode("append") \
        .parquet(f"{path}/commits")
    for name in tuple(refresh) + ("commits",):
        spark.catalog.refreshByPath(f"{path}/{name}")
