"""pydin_spark — a PySpark-native ETL/analytics engine.

Re-expresses the capabilities of the reference ETL framework
(t3eHawk/pydin, ``/root/reference``) on Spark DataFrames: model-based
sources/sinks/transforms, SQL pass-through planned by Catalyst,
business-date windows, incremental watermarks, lineage keys, idempotent
recycle, plus large-scale data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference never had.
"""

import os

from . import calendar as calendar  # noqa: PLC0414
from .calendar import (Day, Hour, Month, Today, Tomorrow, Week, Year,
                       Yesterday)
from .fields import KEY_FIELDS, KeyField
from .models import (CSV, JSON, ORC, SQL, XML, Avro, Command, Delta, Executable, Extractable,
                     FileManager, Filenames, Insert, Loadable, Mapper, Model,
                     Parquet, Select, Table, Transform, Transformable)
from .config import pipeline_from_config
from .pipeline import ErrorLimitExceeded, Node, Pipeline, Step, StepError
from .session import get_session
from .notify import SmtpNotifier
from .sources import Database, Filesystem, Server, SourceRegistry, registry

__version__ = "0.1.0"

TPCH_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings")


def _stage_converted(spark, source_path: str, df):
    """One-time ingest rewrite of a table whose timestamp column needed a
    computed conversion (TIMESTAMP(NANOS) → µs). The staged copy stores
    ``ts`` as a real timestamp column, so date-window predicates push
    into the parquet scan (row-group min/max skipping) instead of being
    evaluated post-scan on a derived expression — at 100 TB that is the
    difference between pruning and a full read. Cache is fingerprinted by
    source path+size+mtime and shared across processes; a failed/raced
    build falls back to the in-memory converted DataFrame.
    """
    import hashlib
    import shutil as _shutil

    root = os.environ.get("PYDIN_STAGED_DIR") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, ".staged")
    try:
        st = os.stat(source_path)
        fingerprint = f"{source_path}:{st.st_size}:{st.st_mtime_ns}"
        key = hashlib.sha1(fingerprint.encode()).hexdigest()[:16]
        staged = os.path.join(os.path.abspath(root), key)
        if not os.path.isdir(staged):
            tmp = f"{staged}.tmp-{os.getpid()}"
            df.write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, staged)
            except OSError:  # concurrent builder won the rename
                _shutil.rmtree(tmp, ignore_errors=True)
        return spark.read.parquet(staged)
    except Exception:
        return df


def load_table(spark, sf_dir: str, name: str):
    """Read one fixture parquet table, normalizing timestamp encodings.

    Two generator encodings need normalization to plain TIMESTAMP:
    parquet TIMESTAMP(NANOS) (rejected by Spark's vectorized reader;
    read as raw nanos and convert — exact, the generated values have
    microsecond precision) and TIMESTAMP_NTZ (valid for batch but
    rejected by Structured Streaming event-time watermarks). The engine
    (and this container) run UTC, so the TIMESTAMP rendering matches
    DuckDB's naive rendering instant-for-instant; a non-UTC session
    would shift wall-clock values. Converted tables are staged once
    (fingerprint-cached) so later scans keep predicate pushdown on the
    stored timestamp column instead of filtering a computed expression.
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    key = "spark.sql.legacy.parquet.nanosAsLong"
    previous = spark.conf.get(key, "false")
    spark.conf.set(key, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        spark.conf.set(key, previous)
    converted = False
    for field_name, dtype in df.dtypes:
        if field_name == "ts" and dtype == "bigint":
            # integer div: double division of an ~1.7e18 ns epoch loses the
            # low microsecond bit (52-bit mantissa)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            converted = True
        elif dtype == "timestamp_ntz":
            df = df.withColumn(field_name,
                               F.col(field_name).cast("timestamp"))
            converted = True
    if converted:
        df = _stage_converted(spark, path, df)
    return df


import weakref as _weakref

_registered: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def register_tables(spark, sf_dir: str, tables=TPCH_TABLES,
                    force: bool = False) -> None:
    """Register every parquet fixture table in ``sf_dir`` as a temp view so
    ``Select``/``SQL`` models and ``spark.sql`` can reference them by name.
    Idempotent while the session stays on the same dir: repeated calls
    (one per query in the driver/bench harness) skip the 10 parquet
    footer reads; switching dirs re-registers. Keyed by weak session
    reference so a recycled session never inherits a stale entry.
    """
    key = sf_dir.rstrip("/")
    if not force and _registered.get(spark) == key:
        return
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _registered[spark] = key


__all__ = [
    "CSV", "JSON", "SQL", "XML", "Parquet", "ORC", "Avro", "Command", "Delta", "Table", "Select", "Insert",
    "Mapper", "Transform", "Filenames", "FileManager", "Model", "Extractable",
    "Transformable", "Loadable", "Executable",
    "Pipeline", "Node", "Step", "StepError", "ErrorLimitExceeded",
    "Day", "Hour", "Month", "Week", "Year", "Today", "Yesterday", "Tomorrow",
    "KeyField", "KEY_FIELDS",
    "Database", "Filesystem", "Server", "SourceRegistry", "registry",
    "get_session", "register_tables", "load_table", "TPCH_TABLES",
    "pipeline_from_config", "SmtpNotifier",
]
