"""SparkSession factory with scale-aware defaults.

The reference engine (pydin) owns no compute session — it delegates SQL to
source databases via SQLAlchemy engines (reference ``pydin/sources.py:104-141``).
Here the SparkSession *is* the engine: every model compiles to lazy
DataFrames and Catalyst plans the execution.

Defaults are chosen for correctness at small SF and sanity at cluster
scale: AQE on (runtime coalesce + skew-join handling), Arrow on (fast
pandas interchange for the Pandas-UDF operators), UTC session timezone
(deterministic timestamp semantics vs the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Config applied to every session this engine builds. Values hold at
#: cluster scale too: AQE re-plans shuffle partition counts at runtime, so
#: ``spark.sql.shuffle.partitions`` is only an upper bound pre-AQE.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # Broadcast joins for dimension tables (region/nation/… at any SF).
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # local-mode driver heap: Spark's 1g default is undersized for a
    # 32-thread local master (the driver JVM IS the executor). Applied
    # at session build, so spark-submit's --driver-memory (cluster ops)
    # and extra_conf both override it.
    "spark.driver.memory": os.environ.get("PYDIN_DRIVER_MEMORY", "8g"),
    "spark.ui.enabled": "false",
}


def get_session(app_name: str = "pydin-spark", master: str | None = None,
                extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    manager is configured; on a real cluster, leave ``master`` unset in
    the environment-provided config and spark-submit decides.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for key, value in {**ENGINE_CONF, **(extra_conf or {})}.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
