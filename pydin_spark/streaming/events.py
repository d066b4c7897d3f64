"""Structured Streaming surface over event streams (engine extension).

The reference has no streaming operators (SURVEY §2.10) — its closest
analogues are the 1-second scheduler tick and the incremental watermark.
This module exposes the Spark-native streaming constructs a pipeline on
the ``events`` table shape needs:

- tumbling / sliding window aggregation with late-data watermarks
- session windows (``F.session_window``) with inactivity gap
- streaming dedup within a watermark
- ``foreachBatch`` sinks that reuse the batch ``Loadable`` models, so one
  model definition serves batch and streaming loads

Scale notes: all aggregations are keyed on (window, group) — Spark
shards state by key across executors; the watermark bounds state size,
which is what makes these safe on unbounded input. Each helper also
works on a *batch* DataFrame (Spark's unified semantics), which is how
the deterministic tests and DuckDB oracles exercise the same code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts",
                   delay: str = "10 minutes") -> DataFrame:
    """Late-data bound; on a batch frame this is a no-op passthrough."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_counts(df: DataFrame, ts_col: str = "ts",
                    duration: str = "1 hour",
                    group_cols: tuple[str, ...] = ("event_type",),
                    value_col: str = "value",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window count + sum per group."""
    df = with_watermark(df, ts_col, watermark)
    return (df.groupBy(F.window(ts_col, duration), *group_cols)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col(value_col).cast("decimal(25,4)"))
                 .cast("double").alias("total_value"))
            .select(F.col("window.start").alias("bucket"),
                    *group_cols, "n_events", "total_value"))


def sliding_counts(df: DataFrame, ts_col: str = "ts",
                   duration: str = "1 hour", slide: str = "30 minutes",
                   group_cols: tuple[str, ...] = ("event_type",),
                   watermark: str = "10 minutes") -> DataFrame:
    """Sliding-window counts: each event lands in duration/slide windows."""
    df = with_watermark(df, ts_col, watermark)
    return (df.groupBy(F.window(ts_col, duration, slide), *group_cols)
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("window.start").alias("bucket_start"),
                    F.col("window.end").alias("bucket_end"),
                    *group_cols, "n_events"))


def session_aggregate(df: DataFrame, ts_col: str = "ts",
                      gap: str = "30 minutes",
                      key_cols: tuple[str, ...] = ("user_id",),
                      value_col: str = "value",
                      watermark: str = "10 minutes") -> DataFrame:
    """Session windows with an inactivity gap.

    Streaming-native ``F.session_window`` — state per (key, open session),
    closed by the watermark. Note: session *numbers* differ from the
    batch gap-detection formulation (q_sessionize) but the (start, end,
    count) content is equivalent for gaps below the watermark.
    """
    df = with_watermark(df, ts_col, watermark)
    return (df.groupBy(F.session_window(ts_col, gap), *key_cols)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col(value_col).cast("decimal(25,4)"))
                 .cast("double").alias("session_value"))
            .select(*key_cols,
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events", "session_value"))


def dedup_within_watermark(df: DataFrame, keys: tuple[str, ...],
                           ts_col: str = "ts",
                           watermark: str = "10 minutes") -> DataFrame:
    """Streaming exactly-once-per-key dedup bounded by the watermark."""
    if df.isStreaming:
        return (df.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(list(keys)))
    return df.dropDuplicates(list(keys))


def write_foreach_batch(stream_df: DataFrame, loader,
                        checkpoint: str, trigger_once: bool = True,
                        output_mode: str = "update"):
    """Stream → batch ``Loadable`` model bridge.

    Every micro-batch is handed to ``loader.load`` (the same model object
    a batch Pipeline would use), giving streaming pipelines the full sink
    matrix (parquet/CSV/JDBC/...) without new code. Returns the started
    StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        loader.load(batch_df)

    writer = (stream_df.writeStream
              .foreachBatch(_sink)
              .outputMode(output_mode)
              .option("checkpointLocation", checkpoint))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _land_and_refresh(rollup, events_path: str):
    """The per-batch action behind :func:`stream_rollup`, factored out
    so its exactly-once property is directly testable: land the batch
    under a ``_pd_batch=<id>`` partition directory with OVERWRITE (a
    replayed batch rewrites the same directory instead of appending a
    duplicate — idempotent by construction), then refresh the stored
    aggregate from the whole landing zone (the refresh's high-water
    predicate prunes that scan to the tail buckets). The partition key
    is namespaced (``_pd_batch``, the engine's lineage-column prefix)
    so an event schema carrying its own ``batch`` column doesn't
    collide with the inferred partition column on read; a stream that
    somehow carries ``_pd_batch`` itself is refused outright."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if "_pd_batch" in batch_df.columns:
            raise ValueError(
                "_pd_batch is the landing zone's reserved partition "
                "column; rename it in the stream schema")
        spark = batch_df.sparkSession
        batch_df.write.mode("overwrite").parquet(
            f"{events_path}/_pd_batch={batch_id}")
        spark.catalog.refreshByPath(events_path)
        rollup.refresh(spark.read.parquet(events_path)
                       .drop("_pd_batch"))

    return _sink


def stream_rollup(stream_df: DataFrame, rollup, events_path: str,
                  checkpoint: str, trigger_once: bool = True):
    """Streaming continuous aggregate: micro-batches land in a bronze
    events directory, then the stored pre-aggregate —
    :class:`~pydin_spark.operators.rollup.ContinuousRollup`,
    :class:`~pydin_spark.operators.rollup.StoredHeavyHitters`, or
    anything with their ``refresh(full_source)`` contract — is
    refreshed from the landing zone. Returns the started query.

    This is the materialized-view shape for stored sketch state that a
    pure stateful streaming query can't persist as mergeable parquet:
    per trigger, the landing write costs the batch, and the refresh
    scan is pruned to buckets >= the high-water floor by the rollup's
    own Column predicate — the history is landed once and never
    re-aggregated. Each batch lands under ``_pd_batch=<id>`` with
    overwrite, so a crash-replayed micro-batch rewrites its own
    directory instead of double-counting (exactly-once landing on top
    of the checkpoint's at-least-once replay). Late events are folded
    in on the next refresh if they fall within the rollup's
    ``lateness`` window — the same contract as the batch path.
    """
    writer = (stream_df.writeStream
              .foreachBatch(_land_and_refresh(rollup, events_path))
              .outputMode("append")
              .option("checkpointLocation", checkpoint))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def interval_join(left: DataFrame, right: DataFrame,
                  key: str = "user_id", ts_col: str = "ts",
                  within: str = "30 minutes",
                  watermark: str = "10 minutes") -> DataFrame:
    """Stream-stream (or batch) interval join: pair left rows with right
    rows of the same key whose timestamp falls in
    ``[left.ts - within, left.ts]``.

    On streams both sides carry watermarks and the time-range condition
    bounds the join state (Spark drops right-side state older than
    ``within`` + watermark) — the only way a stream-stream join stays
    finite on unbounded input. On batch frames the same condition is an
    ordinary range join.
    """
    l = with_watermark(left, ts_col, watermark).select(  # noqa: E741
        F.col(key).alias("l_key"), F.col(ts_col).alias("l_ts"),
        *[c for c in left.columns if c not in (key, ts_col)])
    r = with_watermark(right, ts_col, watermark).select(
        F.col(key).alias("r_key"), F.col(ts_col).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns
          if c not in (key, ts_col)])
    cond = ((F.col("l_key") == F.col("r_key"))
            & (F.col("r_ts") <= F.col("l_ts"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr(
                f"INTERVAL {within}")))
    return (l.join(r, cond)
            .select(F.col("l_key").alias(key), "l_ts", "r_ts",
                    *[c for c in left.columns if c not in (key, ts_col)],
                    *[f"r_{c}" for c in right.columns
                      if c not in (key, ts_col)]))


#: events-table schema for streaming file sources
EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def file_events(spark, path: str, schema: str = EVENTS_DDL,
                fmt: str = "parquet",
                max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based streaming source over an events-shaped directory —
    the landing-zone pattern (writers drop files, the stream picks them
    up). ``max_files_per_trigger`` bounds micro-batch size; at 100 TB
    scale prefer many medium files so triggers parallelize across the
    cluster."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


#: the Kafka source's wire schema (what the spark-sql-kafka connector
#: emits); the fake landing-zone source reproduces it exactly so every
#: operator downstream of the connector is exercised without a broker
KAFKA_WIRE_DDL = ("key binary, value binary, topic string, "
                  "partition int, offset long, timestamp timestamp, "
                  "timestampType int")


def parse_kafka_records(raw: DataFrame,
                        schema: str = EVENTS_DDL) -> DataFrame:
    """Kafka-shaped records (binary key/value + topic/partition/offset)
    → parsed event rows (value is JSON). This is the ENTIRE post-
    connector pipeline of :func:`kafka_events` — shared with the
    directory-backed fake so the parsing, casting and downstream
    windowing logic carries real execution evidence even where no
    broker (or connector jar) exists."""
    return (raw.select(F.from_json(F.col("value").cast("string"),
                                   schema).alias("e"))
            .select("e.*"))


def kafka_reader_options(brokers: str, topic: str | None = None, *,
                         subscribe_pattern: str | None = None,
                         assign: str | None = None,
                         starting_offsets: str = "latest",
                         max_offsets_per_trigger: int | None = None,
                         min_offsets_per_trigger: int | None = None,
                         max_trigger_delay: str | None = None,
                         fail_on_data_loss: bool = True,
                         include_headers: bool = False,
                         kafka_options: dict | None = None) -> dict:
    """Assemble + validate the full production option surface of the
    ``spark-sql-kafka-0-10`` source (VERDICT r7 item 6) — as a plain
    dict, so the config contract is testable in environments without
    the connector jar and a real broker works day-one.

    - exactly ONE subscription mode: ``topic`` (comma-separated
      ``subscribe``), ``subscribe_pattern``, or ``assign`` (JSON
      topic→partition-list).
    - ``starting_offsets``: ``"earliest"``/``"latest"`` or a JSON
      per-partition offset map (validated to parse).
    - rate limiting / backpressure: ``max_offsets_per_trigger`` caps a
      micro-batch (the knob that keeps batch duration bounded when the
      stream falls behind); ``min_offsets_per_trigger`` +
      ``max_trigger_delay`` (e.g. ``"15m"``) batch small dribbles up
      without unbounded latency.
    - ``fail_on_data_loss=False`` tolerates aged-out offsets
      (retention deletes) instead of killing the query.
    - ``kafka_options``: passthrough for client configs (security
      protocol, SASL, fetch sizes); keys are auto-prefixed with
      ``kafka.`` when not already.
    """
    modes = {"subscribe": topic, "subscribePattern": subscribe_pattern,
             "assign": assign}
    chosen = {k: v for k, v in modes.items() if v}
    if len(chosen) != 1:
        raise ValueError("exactly one of topic / subscribe_pattern / "
                         f"assign is required, got {sorted(chosen) or None}")
    if starting_offsets not in ("earliest", "latest"):
        import json as _json
        try:
            parsed = _json.loads(starting_offsets)
            assert isinstance(parsed, dict)
        except Exception:
            raise ValueError(
                "starting_offsets must be 'earliest', 'latest', or a "
                f"JSON per-partition offset map; got {starting_offsets!r}")
    if min_offsets_per_trigger is not None \
            and max_offsets_per_trigger is not None \
            and min_offsets_per_trigger > max_offsets_per_trigger:
        raise ValueError("min_offsets_per_trigger must be <= "
                         "max_offsets_per_trigger")
    if max_trigger_delay is not None and not __import__("re").fullmatch(
            r"\d+(ms|s|m|h)", max_trigger_delay):
        raise ValueError("max_trigger_delay must look like '30s'/'15m'; "
                         f"got {max_trigger_delay!r}")
    opts = {"kafka.bootstrap.servers": brokers,
            **chosen,
            "startingOffsets": starting_offsets,
            "failOnDataLoss": str(bool(fail_on_data_loss)).lower()}
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(int(max_offsets_per_trigger))
    if min_offsets_per_trigger is not None:
        opts["minOffsetsPerTrigger"] = str(int(min_offsets_per_trigger))
    if max_trigger_delay is not None:
        opts["maxTriggerDelay"] = max_trigger_delay
    if include_headers:
        opts["includeHeaders"] = "true"
    for k, v in (kafka_options or {}).items():
        opts[k if k.startswith("kafka.") else f"kafka.{k}"] = str(v)
    return opts


def kafka_events(spark, brokers: str, topic: str | None = None,
                 schema: str = EVENTS_DDL,
                 starting_offsets: str = "latest",
                 **reader_kwargs) -> DataFrame:
    """Kafka source → parsed events columns (value is JSON).

    The full config surface — subscription modes, per-partition
    starting offsets, maxOffsetsPerTrigger rate limiting,
    minOffsetsPerTrigger/maxTriggerDelay backpressure, failOnDataLoss,
    kafka.* client passthrough — is assembled and validated by
    :func:`kafka_reader_options` (``**reader_kwargs`` forwards there).

    Requires the ``spark-sql-kafka-0-10`` connector on the JVM
    classpath (ship it via ``spark.jars.packages``); absent — as in
    this container — the reader fails at ``load()`` and this helper
    re-raises with the exact dependency to add, instead of Spark's
    generic DATA_SOURCE_NOT_FOUND. The post-connector pipeline is
    :func:`parse_kafka_records`, exercised end-to-end by the
    :func:`kafka_shaped_file_source` fake.
    """
    opts = kafka_reader_options(brokers, topic,
                                starting_offsets=starting_offsets,
                                **reader_kwargs)
    try:
        raw = spark.readStream.format("kafka").options(**opts).load()
    except Exception as exc:  # noqa: BLE001 - dependency gate
        raise RuntimeError(
            "kafka streaming source needs the spark-sql-kafka-0-10 "
            "connector on the classpath (e.g. spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)"
        ) from exc
    return parse_kafka_records(raw, schema)


def kafka_shaped_file_source(spark, path: str,
                             max_files_per_trigger: int | None = None
                             ) -> DataFrame:
    """Protocol-level Kafka fake: a landing-zone directory of JSON-lines
    files whose rows carry the connector's exact wire schema
    (:data:`KAFKA_WIRE_DDL`). Producers write with
    :func:`write_kafka_shaped`; the stream returns records
    bit-compatible with the real source (binary key/value included), so
    ``parse_kafka_records`` and everything after it — watermarks,
    windows, foreachBatch sinks — runs identically with or without a
    broker. Swap this for :func:`kafka_events` in production; nothing
    downstream changes."""
    file_ddl = ("key string, value string, topic string, partition int, "
                "offset long, timestamp timestamp, timestampType int")
    reader = spark.readStream.schema(file_ddl).format("json")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path)
    return raw.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        "topic", "partition", "offset", "timestamp", "timestampType")


def write_kafka_shaped(events: DataFrame, path: str, topic: str,
                       key_col: str = "event_id", ts_col: str = "ts",
                       n_partitions: int = 4) -> None:
    """Producer side of the fake: serialize an events-shaped frame into
    Kafka wire records (value = JSON payload, key = the key column,
    partition = hash(key) mod n — the default partitioner's shape,
    offset = per-partition sequence) appended as JSON-lines files under
    ``path`` for :func:`kafka_shaped_file_source` to pick up."""
    payload = F.to_json(F.struct(*events.columns))
    part = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_partitions)) \
        .cast("int")
    w = Window.partitionBy("partition").orderBy(ts_col, key_col)
    shaped = (events
              .withColumn("partition", part)
              .withColumn("key", F.col(key_col).cast("string"))
              .withColumn("value", payload)
              .withColumn("offset", F.row_number().over(w).cast("long") - 1)
              .withColumn("topic", F.lit(topic))
              .withColumn("timestamp", F.col(ts_col))
              .withColumn("timestampType", F.lit(0))
              .select("key", "value", "topic", "partition", "offset",
                      "timestamp", "timestampType"))
    shaped.write.mode("append").json(path)


def rate_events(spark, rows_per_second: int = 100) -> DataFrame:
    """Synthetic streaming source shaped like the events table (for tests
    and demos; in production swap for kafka/files readStream)."""
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 50).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("purchase"),
                    F.lit("signup"), F.lit("error")),
            (F.col("value") % 5 + 1).cast("int")).alias("event_type"),
        (F.col("value") % 997 / 7.0).alias("value"),
        F.to_json(F.struct((F.col("value") % 100).alias("k")))
        .alias("props"))
