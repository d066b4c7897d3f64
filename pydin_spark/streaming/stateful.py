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


HH_SCHEMA = ("grp string, item string, est_count long, err_ub long, "
             "rank int")
HH_STATE = "counters string, err long"  # counters as a JSON object


def _heavy_hitters_fn(capacity: int, k: int):
    def fn(key, pdfs, state: GroupState):
        import json

        import pandas as pd
        if state.exists:
            counters = json.loads(state.get[0])
            err = int(state.get[1])
        else:
            counters, err = {}, 0
        for pdf in pdfs:
            for item, cnt in pdf["item"].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                d = vals[capacity]
                counters = {i: c - d for i, c in counters.items()
                            if c - d > 0}
                err += d
        state.update((json.dumps(counters), err))
        top = sorted(counters.items(), key=lambda t: (-t[1], t[0]))[:k]
        yield pd.DataFrame(
            [(key[0], item, est, err, rnk + 1)
             for rnk, (item, est) in enumerate(top)],
            columns=["grp", "item", "est_count", "err_ub", "rank"])
    return fn


def streaming_heavy_hitters(df: DataFrame, item_col: str,
                            k: int = 10, capacity: int = 4096,
                            group_col: str | None = None) -> DataFrame:
    """Misra-Gries frequent items over an unbounded stream: per group
    (or one global group) the state carries at most ``capacity``
    counters across micro-batches, emitting the current top-``k`` with
    the accumulated error bound every trigger — the live-dashboard
    shape of :func:`~pydin_spark.operators.rollup.heavy_hitters`, with
    the same contract (est ≤ true ≤ est + err_ub; exact while distinct
    ≤ capacity).

    State shards by the GROUP: fine when groups partition the traffic
    (per-tenant, per-topic dashboards). A single global group funnels
    every event through one task — at that scale, pre-aggregate per
    micro-batch in the query (groupBy item counts) or keep per-group
    sketches and merge at read, as the batch operator's stored-summary
    form does.

    Batch input falls back to the exact equivalent shape.
    """
    grp = (F.col(group_col) if group_col is not None
           else F.lit("__all__")).cast("string").alias("grp")
    src = df.select(grp, F.col(item_col).cast("string").alias("item"))
    if not df.isStreaming:
        from ..operators.rollup import heavy_hitters
        out = heavy_hitters(src, "item", k=k, capacity=capacity,
                            group_cols=("grp",))
        return out.select("grp", "item", "est_count", "err_ub", "rank")
    return (src.groupBy("grp").applyInPandasWithState(
        _heavy_hitters_fn(int(capacity), int(k)), HH_SCHEMA, HH_STATE,
        "update", GroupStateTimeout.NoTimeout))
