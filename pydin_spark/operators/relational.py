"""Relational operators Spark lacks as built-ins: as-of join.

The as-of (point-in-time) join matches each left row with the most
recent right row at-or-before its timestamp, per key. Spark has no
native ASOF JOIN (DuckDB/pandas do); the idiomatic distributed plan is
the **union + windowed last_value trick**:

1. tag right rows 0 and left rows 1, union them aligned on
   (key, ts, tag, payload columns);
2. one window per key ordered by (ts, tag, right_id): running
   ``last(right_payload, ignorenulls=True)`` carries the latest right
   row forward;
3. keep only left rows.

Cost: ONE shuffle on the key (the window) — same as a co-partitioned
join; no range explosion, no nested-loop. This is the formulation that
scales to 100 TB because state per key is a single carried row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: tuple[str, ...] = ("user_id",),
              right_cols: tuple[str, ...] = (),
              tolerance: str | None = None,
              suffix: str = "r_",
              direction: str = "backward") -> DataFrame:
    """Inclusive as-of join per key: ``direction='backward'`` matches
    the latest right.ts <= left.ts (point-in-time, no future leakage);
    ``direction='forward'`` the earliest right.ts >= left.ts (next
    event after). Same single-shuffle union+window plan either way —
    forward just runs the window in descending time order.

    ``right_cols`` are the right-side payload columns carried to the
    output as ``{suffix}{col}``; right's ``on`` column is always carried
    as ``{suffix}{on}``. ``tolerance`` (e.g. ``'1 hour'``) drops matches
    farther than the interval, like pandas ``merge_asof``.

    Rows of right that tie on (key, ts) must be unique — pre-aggregate
    if needed (ties would make any engine's answer arbitrary).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"not {direction!r}")
    by = list(by)
    payload = [on, *right_cols]
    r = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in payload]).alias("__rp"))
    l = left.select(  # noqa: E741
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lp"))
    r = r.withColumn("__lp", F.lit(None).cast(l.schema["__lp"].dataType))
    unioned = r.select(*by, "__ts", "__tag", "__rp", "__lp").unionByName(
        l.select(*by, "__ts", "__tag", "__rp", "__lp"))
    ts_order = (F.col("__ts").asc() if direction == "backward"
                else F.col("__ts").desc())
    w = (Window.partitionBy(*by).orderBy(ts_order, F.col("__tag").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "__asof", F.last("__rp", ignorenulls=True).over(w))
    out = carried.where(F.col("__tag") == 1)
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        cond = (F.col(f"__asof.{on}") >= F.col("__ts") - bound
                if direction == "backward"
                else F.col(f"__asof.{on}") <= F.col("__ts") + bound)
        out = out.withColumn("__asof", F.when(cond, F.col("__asof")))
    cols = [F.col(f"__lp.{c}").alias(c) for c in left.columns]
    cols.append(F.col(f"__asof.{on}").alias(f"{suffix}{on}"))
    cols += [F.col(f"__asof.{c}").alias(f"{suffix}{c}") for c in right_cols]
    return out.select(*cols)


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str = "ts", start_col: str = "w_start",
               end_col: str = "w_end",
               bin_width: int = 900) -> DataFrame:
    """Keyless point-in-interval join (``start <= point <= end``) as an
    equi-join: timestamps are binned to ``bin_width`` seconds, each
    interval explodes into the bins it covers, the sides hash-join on
    the bin, and an exact containment filter finishes.

    Without this, a keyless range predicate plans as
    BroadcastNestedLoopJoin — O(|points|·|intervals|) compared row
    pairs. Binned, the cost is |points| + Σ interval_span/bin_width
    with an ordinary shuffle/broadcast hash join — the plan that
    survives 100 TB of points. Pick ``bin_width`` near the typical
    interval length (fan-out stays ~1-2 bins per interval).

    Output: every points column plus the interval's columns.
    """
    p_bin = F.floor(F.unix_timestamp(F.col(point_col)) / bin_width)
    i_bins = F.sequence(
        F.floor(F.unix_timestamp(F.col(start_col)) / bin_width),
        F.floor(F.unix_timestamp(F.col(end_col)) / bin_width))
    p = points.withColumn("__bin", p_bin)
    i = intervals.withColumn("__bin", F.explode(i_bins))
    joined = (p.join(i, "__bin")
              .where(F.col(point_col).between(F.col(start_col),
                                              F.col(end_col))))
    return joined.select(*points.columns, *intervals.columns)


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           within: str | None = None) -> DataFrame:
    """Ordered funnel analysis: how many users completed step 1, then
    step 2 strictly AFTER their step-1 time, and so on — the product-
    analytics staple (view → click → purchase). Output one row per
    step: (step_no, step, n_users, conversion) where conversion is the
    fraction of step-1 completers who reached this step.

    A user's step-k time is the EARLIEST step-k event strictly after
    their step-(k-1) time (first-completion semantics — re-entries
    don't restart the funnel). ``within`` bounds the whole journey:
    step-k events count only inside ``[t1, t1 + within]``.

    Scale shape: K-1 conditional min-aggregations, each one shuffle of
    the step's events against the (shrinking) reached-user frontier.
    The frontier is MATERIALIZED per step (``localCheckpoint``) — each
    step is counted from the materialized frontier, so step k costs
    one events pass, not a replay of steps 1..k-1 (K passes total, not
    K²). No per-user window over the full history, no UDF; the result
    is K rows.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    t1 = (events.where(F.col(type_col) == steps[0])
          .groupBy(user_col)
          .agg(F.min(ts_col).alias("t1")))
    reached = t1.select(user_col, F.col("t1"),
                        F.col("t1").alias("t_prev")) \
        .localCheckpoint(eager=True)
    counts = [(1, steps[0], reached.count())]
    for i, step in enumerate(steps[1:], start=2):
        ev = events.where(F.col(type_col) == step) \
            .select(user_col, F.col(ts_col).alias("__ts"))
        cond = F.col("__ts") > F.col("t_prev")
        if within is not None:
            cond = cond & (F.col("__ts") <=
                           F.col("t1") + F.expr(f"INTERVAL {within}"))
        nxt = (ev.join(reached, user_col)
               .where(cond)
               .groupBy(user_col)
               .agg(F.min("__ts").alias("t_step"),
                    F.first("t1").alias("t1")))
        reached = nxt.select(user_col, "t1",
                             F.col("t_step").alias("t_prev")) \
            .localCheckpoint(eager=True)
        counts.append((i, step, reached.count()))
    spark = events.sparkSession
    base = counts[0][2]
    # conversion is "fraction of step-1 completers"; with zero step-1
    # completers that fraction is undefined — NULL, not 0.0 (0.0 would
    # claim "nobody converted out of a real cohort", and the step-1
    # row itself is 1.0 by definition whenever the base exists)
    rows = [(n, s, c, (c / base) if base else None)
            for (n, s, c) in counts]
    return spark.createDataFrame(
        rows, "step_no int, step string, n_users long, conversion double")


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      bucket: str = "1 day") -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    bucket (the cohort); for each (cohort, offset) the distinct cohort
    members active ``offset`` buckets later — the curve every growth
    dashboard plots. Output: (cohort, offset, n_active, n_cohort,
    retention); offset 0 rows equal the cohort size by construction.

    Scale shape: one min-aggregate for first-seen, one distinct
    (user, bucket) projection, a hash join on the user key, and one
    count-distinct per (cohort, offset) — two shuffles over the event
    key space regardless of history length. Buckets are epoch-aligned
    fixed windows (``F.window``), so the offset is an exact integer
    division.
    """
    w = F.window(ts_col, bucket)["start"]
    first = (events.groupBy(user_col)
             .agg(F.min(w).alias("cohort")))
    active = events.select(F.col(user_col), w.alias("bucket")).distinct()
    # bucket width in seconds via a 1-row probe (no duration parsing)
    spark = events.sparkSession
    probe = (spark.range(1)
             .select(F.window(F.lit("1970-01-01 00:00:00")
                              .cast("timestamp"), bucket).alias("w"))
             .select((F.unix_timestamp("w.end")
                      - F.unix_timestamp("w.start")).alias("s")))
    secs = probe.first()["s"]
    joined = (active.join(first, user_col)
              .select(F.col("cohort"),
                      ((F.unix_timestamp("bucket")
                        - F.unix_timestamp("cohort"))
                       / F.lit(int(secs))).cast("long").alias("offset"),
                      F.col(user_col)))
    matrix = (joined.groupBy("cohort", "offset")
              .agg(F.count_distinct(F.col(user_col)).alias("n_active")))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort"))
    return (matrix.join(sizes, "cohort")
            .select("cohort", "offset", "n_active", "n_cohort",
                    (F.col("n_active").cast("double")
                     / F.col("n_cohort")).alias("retention")))


def event_paths(events: DataFrame, user_col: str = "user_id",
                ts_col: str = "ts", type_col: str = "event_type",
                order_col: str = "event_id",
                max_len: int = 5, k: int = 20) -> DataFrame:
    """Top-k first-journey paths: each user's first ``max_len`` events
    in (ts, order_col) order joined into a ``a>b>c`` path string, then
    the ``k`` most common paths — the "how do users actually move
    through the product" query. Output: (path, n_users, rank).

    Determinism: the per-user order is a total order (ts then
    ``order_col``), and the path list is rebuilt with ``array_sort``
    over (position, type) structs rather than trusting
    ``collect_list`` arrival order. Scale shape: one rank window per
    user, one per-user aggregate (≤ max_len rows each), one keyed path
    count, then a distributed ``orderBy().limit(k)`` (TakeOrdered —
    per-partition top-k merged on the driver) so the full path
    histogram is never shuffled to one partition; the rank window runs
    over the k surviving rows only.
    """
    from pyspark.sql import Window
    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col), F.col(order_col)))
    firsts = (events
              .withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= int(max_len)))
    per_user = (firsts.groupBy(user_col)
                .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct(F.col("__rn").alias("rn"),
                                     F.col(type_col).alias("t")))),
                        lambda s: s["t"]),
                    ">").alias("path")))
    counts = (per_user.groupBy("path")
              .agg(F.count(F.lit(1)).alias("n_users")))
    top = counts.orderBy(F.desc("n_users"), F.col("path")).limit(int(k))
    wr = Window.orderBy(F.desc("n_users"), F.col("path"))
    return (top.withColumn("rank", F.row_number().over(wr))
            .select("path", "n_users", "rank"))


def fill_gaps_locf(events: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value",
                   bucket: str = "1 hour") -> DataFrame:
    """Per-key regular time grid with last-observation-carried-forward
    filling: bucket the series (MAX per bucket — a deterministic
    representative), generate every bucket between each key's first
    and last observation, and forward-fill the holes — the
    sensor/metrics gap-fill every time-series store ships
    (``locf``/``interpolate``). Output: (key, bucket, value_filled,
    is_gap).

    Scale shape: one bucket aggregate, a per-key 2-row bounds
    aggregate, a ``sequence`` explode of the grid (rows ∝ key-span
    buckets — bound the bucket width to the span you actually serve),
    a keyed left join, and one ordered LOCF window per key. No UDF,
    no driver data.
    """
    from pyspark.sql import Window
    b = F.window(ts_col, bucket)["start"]
    per = (events.groupBy(F.col(key_col), b.alias("bucket"))
           .agg(F.max(value_col).alias("__v")))
    bounds = per.groupBy(key_col).agg(F.min("bucket").alias("mn"),
                                      F.max("bucket").alias("mx"))
    grid = bounds.select(
        key_col,
        F.explode(F.expr(f"sequence(mn, mx, interval {bucket})"))
        .alias("bucket"))
    joined = grid.join(per, [key_col, "bucket"], "left")
    w = (Window.partitionBy(key_col).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        F.col(key_col), F.col("bucket"),
        F.last("__v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("__v").isNull().alias("is_gap"))
