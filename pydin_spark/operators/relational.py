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
