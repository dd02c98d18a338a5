"""Time-series operators over event tables (training-data pipeline ops):
gap sessionization and as-of (most-recent-prior) joins.

Both are pure JVM window/aggregate compositions — Spark has no native
SESSION WINDOW for batch or ASOF JOIN, but each is expressible with one
shuffle on the entity key:

* **sessionize** — the classic gap-and-island: a session break is a row
  whose gap to the previous event exceeds the timeout; the running sum of
  break flags per user is the session ordinal.  One window (lag + sum) +
  one groupBy, both hash-partitioned on ``user``.
* **asof_join** — union-tag: left and right rows interleave in one
  per-key timeline ordered by (ts, right-before-left); a running
  ``last(value, ignorenulls=True)`` carries the most recent right-side
  value onto every left row.  ONE shuffle on the key, no range-join
  explosion (a naive ``l.ts >= r.ts`` join is O(|L|·|R|) per key).  The
  right side is deduplicated to one row per (key, ts) first so ties are
  deterministic in every engine (DuckDB's native ASOF JOIN is the oracle).

Scale shape: both partition by the entity key only — skewed hot keys are
bounded by per-user event counts, and the window frames are running
(streaming-friendly) rather than bounded lookbacks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: float = 30.0,
               value_col: str | None = "value") -> DataFrame:
    """Per-user gap sessions: ``(user, session_seq, n_events, start_ts,
    end_ts, sum_value)``.  ``session_seq`` is 1-based in time order."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    # NTZ timestamps don't cast to double directly; epoch seconds via the
    # timestamp cast (tz offsets cancel in the difference)
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    gap_s = epoch - F.lag(epoch).over(w)
    brk = F.when(gap_s.isNull() | (gap_s > gap_minutes * 60.0), 1).otherwise(0)
    tagged = events.withColumn("_brk", brk).withColumn(
        "session_seq",
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 5).alias("sum_value"))
    return (
        tagged.groupBy(F.col(user_col), F.col("session_seq"))
        .agg(*aggs)
    )


def asof_join(left: DataFrame, right: DataFrame, keys: Sequence[str],
              ts_col: str, value_col: str,
              out_col: str = "asof_value",
              tie_col: str = "event_id") -> DataFrame:
    """Enrich every LEFT row with the RIGHT row's ``value_col`` at the
    greatest right ``ts_col`` <= the left row's (backward as-of).  Left
    rows with no prior right row get null.

    The right side is first deduplicated to one row per (keys, ts) —
    ``max_by(value, tie_col)`` — so equal-timestamp ties resolve
    identically in every engine.  At equal left/right timestamps the right
    row wins (<=, matching DuckDB ASOF semantics): the timeline orders the
    right row before the left one."""
    r = (
        right.groupBy(*keys, ts_col)
        .agg(F.max_by(value_col, tie_col).alias(out_col))
        .withColumn("_side", F.lit(0))
    )
    l = left.withColumn("_side", F.lit(1))
    timeline = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_side", tie_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = timeline.withColumn(out_col, F.last(out_col, ignorenulls=True).over(w))
    return carried.where(F.col("_side") == 1).drop("_side")
