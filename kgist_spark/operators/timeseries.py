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
  ``last(<wrapped row>, ignorenulls=True)`` carries the most recent
  right-side ROW onto every left row (the value is wrapped in a struct so
  a null ``value_col`` on the matched row comes through as null, exactly
  like SQL ASOF semantics — never skipped for an older non-null).  ONE
  shuffle on the key, no range-join explosion (a naive ``l.ts >= r.ts``
  join is O(|L|·|R|) per key).  The right side is deduplicated to one row
  per (key, ts) first so ties are deterministic in every engine (DuckDB's
  native ASOF JOIN is the oracle).

Gap arithmetic is INTERVAL comparison on the raw (NTZ) timestamps —
wall-clock, timezone- and DST-independent — never an epoch cast through
the session timezone.

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
               value_col: str | None = "value",
               tie_col: str = "event_id") -> DataFrame:
    """Per-user gap sessions: ``(user, session_seq, n_events, start_ts,
    end_ts, sum_value)``.  ``session_seq`` is 1-based in time order; a
    break happens iff the gap STRICTLY exceeds the timeout.  ``tie_col``
    orders equal-timestamp rows deterministically."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    # round, not truncate: 8.3 min is 497999.99999999994 in float — int()
    # would shift the strict-gap boundary by 1 ms
    gap_ms = round(gap_minutes * 60_000)
    prev = F.lag(F.col(ts_col)).over(w)
    brk = F.when(
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap_ms} MILLISECOND")),
        1,
    ).otherwise(0)
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
    rows with no prior right row get null; a matched right row whose value
    is itself null yields null (the ROW is matched, not the last non-null
    value — SQL ASOF semantics).

    The right side is first deduplicated to one row per (keys, ts) —
    ``max_by(value, tie_col)`` — so equal-timestamp ties resolve
    identically in every engine.  At equal left/right timestamps the right
    row wins (<=, matching DuckDB ASOF semantics): the timeline orders the
    right row before the left one."""
    if out_col in left.columns:
        raise ValueError(
            f"out_col {out_col!r} collides with a left column — the carried "
            "as-of value would silently absorb the left side's own values"
        )
    r = (
        right.groupBy(*keys, ts_col)
        .agg(F.struct(F.max_by(value_col, tie_col).alias("v")).alias("_asof_w"))
        .withColumn("_side", F.lit(0))
    )
    l = left.withColumn("_side", F.lit(1))
    timeline = l.unionByName(r, allowMissingColumns=True)
    order = [ts_col, "_side"] + ([tie_col] if tie_col in left.columns else [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = timeline.withColumn(
        "_asof_w", F.last("_asof_w", ignorenulls=True).over(w)
    )
    return (
        carried.where(F.col("_side") == 1)
        .withColumn(out_col, F.col("_asof_w.v"))
        .drop("_side", "_asof_w")
    )


def range_join_pairs(intervals: DataFrame, probes: DataFrame,
                     start_col: str = "start", end_col: str = "end",
                     ts_col: str = "ts", bin_seconds: int = 600) -> DataFrame:
    """Bucketized interval join: every (interval, probe) pair with
    ``start <= probe.ts < end`` — the half-open window — WITHOUT the
    O(|intervals| · |probes|) nested-loop plan Spark picks for a raw
    theta join (``BroadcastNestedLoopJoin`` compares every probe against
    every interval; at 10^9 rows each side that is 10^18 comparisons).

    The classic banding rewrite: intervals explode to the fixed-width
    time bins they overlap (``O(len/bin)`` rows each), probes map to their
    single bin, the join is a plain hash EQUI-join on the bin, and the
    exact window predicate filters the candidates.  Each qualifying pair
    meets in exactly one bin (the probe's), so no dedup pass is needed.
    Bin width trades interval fan-out against candidate precision; at
    web scale you band on (entity key, bin) so a global burst second
    doesn't concentrate one key — a hot bin here is AQE skew-join
    territory, and the pair stream should flow straight into a partial
    aggregation (see ``q_incident_clicks``), never materialize.

    Binning truncates to whole seconds (monotone, so a probe inside the
    window always lands in a covered bin); the filter compares the raw
    full-precision timestamps.  Columns collide by name? Alias before
    calling."""
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds),
            )
        ),
    )
    pb = probes.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds)
    )
    return (
        ib.join(pb, "_bin")
        .where((F.col(ts_col) >= F.col(start_col))
               & (F.col(ts_col) < F.col(end_col)))
        .drop("_bin")
    )


def event_drift(events: DataFrame, type_col: str = "event_type",
                ts_col: str = "ts", trailing: int = 24,
                z_scale: int = 1_000_000) -> DataFrame:
    """Per-(type, hour) volume-drift detection: the z-score of each hourly
    event count against its type's TRAILING ``trailing`` observed hourly
    buckets — the ingest-monitoring primitive that flags a source whose
    volume jumps or collapses (a crawler stuck in a loop, a feed gone
    dark) before the data poisons downstream stages.

    ``(event_type, hour, n, z_x1e6)`` where ``z = (n - mean) / std`` over
    the previous ``trailing`` buckets (population std).  ``z_x1e6`` is NULL
    during warm-up (fewer than ``trailing`` prior buckets) and when the
    trailing window is constant (std = 0) — no sentinel values.  The mean
    and std derive from INTEGER window sums (count, sum, sum of squares);
    the float enters exactly one per-row expression with a fixed evaluation
    order, mirrored literally by the SQL oracle, then rounds to an int —
    the engine's standard determinism discipline, so the result is
    independent of partitioning.

    Semantics note: "trailing buckets" means the previous ``trailing``
    OBSERVED hours of that type (hours with zero events occupy no bucket).
    Gap-filling to wall-clock hours is a different operator (it needs a
    calendar spine); drift over observed buckets is the monitoring default.

    100 TB shape: one hourly pre-aggregation (map-side partials collapse
    the raw stream to |types| × |hours| rows — bounded: a decade is ~88k
    hours) and one window partitioned by type.  A type's full hourly
    series lands in one task, which is exactly right: ~88k rows/task
    ceiling, no skew possible beyond it."""
    hourly = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("HOUR", F.col(ts_col)).alias("hour"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-trailing, -1)
    )
    tw = float(trailing)
    s = F.sum("n").over(w)
    q = F.sum(F.col("n") * F.col("n")).over(w)
    c = F.count("n").over(w)
    var = q / F.lit(tw) - (s / F.lit(tw)) * (s / F.lit(tw))
    z = (F.col("n").cast("double") - s / F.lit(tw)) / F.sqrt(var)
    return hourly.select(
        "event_type",
        "hour",
        "n",
        F.when(
            (c == trailing) & (var > 0), F.round(z * z_scale).cast("long")
        ).alias("z_x1e6"),
    )


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     scale: int = 1_000_000) -> DataFrame:
    """Classic cohort-retention table: ``(cohort_date, day_offset,
    n_active, n_cohort, retention_x1e6)`` — users grouped by their FIRST
    active calendar day (the cohort), then for each later day offset the
    count of distinct cohort members active that day.  The standard
    product-analytics read over an event stream (here: contributor/crawl
    activity over the events table); retention is the integer-DIV
    fixed-point fraction like every ratio in this engine.

    Day boundaries are calendar days of the raw NTZ timestamp (wall-clock,
    timezone-free — the module-wide rule); ``cohort_date`` is emitted as a
    day-truncated TIMESTAMP, not a DATE, because the two engines' DATE
    values arrive in pandas as different dtypes (python ``date`` vs
    ``datetime64``) and the driver's value-hash would diverge on
    representation alone — the ``events_hourly`` precedent.  ``day_offset``
    0 is the cohort day itself (retention identically 1e6 there; kept — it
    carries n_cohort and anchors the table).

    Scale shape: ONE distinct over (user, day) — the only corpus-sized
    shuffle, map-side-combinable — then a grouped MIN (user-sized), a
    user-keyed join back (both sides hash-partition on ``user`` so the
    join reuses the distinct's layout; AQE broadcasts the cohort side
    while it fits), and two small grouped counts.  No windows, no
    collect."""
    days = (
        events.select(
            F.col(user_col).alias("user"),
            F.date_trunc("day", F.col(ts_col)).alias("d"),
        )
        .where(F.col("user").isNotNull() & F.col("d").isNotNull())
        .distinct()
    )
    cohort = days.groupBy("user").agg(F.min("d").alias("cohort_date"))
    sizes = cohort.groupBy("cohort_date").agg(
        F.count("*").alias("n_cohort")
    )
    active = (
        days.join(cohort, "user")
        .groupBy(
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).alias("day_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )
    return active.join(sizes, "cohort_date").select(
        "cohort_date",
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_active",
        "n_cohort",
        F.expr(f"({scale} * n_active) div n_cohort").alias("retention_x1e6"),
    )


def cohort_retention_oracle_sql(scale: int = 1_000_000,
                                table: str = "events") -> str:
    """DuckDB replay of :func:`cohort_retention` — same calendar-day
    truncation, distinct (user, day) basis, and truncating integer div."""
    return f"""
    WITH days AS (
        SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS d
        FROM {table} WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    cohort AS (SELECT u, MIN(d) AS cohort_date FROM days GROUP BY u),
    sizes AS (
        SELECT cohort_date, CAST(COUNT(*) AS BIGINT) AS n_cohort
        FROM cohort GROUP BY cohort_date
    ),
    active AS (
        SELECT c.cohort_date,
               CAST(date_diff('day', c.cohort_date, days.d) AS BIGINT)
                   AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM days JOIN cohort c ON c.u = days.u
        GROUP BY c.cohort_date, day_offset
    )
    SELECT a.cohort_date, a.day_offset, a.n_active, s.n_cohort,
           CAST(({scale} * a.n_active) // s.n_cohort AS BIGINT)
               AS retention_x1e6
    FROM active a JOIN sizes s ON s.cohort_date = a.cohort_date
    """


def funnel(events: DataFrame, stages: Sequence[str] = ("view", "click",
                                                       "purchase"),
           user_col: str = "user_id", ts_col: str = "ts",
           stage_col: str = "event_type",
           tie_col: str = "event_id") -> DataFrame:
    """Ordered funnel conversion: how many users progressed through the
    stage sequence IN ORDER — a stage-``i`` event counts only if it comes
    strictly after the user's counted stage-``i-1`` event.  Output is one
    row per stage: ``(stage_idx, stage, n_users, conv_from_prev_bp,
    conv_from_first_bp)`` with conversions in integer basis points
    (truncating div, NULL when the denominator is 0 — same in the oracle).

    Semantics = the greedy earliest chain: take the user's first stage-1
    event, then the first stage-2 event after it, and so on.  Greedy is
    exhaustive here — the first stage-1 event is the earliest, so ANY
    in-order chain implies the greedy one reaches at least as deep.
    Equal timestamps are ordered by ``tie_col`` in both engines.

    Plan shape (the 100-TB lens): ONE shuffle on the user key; each user's
    qualifying events fold through a JVM ``aggregate`` lambda over the
    sorted in-group array (bounded by per-user event count — the same
    bound every sessionization/retention op here already lives with).
    The per-stage rollup is |stages| rows; everything after the fold is
    driver-negligible.  No self-joins: a join-chain funnel (stage i ⋈
    stage i-1) is i shuffles and explodes on hot users.
    """
    n_st = len(stages)
    if n_st < 2:
        raise ValueError("funnel needs at least 2 stages")
    stage_arr = F.array(*[F.lit(s) for s in stages])
    evs = events.where(
        F.col(stage_col).isin(list(stages))
        & F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()  # null-ts rows would sort NULLS FIRST
        # here but NULLS LAST in the oracle's window — exclude in both
    ).select(
        F.col(user_col).alias("u"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(tie_col).alias("tie"),
            F.col(stage_col).alias("stage"),
        ).alias("e"),
    )
    # depth = how far the sorted event sequence walks the stage list;
    # least() keeps the element_at index in bounds under ANSI mode (when
    # acc == n_st the acc < n_st guard already sends the row to otherwise)
    depth = F.aggregate(
        F.sort_array(F.collect_list("e")),
        F.lit(0),
        lambda acc, x: F.when(
            (acc < F.lit(n_st))
            & (x["stage"] == F.element_at(
                stage_arr, F.least(acc + 1, F.lit(n_st)))),
            acc + 1,
        ).otherwise(acc),
    )
    depths = (
        evs.groupBy("u").agg(depth.alias("depth")).where(F.col("depth") >= 1)
        .groupBy("depth").agg(F.count("*").alias("n"))
    )
    spark = events.sparkSession
    stages_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(stages)], "stage_idx int, stage string"
    )
    counts = (
        stages_df.join(depths, depths["depth"] >= stages_df["stage_idx"], "left")
        .groupBy("stage_idx", "stage")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_users"))
    )
    w = Window.orderBy("stage_idx")
    prev = F.lag("n_users").over(w)
    first = F.first("n_users").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    # TRUNCATING integer division (Spark `div` ≡ DuckDB `//` on positive
    # int64 — never a float quotient, which can round up across the floor).
    # NO NULLs in the output: the first stage self-converts at 10000 bp and
    # a zero denominator yields 0 — a nullable int64 column would round-trip
    # through pandas as float64 and break cross-engine value comparison.
    return (
        counts.withColumn("_prev", prev).withColumn("_first", first)
        .select(
            "stage_idx", "stage", "n_users",
            F.when(F.col("_prev").isNull(), F.lit(10000).cast("long"))
            .when(F.col("_prev") == 0, F.lit(0).cast("long"))
            .otherwise(F.expr("(10000 * n_users) div _prev"))
            .alias("conv_from_prev_bp"),
            F.when(F.col("_first") == 0, F.lit(0).cast("long"))
            .otherwise(F.expr("(10000 * n_users) div _first"))
            .alias("conv_from_first_bp"),
        )
    )


def funnel_oracle_sql(stages: Sequence[str] = ("view", "click", "purchase"),
                      table: str = "events") -> str:
    """DuckDB replay of :func:`funnel` — the greedy earliest chain as
    |stages| chained min-rank CTEs over one per-user ROW_NUMBER timeline
    (rank order = (ts, event_id), exactly the fold's sort key), truncating
    integer basis points, NULL on zero denominators."""
    in_list = ", ".join(f"'{s}'" for s in stages)
    ctes = [
        f"""ranked AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rk
        FROM {table}
        WHERE event_type IN ({in_list}) AND user_id IS NOT NULL
          AND ts IS NOT NULL
    )""",
        f"""s1 AS (
        SELECT user_id, MIN(rk) AS rk FROM ranked
        WHERE event_type = '{stages[0]}' GROUP BY user_id
    )""",
    ]
    for i, st in enumerate(stages[1:], start=2):
        ctes.append(f"""s{i} AS (
        SELECT r.user_id, MIN(r.rk) AS rk
        FROM ranked r JOIN s{i - 1} p
          ON p.user_id = r.user_id AND r.rk > p.rk
        WHERE r.event_type = '{st}' GROUP BY r.user_id
    )""")
    unions = "\n        UNION ALL ".join(
        f"SELECT {i + 1} AS stage_idx, '{s}' AS stage,"
        f" (SELECT COUNT(*) FROM s{i + 1}) AS n_users"
        for i, s in enumerate(stages)
    )
    ctes.append(f"counts AS (\n        {unions}\n    )")
    return f"""
    WITH {', '.join(ctes)}
    SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(CASE WHEN prev IS NULL THEN 10000 WHEN prev = 0 THEN 0
                ELSE (10000 * n_users) // prev END AS BIGINT)
               AS conv_from_prev_bp,
           CAST(CASE WHEN frst = 0 THEN 0
                ELSE (10000 * n_users) // frst END AS BIGINT)
               AS conv_from_first_bp
    FROM (
        SELECT *, LAG(n_users) OVER (ORDER BY stage_idx) AS prev,
               FIRST_VALUE(n_users) OVER (ORDER BY stage_idx) AS frst
        FROM counts
    )
    ORDER BY stage_idx
    """


def event_transitions(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id",
                      scale: int = 1_000_000) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for every consecutive pair in a user's timeline (ordered by
    ``(ts, event_id)`` — the id breaks same-timestamp ties so the chain
    is deterministic in every engine), count ``from_type -> to_type``
    and emit the row-normalized transition probability as integer fixed
    point: ``p_x1e6 = n_trans * scale div n_from`` (truncating div,
    positive operands — Spark's ``div`` and DuckDB's ``//`` agree).
    Output: ``(from_type, to_type, n_trans, p_x1e6)``.

    The next-event model behind session-abandonment prediction and
    behavioral anomaly scoring — and, on a KG-construction pipeline, the
    empirical prior for which predicate follows which in a crawl's
    action log.

    Scale shape: ONE shuffle on the user key (the lead window); per-user
    partitions are bounded by per-user event counts, never by corpus
    size.  The pair aggregation map-side-combines into at most
    ``|types|^2`` rows, so the normalizing window runs over a table the
    size of the type vocabulary squared — driver-trivial at any corpus
    scale."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        events.where(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
            & F.col(type_col).isNotNull()
        )
        .select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_trans")
    )
    norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_trans",
        F.expr(f"n_trans * {scale} div sum(n_trans) over"
               " (partition by from_type)").alias("p_x1e6"),
    )


def event_transitions_oracle_sql(table: str = "events",
                                 scale: int = 1_000_000) -> str:
    """DuckDB replay of :func:`event_transitions` — same ``(ts, event_id)``
    lead ordering, same truncating row-normalized fixed point."""
    return f"""
    WITH pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM {table}
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IS NOT NULL
    ),
    c AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM pairs WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_trans,
           CAST(n_trans * {scale}
                // SUM(n_trans) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_x1e6
    FROM c
    """
