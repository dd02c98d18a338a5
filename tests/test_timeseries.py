"""Time-series operators: gap sessionization and backward as-of join."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_sessionize_gap_semantics(spark):
    """Break iff gap STRICTLY exceeds the timeout; sessions are 1-based in
    time order per user; aggregates cover exactly the session's rows."""
    from kgist_spark.operators.timeseries import sessionize

    rows = [
        # user 1: 0, +29m (same session: gap < 30), +30m exactly (same:
        # NOT strictly greater), then +31m (break)
        (1, 1, _ts(0), 1.0), (2, 1, _ts(29), 2.0), (3, 1, _ts(59), 4.0),
        (4, 1, _ts(90), 8.0),
        # user 2: single event
        (5, 2, _ts(10), 1.5),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["start_ts"],
                                           r["end_ts"], r["sum_value"])
        for r in sessionize(ev).collect()
    }
    assert got[(1, 1)] == (3, _ts(0), _ts(59), 7.0)
    assert got[(1, 2)] == (1, _ts(90), _ts(90), 8.0)
    assert got[(2, 1)] == (1, _ts(10), _ts(10), 1.5)
    assert len(got) == 3


def test_asof_join_semantics(spark):
    """Backward as-of: greatest right ts <= left ts per key; equal
    timestamps match (right before left); no prior right row -> null;
    equal-ts right duplicates resolve by max_by(tie_col)."""
    from kgist_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(100, 1, _ts(5), 0.0),   # view at 0 and AT 5 -> the ts=5 view wins
         (101, 1, _ts(2), 0.0),   # only the ts=0 view precedes
         (102, 1, _ts(0), 0.0),   # equal ts at the very first view -> match
         (103, 2, _ts(1), 0.0)],  # user 2 has no views -> null
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(1, 1, _ts(0), 10.0),
         (2, 1, _ts(5), 20.0),
         (3, 1, _ts(5), 30.0)],   # same ts as event 2: max_by(event_id) wins
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, ["user_id"], "ts", "value").collect()
    }
    assert got[100] == 30.0   # ts=5 views, deduped to event 3's value
    assert got[101] == 10.0
    assert got[102] == 10.0   # <= includes equality
    assert got[103] is None
    assert len(got) == 4


def test_asof_join_single_shuffle(spark):
    """The union-tag implementation is ONE shuffle on the key (plus the
    right-side dedup aggregate) — no range join / cartesian anywhere."""
    from kgist_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(1), 0.0)],
        "event_id long, user_id long, ts timestamp, value double")
    right = spark.createDataFrame(
        [(2, 1, _ts(0), 1.0)],
        "event_id long, user_id long, ts timestamp, value double")
    plan = (
        asof_join(left, right, ["user_id"], "ts", "value")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_asof_join_null_value_row_matches(spark):
    """SQL ASOF semantics: the most recent prior ROW matches even when its
    value is null — never skipped in favour of an older non-null value."""
    from kgist_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(100, 1, _ts(3), 0.0)],
        "event_id long, user_id long, ts timestamp, value double")
    right = spark.createDataFrame(
        [(1, 1, _ts(1), 10.0), (2, 1, _ts(2), None)],
        "event_id long, user_id long, ts timestamp, value double")
    got = asof_join(left, right, ["user_id"], "ts", "value").collect()
    assert len(got) == 1 and got[0]["asof_value"] is None


def test_asof_join_rejects_out_col_collision(spark):
    from kgist_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(0), 0.0)],
        "event_id long, user_id long, ts timestamp, value double")
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, left, ["user_id"], "ts", "value", out_col="value")


def test_sessionize_custom_columns(spark):
    """All columns are parameterized — no hardcoded event_id dependency."""
    from kgist_spark.operators.timeseries import sessionize

    ev = spark.createDataFrame(
        [(1, "u1", _ts(0), 2.0), (2, "u1", _ts(45), 3.0)],
        "rid long, uid string, event_ts timestamp, score double")
    got = {(r["uid"], r["session_seq"]): r["n_events"]
           for r in sessionize(ev, user_col="uid", ts_col="event_ts",
                               value_col="score", tie_col="rid").collect()}
    assert got == {("u1", 1): 1, ("u1", 2): 1}


def test_sessionize_fractional_gap_boundary(spark):
    """8.3 min is 497999.99999999994 in float ms: the timeout must ROUND to
    498000, so a gap of exactly 8.3 min does NOT break (strict-gap rule),
    and one millisecond more does."""
    from kgist_spark.operators.timeseries import sessionize

    ev = spark.createDataFrame(
        [(1, 1, T0, 1.0),
         (2, 1, T0 + dt.timedelta(milliseconds=498000), 1.0),
         (3, 1, T0 + dt.timedelta(milliseconds=996001), 1.0)],
        "event_id long, user_id long, ts timestamp, value double")
    got = {r["session_seq"]: r["n_events"]
           for r in sessionize(ev, gap_minutes=8.3).collect()}
    assert got == {1: 2, 2: 1}


# ---------------------------------------------------------------------------
# banded interval join
# ---------------------------------------------------------------------------

def _dt(s):
    import datetime
    return datetime.datetime.fromisoformat(s)


def test_range_join_boundaries(spark):
    from kgist_spark.operators.timeseries import range_join_pairs

    intervals = spark.createDataFrame(
        [(1, _dt("2024-01-01 00:00:00"), _dt("2024-01-01 00:10:00"))],
        "iid long, start timestamp, end timestamp",
    )
    probes = spark.createDataFrame(
        [(10, _dt("2024-01-01 00:00:00")),     # == start: IN (inclusive)
         (11, _dt("2024-01-01 00:09:59.999999")),  # just inside
         (12, _dt("2024-01-01 00:10:00")),     # == end: OUT (exclusive)
         (13, _dt("2023-12-31 23:59:59"))],    # before
        "pid long, ts timestamp",
    )
    got = sorted(
        r["pid"] for r in range_join_pairs(intervals, probes).collect()
    )
    assert got == [10, 11]


def test_range_join_equals_naive_theta_join(spark):
    # seeded fuzz: banding with a bin width much smaller than (and not
    # dividing) the interval lengths must reproduce the raw theta join
    import datetime
    import random

    from pyspark.sql import functions as F

    from kgist_spark.operators.timeseries import range_join_pairs

    rng = random.Random(11)
    base = datetime.datetime(2024, 1, 1)
    intervals = [
        (i, base + datetime.timedelta(seconds=rng.randrange(3600)),)
        for i in range(40)
    ]
    intervals = [
        (i, s, s + datetime.timedelta(seconds=rng.randrange(30, 900)))
        for (i, s) in intervals
    ]
    probes = [
        (j, base + datetime.timedelta(
            seconds=rng.randrange(4000), microseconds=rng.randrange(10**6)))
        for j in range(300)
    ]
    idf = spark.createDataFrame(intervals, "iid long, start timestamp, end timestamp")
    pdf = spark.createDataFrame(probes, "pid long, ts timestamp")
    got = sorted(
        (r["iid"], r["pid"])
        for r in range_join_pairs(idf, pdf, bin_seconds=64).collect()
    )
    want = sorted(
        (r["iid"], r["pid"])
        for r in idf.crossJoin(pdf)
        .where((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .collect()
    )
    assert got == want and len(got) > 0


def test_range_join_plan_is_equi_join(spark):
    # the whole point: the physical plan must be a hash equi-join on the
    # bin, never a BroadcastNestedLoopJoin over the raw theta predicate
    from kgist_spark.operators.timeseries import range_join_pairs

    intervals = spark.createDataFrame(
        [(1, _dt("2024-01-01 00:00:00"), _dt("2024-01-01 00:10:00"))],
        "iid long, start timestamp, end timestamp",
    )
    probes = spark.createDataFrame(
        [(10, _dt("2024-01-01 00:05:00"))], "pid long, ts timestamp"
    )
    plan = range_join_pairs(intervals, probes)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------ event drift


def test_event_drift_hand_computed(spark):
    from kgist_spark.operators.timeseries import event_drift

    # type "a": counts 1,1,1,1 then a burst of 5 — with trailing=3 the
    # burst's window is (1,1,1): mean 1, std 0 -> NULL; make the window
    # varied so std > 0: counts 1,2,3 then 6
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for h, n in enumerate([1, 2, 3, 6]):
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1), "a"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {
        r["hour"].hour: (r["n"], r["z_x1e6"])
        for r in event_drift(ev, trailing=3).collect()
    }
    # hours 0-2: warm-up (fewer than 3 prior buckets) -> NULL z
    assert out[0] == (1, None) and out[1] == (2, None) and out[2] == (3, None)
    # hour 3: window (1,2,3): mean 2, var (1+4+9)/3 - 4 = 2/3, z = 4/sqrt(2/3)
    import math

    expected = round((6 - 2.0) / math.sqrt(14 / 3.0 - 4.0) * 1_000_000)
    assert out[3] == (6, expected)


def test_event_drift_constant_window_is_null(spark):
    from kgist_spark.operators.timeseries import event_drift

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for h in range(5):  # constant volume: every window has std 0
        for _ in range(2):
            rows.append((eid, base + dt.timedelta(hours=h), "a"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = event_drift(ev, trailing=3).collect()
    assert all(r["z_x1e6"] is None for r in out)


# ---------------------------------------------------------------------------
# cohort retention (cohort_retention)


def test_cohort_retention_hand_computed(spark):
    from kgist_spark.operators.timeseries import cohort_retention

    d = lambda day, hour=0: dt.datetime(2024, 1, day, hour)
    rows = [
        # user 1 and 2 join day 1; user 1 returns days 2 and 3, user 2
        # only day 3; user 3 joins day 2 and never returns
        (1, d(1)), (1, d(1, 5)), (1, d(2)), (1, d(3)),
        (2, d(1)), (2, d(3)),
        (3, d(2)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_date"].day, r["day_offset"]):
            (r["n_active"], r["n_cohort"], r["retention_x1e6"])
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        (1, 0): (2, 2, 1000000),
        (1, 1): (1, 2, 500000),
        (1, 2): (2, 2, 1000000),
        (2, 0): (1, 1, 1000000),
    }


def test_cohort_retention_day_boundary_not_24h_window(spark):
    from kgist_spark.operators.timeseries import cohort_retention

    # 23:00 -> 01:00 next day is offset 1 (calendar day), not offset 0
    rows = [(1, dt.datetime(2024, 1, 1, 23)), (1, dt.datetime(2024, 1, 2, 1))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    offs = {r["day_offset"] for r in cohort_retention(ev).collect()}
    assert offs == {0, 1}


def test_cohort_retention_null_users_excluded(spark):
    from kgist_spark.operators.timeseries import cohort_retention

    rows = [(1, dt.datetime(2024, 1, 1)), (None, dt.datetime(2024, 1, 1))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = cohort_retention(ev).collect()
    assert len(out) == 1 and out[0]["n_cohort"] == 1


# ---------------------------------------------------------------------------
# Markov event transitions (event_transitions)

_TR_DDL = ("event_id long, ts timestamp, user_id long, event_type string,"
           " value double, props string")


def _tr_rows():
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, minute, user, etype):
        return (eid, t0 + dt.timedelta(minutes=minute), user, etype,
                1.0, "{}")

    return [
        # u1 timeline: A -> B -> A -> C
        ev(1, 0, 1, "A"), ev(2, 1, 1, "B"), ev(3, 2, 1, "A"),
        ev(4, 3, 1, "C"),
        # u2: B and A at the SAME ts — event_id 5 (B) sorts before 6 (A),
        # so the chain contributes B -> A, never A -> B
        ev(5, 0, 2, "B"), ev(6, 0, 2, "A"),
        # u3: single event, no transition
        ev(7, 0, 3, "C"),
    ]


def test_event_transitions_hand_computed(spark):
    from kgist_spark.operators.timeseries import event_transitions

    df = spark.createDataFrame(_tr_rows(), _TR_DDL)
    got = {
        (r["from_type"], r["to_type"]): (r["n_trans"], r["p_x1e6"])
        for r in event_transitions(df).collect()
    }
    # from A: A->B 1, A->C 1 (each 1/2); from B: B->A 2 (2/2)
    assert got == {
        ("A", "B"): (1, 500_000),
        ("A", "C"): (1, 500_000),
        ("B", "A"): (2, 1_000_000),
    }


def test_event_transitions_same_ts_tiebreak_is_event_id(spark):
    from kgist_spark.operators.timeseries import event_transitions

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # both events at the identical timestamp: the id order decides the
    # chain direction deterministically
    df = spark.createDataFrame(
        [(10, t0, 1, "X", 1.0, "{}"), (11, t0, 1, "Y", 1.0, "{}")],
        _TR_DDL,
    )
    got = [tuple(r) for r in event_transitions(df).collect()]
    assert got == [("X", "Y", 1, 1_000_000)]


def test_event_transitions_matches_duckdb_oracle(spark):
    import duckdb

    from kgist_spark.operators.timeseries import (
        event_transitions, event_transitions_oracle_sql)

    df = spark.createDataFrame(_tr_rows(), _TR_DDL)
    got = sorted(tuple(r) for r in event_transitions(df).collect())
    con = duckdb.connect()
    con.register("events", df.toPandas())
    want = sorted(map(tuple, con.sql(
        event_transitions_oracle_sql()).fetchall()))
    assert got == want
