"""Ordered funnel: depth is the greedy earliest in-order chain — events
arriving out of stage order must NOT count (the saturated synthetic events
table can't distinguish ordered from naive per-stage distinct counts, so
this fixture is built so every wrong semantic gives a different table)."""

import datetime as dt

import duckdb
import pytest

from kgist_spark.operators.timeseries import funnel, funnel_oracle_sql

pytestmark = pytest.mark.spark

EV_DDL = ("event_id long, ts timestamp, user_id long, event_type string,"
          " value double, props string")

T0 = dt.datetime(2024, 1, 1)


def _ev(eid, minute, user, etype):
    return (eid, T0 + dt.timedelta(minutes=minute), user, etype, 1.0, "{}")


ROWS = [
    # u1: clean view -> click -> purchase            depth 3
    _ev(1, 0, 1, "view"), _ev(2, 1, 1, "click"), _ev(3, 2, 1, "purchase"),
    # u2: click BEFORE view, purchase after           depth 1 (view only --
    # the pre-view click must not count, nor purchase without a click)
    _ev(4, 0, 2, "click"), _ev(5, 1, 2, "view"), _ev(6, 2, 2, "purchase"),
    # u3: view only                                   depth 1
    _ev(7, 0, 3, "view"),
    # u4: purchase only -> no stage-1 event, excluded from every row
    _ev(8, 0, 4, "purchase"),
    # u5: view, purchase, click -> purchase precedes the counted click,
    # so depth 2 (view, click)
    _ev(9, 0, 5, "view"), _ev(10, 1, 5, "purchase"), _ev(11, 2, 5, "click"),
    # u6: click and view at the SAME ts; click has the smaller event_id so
    # it sorts first and precedes the view             depth 1
    _ev(12, 0, 6, "click"), _ev(13, 0, 6, "view"),
    # noise: an unrelated event type never enters the funnel
    _ev(14, 0, 1, "error"),
]

WANT = [
    # stage_idx, stage, n_users, conv_from_prev_bp, conv_from_first_bp
    # (the first stage self-converts at 10000 bp — the output is NULL-free
    # by contract so int64 columns never round-trip as pandas float64)
    (1, "view", 5, 10000, 10000),
    (2, "click", 2, 4000, 4000),
    (3, "purchase", 1, 5000, 2000),
]


def test_funnel_order_sensitivity(spark):
    df = spark.createDataFrame(ROWS, EV_DDL)
    got = [
        (r["stage_idx"], r["stage"], r["n_users"], r["conv_from_prev_bp"],
         r["conv_from_first_bp"])
        for r in funnel(df).orderBy("stage_idx").collect()
    ]
    assert got == WANT


def test_funnel_oracle_matches_on_adversarial_fixture(spark):
    import pandas as pd

    events = pd.DataFrame(
        ROWS, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"]
    )
    con = duckdb.connect()
    con.register("events", events)
    odf = con.execute(funnel_oracle_sql()).df()
    got = [
        (int(r.stage_idx), r.stage, int(r.n_users),
         int(r.conv_from_prev_bp), int(r.conv_from_first_bp))
        for r in odf.itertuples()
    ]
    assert got == WANT


def test_funnel_rejects_single_stage(spark):
    df = spark.createDataFrame(ROWS, EV_DDL)
    with pytest.raises(ValueError):
        funnel(df, stages=("view",))
