"""Streaming gap sessionization: emitted closed sessions equal the batch
operator on the union (all sessions force-closed by a far-future flush
event per user), across batch seams and restarts."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.timeseries import sessionize
from kgist_spark.streaming.sessions import run_incremental_sessions

pytestmark = pytest.mark.spark

EV_DDL = ("event_id long, ts timestamp, user_id long, event_type string,"
          " value double, props string")
GAP_MIN = 2.0  # small gap so the generator produces many sessions


def _events(spark, ids):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in ids:
        # bursty timeline: ~3-event bursts separated by > gap
        burst, pos = divmod(i, 3)
        ts = base + dt.timedelta(minutes=burst * 7, seconds=pos * 20)
        rows.append((i, ts, i % 5, "e", float(i % 4), "{}"))
    return spark.createDataFrame(rows, EV_DDL)


def _flush(spark, start_eid):
    far = dt.datetime(2030, 1, 1)
    rows = [(start_eid + u, far, u, "flush", 0.0, "{}") for u in range(5)]
    return spark.createDataFrame(rows, EV_DDL)


def _rows(df):
    return {
        (r["user_id"], r["session_seq"]):
        (r["n_events"], r["start_ts"], r["end_ts"], r["sum_value"])
        for r in df.collect()
    }


def test_stream_equals_batch_after_flush_across_restart(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()

    _events(spark, range(0, 45)).write.parquet(str(inp / "f1.parquet"))
    run_incremental_sessions(spark, str(inp) + "/*", out, ckpt,
                             gap_minutes=GAP_MIN)
    # a cross-seam burst: events 45-89 continue (restart resumes state)
    _events(spark, range(45, 90)).write.parquet(str(inp / "f2.parquet"))
    _flush(spark, 10_000).write.parquet(str(inp / "f3.parquet"))
    run_incremental_sessions(spark, str(inp) + "/*", out, ckpt,
                             gap_minutes=GAP_MIN)

    got = _rows(spark.read.parquet(out))
    batch_all = sessionize(
        _events(spark, range(0, 90)).union(_flush(spark, 10_000)),
        gap_minutes=GAP_MIN,
    )
    # drop the flush singleton sessions (one per user, the max seq)
    mx = batch_all.groupBy("user_id").agg(
        F.max("session_seq").alias("mseq"))
    want = _rows(
        batch_all.join(mx, "user_id")
        .where(F.col("session_seq") != F.col("mseq"))
        .drop("mseq")
    )
    assert got == want
    assert len(got) > 10  # many real sessions actually closed


def test_replay_appends_nothing(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()
    _events(spark, range(0, 30)).write.parquet(str(inp / "f1.parquet"))
    run_incremental_sessions(spark, str(inp) + "/*", out, ckpt,
                             gap_minutes=GAP_MIN)
    n = spark.read.parquet(out).count()
    run_incremental_sessions(spark, str(inp) + "/*", out, ckpt,
                             gap_minutes=GAP_MIN)
    assert spark.read.parquet(out).count() == n
