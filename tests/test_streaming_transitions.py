"""Streaming Markov transitions: summed n_inc increments over the output
log equal the batch operator's pair counts on the union of all
micro-batches, including the cross-batch boundary pairs and across a
restart."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.timeseries import event_transitions
from kgist_spark.streaming.transitions import run_incremental_transitions

pytestmark = pytest.mark.spark

EV_DDL = ("event_id long, ts timestamp, user_id long, event_type string,"
          " value double, props string")

TYPES = ["view", "click", "buy"]


def _events(spark, ids):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), i % 7,
         TYPES[(i * i + i // 5) % 3], 1.0, "{}")
        for i in ids
    ]
    return spark.createDataFrame(rows, EV_DDL)


def _matrix_from_log(spark, out_dir):
    df = spark.read.parquet(out_dir)
    return {
        (r["from_type"], r["to_type"]): r["n"]
        for r in df.groupBy("from_type", "to_type")
                   .agg(F.sum("n_inc").alias("n")).collect()
    }


def _batch_matrix(df):
    return {
        (r["from_type"], r["to_type"]): r["n_trans"]
        for r in event_transitions(df).collect()
    }


def test_stream_equals_batch_across_restart(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()

    # batch 1: first time slice (append-log shape: later files = later ts)
    _events(spark, range(0, 60)).write.parquet(str(inp / "f1.parquet"))
    run_incremental_transitions(spark, str(inp) + "/*", out, ckpt)

    # batch 2 lands later events; a RESTARTED run resumes from state and
    # must emit the boundary pairs (user's stored last -> batch first)
    _events(spark, range(60, 150)).write.parquet(str(inp / "f2.parquet"))
    run_incremental_transitions(spark, str(inp) + "/*", out, ckpt)

    got = _matrix_from_log(spark, out)
    want = _batch_matrix(_events(spark, range(0, 150)))
    assert got == want
    # the boundary pairs exist: 7 users each chain across the batch seam,
    # so the stream total equals the batch total (149 pairs - none lost)
    assert sum(got.values()) == sum(want.values()) == 150 - 7


def test_replay_idempotence(spark, tmp_path):
    """Re-running availableNow with NO new files appends nothing."""
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()
    _events(spark, range(0, 40)).write.parquet(str(inp / "f1.parquet"))
    run_incremental_transitions(spark, str(inp) + "/*", out, ckpt)
    before = _matrix_from_log(spark, out)
    run_incremental_transitions(spark, str(inp) + "/*", out, ckpt)
    assert _matrix_from_log(spark, out) == before
