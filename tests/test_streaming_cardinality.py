"""Streaming HLL: latest snapshot per group equals the batch sketch over
the union of all micro-batches, across restarts, with bounded state."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.sketch import hll_distinct
from kgist_spark.streaming.cardinality import run_incremental_hll

pytestmark = pytest.mark.spark

EV_DDL = ("event_id long, ts timestamp, user_id long, event_type string,"
          " value double, props string")


def _events(spark, ids, etype):
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=i), i, etype, 1.0, "{}")
            for i in ids]
    return spark.createDataFrame(rows, EV_DDL)


def _latest(spark, out_dir):
    df = spark.read.parquet(out_dir)
    w_max = df.groupBy("event_type").agg(
        F.max("n_values_seen").alias("n_values_seen")
    )
    return {
        (r["event_type"]): (r["n_registers_hit"], r["n_distinct_hll"])
        for r in df.join(w_max, ["event_type", "n_values_seen"]).collect()
    }


def test_stream_equals_batch_and_resumes(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()

    # batch 1: two groups, overlapping user ranges
    _events(spark, range(0, 300), "click").union(
        _events(spark, range(100, 250), "view")
    ).write.parquet(str(inp / "f1.parquet"))
    run_incremental_hll(spark, str(inp) + "/*", out, ckpt)

    # batch 2 (new file, RESTARTED stream): duplicates + new values
    _events(spark, range(200, 500), "click").write.parquet(
        str(inp / "f2.parquet")
    )
    run_incremental_hll(spark, str(inp) + "/*", out, ckpt)

    got = _latest(spark, out)

    # ground truth: the batch sketch over everything the stream saw
    allev = _events(spark, range(0, 500), "click").union(
        _events(spark, range(100, 250), "view")
    )
    want = {
        r["event_type"]: (r["n_registers_hit"], r["n_distinct_hll"])
        for r in hll_distinct(allev, ["event_type"], "user_id").collect()
    }
    assert got == want

    # estimates are in the right ballpark too (linear-counting regime)
    assert abs(got["click"][1] - 500) / 500 < 0.1
    assert abs(got["view"][1] - 150) / 150 < 0.1


def test_stream_duplicates_are_free(spark, tmp_path):
    # the same values re-arriving in a later batch must not move the
    # estimate (register merge is idempotent max)
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()
    _events(spark, range(0, 200), "click").write.parquet(
        str(inp / "f1.parquet")
    )
    run_incremental_hll(spark, str(inp) + "/*", out, ckpt)
    first = _latest(spark, out)["click"]

    _events(spark, range(0, 200), "click").write.parquet(
        str(inp / "f2.parquet")
    )
    run_incremental_hll(spark, str(inp) + "/*", out, ckpt)
    again = _latest(spark, out)["click"]
    assert first == again
