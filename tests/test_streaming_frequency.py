"""Streaming CMS: latest snapshot per (group, probe) equals the batch
sketch probed over the union of all micro-batches, across restarts."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.sketch import cms_build, cms_probe
from kgist_spark.streaming.frequency import run_incremental_cms

pytestmark = pytest.mark.spark

EV_DDL = ("event_id long, ts timestamp, user_id long, event_type string,"
          " value double, props string")

D, W = 4, 64
PROBES = [0, 7, 199, 424242]  # last one never occurs -> estimate small/0


def _events(spark, ids, etype):
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=i), i % 200, etype, 1.0, "{}")
            for i in ids]
    return spark.createDataFrame(rows, EV_DDL)


def _latest(spark, out_dir):
    df = spark.read.parquet(out_dir)
    mx = df.groupBy("event_type", "probe").agg(
        F.max("n_rows_seen").alias("n_rows_seen")
    )
    return {
        (r["event_type"], r["probe"]): r["n_cms"]
        for r in df.join(mx, ["event_type", "probe", "n_rows_seen"]).collect()
    }


def _batch_truth(df):
    out = {}
    for g in [r["event_type"] for r in df.select("event_type").distinct().collect()]:
        sub = df.where(F.col("event_type") == g)
        probes = sub.sparkSession.createDataFrame(
            [(str(p),) for p in PROBES], "v string"
        )
        sk = cms_build(sub.withColumn("v", F.col("user_id").cast("string")),
                       "v", d=D, w=W)
        for r in cms_probe(sk, probes, "v", d=D, w=W).collect():
            out[(g, r["v"])] = r["n_cms"]
    return out


def test_stream_equals_batch_across_restart(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()

    _events(spark, range(0, 500), "click").union(
        _events(spark, range(100, 300), "view")
    ).write.parquet(str(inp / "f1.parquet"))
    run_incremental_cms(spark, str(inp) + "/*", out, ckpt, PROBES, d=D, w=W)

    _events(spark, range(500, 900), "click").write.parquet(
        str(inp / "f2.parquet")
    )
    run_incremental_cms(spark, str(inp) + "/*", out, ckpt, PROBES, d=D, w=W)

    got = _latest(spark, out)

    allev = _events(spark, range(0, 900), "click").union(
        _events(spark, range(100, 300), "view")
    )
    want = _batch_truth(allev)
    assert got == want

    # CMS never undercounts: user 0 occurs ceil(900/200)=5 times in click
    assert got[("click", "0")] >= 5
