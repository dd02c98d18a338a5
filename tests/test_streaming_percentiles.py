"""Streaming percentiles: latest snapshot per stratum equals the batch
distribution_report over the union of all micro-batches, across restarts,
with distinct-value-bounded state."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.sampling import distribution_report
from kgist_spark.streaming.percentiles import run_incremental_percentiles

pytestmark = pytest.mark.spark

EV_DDL = ("event_id long, ts timestamp, user_id long, event_type string,"
          " value double, props string")


def _events(spark, values, etype):
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=i), i, etype, float(v), "{}")
            for i, v in enumerate(values)]
    return spark.createDataFrame(rows, EV_DDL)


def _latest(spark, out_dir):
    df = spark.read.parquet(out_dir)
    w_max = df.groupBy("stratum").agg(F.max("n_rows").alias("n_rows"))
    return {
        r["stratum"]: (r["n_rows"], r["p25"], r["p50"], r["p75"], r["p95"])
        for r in df.join(w_max, ["stratum", "n_rows"]).collect()
    }


def _batch(spark, df):
    rep = distribution_report(
        df.select("event_type", F.col("value").cast("long").alias("v")),
        "event_type", "v",
    )
    return {
        r["stratum"]: (r["n_rows"], r["p25"], r["p50"], r["p75"], r["p95"])
        for r in rep.collect()
    }


def test_stream_equals_batch_and_resumes(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()

    # batch 1: two strata, skewed values (interpolation lands off-grid)
    v1 = [(i * 7) % 100 for i in range(41)]
    v2 = [(i * 13) % 50 for i in range(23)]
    _events(spark, v1, "click").union(_events(spark, v2, "view")) \
        .write.parquet(str(inp / "f1.parquet"))
    run_incremental_percentiles(spark, str(inp) + "/*", out, ckpt)

    # batch 2 (new file, RESTARTED stream): click moves, view untouched
    v3 = [(i * 3) % 200 for i in range(37)]
    _events(spark, v3, "click").write.parquet(str(inp / "f2.parquet"))
    run_incremental_percentiles(spark, str(inp) + "/*", out, ckpt)

    got = _latest(spark, out)
    want = _batch(
        spark,
        _events(spark, v1 + v3, "click").union(_events(spark, v2, "view")),
    )
    assert got == want
    assert got["click"][0] == 78 and got["view"][0] == 23


def test_stream_replay_is_idempotent(spark, tmp_path):
    # re-running the driver with NO new files must append nothing new
    # (availableNow resumes from the checkpoint offsets)
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()
    _events(spark, [5, 1, 9, 1], "click").write.parquet(
        str(inp / "f1.parquet"))
    run_incremental_percentiles(spark, str(inp) + "/*", out, ckpt)
    n1 = spark.read.parquet(out).count()
    run_incremental_percentiles(spark, str(inp) + "/*", out, ckpt)
    assert spark.read.parquet(out).count() == n1
    assert _latest(spark, out) == _batch(
        spark, _events(spark, [5, 1, 9, 1], "click"))


def test_null_values_excluded_like_batch(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base, 1, "click", 10.0, "{}"),
            (2, base, 2, "click", None, "{}"),
            (3, base, 3, "click", 20.0, "{}")]
    spark.createDataFrame(rows, EV_DDL).write.parquet(str(inp / "f1.parquet"))
    run_incremental_percentiles(spark, str(inp) + "/*", out, ckpt)
    got = _latest(spark, out)["click"]
    assert got[0] == 2          # the NULL row never entered the histogram
    assert got[2] == 15.0       # p50 of {10, 20}
