"""Streaming schema profile: the latest snapshot per (pred, side) equals
the batch predicate_schema over the union of all micro-batches, across
restarts; HALF_UP entropy parity pinned on knife-edge-free real data."""

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.graph import predicate_schema
from kgist_spark.streaming.schema import run_incremental_schema

pytestmark = pytest.mark.spark


def _triples(spark, ids):
    rows = [
        (f"n{i % 31}", ["p", "q"][i % 2], f"m{i % 17}")
        for i in ids
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _labels(spark):
    rows = [(f"n{i}", lab) for i in range(31)
            for lab in (["A"] if i % 3 else ["A", "B"])]
    rows += [(f"m{i}", ["C", "D"][i % 2]) for i in range(17)]
    return spark.createDataFrame(rows, "node string, label string")


def _latest(spark, out_dir):
    df = spark.read.parquet(out_dir)
    mx = df.groupBy("pred", "side").agg(F.max("n_pairs").alias("n_pairs"))
    return {
        (r["pred"], r["side"]): (r["n_pairs"], r["n_types"], r["top_label"],
                                 r["top_share_x1e6"], r["entropy_x1e6"])
        for r in df.join(mx, ["pred", "side", "n_pairs"]).collect()
    }


def _batch(spark, triples, labels):
    return {
        (r["pred"], r["side"]): (r["n_pairs"], r["n_types"], r["top_label"],
                                 r["top_share_x1e6"], r["entropy_x1e6"])
        for r in predicate_schema(triples, labels).collect()
    }


def test_stream_equals_batch_across_restart(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()
    labels = _labels(spark)

    _triples(spark, range(0, 120)).write.parquet(str(inp / "f1.parquet"))
    run_incremental_schema(spark, str(inp) + "/*", labels, out, ckpt)

    _triples(spark, range(120, 300)).write.parquet(str(inp / "f2.parquet"))
    run_incremental_schema(spark, str(inp) + "/*", labels, out, ckpt)

    got = _latest(spark, out)
    want = _batch(spark, _triples(spark, range(0, 300)), labels)
    assert got == want
    assert len(got) == 4  # (p, q) x (s, o)


def test_replay_appends_nothing(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()
    labels = _labels(spark)
    _triples(spark, range(0, 60)).write.parquet(str(inp / "f1.parquet"))
    run_incremental_schema(spark, str(inp) + "/*", labels, out, ckpt)
    n_before = spark.read.parquet(out).count()
    run_incremental_schema(spark, str(inp) + "/*", labels, out, ckpt)
    assert spark.read.parquet(out).count() == n_before
