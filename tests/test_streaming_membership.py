"""Streaming Bloom dedup: fixed-state admission equals first-seen dedup
(at test scale the FP rate is ~0), duplicates stay rejected across
restarts, and the stream's bit positions are byte-identical to the batch
Bloom operator's."""

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.sketch import bloom_build
from kgist_spark.streaming.membership import (
    bloom_positions,
    run_incremental_bloom_dedup,
)

pytestmark = pytest.mark.spark

DDL = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DDL)


def test_stream_positions_match_batch_bloom(spark):
    # a single inserted value must set, in the batch word table, exactly
    # the bits the streaming admit computes
    df = _docs(spark, [(1, "the quick brown fox")])
    words = {r["word_idx"]: r["bits"]
             for r in bloom_build(df, "text").collect()}
    got = {(w, b) for w, bits in words.items()
           for b in range(32) if bits & (1 << b)}
    want = {(p // 32, p % 32) for p in bloom_positions("the quick brown fox")}
    assert got == want


def test_stream_dedup_equals_first_seen_across_restart(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()

    # batch 1: texts t0..t49, with 60..69 duplicating t0..t9 at higher ids
    b1 = [(i, f"text number {i}") for i in range(50)] + [
        (60 + i, f"text number {i}") for i in range(10)
    ]
    _docs(spark, b1).write.parquet(str(inp / "f1.parquet"))
    run_incremental_bloom_dedup(spark, str(inp) + "/*", out, ckpt)

    # batch 2: all of t0..t49 again (must ALL be rejected) + new t100..t119
    b2 = [(200 + i, f"text number {i}") for i in range(50)] + [
        (300 + i, f"text number {100 + i}") for i in range(20)
    ]
    _docs(spark, b2).write.parquet(str(inp / "f2.parquet"))
    run_incremental_bloom_dedup(spark, str(inp) + "/*", out, ckpt)

    res = spark.read.parquet(out)
    admitted = {r["doc_id"] for r in res.where("admitted").collect()}
    rejected = {r["doc_id"] for r in res.where("NOT admitted").collect()}

    # first-seen per text: ids 0..49 in batch 1 (they precede 60..69 in
    # doc_id order), the 20 new texts in batch 2
    assert admitted == set(range(50)) | {300 + i for i in range(20)}
    assert rejected == {60 + i for i in range(10)} | \
        {200 + i for i in range(50)}
    # every row of both batches is accounted for exactly once
    assert res.count() == len(b1) + len(b2)


def test_stream_state_is_fixed_size(spark, tmp_path):
    # the checkpointed state is the bitmap, not a per-fingerprint table:
    # admitting 500 documents must leave exactly n_shards state blobs of
    # m/8 bytes — readable back through another run that rejects them all
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()
    _docs(spark, [(i, f"doc {i}") for i in range(500)]).write.parquet(
        str(inp / "f1.parquet"))
    run_incremental_bloom_dedup(spark, str(inp) + "/*", out, ckpt)
    _docs(spark, [(1000 + i, f"doc {i}") for i in range(500)]).write.parquet(
        str(inp / "f2.parquet"))
    run_incremental_bloom_dedup(spark, str(inp) + "/*", out, ckpt)
    res = spark.read.parquet(out)
    assert res.where("admitted").count() == 500
    assert res.where("NOT admitted AND doc_id >= 1000").count() == 500
