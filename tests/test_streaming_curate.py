"""Streaming curate admission (streaming/curate.py).

Pins the module contract: micro-batched admission decisions equal the
batch decision table on the shared columns (same feature expressions —
imported, not copied — and same first-failing-gate chain), the stateful
exact-dup gate holds across batches AND restarts, and a replayed run emits
nothing new (checkpoint idempotence).
"""

import pytest

from kgist_spark.operators.curate import curate_table
from kgist_spark.streaming.curate import (
    DOCS_DDL, STREAM_GATES, run_incremental_curate,
)

pytestmark = pytest.mark.spark

_CLEAN = ("quick brown foxes jumped over several lazy sleeping dogs while "
          "bright autumn leaves drifted past the quiet river bank today")
_LOWDIV = "word " * 30
_REPEAT = " ".join(f"filler{i}word" for i in range(40)) + " " + "spam alert " * 10

#: two micro-batch files; ids ascend in batch order so the stream's
#: first-seen keeper coincides with the batch table's min-id keeper.
#: No near-dups that are not exact dups — near_dup is the batch-only gate.
_BATCH1 = [
    (0, "en", _CLEAN),                 # kept
    (1, "de", _CLEAN + " extra"),      # lang
    (2, "en", "too few tokens"),       # too_short
    (3, "en", _LOWDIV),                # low_diversity
]
_BATCH2 = [
    (4, "en", _REPEAT),                # repetitive
    (5, "en", _CLEAN),                 # exact_dup of 0 (earlier BATCH)
    (6, "en", _CLEAN + " clause with several fresh distinct tokens "
              "making this a genuinely different long document body "
              "unrelated to anything previously ingested here today "
              "carrying plenty of novel vocabulary for the gates"),  # kept
]


def _write(spark, rows, path):
    spark.createDataFrame(rows, DOCS_DDL).coalesce(1).write.parquet(path)


def _run(spark, tmp_path, batches):
    inp = tmp_path / "in"
    inp.mkdir(exist_ok=True)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for i, rows in enumerate(batches):
        _write(spark, rows, str(inp / f"f{i}.parquet"))
        run_incremental_curate(spark, str(inp) + "/*", out, ckpt)
    return out, ckpt, inp


def test_stream_decisions_equal_batch_table(spark, tmp_path):
    out, _, _ = _run(spark, tmp_path, [_BATCH1, _BATCH2])
    got = {r["doc_id"]: r.asDict() for r in spark.read.parquet(out).collect()}
    docs = spark.createDataFrame(_BATCH1 + _BATCH2, DOCS_DDL)
    want = {r["doc_id"]: r.asDict() for r in curate_table(docs).collect()}
    assert set(got) == set(want) == set(range(7))
    shared = ["doc_id", "lang", "n_tokens", "unique_ratio",
              "dup_bigram_frac", "is_exact_dup", "keep", "drop_reason"]
    for i in want:
        # every batch near-dup in this corpus is an exact dup (or fails an
        # earlier gate), so near_dup never NAMES the reason and the shared
        # columns must be row-identical
        assert want[i]["drop_reason"] != "near_dup"
        assert {c: got[i][c] for c in shared} == {c: want[i][c] for c in shared}
    assert got[5]["drop_reason"] == "exact_dup"  # cross-BATCH duplicate
    assert got[0]["keep"] and got[6]["keep"]


def test_restart_restores_keeper_state(spark, tmp_path):
    """A duplicate arriving after a restart (fresh run, same checkpoint)
    is flagged against the keeper admitted in the earlier run."""
    out, ckpt, inp = _run(spark, tmp_path, [_BATCH1])
    n_first = spark.read.parquet(out).count()
    assert n_first == 4
    _write(spark, [(7, "en", _CLEAN)], str(inp / "f9.parquet"))
    run_incremental_curate(spark, str(inp) + "/*", out, str(ckpt))
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert len(rows) == 5
    assert rows[7]["is_exact_dup"] and rows[7]["drop_reason"] == "exact_dup"
    assert not rows[0]["is_exact_dup"]  # keeper unchanged


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running with the same checkpoint and no new files emits nothing."""
    out, ckpt, inp = _run(spark, tmp_path, [_BATCH1, _BATCH2])
    before = sorted(map(tuple, spark.read.parquet(out).collect()))
    run_incremental_curate(spark, str(inp) + "/*", out, ckpt)
    after = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert before == after


def test_in_batch_keeper_is_min_id(spark, tmp_path):
    """Within one micro-batch the keeper is deterministic: ascending id
    (micro-batch row order is undefined without it)."""
    rows = [(11, "en", _CLEAN), (10, "en", _CLEAN), (12, "en", _CLEAN)]
    out, _, _ = _run(spark, tmp_path, [rows])
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert not got[10]["is_exact_dup"]
    assert got[11]["is_exact_dup"] and got[12]["is_exact_dup"]


def test_stream_gates_subset_of_batch(spark):
    from kgist_spark.operators.curate import GATES

    assert STREAM_GATES == GATES[:-1]  # near_dup is the batch-only gate
