"""Streaming cardinality: cross-batch HyperLogLog distinct counts.

The streaming twin of :func:`kgist_spark.operators.sketch.hll_distinct` —
"how many distinct users/entities/domains has this stream seen so far, per
group" with state that NEVER grows past ``m`` bytes per group.  An exact
streaming distinct needs a state store keyed by every value ever seen
(unbounded — the same reason exact distinct can't map-side-combine in
batch); the HLL register array is the bounded-state replacement, and its
merge operation is a per-register MAX, which is exactly the idempotent,
commutative shape micro-batch processing wants: replays and out-of-order
batches can only re-apply maxima.

Cross-surface equality contract: the per-value register update here is the
same md5-derived (index, rho) as the batch operator and the estimate is
computed by the SHARED :func:`estimate_from_registers` — so after any
sequence of micro-batches the latest emitted estimate per group equals
``hll_distinct`` run in batch over the union of those batches, row for row
(pinned in ``tests/test_streaming_cardinality.py``).  State survives
restarts via the checkpointed state store like every stateful operator in
:mod:`kgist_spark.streaming.ingest`.

Scale shape: state per group is one ``m``-byte binary row (1 KiB at the
default p=10 — a million groups is a gigabyte of state store, flat in
stream length); the per-batch cost is one Arrow-batched pass over the
batch's rows grouped by key.  The update loop is per-row Python (md5 of
the value string — the cross-engine convention; there is no vectorized
md5), which is the honest cost of replayability here: the batch operator
stays all-JVM, the streaming monitor pays Python only on the incremental
batch, never the history.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgist_spark.operators.sketch import HLL_P, _consts, estimate_from_registers


def update_registers(regs, values, p: int = HLL_P) -> None:
    """In-place register update — one md5-derived (index, rho) max per
    value, the same bit layout as the batch operator's SQL expressions."""
    m, maxrho, _ = _consts(p)
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        j, w = h % m, h >> p
        rho = maxrho - (w.bit_length() if w else 0)
        if rho > regs[j]:
            regs[j] = rho


def stateful_hll_stream(events_stream: DataFrame,
                        group_col: str = "event_type",
                        value_col: str = "user_id",
                        p: int = HLL_P) -> DataFrame:
    """Running distinct-count estimates per group: each micro-batch that
    touches a group emits ``(<group_col>, n_values_seen, n_registers_hit,
    n_distinct_hll)`` with the estimate over EVERYTHING the stream has seen
    for that group so far.  ``n_values_seen`` is the cumulative (non-null)
    row count — strictly increasing per touched group, so the row with the
    per-group max is always the latest snapshot in an append sink."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    m, _, _ = _consts(p)

    keyed = events_stream.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("string").alias("v"),
    ).where(F.col("v").isNotNull())

    def upd(key, pdfs, state: GroupState):
        if state.exists:
            blob, n = state.get
            regs = np.frombuffer(blob, dtype=np.uint8).copy()
        else:
            regs, n = np.zeros(m, dtype=np.uint8), 0
        for pdf in pdfs:
            update_registers(regs, pdf["v"], p)
            n += len(pdf)
        state.update((regs.tobytes(), n))
        return iter([pd.DataFrame({
            "g": [key[0]],
            "n_values_seen": [n],
            "n_registers_hit": [int((regs > 0).sum())],
            "n_distinct_hll": [estimate_from_registers(regs, p)],
        })])

    out = keyed.groupBy("g").applyInPandasWithState(
        upd,
        outputStructType=("g string, n_values_seen long,"
                          " n_registers_hit long, n_distinct_hll long"),
        stateStructType="regs binary, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.withColumnRenamed("g", group_col)


def run_incremental_hll(spark, input_glob: str, out_dir: str,
                        checkpoint_dir: str,
                        group_col: str = "event_type",
                        value_col: str = "user_id",
                        schema_ddl: str = ("event_id long, ts timestamp,"
                                           " user_id long, event_type string,"
                                           " value double, props string"),
                        p: int = HLL_P) -> None:
    """AvailableNow driver: fold all new event files into the register
    state, appending one snapshot row per touched group per batch.
    Re-running after more files land resumes from the checkpointed
    registers — the estimate keeps counting where it left off."""
    events = spark.readStream.schema(schema_ddl).parquet(input_glob)
    q = (
        stateful_hll_stream(events, group_col, value_col, p)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
