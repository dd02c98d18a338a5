"""Streaming transition counting: cross-batch first-order Markov pairs.

The streaming twin of
:func:`kgist_spark.operators.timeseries.event_transitions` — the
next-event prior maintained INCREMENTALLY as the event log lands, instead
of recomputed over the full history per refresh.  State per user is ONE
row (the type of their latest event), so state size is O(#users) and
never grows with history; each micro-batch pays one Arrow-batched pass
over its own rows only.

Batch ≡ stream contract: the emitted ``(user, from_type, to_type,
n_inc)`` increments, summed over the whole output log, equal the batch
operator's pair counts over the union of all micro-batches — pinned by
test, including across a restart — PROVIDED batches respect per-user
time order (each new file holds events at-or-after the user's stored
last event: the natural shape of an append-only event log).  A late
event that lands behind a user's stored tail would pair against the
wrong neighbor — same ordered-arrival assumption every cross-batch
sessionizer in this package makes (`streaming/ingest.py`), documented
rather than hidden.

The boundary pair (stored last type -> first type of the new batch) is
exactly what a stateless per-batch recount would MISS; the state row
exists to emit it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stateful_transitions_stream(events_stream: DataFrame,
                                user_col: str = "user_id",
                                type_col: str = "event_type",
                                ts_col: str = "ts",
                                id_col: str = "event_id") -> DataFrame:
    """Per-batch transition-count increments per user —
    ``(<user_col>, from_type, to_type, n_inc)``.  Rows within a batch are
    ordered by ``(ts, event_id)`` (the batch operator's deterministic
    tie-break); the user's stored last type, if any, pairs with the
    batch's first event.  Users whose batch adds no pair (a single first
    event) emit nothing but still update state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = events_stream.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(user_col).cast("long").alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(type_col).alias("t"),
    )

    def upd(key, pdfs, state: GroupState):
        parts = [pdf for pdf in pdfs]
        pdf = pd.concat(parts, ignore_index=True)
        # mergesort = stable; (ts, eid) is unique by event-id uniqueness,
        # so the order is deterministic regardless of arrival interleaving
        pdf = pdf.sort_values(["ts", "eid"], kind="mergesort")
        types = list(pdf["t"])
        chain = ([state.get[0]] if state.exists else []) + types
        if types:
            state.update((types[-1],))
        counts: dict = {}
        for a, b in zip(chain, chain[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            return iter([])
        ks = sorted(counts)
        return iter([pd.DataFrame({
            "u": [key[0]] * len(ks),
            "from_type": [a for a, _ in ks],
            "to_type": [b for _, b in ks],
            "n_inc": [counts[k] for k in ks],
        })])

    out = keyed.groupBy("u").applyInPandasWithState(
        upd,
        outputStructType="u long, from_type string, to_type string, n_inc long",
        stateStructType="last_type string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.withColumnRenamed("u", user_col)


def run_incremental_transitions(spark, input_glob: str, out_dir: str,
                                checkpoint_dir: str,
                                schema_ddl: str = ("event_id long,"
                                                   " ts timestamp,"
                                                   " user_id long,"
                                                   " event_type string,"
                                                   " value double,"
                                                   " props string")) -> None:
    """AvailableNow driver: fold all new event files into per-user last
    -event state, appending the batch's pair-count increments.  The full
    transition matrix at any point is ONE aggregation over the output
    log (sum n_inc per (from_type, to_type)); re-running after more
    files land resumes from the checkpointed state."""
    events = spark.readStream.schema(schema_ddl).parquet(input_glob)
    q = (
        stateful_transitions_stream(events)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
