"""Streaming frequency monitoring: cross-batch count-min sketch.

The streaming twin of :func:`kgist_spark.operators.sketch.cms_build` /
``cms_probe`` — "how often has this stream seen each watched key so far,
per group" with state that never grows past ``d × w`` int64 counters per
group.  Exact streaming counts for a watchlist need one state row per
watched key per group (fine for small lists, unbounded if the watchlist
is the value domain); the CMS keeps ONE fixed-size counter block per
group and answers point queries for ANY key after the fact, watched or
not — the probe list here only chooses which estimates get emitted.

Counter merge is addition, which is exactly right for the micro-batch
contract: the checkpointed commit log applies each batch once, and a
restarted ``availableNow`` run resumes from the stored counters (pinned
by the restart test).  The per-value update is the same seeded-md5
(row, cell) arithmetic as the batch operator, and estimates go through
the shared pure-Python :func:`estimate` so batch, stream, and oracle can
never drift.

Scale shape: state per group is ``d·w`` int64 (32 KiB at d=4/w=1024);
the per-batch cost is one Arrow-batched pass over the batch's rows.  The
update loop is per-row Python md5 — the honest replayability cost, paid
only on the incremental batch, never the history (same trade as
:mod:`kgist_spark.streaming.cardinality`).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgist_spark.operators.sketch import CMS_D, CMS_W


def _cell(r: int, v: str, w: int) -> int:
    """Row-``r`` counter index — same seeded md5 → 60-bit int → mod ``w``
    as :func:`kgist_spark.operators.sketch._cms_cell`."""
    h = int(hashlib.md5(f"{r}:{v}".encode()).hexdigest()[:15], 16)
    return h % w


def update_counters(cnt, values, d: int = CMS_D, w: int = CMS_W) -> None:
    """In-place (d, w) counter update, one increment per row per value."""
    for v in values:
        s = str(v)
        for r in range(d):
            cnt[r, _cell(r, s, w)] += 1


def estimate(cnt, value, d: int = CMS_D, w: int = CMS_W) -> int:
    """CMS point estimate: min over the d counters the value hashes to."""
    s = str(value)
    return int(min(cnt[r, _cell(r, s, w)] for r in range(d)))


def stateful_cms_stream(events_stream: DataFrame, probes: list,
                        group_col: str = "event_type",
                        value_col: str = "user_id",
                        d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Running frequency estimates per group for a fixed watchlist: each
    micro-batch that touches a group emits one row per probe key —
    ``(<group_col>, probe, n_rows_seen, n_cms)`` — where ``n_cms``
    estimates the value's total occurrences in EVERYTHING the stream has
    seen for that group.  ``n_rows_seen`` is the cumulative row count, so
    the per-(group, probe) max row is always the latest snapshot in an
    append sink."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    probe_strs = [str(p) for p in probes]

    keyed = events_stream.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("string").alias("v"),
    ).where(F.col("v").isNotNull())

    def upd(key, pdfs, state: GroupState):
        if state.exists:
            blob, n = state.get
            cnt = np.frombuffer(blob, dtype=np.int64).reshape(d, w).copy()
        else:
            cnt, n = np.zeros((d, w), dtype=np.int64), 0
        for pdf in pdfs:
            update_counters(cnt, pdf["v"], d, w)
            n += len(pdf)
        state.update((cnt.tobytes(), n))
        return iter([pd.DataFrame({
            "g": [key[0]] * len(probe_strs),
            "probe": probe_strs,
            "n_rows_seen": [n] * len(probe_strs),
            "n_cms": [estimate(cnt, p, d, w) for p in probe_strs],
        })])

    out = keyed.groupBy("g").applyInPandasWithState(
        upd,
        outputStructType=("g string, probe string, n_rows_seen long,"
                          " n_cms long"),
        stateStructType="cnt binary, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.withColumnRenamed("g", group_col)


def run_incremental_cms(spark, input_glob: str, out_dir: str,
                        checkpoint_dir: str, probes: list,
                        group_col: str = "event_type",
                        value_col: str = "user_id",
                        schema_ddl: str = ("event_id long, ts timestamp,"
                                           " user_id long, event_type string,"
                                           " value double, props string"),
                        d: int = CMS_D, w: int = CMS_W) -> None:
    """AvailableNow driver: fold all new event files into the counter
    state, appending one snapshot row per (touched group, probe) per
    batch.  Re-running after more files land resumes from the
    checkpointed counters."""
    events = spark.readStream.schema(schema_ddl).parquet(input_glob)
    q = (
        stateful_cms_stream(events, probes, group_col, value_col, d, w)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
