"""Streaming gap sessionization: cross-batch open-session state.

The streaming twin of
:func:`kgist_spark.operators.timeseries.sessionize` — sessions close ON
INGEST when a gap is observed, instead of a batch backfill re-windowing
the full history.  State per user is ONE open-session row (seq, start,
last ts, count, value sum) — O(#users) forever; each batch folds only
its own rows.

Emission contract: a session row is emitted when its CLOSE is observed
(the next event arrives more than ``gap_minutes`` later — same
STRICT-gap rule as the batch operator, same millisecond-rounded
threshold imported from the same arithmetic).  The still-open tail
session per user lives in state and is NOT yet emitted — exactly the
semantics a monitoring consumer wants (a session isn't over until the
user stops).  Batch ≡ stream: emitted sessions equal the batch
operator's rows for every session the batch view also considers closed;
the equality test closes all sessions with a far-future flush event per
user and pins the FULL table equal (minus the flush singletons),
including across a restart — the ordered-arrival assumption of every
cross-batch keeper in this package (`streaming/transitions.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stateful_sessions_stream(events_stream: DataFrame,
                             user_col: str = "user_id",
                             ts_col: str = "ts",
                             value_col: str = "value",
                             tie_col: str = "event_id",
                             gap_minutes: float = 30.0) -> DataFrame:
    """Emit CLOSED sessions — ``(<user_col>, session_seq, n_events,
    start_ts, end_ts, sum_value)``, schema-identical to the batch
    operator.  ``session_seq`` numbers a user's sessions 1-based across
    the whole stream (the open session's seq is reserved in state)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = round(gap_minutes * 60_000)

    keyed = events_stream.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).cast("long").alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(tie_col).cast("long").alias("eid"),
        F.col(value_col).cast("double").alias("v"),
    )

    def upd(key, pdfs, state: GroupState):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "eid"], kind="mergesort")
        if state.exists:
            seq, start_us, last_us, n, sv = state.get
        else:
            seq, start_us, last_us, n, sv = 0, None, None, 0, 0.0
        closed = []
        for ts, v in zip(pdf["ts"], pdf["v"]):
            us = int(ts.value // 1_000)  # pandas ns -> µs
            if last_us is None:
                seq, start_us, n, sv = seq + 1, us, 1, float(v or 0.0)
            elif us - last_us > gap_ms * 1_000:  # STRICT gap, µs
                closed.append((seq, n, start_us, last_us, sv))
                seq, start_us, n, sv = seq + 1, us, 1, float(v or 0.0)
            else:
                n, sv = n + 1, sv + float(v or 0.0)
            last_us = us
        state.update((seq, start_us, last_us, n, sv))
        if not closed:
            return iter([])
        return iter([pd.DataFrame({
            "u": [key[0]] * len(closed),
            "session_seq": [c[0] for c in closed],
            "n_events": [c[1] for c in closed],
            "start_ts": [pd.Timestamp(c[2], unit="us") for c in closed],
            "end_ts": [pd.Timestamp(c[3], unit="us") for c in closed],
            "sum_value": [round(c[4], 5) for c in closed],
        })])

    out = keyed.groupBy("u").applyInPandasWithState(
        upd,
        outputStructType=("u long, session_seq long, n_events long,"
                          " start_ts timestamp, end_ts timestamp,"
                          " sum_value double"),
        stateStructType=("seq long, start_us long, last_us long, n long,"
                         " sv double"),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.withColumnRenamed("u", user_col)


def run_incremental_sessions(spark, input_glob: str, out_dir: str,
                             checkpoint_dir: str,
                             gap_minutes: float = 30.0,
                             schema_ddl: str = ("event_id long,"
                                                " ts timestamp,"
                                                " user_id long,"
                                                " event_type string,"
                                                " value double,"
                                                " props string")) -> None:
    """AvailableNow driver: fold new event files into open-session state,
    appending sessions as their closes are observed; re-running resumes
    from the checkpointed open sessions."""
    events = spark.readStream.schema(schema_ddl).parquet(input_glob)
    q = (
        stateful_sessions_stream(events, gap_minutes=gap_minutes)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
