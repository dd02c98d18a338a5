"""Streaming percentiles: cross-batch EXACT grouped distribution snapshots.

The streaming twin of
:func:`kgist_spark.operators.sampling.distribution_report` — "what do the
length/score distributions of this ingest stream look like so far, per
stratum" with state bounded by the DISTINCT-VALUE count per group, never
the row count: the state is the same value HISTOGRAM the batch operator
builds as a DataFrame, folded incrementally (histogram merge is counter
addition — commutative and associative, the shape micro-batches want).

Cross-surface equality contract: the snapshot math is the batch operator's
exactly — positions ``floor/ceil(p * (n-1))`` located in the cumulative
histogram, interpolation ``lo + frac * (hi - lo)`` in IEEE doubles — so
the latest emitted snapshot per group equals ``distribution_report`` run
in batch over the union of all micro-batches, row for row (pinned in
``tests/test_streaming_percentiles.py``).  State survives restarts via the
checkpointed state store like every stateful operator in
:mod:`kgist_spark.streaming.ingest`.

Scale shape: state per group is two int64 arrays of DISTINCT-value length
(the batch operator's memory argument verbatim: one row per distinct
value, never a raw-value buffer; true continuous data pre-buckets to fixed
precision first).  The per-batch cost is one vectorized
``value_counts``/merge per touched group — no per-row Python.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: must match the batch operator's default percentile set so the twin's
#: output schema lines up column-for-column
PCTS = (0.25, 0.50, 0.75, 0.95)


def percentiles_from_hist(vals, cnts, pcts=PCTS):
    """The batch interpolation replayed over a (sorted-value, count)
    histogram: for each p, bracket ``r = p * (n - 1)`` in the cumulative
    ranges and interpolate — identical IEEE double ops to the batch plan
    (and DuckDB's quantile_cont)."""
    n = int(sum(cnts))
    cum = []
    run = 0
    for v, c in zip(vals, cnts):
        cum.append((run, run + c - 1, float(v)))  # lo_pos, hi_pos, val
        run += c
    out = []
    for p in pcts:
        r = p * (n - 1)
        k_lo, k_hi = math.floor(r), math.ceil(r)
        frac = r - math.floor(r)
        v_lo = next(v for lo, hi, v in cum if lo <= k_lo <= hi)
        v_hi = next(v for lo, hi, v in cum if lo <= k_hi <= hi)
        x = v_lo + frac * (v_hi - v_lo)
        # the batch plan emits round(x, 5) with Spark's BigDecimal
        # HALF_UP — Decimal(float) is the same exact binary expansion,
        # so the twin rounds identically (Python's round() is banker's)
        out.append(float(Decimal(x).quantize(Decimal("0.00001"),
                                             rounding=ROUND_HALF_UP)))
    return n, out


def stateful_percentiles_stream(stream: DataFrame,
                                strata_col: str = "event_type",
                                value_col: str = "value") -> DataFrame:
    """Running exact percentile snapshots per stratum: each micro-batch
    that touches a stratum emits ``(stratum, n_rows, p25, p50, p75, p95)``
    over EVERYTHING the stream has seen for it so far (NULL values
    excluded, like the batch operator).  ``n_rows`` is strictly increasing
    per touched stratum, so the row with the per-stratum max is always the
    latest snapshot in an append sink."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = stream.select(
        F.col(strata_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
    ).where(F.col("v").isNotNull())

    def upd(key, pdfs, state: GroupState):
        if state.exists:
            vblob, cblob = state.get
            vals = np.frombuffer(vblob, dtype=np.int64)
            cnts = np.frombuffer(cblob, dtype=np.int64)
            hist = dict(zip(vals.tolist(), cnts.tolist()))
        else:
            hist = {}
        for pdf in pdfs:
            for v, c in pdf["v"].value_counts().items():
                hist[int(v)] = hist.get(int(v), 0) + int(c)
        vals = np.array(sorted(hist), dtype=np.int64)
        cnts = np.array([hist[v] for v in vals.tolist()], dtype=np.int64)
        state.update((vals.tobytes(), cnts.tobytes()))
        n, ps = percentiles_from_hist(vals.tolist(), cnts.tolist())
        return iter([pd.DataFrame({
            "g": [key[0]], "n_rows": [n],
            **{f"p{int(p * 100)}": [est] for p, est in zip(PCTS, ps)},
        })])

    out = keyed.groupBy("g").applyInPandasWithState(
        upd,
        outputStructType=("g string, n_rows long, p25 double, p50 double,"
                          " p75 double, p95 double"),
        stateStructType="vals binary, cnts binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.withColumnRenamed("g", "stratum")


def run_incremental_percentiles(spark, input_glob: str, out_dir: str,
                                checkpoint_dir: str,
                                strata_col: str = "event_type",
                                value_col: str = "value",
                                schema_ddl: str = ("event_id long,"
                                                   " ts timestamp,"
                                                   " user_id long,"
                                                   " event_type string,"
                                                   " value double,"
                                                   " props string")) -> None:
    """AvailableNow driver: fold all new event files into the histogram
    state, appending one snapshot row per touched stratum per batch.
    Re-running after more files land resumes from the checkpointed
    histograms."""
    stream = spark.readStream.schema(schema_ddl).parquet(input_glob)
    q = (
        stateful_percentiles_stream(stream, strata_col, value_col)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
