"""Streaming schema-profile monitoring: cross-batch predicate type
profiles.

The streaming twin of
:func:`kgist_spark.operators.graph.predicate_schema` — the
ontology-induction report maintained INCREMENTALLY as extracted triples
land, so schema drift (the kg_schema_drift alarm) is visible per batch
instead of per backfill.  State per ``(pred, side)`` is the label→count
map — VOCABULARY-sized (≤ |labels| entries however many triples
stream through), the same bound the batch rollup enjoys.

The label join happens BEFORE the stateful operator (a stream-static
equi-join against the label table — Structured Streaming's supported
shape), so the state update is pure counting; every derived number
(dominance, share, entropy) recomputes per snapshot from the counts
through :func:`profile_from_counts`, which replays the batch plan's
arithmetic EXACTLY — truncating integer share and the fixed-point
entropy term with Spark's HALF_UP rounding (``floor(x + 0.5)`` on the
positive terms, the `streaming/percentiles.py` precedent) — so the
latest snapshot per (pred, side) equals the batch profile over the
union, pinned by test including across a restart.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_from_counts(labels: list, counts: list) -> tuple:
    """``(n_pairs, n_types, top_label, top_share_x1e6, entropy_x1e6)``
    from a label→count multiset — the batch plan's arithmetic replayed:
    dominance ties to the lexicographically smallest label, share is a
    truncating div, entropy terms are HALF_UP-rounded fixed-point ints
    summed exactly."""
    n = sum(counts)
    n_types = len(counts)
    top_label, top_c = min(
        ((lab, c) for lab, c in zip(labels, counts)),
        key=lambda t: (-t[1], t[0]),
    )
    entropy = 0
    for c in counts:
        term = 1_000_000 * (c * math.log2(n / c)) / n
        entropy += int(math.floor(term + 0.5))  # Spark round() = HALF_UP
    return n, n_types, top_label, top_c * 1_000_000 // n, entropy


def stateful_schema_stream(triples_stream: DataFrame,
                           labels: DataFrame) -> DataFrame:
    """Running schema profile per (pred, side): each micro-batch that
    touches a slot emits one snapshot row ``(pred, side, n_pairs,
    n_types, top_label, top_share_x1e6, entropy_x1e6)`` over EVERYTHING
    seen so far; the latest row per slot is always the current profile
    (max n_pairs in an append sink).  ``labels`` is a STATIC DataFrame
    (the canonical label table) joined stream-static before the state
    update."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    pairs = (
        triples_stream.select(
            "pred",
            F.explode(
                F.array(
                    F.struct(F.lit("s").alias("side"),
                             F.col("subj").alias("node")),
                    F.struct(F.lit("o").alias("side"),
                             F.col("obj").alias("node")),
                )
            ).alias("sn"),
        )
        .select("pred", F.col("sn.side").alias("side"),
                F.col("sn.node").alias("node"))
        .join(labels, "node")
        .select("pred", "side", "label")
    )

    def upd(key, pdfs, state: GroupState):
        if state.exists:
            labs, cnts = state.get
            m = dict(zip(labs, cnts))
        else:
            m = {}
        for pdf in pdfs:
            for lab, c in pdf["label"].value_counts().items():
                m[lab] = m.get(lab, 0) + int(c)
        labs = sorted(m)
        state.update((labs, [m[x] for x in labs]))
        n, nt, top, share, ent = profile_from_counts(labs,
                                                     [m[x] for x in labs])
        return iter([pd.DataFrame({
            "pred": [key[0]], "side": [key[1]],
            "n_pairs": [n], "n_types": [nt], "top_label": [top],
            "top_share_x1e6": [share], "entropy_x1e6": [ent],
        })])

    return pairs.groupBy("pred", "side").applyInPandasWithState(
        upd,
        outputStructType=("pred string, side string, n_pairs long,"
                          " n_types long, top_label string,"
                          " top_share_x1e6 long, entropy_x1e6 long"),
        stateStructType="labs array<string>, cnts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_incremental_schema(spark, input_glob: str, labels: DataFrame,
                           out_dir: str, checkpoint_dir: str,
                           schema_ddl: str = ("subj string, pred string,"
                                              " obj string")) -> None:
    """AvailableNow driver: fold all new triple files into the per-slot
    label counts, appending one profile snapshot per touched slot per
    batch; re-running resumes from the checkpointed counts."""
    triples = spark.readStream.schema(schema_ddl).parquet(input_glob)
    q = (
        stateful_schema_stream(triples, labels)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
