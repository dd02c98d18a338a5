"""Streaming anomaly scoring: score triples against a FITTED model on
ingest.

The batch scorer (`operators/anomaly.py`) decides an edge's score from
(a) whether the edge matches a rule pattern — a function of the edge's own
endpoints' labels and predicate against the model's O(|rules|) atom tables
— and (b) per-(node, pred) blame costs, another static model table.
Coverage is therefore PER-EDGE DECIDABLE (no cross-edge state; see
``covered_triples_for_model``'s pattern-join construction, reference
``anomaly_detector.py:40-83`` for the score semantics), so scoring a stream
micro-batch by micro-batch is EXACTLY the batch scoring of the union — the
equivalence a test pins, not an approximation.

Shape: the model side tables (node labels, blame, and — for nested models
only — the driver-resident covered set) are computed ONCE outside the
stream and reused across batches; each micro-batch runs the same
pattern-join against its own (small) edge set.  Output lands in
``batch=<id>`` partitions via dynamic overwrite, so a replayed batch (sink
failure after write, retry before checkpoint commit) overwrites itself —
the same exactly-once discipline as ``streaming/construct.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgist_spark.operators.anomaly import (
    _assemble_scores,
    _covered_from_driver_model,
    blame_table,
    covered_triples_for_model,
    node_labels_df,
)
from kgist_spark.oracle.anomaly import AnomalyScorer

TRIPLES_SCHEMA = "subj string, pred string, obj string"


class StreamScorer:
    """Holds the once-computed model side tables and scores one batch of
    (subj, pred, obj) rows at a time."""

    def __init__(self, spark: SparkSession, model):
        self.spark = spark
        self.model = model
        self.unexplained = AnomalyScorer(model).unexplained_edge_bits()
        self.labels_flat = node_labels_df(spark, model).persist()
        self.blame = blame_table(spark, model, self.labels_flat).persist()
        # nested (depth >= 2) models aren't pattern-decomposable: fall back
        # to the driver-resident covered set ONCE (the probe runs the
        # model-structure loop only — the empty frame is never scanned)
        probe = covered_triples_for_model(
            spark, model,
            spark.createDataFrame([], TRIPLES_SCHEMA), self.labels_flat,
        )
        self.covered_static = (
            _covered_from_driver_model(spark, model).persist()
            if probe is None else None
        )

    def score_batch(self, batch: DataFrame) -> DataFrame:
        covered = self.covered_static
        if covered is None:
            covered = covered_triples_for_model(
                self.spark, self.model, batch, self.labels_flat
            )
        return _assemble_scores(
            batch.select("subj", "pred", "obj"),
            covered, self.blame, self.unexplained,
        )

    def close(self):
        self.labels_flat.unpersist()
        self.blame.unpersist()
        if self.covered_static is not None:
            self.covered_static.unpersist()


def run_streaming_score(
    spark: SparkSession,
    model,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> int:
    """Score all NEW triple files once (AvailableNow) and stop; returns the
    number of micro-batches processed.  Scored rows land under
    ``out_dir/batch=<id>`` (dynamic overwrite ⇒ replay-safe); read the
    result back with ``spark.read.parquet(out_dir)``."""
    scorer = StreamScorer(spark, model)
    n_batches = [0]

    def sink(batch_df: DataFrame, batch_id: int):
        (
            scorer.score_batch(batch_df)
            .withColumn("batch", F.lit(int(batch_id)))
            .write.partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(out_dir)
        )
        n_batches[0] += 1

    reader = spark.readStream.schema(TRIPLES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        scorer.close()
    return n_batches[0]
