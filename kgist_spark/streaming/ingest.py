"""Structured-Streaming ingestion of web pages into the KG.

The reference engine is strictly batch, and the pipeline's resumability
contract is batch-checkpoint based (the stage-3 manifest).  This module adds
the *incremental arrival* path on top: new page files landing in a directory
are picked up by a file-source stream, run through the exact same stage-1
extraction transformations (mapInPandas works unchanged on streaming
DataFrames), and appended to the raw-triples area exactly once — the stream
checkpoint gives at-least-once file processing and the per-batch parquet
append keeps outputs partitioned by ingest batch for downstream
reprocessing.  ``Trigger.AvailableNow`` makes the same code run as an
incremental batch job (process everything new, then stop), which is the
deployment mode the KG-construction pipeline uses between full rebuilds.

A watermarked windowed aggregation over the events shape is included as the
engine's streaming-aggregation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def run_incremental_extraction(spark: SparkSession, input_dir: str, out_dir: str,
                               checkpoint_dir: str) -> int:
    """Process all new page files once (AvailableNow) and append extracted
    triples to ``out_dir``; returns the number of micro-batches run."""
    from kgist_spark.pipeline.extract import extract_triples

    pages = stream_pages(spark, input_dir)
    triples = extract_triples(pages)
    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int):
        (
            batch_df.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )
        n_batches["n"] += 1

    q = (
        triples.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def windowed_event_counts(events_stream: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type (late rows beyond
    the watermark are dropped; state is bounded)."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → TZ for event time
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "avg_value")
    )
