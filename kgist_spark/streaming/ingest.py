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


def stateful_dedup_stream(docs_stream: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Cross-batch EXACT dedup as a custom stateful streaming operator
    (``applyInPandasWithState``): the first document carrying each md5
    fingerprint — across ALL micro-batches and across restarts, via the
    checkpointed state store — is emitted as ``(text_md5, keep_id)``; every
    later duplicate is dropped.

    State per group is one flag row keyed by the fingerprint, so the state
    store grows with #distinct documents (the same cardinality the batch
    dedup's shuffle carries) and is partitioned by the fingerprint hash —
    no skew beyond genuine duplicate mass.  ``NoTimeout`` keeps fingerprints
    forever, which is the dedup contract; swap in a processing-time timeout
    for a sliding-horizon variant."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = docs_stream.select(
        F.md5(F.col(text_col)).alias("text_md5"),
        F.col(id_col).cast("long").alias("_id"),
    )

    def dedup(key, pdfs, state: GroupState):
        if state.exists:
            return iter(())
        best = None
        for pdf in pdfs:
            m = pdf["_id"].min()
            best = m if best is None else min(best, m)
        state.update((1,))
        return iter([pd.DataFrame({"text_md5": [key[0]], "keep_id": [best]})])

    return keyed.groupBy("text_md5").applyInPandasWithState(
        dedup,
        outputStructType="text_md5 string, keep_id long",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_incremental_dedup(spark: SparkSession, input_dir: str, out_dir: str,
                          checkpoint_dir: str) -> None:
    """AvailableNow driver for :func:`stateful_dedup_stream`: process all new
    page files once, appending newly-first-seen fingerprints to ``out_dir``.
    Re-running after more files land emits ONLY fingerprints never seen in
    any previous run (state restored from the checkpoint)."""
    docs = stream_pages(spark, input_dir).select(
        F.abs(F.hash("url")).cast("long").alias("doc_id"), "text"
    )
    deduped = stateful_dedup_stream(docs)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


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


def stateful_domain_cap_stream(docs_stream: DataFrame, domain_col: str = "domain",
                               id_col: str = "doc_id", cap: int = 100) -> DataFrame:
    """Cross-batch per-domain ADMISSION QUOTA as a custom stateful streaming
    operator: at most ``cap`` documents per domain are ever admitted across
    ALL micro-batches (and across restarts — the counter lives in the
    checkpointed state store).  Output: ``(domain, doc_id, admit_idx)`` with
    ``admit_idx`` the 1-based per-domain admission number.

    Contract note: this is the STREAMING quota semantics (first-come in
    batch order, deterministic WITHIN a batch by ascending id — micro-batch
    row order is undefined, so the id sort makes replays reproducible), not
    the batch :func:`kgist_spark.operators.sampling.domain_cap` md5-ranking
    semantics: a stream cannot retroactively displace an admitted document
    when a better-ranked one arrives later.  Use the batch operator for
    rebuilds; use this to bound ingest volume per domain as data lands.

    State per domain is ONE counter row, so the state store is
    O(#domains) — bounded regardless of corpus size, partitioned by the
    domain hash (a hot domain stops costing anything once its quota
    fills: its rows are dropped map-side in the stateful stage)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = docs_stream.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).cast("long").alias("_id"),
    )

    def admit(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        if n >= cap:
            return iter(())
        ids = pd.concat([pdf["_id"] for pdf in pdfs]).sort_values()
        take = ids.iloc[: max(0, cap - n)]
        if take.empty:
            return iter(())
        state.update((n + len(take),))
        return iter([pd.DataFrame({
            "domain": key[0],
            "doc_id": take.to_numpy(),
            "admit_idx": range(n + 1, n + len(take) + 1),
        })])

    return keyed.groupBy("domain").applyInPandasWithState(
        admit,
        outputStructType="domain string, doc_id long, admit_idx long",
        stateStructType="n_admitted long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_incremental_domain_cap(spark: SparkSession, input_dir: str, out_dir: str,
                               checkpoint_dir: str, cap: int = 100) -> None:
    """AvailableNow driver for :func:`stateful_domain_cap_stream`: process
    all new page files once, appending newly-admitted (url-hash doc id,
    domain) rows to ``out_dir``.  Re-running after more files land admits
    only into remaining per-domain quota (state restored from the
    checkpoint)."""
    docs = stream_pages(spark, input_dir).select(
        F.abs(F.hash("url")).cast("long").alias("doc_id"),
        F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("domain"),
    )
    admitted = stateful_domain_cap_stream(docs, "domain", "doc_id", cap=cap)
    q = (
        admitted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
