"""Streaming crawl-frontier admission: cross-batch canonical-URL dedup.

The streaming twin of
:func:`kgist_spark.operators.url.url_frontier_dedup` — the admission
decision a crawler actually makes ON INGEST ("have I already queued this
page under any URL spelling?") instead of as a batch backfill: each
incoming URL canonicalizes through the SAME
:func:`~kgist_spark.operators.url.canonical_url_expr` projection the
batch operator uses (imported, not copied — the two can never drift),
then a first-seen keeper per canonical URL runs as a stateful streaming
operator, state = one flag row per distinct canonical URL across all
batches and restarts.

Batch ≡ stream contract: the admitted ``(canon_url, keep_id)`` set
equals the batch decision table's keepers over the union of all
micro-batches when batches arrive in ascending id order (the batch
keeper is min-id; first-seen == min-id exactly then — the
ordered-arrival assumption every cross-batch keeper in this package
documents, `streaming/transitions.py`).  Within one batch the min id
wins regardless of row order, so intra-batch ordering never matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgist_spark.operators.url import canonical_url_expr


def stateful_frontier_stream(pages_stream: DataFrame,
                             url_col: str = "url",
                             id_col: str = "doc_id") -> DataFrame:
    """First-seen admission per canonical URL — emits
    ``(canon_url, keep_id)`` for every canonical URL the FIRST time any
    spelling of it appears; all later variants (same batch or later
    batches) are dropped.  State per canonical URL is one flag row."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = pages_stream.select(
        canonical_url_expr(url_col).alias("canon_url"),
        F.col(id_col).cast("long").alias("_id"),
    )

    def admit(key, pdfs, state: GroupState):
        if state.exists:
            return iter(())
        best = None
        for pdf in pdfs:
            m = pdf["_id"].min()
            best = m if best is None else min(best, m)
        state.update((1,))
        return iter([pd.DataFrame({"canon_url": [key[0]],
                                   "keep_id": [best]})])

    return keyed.groupBy("canon_url").applyInPandasWithState(
        admit,
        outputStructType="canon_url string, keep_id long",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_incremental_frontier(spark, input_glob: str, out_dir: str,
                             checkpoint_dir: str,
                             schema_ddl: str = "doc_id long, url string"
                             ) -> None:
    """AvailableNow driver: admit all new page files' never-seen canonical
    URLs, appending ``(canon_url, keep_id)``; re-running after more files
    land admits ONLY URLs no earlier run has seen (checkpointed state)."""
    pages = spark.readStream.schema(schema_ddl).parquet(input_glob)
    q = (
        stateful_frontier_stream(pages)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
