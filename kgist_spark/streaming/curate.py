"""Streaming curate ADMISSION: the batch curation gates applied at ingest
time, with keep/drop lineage per document.

The batch decision table (:func:`kgist_spark.operators.curate.curate_table`)
runs six gates; four of them (lang, too_short, low_diversity, repetitive)
are pure per-row functions and one (exact_dup) is a first-seen set — the
exact shape ``applyInPandasWithState`` models: state is ONE ``keep_id``
row per fingerprint, restored across restarts from the checkpointed state
store.  The near_dup gate is deliberately ABSENT here: LSH pair closure is
retrospective (a later document can merge two existing clusters), so its
streaming form would have to re-emit revised decisions for already-ingested
documents — that is a rebuild, and the batch table owns it.  The module
contract mirrors :func:`kgist_spark.streaming.ingest.stateful_domain_cap_stream`'s:
use THIS to gate volume as data lands, the batch operator for rebuilds.

Shared code, not parallel code: the feature projection
(``operators.curate.row_features``) and the first-failing-gate CASE chain
(``operators.curate.reason_expr``) are imported from the batch module, so
the two surfaces replay the SAME expressions — a pinned equality test
(``tests/test_streaming_curate.py``) runs a multi-batch stream and the
batch table over the same corpus and requires row-identical decisions on
every shared column.

Exact-dup keeper semantics (the one documented divergence): the stream
keeps the FIRST-SEEN document per fingerprint (deterministic within a
micro-batch by ascending id — micro-batch row order is undefined, so the
id sort makes replays reproducible), while the batch table keeps the
global min id; a stream cannot retroactively displace an admitted
document.  When ids arrive in ascending batch order the two coincide,
which is what the equality test pins.

Scale shape: the stateless gates are one codegen projection per
micro-batch; the stateful stage shuffles each batch once on ``text_md5``
(uniform — the only key concentration is identical texts, the group being
measured) and holds O(#distinct fingerprints) state rows, the same
cardinality the batch dedup's shuffle carries.  Quota composition: domain
caps run as a SEPARATE downstream stream over the admitted output
(``stateful_domain_cap_stream``) — chaining two arbitrary-stateful
operators in one query is restricted by Structured Streaming, and the
two-query composition keeps each state store independently checkpointed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgist_spark.operators.curate import reason_expr, row_features

DOCS_DDL = "doc_id long, lang string, text string"

#: the gates the streaming surface applies, in batch order (near_dup is
#: batch-only — see module docstring)
STREAM_GATES = ("lang", "too_short", "low_diversity", "repetitive",
                "exact_dup")

_FLAGGED_DDL = ("doc_id long, lang string, n_tokens int, "
                "unique_ratio double, dup_bigram_frac double, "
                "text_md5 string, is_exact_dup boolean")


def curate_admission_stream(docs_stream: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            lang_col: str = "lang") -> DataFrame:
    """``(doc_id, lang, n_tokens, unique_ratio, dup_bigram_frac,
    is_exact_dup, keep, drop_reason)`` per arriving document — the batch
    decision-table columns minus the batch-only near_dup flag.

    Every document flows through (flags, not filters), matching the batch
    table: a wrong-lang duplicate still claims its fingerprint's keeper
    slot race and still carries ``drop_reason = 'lang'`` (first failing
    gate wins)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    feats = row_features(
        docs_stream.select(F.col(id_col).alias("doc_id"),
                           F.col(lang_col).alias("lang"),
                           F.col(text_col).alias("text"))
    )

    def gate(key, pdfs, state: GroupState):
        pdf = pd.concat(list(pdfs)).sort_values("doc_id")
        if state.exists:
            keep_id = state.get[0]
        else:
            keep_id = int(pdf["doc_id"].iloc[0])
            state.update((keep_id,))
        pdf["is_exact_dup"] = pdf["doc_id"] != keep_id
        return iter([pdf])

    flagged = feats.groupBy("text_md5").applyInPandasWithState(
        gate,
        outputStructType=_FLAGGED_DDL,
        stateStructType="keep_id long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    reason = reason_expr(STREAM_GATES)
    return flagged.select(
        "doc_id", "lang", "n_tokens", "unique_ratio", "dup_bigram_frac",
        "is_exact_dup",
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )


def run_incremental_curate(spark: SparkSession, input_dir: str, out_dir: str,
                           checkpoint_dir: str) -> None:
    """AvailableNow driver: admit all NEW document files once, appending
    decision rows to ``out_dir``.  Re-running after more files land
    processes only the new files, with the fingerprint keeper state
    restored from the checkpoint — a duplicate of a document admitted in
    ANY earlier run is flagged ``exact_dup``."""
    docs = spark.readStream.schema(DOCS_DDL).parquet(input_dir)
    decisions = curate_admission_stream(docs)
    q = (
        decisions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
