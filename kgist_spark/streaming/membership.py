"""Streaming bounded-state approximate dedup: cross-batch Bloom membership.

The streaming twin of :func:`kgist_spark.operators.sketch.bloom_build` /
``bloom_maybe_contains`` — and the bounded-state alternative to
:func:`kgist_spark.streaming.ingest.stateful_dedup_stream`, whose exact
fingerprint state grows with #distinct documents.  Here the state is a
FIXED bitmap per shard (``n_shards × m`` bits total, ~256 KiB at the
defaults) no matter how many documents the stream has admitted: a document
whose fingerprint bits are all already set is rejected as a duplicate;
otherwise its bits are set and it is admitted.  The Bloom direction of
error is the SAFE one for ingest dedup — a duplicate is never admitted;
a novel document is rejected only on a (deterministic, rate-bounded)
false positive, the classic capacity-for-exactness trade a 10^12-document
ingest has to make somewhere.

Sharding: each fingerprint maps to one shard (its md5 mod ``n_shards``),
and membership is tested entirely within that shard's bitmap, so the
grouped stateful operator sees a complete, self-contained filter per key
— admitting in parallel across shards is exact sharding, not approximation
stacked on approximation.  Within a micro-batch each shard processes its
rows in ``doc_id`` order, so the admitted set is deterministic for a given
batch sequence (pinned by the restart test).

The per-row update is Python md5 — the honest replayability cost, paid
only on the incremental batch (same trade as
:mod:`kgist_spark.streaming.frequency` /
:mod:`kgist_spark.streaming.cardinality`).  The bit positions are the
SAME ``bloom{r}:{value}`` seeded convention as the batch operator, so a
batch-built filter and a stream-built filter over the same values are
bit-identical (pinned by test).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgist_spark.operators.sketch import BLOOM_K, BLOOM_M

#: default shard count — total state = n_shards * m bits
BLOOM_SHARDS = 8


def bloom_positions(value: str, m: int = BLOOM_M,
                    k: int = BLOOM_K) -> list[int]:
    """The k seeded bit positions of a value — byte-for-byte the batch
    operator's ``md5('bloom{r}:' || value)`` convention."""
    return [
        int(hashlib.md5(f"bloom{r}:{value}".encode()).hexdigest()[:15], 16)
        % m
        for r in range(k)
    ]


def bloom_admit(buf: bytearray, value: str, m: int = BLOOM_M,
                k: int = BLOOM_K) -> bool:
    """Test-and-set: True (admitted) iff at least one of the value's bits
    was unset; sets all k bits either way."""
    pos = bloom_positions(value, m, k)
    seen = all(buf[p >> 3] & (1 << (p & 7)) for p in pos)
    for p in pos:
        buf[p >> 3] |= 1 << (p & 7)
    return not seen


def stateful_bloom_dedup_stream(docs_stream: DataFrame,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                n_shards: int = BLOOM_SHARDS,
                                m: int = BLOOM_M,
                                k: int = BLOOM_K) -> DataFrame:
    """Cross-batch approximate dedup with FIXED state: emits every row as
    ``(doc_id, text_md5, admitted)`` — ``admitted`` false for any document
    whose fingerprint bits were already all set (a true duplicate, or a
    bounded-rate false positive; never the reverse error).  State per
    shard is one ``m``-bit blob, restored from the checkpoint across
    restarts."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = docs_stream.select(
        F.md5(F.col(text_col)).alias("text_md5"),
        F.col(id_col).cast("long").alias("_id"),
    ).withColumn(
        "shard",
        F.expr(f"pmod(cast(conv(substring(text_md5, 1, 15), 16, 10)"
               f" as bigint), {n_shards})"),
    )

    def upd(key, pdfs, state: GroupState):
        if state.exists:
            buf = bytearray(state.get[0])
        else:
            buf = bytearray(m // 8)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("_id", kind="mergesort").reset_index(drop=True)
        admitted = [bloom_admit(buf, fp, m, k) for fp in pdf["text_md5"]]
        state.update((bytes(buf),))
        return iter([pd.DataFrame({
            "doc_id": pdf["_id"],
            "text_md5": pdf["text_md5"],
            "admitted": admitted,
        })])

    return keyed.groupBy("shard").applyInPandasWithState(
        upd,
        outputStructType="doc_id long, text_md5 string, admitted boolean",
        stateStructType="words binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_incremental_bloom_dedup(spark: SparkSession, input_glob: str,
                                out_dir: str, checkpoint_dir: str,
                                schema_ddl: str = "doc_id long, text string",
                                n_shards: int = BLOOM_SHARDS,
                                m: int = BLOOM_M,
                                k: int = BLOOM_K) -> None:
    """AvailableNow driver: fold all new document files through the
    sharded Bloom state, appending per-row admission verdicts.
    Re-running after more files land resumes from the checkpointed
    bitmaps — documents seen in ANY earlier run stay rejected."""
    docs = spark.readStream.schema(schema_ddl).parquet(input_glob)
    q = (
        stateful_bloom_dedup_stream(docs, n_shards=n_shards, m=m, k=k)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
