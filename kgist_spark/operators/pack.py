"""Concat-and-chunk packing layout for LLM pretraining.

The layout table behind the standard pretraining data format (GPT-style
"concatenate every document in a fixed order, then cut the token stream
every ``ctx`` tokens"): for each document, where its tokens land —
``(doc_id, n_tokens, tok_start, chunk_first, chunk_last,
offset_in_chunk)``.  A downstream packer uses it to materialize training
sequences; ``chunk_last > chunk_first`` marks boundary-crossing documents
(the attention-masking decision every pretraining pipeline has to make).

The interesting part at 10^12 documents is the GLOBAL running token count:
the naive plan is one window over a corpus-wide total order — a
single-partition sort, the canonical Spark scale cliff.  Here it is a
TWO-PHASE DISTRIBUTED PREFIX SUM instead:

1. the deterministic global order is ``(h, doc_id)`` with ``h = md5(salt |
   doc_id)``; its PREFIX ``substring(h, 1, bucket_hex)`` partitions the
   order into ``16^bucket_hex`` contiguous ranges (a string-prefix bucket
   can never interleave two buckets' sort ranges),
2. per-bucket token totals (one map-side-combined aggregation, 16^k rows)
   get their running offsets from a window over the BUCKET table — bounded
   by the PARAMETER, never the data — and broadcast back,
3. the intra-bucket running count is a window partitioned BY BUCKET, so
   every sort is a 1/16^k shard of the corpus, spillable and parallel.

``bucket_hex`` is the shard-size dial: 2 → 256 buckets, 3 → 4096.  Tokens
are whitespace tokens (the engine's counting convention); empty documents
carry no tokens and are excluded identically by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgist_spark.operators.text import tokens


def pack_layout(docs: DataFrame, ctx: int = 2048, id_col: str = "doc_id",
                text_col: str = "text", salt: str = "pack",
                bucket_hex: int = 2) -> DataFrame:
    """See the module docstring.  Output columns are all BIGINT:
    ``tok_start`` = position of the document's first token in the global
    stream (0-based), ``chunk_first``/``chunk_last`` = the 0-based ``ctx``
    chunks its tokens touch, ``offset_in_chunk`` = ``tok_start % ctx``."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    d = (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.size(tokens(text_col)).cast("long").alias("n_tokens"),
            h.alias("h"),
            F.substring(h, 1, bucket_hex).alias("bkt"),
        )
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = d.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    # bucket offsets: 16^bucket_hex rows — bounded by the PARAMETER, so
    # the single-partition window here is a constant-size sort, not the
    # corpus-wide one this operator exists to avoid
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        d.groupBy("bkt").agg(F.sum("n_tokens").alias("tot"))
        .select("bkt", F.coalesce(F.sum("tot").over(w_b), F.lit(0))
                .alias("off"))
    )
    return (
        intra.join(F.broadcast(offs), "bkt")
        .select(
            id_col,
            "n_tokens",
            (F.col("off") + F.col("cum_in") - F.col("n_tokens"))
            .alias("tok_start"),
        )
        .select(
            id_col, "n_tokens", "tok_start",
            F.expr(f"tok_start DIV {ctx}").alias("chunk_first"),
            F.expr(f"(tok_start + n_tokens - 1) DIV {ctx}")
            .alias("chunk_last"),
            F.expr(f"tok_start % {ctx}").alias("offset_in_chunk"),
        )
    )


def pack_layout_oracle_sql(docs_sql: str, ctx: int = 2048,
                           salt: str = "pack") -> str:
    """DuckDB replay of :func:`pack_layout`: the two-phase prefix sum
    collapses to ONE window over the same (h, doc_id) total order — the
    semantics the distributed plan must reproduce exactly."""
    return f"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                    AS BIGINT) AS n_tokens,
               md5(concat('{salt}', '|', CAST(doc_id AS VARCHAR))) AS h
        FROM ({docs_sql}) WHERE length(trim(text)) > 0
    ),
    c AS (
        -- DuckDB SUM(BIGINT) promotes to HUGEINT (float through pandas):
        -- pin the stream position back to BIGINT before deriving columns
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY h, doc_id) - n_tokens
                    AS BIGINT) AS tok_start
        FROM d
    )
    SELECT doc_id, n_tokens, tok_start,
           tok_start // {ctx} AS chunk_first,
           (tok_start + n_tokens - 1) // {ctx} AS chunk_last,
           tok_start % {ctx} AS offset_in_chunk
    FROM c
    """


def pack_chunks(docs: DataFrame, ctx: int = 2048, id_col: str = "doc_id",
                text_col: str = "text", salt: str = "pack",
                bucket_hex: int = 2) -> DataFrame:
    """The INVERSE packing table — what a training loader actually reads:
    :func:`pack_layout` answers "where does this document land"; this
    answers "what composes this chunk": one row per (chunk, document
    segment) — ``(chunk_id, doc_id, offset_in_chunk, seg_start,
    seg_len)`` with ``seg_start`` the 1-based token position WITHIN the
    document and segments tiling every chunk gaplessly (sum(seg_len) =
    ctx on all but the final partial chunk — pinned by test).

    Pure arithmetic on the layout: each document explodes into its
    ``chunk_last − chunk_first + 1`` touched chunks (a per-row
    ``sequence``, bounded by ⌈n_tokens/ctx⌉ — no join, no extra
    shuffle beyond the layout's own), and the segment bounds are
    min/max intersections of the doc's token interval with the chunk's.
    """
    lay = pack_layout(docs, ctx=ctx, id_col=id_col, text_col=text_col,
                      salt=salt, bucket_hex=bucket_hex)
    return (
        lay.select(
            id_col, "n_tokens", "tok_start",
            F.explode(
                F.sequence(F.col("chunk_first"), F.col("chunk_last"))
            ).alias("chunk_id"),
        )
        .select(
            "chunk_id",
            F.col(id_col),
            F.expr(
                f"greatest(tok_start, chunk_id * {ctx}) - chunk_id * {ctx}"
            ).cast("long").alias("offset_in_chunk"),
            F.expr(
                f"greatest(tok_start, chunk_id * {ctx}) - tok_start + 1"
            ).cast("long").alias("seg_start"),
            F.expr(
                f"least(tok_start + n_tokens, (chunk_id + 1) * {ctx})"
                f" - greatest(tok_start, chunk_id * {ctx})"
            ).cast("long").alias("seg_len"),
        )
    )


def pack_chunks_oracle_sql(docs_sql: str, ctx: int = 2048,
                           salt: str = "pack") -> str:
    """DuckDB replay of :func:`pack_chunks`: the layout oracle's single
    global window + the identical per-chunk explode and intersection
    arithmetic."""
    lay = pack_layout_oracle_sql(docs_sql, ctx=ctx, salt=salt)
    return f"""
    WITH lay AS ({lay})
    SELECT u.chunk_id, l.doc_id,
           CAST(greatest(l.tok_start, u.chunk_id * {ctx})
                - u.chunk_id * {ctx} AS BIGINT) AS offset_in_chunk,
           CAST(greatest(l.tok_start, u.chunk_id * {ctx})
                - l.tok_start + 1 AS BIGINT) AS seg_start,
           CAST(least(l.tok_start + l.n_tokens, (u.chunk_id + 1) * {ctx})
                - greatest(l.tok_start, u.chunk_id * {ctx}) AS BIGINT)
               AS seg_len
    FROM lay l, LATERAL unnest(
        range(l.chunk_first, l.chunk_last + 1)) u(chunk_id)
    """
