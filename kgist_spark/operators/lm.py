"""Unigram language-model quality scoring (the CCNet/KenLM-style filter).

CCNet ranks web documents by the perplexity of a language model trained on
a trusted corpus (Wikipedia) and keeps the low-perplexity tail.  This is
the distributed analogue with the smallest honest model — an add-one
unigram LM trained on a reference slice — producing per-document
bits-per-token.  The point here is the PLAN (train once, broadcast,
one corpus pass), not the model class; swapping a real KenLM table into
the broadcast side changes nothing structural.

Determinism discipline: per-token log-probs are fixed-point ints
(``round(log2(p) * 1e6)``) BEFORE summation, so the per-document sum is an
integer — order-free at any parallelism, same class as the fixed-point
PageRank (`operators/graph.py`) — and hash-comparable against the DuckDB
oracle, which replays the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgist_spark.operators.text import tokens

#: fixed-point scale for per-token log2 probabilities
LOGP_SCALE = 1_000_000


def unigram_lm(reference: DataFrame, text_col: str = "text"):
    """Add-one-smoothed unigram model from a reference corpus.

    Returns ``(counts, denom)``: the raw ``(token, cnt)`` table and a
    ONE-ROW ``(denom,)`` frame with ``denom = total + V + 1`` — the ``+1``
    funds a single shared OOV bucket.  The scorer derives every log-prob
    from these via ONE formula, ``log2(coalesce(cnt, 0) + 1) -
    log2(denom)``, which covers in-vocabulary AND OOV tokens (cnt NULL ⇒
    log2(1) = 0), so the model ships as one broadcast join + one one-row
    crossJoin — no separate OOV plumbing, and the reference slice is
    aggregated exactly twice (the counts table and its total), never four
    times as a logp-table + scalar-subquery formulation costs.

    100 TB shape: trained ONCE on the (small, trusted) reference slice —
    one explode + one aggregation; at CCNet scale this side is a fixed
    artifact (a pruned top-K table), not per-run work."""
    tok = reference.select(F.explode(tokens(text_col)).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    denom = counts.agg((F.sum("cnt") + F.count("*") + 1).alias("denom"))
    return counts, denom


def lm_score(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bits-per-token of each corpus document under the reference unigram
    LM: ``(id, n_tokens, n_oov, bits_per_token_x1e6)`` — LOWER is more
    reference-like (the CCNet keep side).

    One corpus pass: tokens explode, a BROADCAST left join against the
    count table (justified: the LM side is a fixed small artifact, like
    the decontamination benchmark — never the corpus), per-document
    partial aggregation collapses the exploded stream back to one row per
    document before the only shuffle.  OOV tokens fall out of the same
    ``coalesce(cnt, 0)`` formula as hits.  All post-rounding arithmetic is
    integer, so the score is independent of partitioning and execution
    order."""
    from kgist_spark.operators.dedup import fan_out_scan

    counts, denom = unigram_lm(reference, text_col)
    tok = fan_out_scan(corpus.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("token")
    )
    scored = tok.join(F.broadcast(counts), "token", "left").crossJoin(
        F.broadcast(denom)
    )
    logp = (
        F.round(
            (
                F.log2(F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                - F.log2(F.col("denom"))
            )
            * LOGP_SCALE
        )
        .cast("long")
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("token").alias("n_tokens"),
            F.count(
                F.when(F.col("token").isNotNull() & F.col("cnt").isNull(), 1)
            ).alias("n_oov"),
            F.sum(logp).alias("sum_logp"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            "n_oov",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("(-sum_logp) div n_tokens"),
            ).alias("bits_per_token_x1e6"),
        )
    )
