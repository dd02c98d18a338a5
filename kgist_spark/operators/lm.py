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


def unigram_lm(reference: DataFrame, text_col: str = "text") -> DataFrame:
    """Add-one-smoothed unigram log-prob table from a reference corpus:
    ``(token, logp_x1e6)`` with ``p(w) = (cnt(w)+1) / (total+V+1)``.
    The ``+1`` in the denominator funds a single shared OOV bucket
    (``oov_logp_x1e6`` = log2 of that bucket, computed by the caller via
    :func:`oov_logp` from the same aggregates).

    100 TB shape: trained ONCE on the (small, trusted) reference slice —
    one explode + one aggregation; at CCNet scale this side is a fixed
    artifact (a pruned top-K table), not per-run work."""
    tok = reference.select(F.explode(tokens(text_col)).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("v")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        F.round(
            F.log2((F.col("cnt") + 1) / (F.col("total") + F.col("v") + 1))
            * LOGP_SCALE
        )
        .cast("long")
        .alias("logp_x1e6"),
        (F.col("total") + F.col("v") + 1).alias("denom"),
    )


def lm_score(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bits-per-token of each corpus document under the reference unigram
    LM: ``(id, n_tokens, n_oov, bits_per_token_x1e6)`` — LOWER is more
    reference-like (the CCNet keep side).

    One corpus pass: tokens explode, a BROADCAST left join against the LM
    table (justified: the LM side is a fixed small artifact, like the
    decontamination benchmark — never the corpus), per-document partial
    aggregation collapses the exploded stream back to one row per document
    before the only shuffle.  OOV tokens take the shared smoothing bucket's
    log-prob.  All post-rounding arithmetic is integer, so the score is
    independent of partitioning and execution order."""
    lm = unigram_lm(reference, text_col)
    # the OOV bucket's fixed-point log-prob, from the same aggregates the
    # table rows used (one tiny action-free scalar subquery via crossJoin)
    oov = lm.select(
        F.round(F.log2(1.0 / F.col("denom")) * LOGP_SCALE)
        .cast("long")
        .alias("oov_logp_x1e6")
    ).limit(1)
    tok = corpus.select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("token")
    )
    scored = tok.join(
        F.broadcast(lm.select("token", "logp_x1e6")), "token", "left"
    ).crossJoin(F.broadcast(oov))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("token").alias("n_tokens"),
            F.count(F.when(F.col("logp_x1e6").isNull(), 1)).alias("n_oov"),
            F.sum(
                F.coalesce(F.col("logp_x1e6"), F.col("oov_logp_x1e6"))
            ).alias("sum_logp"),
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
