"""Unigram LM quality scoring (operators/lm.py).

Engine parity with DuckDB is pinned by tests/test_entry_contract.py
(lm_score rows+schema+values); this file pins the operator's own semantics
against a hand-computed model: add-one smoothing, the shared OOV bucket,
fixed-point integer aggregation, and ordering of reference-like vs
gibberish documents.
"""

import math

import pytest

from kgist_spark.operators.lm import LOGP_SCALE, lm_score, unigram_lm

pytestmark = pytest.mark.spark


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_logp(cnt, total, v):
    # the operator's exact arithmetic: log2(cnt+1) - log2(denom), rounded
    # to fixed point (covers OOV via cnt=0)
    return round(
        (math.log2(cnt + 1) - math.log2(total + v + 1)) * LOGP_SCALE
    )


def test_unigram_lm_add_one(spark):
    ref = _docs(spark, [(1, "a a b")])
    counts_df, denom_df = unigram_lm(ref)
    counts = {r["token"]: r["cnt"] for r in counts_df.collect()}
    # total=3 tokens, v=2 types, denom=6: p(a)=(2+1)/6, p(b)=(1+1)/6
    assert counts == {"a": 2, "b": 1}
    assert denom_df.collect()[0]["denom"] == 6


def test_lm_score_hand_computed(spark):
    ref = _docs(spark, [(1, "a a b")])
    corpus = _docs(spark, [(10, "a b"), (11, "z z"), (12, "a z")])
    out = {r["doc_id"]: r for r in lm_score(corpus, ref).collect()}
    la, lb = _expected_logp(2, 3, 2), _expected_logp(1, 3, 2)
    loov = _expected_logp(0, 3, 2)
    assert (out[10]["n_tokens"], out[10]["n_oov"]) == (2, 0)
    assert out[10]["bits_per_token_x1e6"] == (-(la + lb)) // 2
    assert (out[11]["n_tokens"], out[11]["n_oov"]) == (2, 2)
    assert out[11]["bits_per_token_x1e6"] == (-(2 * loov)) // 2
    assert out[12]["bits_per_token_x1e6"] == (-(la + loov)) // 2
    # gibberish scores strictly more bits than in-distribution text
    assert (
        out[11]["bits_per_token_x1e6"]
        > out[12]["bits_per_token_x1e6"]
        > out[10]["bits_per_token_x1e6"]
    )


def test_lm_score_partitioning_independent(spark):
    ref = _docs(spark, [(1, "x y z x")])
    rows = [(i, "x y q " * 5) for i in range(20)]
    a = lm_score(_docs(spark, rows).repartition(1), ref).collect()
    b = lm_score(_docs(spark, rows).repartition(16), ref).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
