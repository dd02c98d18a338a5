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


# -------------------------------------------------- interpolated bigram LM


def _py_bigram_score(corpus, reference, lam=(7, 10)):
    """Independent driver-side replay of bigram_score's exact arithmetic."""
    ln, ld = lam
    uni, bi, ctx = {}, {}, {}
    for _, text in reference:
        t = text.split()
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    denom = sum(uni.values()) + len(uni) + 1
    v = len(uni)
    out = {}
    for doc_id, text in corpus:
        t = text.split()
        if len(t) < 2:
            continue
        s = 0
        for a, b in zip(t, t[1:]):
            pb = (bi.get((a, b), 0) + 1.0) / (ctx.get(a, 0) + v + 1.0)
            pu = (uni.get(b, 0) + 1.0) / denom
            s += round(math.log2((ln * pb + (ld - ln) * pu) / ld) * LOGP_SCALE)
        n_trans = len(t) - 1
        out[doc_id] = (len(t), n_trans, (-s) // n_trans if s <= 0 else -((s) // n_trans))
    return out


def test_bigram_score_matches_python_replay(spark):
    from kgist_spark.operators.lm import bigram_score

    ref = [(100 + i, "the cat sat on the mat and the cat ran") for i in range(3)]
    ref += [(200, "dogs bark at the moon every night")]
    cor = [
        (1, "the cat sat on the mat"),       # reference-like
        (2, "mat the on sat cat the"),       # same tokens, shuffled order
        (3, "zebra quantum flux bagel"),     # OOV everywhere
        (4, "single"),                        # no transition: no row
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_trans"], r["bits_per_trans_x1e6"])
        for r in bigram_score(_docs(spark, cor), _docs(spark, ref)).collect()
    }
    assert got == _py_bigram_score(cor, ref)
    # word order must matter: the shuffled twin scores strictly worse
    assert got[1][2] < got[2][2]
    # OOV gibberish scores worst of all
    assert got[3][2] > got[2][2]
    assert 4 not in got


def test_trigram_score_backoff_ladder(spark):
    """Each backoff branch hand-verified: seen trigram, unseen trigram
    with seen bigram (0.4), and full OOV backstop (0.16 add-one)."""
    import math

    from kgist_spark.operators.lm import trigram_score

    ref = spark.createDataFrame(
        [("r1", "a b c a b c"), ("r2", "a b d")],
        "doc_id string, text string",
    )
    # doc1: trigram (a b c): cnt3=2, ctx cnt2(a,b)=3 -> S=2/3
    # doc2: (c a x): unseen tri, unseen bigram (a x) -> backstop via
    #       cnt(x)=0: S = 0.16 * 1/denom
    # doc3: (b d b): unseen tri; bigram (d b) unseen -> backstop cnt(b)=3
    cor = spark.createDataFrame(
        [("d1", "a b c"), ("d2", "c a x"), ("d3", "b d b")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in trigram_score(cor, ref).collect()}
    # reference: tokens a:3,b:3,c:2,d:1 -> total 9, V=4, denom=14
    assert out["d1"]["bits_per_tri_x1e6"] == round(
        -math.log2(2 / 3) * 1_000_000)
    assert out["d2"]["bits_per_tri_x1e6"] == round(
        -math.log2(0.16 * 1.0 / 14) * 1_000_000)
    # d3: bigram (d b) unseen -> backstop on cnt(b)=3: 0.16*4/14
    assert out["d3"]["bits_per_tri_x1e6"] == round(
        -math.log2(0.16 * (3 + 1.0) / 14) * 1_000_000)
    # quality ordering: the in-distribution doc scores fewer bits
    assert (out["d1"]["bits_per_tri_x1e6"]
            < out["d3"]["bits_per_tri_x1e6"]
            < out["d2"]["bits_per_tri_x1e6"])


def test_trigram_score_skips_short_docs(spark):
    from kgist_spark.operators.lm import trigram_score

    ref = spark.createDataFrame([("r", "a b c")], "doc_id string, text string")
    cor = spark.createDataFrame(
        [("s", "a b"), ("t", "a b c d")], "doc_id string, text string"
    )
    out = {r["doc_id"]: r for r in trigram_score(cor, ref).collect()}
    assert set(out) == {"t"}          # < 3 tokens -> no row
    assert out["t"]["n_tri"] == 2
