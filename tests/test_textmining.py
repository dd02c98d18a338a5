"""Repeated-n-gram dedup stats + PMI co-occurrence mining."""

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.dedup import dup_ngram_stats
from kgist_spark.operators.text import pmi_pairs

pytestmark = pytest.mark.spark


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_dup_ngram_known_duplicates(spark):
    shared = "one two three four five"
    rows = [
        ("a", shared + " alpha beta"),          # 3 windows, 1 shared
        ("b", shared),                           # 1 window, shared
        ("c", "totally different words here now"),  # 1 window, unique
        ("d", "tiny"),                            # < n tokens: no row
    ]
    out = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_frac_x1e6"])
        for r in dup_ngram_stats(_docs(spark, rows), n=5).collect()
    }
    assert out == {
        "a": (3, 1, 333333),   # 1e6 * 1 DIV 3, truncating
        "b": (1, 1, 1000000),
        "c": (1, 0, 0),
    }


def test_dup_ngram_internal_repetition_not_cross_doc(spark):
    # a doc repeating ITS OWN 5-gram is not a cross-document duplicate:
    # the distinct-(gram, doc) collapse must keep nd at 1
    rows = [("a", "x y z w v x y z w v")]
    (row,) = dup_ngram_stats(_docs(spark, rows), n=5).collect()
    assert (row["n_grams"], row["n_dup_grams"]) == (6, 0)


def test_pmi_prefers_exclusive_pair(spark):
    # "gold silver" always co-occur and appear nowhere else; "the" is
    # everywhere — PMI must rank (gold, silver) above any pair with "the"
    rows = [("d%d" % i, "the gold silver the noise%d the" % i) for i in range(12)]
    out = pmi_pairs(_docs(spark, rows), window=3, min_count=5, k=10).collect()
    assert out[0]["a"] == "gold" and out[0]["b"] == "silver"
    assert all(r["pmi_x1e6"] <= out[0]["pmi_x1e6"] for r in out)


def test_pmi_pair_orientation_and_window(spark):
    # pairs are (least, greatest) regardless of text order, and only
    # positions within the window count
    rows = [("a", "zeta alpha mid1 mid2 mid3 mid4 zeta alpha")] * 6
    rows = [(f"d{i}", t) for i, (_, t) in enumerate(rows)]
    out = {
        (r["a"], r["b"]): r["n_pair"]
        for r in pmi_pairs(_docs(spark, rows), window=1, min_count=1, k=100).collect()
    }
    # window=1: only adjacent pairs; (alpha, zeta) appears twice per doc
    # in both text orders, normalized to one key
    assert out[("alpha", "zeta")] == 12
    assert ("alpha", "mid2") not in out


# --------------------------------------------------- quantized ANN recall


def test_quantized_topk_recall_vs_exact(spark):
    """int8 quantization must preserve most of the exact-cosine top-k on
    the real testdata embeddings (unit-ish synthetic vectors, dim 64)."""
    from kgist_spark.operators import similarity as SIM

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = {r["vec_id"] for r in SIM.cosine_topk(emb, q, k=10).collect()}
    quant = {r["vec_id"] for r in SIM.quantized_topk(emb, q, k=10).collect()}
    assert len(exact & quant) >= 7, (exact, quant)


def test_q8_py_matches_sql_round_semantics(spark):
    """The driver-side query quantizer must round half AWAY from zero like
    Spark/DuckDB round, not like Python's banker's round."""
    from pyspark.sql import functions as F

    from kgist_spark.operators.similarity import Q8_SCALE, _q8_py, q8_expr

    # values engineered to hit exact .5 products at scale 64: 0.0234375*64
    # = 1.5, -0.0234375*64 = -1.5, plus clamp extremes
    vals = [0.0234375, -0.0234375, 0.0390625, -3.0, 3.0, 0.01, -0.01]
    df = spark.createDataFrame([(vals,)], "v array<double>")
    (got,) = df.select(q8_expr("v", Q8_SCALE).alias("q")).first()
    assert list(got) == [_q8_py(x) for x in vals]
    assert _q8_py(0.0234375) == 2 and _q8_py(-0.0234375) == -2  # away from 0
    assert _q8_py(3.0) == 127 and _q8_py(-3.0) == -127          # clamped
