"""Benchmark decontamination (operators/text.py::ngram_decontaminate).

DuckDB parity at the query surface is pinned by test_entry_contract
(`decontaminate`); this file pins the operator semantics: planted overlap
detection, distinct-gram counting, short-document handling, and the
broadcast-join 100TB shape.
"""

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.text import ngram_decontaminate, word_ngrams

pytestmark = pytest.mark.spark


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_basic_and_short(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("  x  y   z ",)], "text string"
    )
    got = [r[0] for r in df.select(word_ngrams("text", 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []          # shorter than n: empty, NOT truncated grams
    assert got[2] == ["x y z"]   # trim + multi-space tokenization


def test_planted_contamination_detected(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(spark, [
        (1, "xx alpha beta gamma delta epsilon yy"),  # 5-gram overlap
        (2, "totally unrelated words without any overlap here"),
        (3, "al be ga"),                               # shorter than n
    ])
    got = {r["doc_id"]: r.asDict()
           for r in ngram_decontaminate(corpus, bench, n=5).collect()}
    assert set(got) == {1, 2, 3}
    # 7 tokens -> 3 distinct 5-grams, of which exactly one
    # ('alpha beta gamma delta epsilon') appears in the benchmark
    assert got[1]["contaminated"] and got[1]["n_hits"] == 1
    assert got[1]["n_doc_grams"] == 3
    assert not got[2]["contaminated"] and got[2]["n_hits"] == 0
    assert got[3]["n_doc_grams"] == 0 and not got[3]["contaminated"]


def test_repeated_grams_counted_once(spark):
    bench = _docs(spark, [(100, "p q r s t")])
    corpus = _docs(spark, [(1, "p q r s t u p q r s t")])
    row = ngram_decontaminate(corpus, bench, n=5).collect()[0]
    # 'p q r s t' occurs twice in the doc but is ONE distinct gram
    assert row["n_hits"] == 1 and row["contaminated"]


def test_benchmark_side_broadcasts(spark):
    bench = _docs(spark, [(100, "a b c d e")])
    corpus = _docs(spark, [(1, "a b c d e f")])
    plan = (
        ngram_decontaminate(corpus, bench, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
