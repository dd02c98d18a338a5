"""Gopher-style repetition quality gates (operators/text.py::repetition_stats).

DuckDB parity at sf0.001 is pinned by test_entry_contract (`repetition`);
this pins the semantics on hand-built documents and the zero-shuffle plan.
"""

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.text import repetition_stats

pytestmark = pytest.mark.spark


def test_repetitive_doc_scores_high(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "all these tokens appear exactly once here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    # doc 1: 5 bigrams, all 'spam spam' -> dup 4/5, top 5/5
    assert got[1]["dup_bigram_frac"] == 0.8
    assert got[1]["top_bigram_frac"] == 1.0
    assert got[1]["dup_trigram_frac"] == 0.75
    # doc 2: every gram unique -> dup 0, top 1/n
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == round(1 / 6, 5)  # 7 tokens, 6 bigrams
    assert got[2]["dup_trigram_frac"] == 0.0


def test_short_docs_yield_nulls_not_errors(spark):
    df = spark.createDataFrame(
        [(1, "one"), (2, "one two")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert got[1]["dup_bigram_frac"] is None          # no bigrams
    assert got[1]["dup_trigram_frac"] is None
    assert got[2]["dup_bigram_frac"] == 0.0           # one bigram
    assert got[2]["dup_trigram_frac"] is None         # no trigrams


def test_repetition_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
