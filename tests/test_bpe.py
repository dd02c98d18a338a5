"""Real merge-table BPE: training determinism, encoder semantics, and
Spark-vs-DuckDB parity of the full token-count query."""

import random

import pytest

from kgist_spark.operators.bpe import (
    DEFAULT_MERGES,
    _SEED_WORD_FREQS,
    bpe_token_counts,
    bpe_token_counts_oracle_sql,
    encode_word,
    merge_ranks,
    train_bpe_merges,
)

pytestmark = pytest.mark.spark


def test_training_is_order_independent():
    shuffled = list(_SEED_WORD_FREQS)
    random.Random(5).shuffle(shuffled)
    assert tuple(train_bpe_merges(shuffled, n_merges=64)) == DEFAULT_MERGES


def test_encoder_semantics():
    # rank order decides: with (a,b) ranked over (b,c), 'abc' -> ['ab','c']
    ranks = merge_ranks([("a", "b"), ("b", "c")])
    assert encode_word("abc", ranks) == ["ab", "c"]
    # leftmost-first on equal rank: 'aaa' with (a,a) -> ['aa','a']
    assert encode_word("aaa", merge_ranks([("a", "a")])) == ["aa", "a"]
    # chained merges reach multi-char symbols
    ranks = merge_ranks([("t", "h"), ("th", "e")])
    assert encode_word("the", ranks) == ["the"]
    # untrained material stays at characters
    assert encode_word("zzq", merge_ranks(DEFAULT_MERGES)) == ["z", "z", "q"]
    # single char / empty-safe
    assert encode_word("x", merge_ranks(DEFAULT_MERGES)) == ["x"]


def test_default_table_compresses_english():
    ranks = merge_ranks(DEFAULT_MERGES)
    assert encode_word("the", ranks) == ["the"]
    assert len(encode_word("information", ranks)) < len("information")


def test_spark_matches_duckdb_on_adversarial_corpus(spark):
    """Bit-exact parity on text with punctuation, digits, apostrophes, and
    non-ASCII single-char tokens."""
    import duckdb

    rows = [
        (0, "the quick brown fox, the lazy dog's 42nd question!"),
        (1, "Information systems; nation-wide stations under water."),
        (2, "café — résumés & naïveté 100% off"),
        (3, "   "),  # no tokens: absent from BOTH outputs
        (4, "x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join("(%d, ?)" % i for i, _ in rows)
        + ") t(doc_id, text)",
        [t for _, t in rows],
    )
    want = {
        int(r[0]): (int(r[1]), int(r[2]))
        for r in con.execute(bpe_token_counts_oracle_sql()).fetchall()
    }
    assert got == want
    assert 3 not in got and 0 in got and 4 in got
    assert got[4] == (1, 1)


def test_python_stage_is_vocab_bounded(spark):
    """The mapInPandas encoder sees DISTINCT words only — the plan contains
    exactly one Python stage, fed by an aggregate, not the raw corpus."""
    docs = spark.createDataFrame(
        [(i, "the the the repeated text") for i in range(50)],
        "doc_id long, text string",
    )
    plan = bpe_token_counts(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("MapInPandas") == 1, plan
    # the encoder input is the post-aggregate distinct vocabulary
    assert "Aggregate" in plan.split("MapInPandas")[-1], plan
