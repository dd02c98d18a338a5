"""Composite curation decision table (operators/curate.py).

Engine parity with DuckDB (rows+schema+values at sf0.001/sf0.01) is pinned
by tests/test_entry_contract.py (``curate`` / ``curate_summary``); this
file pins the operator's own semantics on a synthetic corpus where every
gate fires: flag correctness, the drop_reason PRIORITY order (first
failing gate wins), exact-dup group keep semantics (min id survives),
near-dup cluster keep semantics, and the summary rollup.
"""

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.curate import (
    GATES, KEEP_LANG, MAX_DUP_BIGRAM_FRAC, MIN_TOKENS, MIN_UNIQUE_RATIO,
    curate_summary, curate_table,
)

pytestmark = pytest.mark.spark

#: long, diverse, clean English text — passes every in-row gate
_CLEAN = ("quick brown foxes jumped over several lazy sleeping dogs while "
          "bright autumn leaves drifted past the quiet river bank today")
#: high token DIVERSITY (40 distinct filler words keep unique_ratio ~0.7,
#: clearing the diversity floor) but a phrase repeated 10 times drives the
#: duplicate-bigram fraction past the cap — only the repetition gate fires
_REPEAT = " ".join(f"filler{i}word" for i in range(40)) + " " + "spam alert " * 10
#: enough tokens, tiny vocabulary -> low unique ratio but few REPEATED
#: bigrams would also trip the repetition gate, so diversity must be
#: checked FIRST for the priority assertion below
_LOWDIV = "word " * 30
#: near-duplicate of _CLEAN: one trailing token changed
_NEAR = _CLEAN.rsplit(" ", 1)[0] + " tonight"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "en", _CLEAN),                       # kept
        (1, "de", _CLEAN),                       # lang (priority over all)
        (2, "en", "too few tokens here"),        # too_short
        (3, "en", _LOWDIV),                      # low_diversity
        (4, "en", _REPEAT),                      # repetitive
        (5, "en", _CLEAN),                       # exact_dup of 0
        (6, "en", _NEAR),                        # near_dup of {0, 5}
        (7, "en", _CLEAN + " entirely unrelated further clause appended "
                  "with many extra distinct tokens making jaccard low "
                  "plus more filler words stretching the shingle sets "
                  "apart so the overlap fraction drops beneath threshold "
                  "and even more unique vocabulary items keep appearing "
                  "until similarity finally dilutes away completely"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


@pytest.fixture(scope="module")
def decisions(corpus):
    return {r["doc_id"]: r.asDict()
            for r in curate_table(corpus, threshold=0.4).collect()}


def test_gate_constants_sane():
    assert KEEP_LANG == "en" and MIN_TOKENS > 0
    assert 0 < MIN_UNIQUE_RATIO < 1 and 0 < MAX_DUP_BIGRAM_FRAC < 1
    assert GATES[0] == "lang" and GATES[-1] == "near_dup"


def test_clean_doc_kept(decisions):
    d = decisions[0]
    assert d["keep"] and d["drop_reason"] is None
    assert not d["is_exact_dup"] and not d["is_near_dup"]
    assert d["n_tokens"] >= MIN_TOKENS
    assert d["unique_ratio"] >= MIN_UNIQUE_RATIO


def test_each_gate_fires_with_its_reason(decisions):
    assert decisions[1]["drop_reason"] == "lang"
    assert decisions[2]["drop_reason"] == "too_short"
    assert decisions[3]["drop_reason"] == "low_diversity"
    assert decisions[4]["drop_reason"] == "repetitive"
    assert decisions[5]["drop_reason"] == "exact_dup"
    assert decisions[6]["drop_reason"] == "near_dup"
    assert all(not decisions[i]["keep"] for i in range(1, 7))


def test_priority_lang_wins_over_everything(decisions):
    # doc 1 is an exact duplicate of doc 0's text AND wrong-lang: the
    # earlier gate names the reason
    assert decisions[1]["is_exact_dup"] or decisions[1]["drop_reason"] == "lang"
    assert decisions[1]["drop_reason"] == "lang"


def test_priority_low_diversity_before_repetitive(decisions):
    # _LOWDIV ("word " * 30) maxes dup_bigram_frac too — diversity is the
    # FIRST failing gate and must name the reason
    d = decisions[3]
    assert d["dup_bigram_frac"] is not None
    assert d["dup_bigram_frac"] > MAX_DUP_BIGRAM_FRAC
    assert d["drop_reason"] == "low_diversity"


def test_exact_dup_keeps_min_id(decisions):
    # 0 and 5 share text: 0 (min id) survives, 5 flagged
    assert not decisions[0]["is_exact_dup"]
    assert decisions[5]["is_exact_dup"]


def test_near_dup_flags_non_representative(decisions):
    # {0, 5, 6} form a near-dup cluster; 0 is the min-id representative
    assert not decisions[0]["is_near_dup"]
    assert decisions[6]["is_near_dup"]
    # doc 7 shares a prefix but diluted well under the jaccard threshold
    assert not decisions[7]["is_near_dup"] and decisions[7]["keep"]


def test_summary_rolls_up_reasons(corpus):
    rows = {r["drop_reason"]: r["n_docs"]
            for r in curate_summary(curate_table(corpus, threshold=0.4)).collect()}
    assert rows["kept"] == 2
    assert sum(rows.values()) == 8
    for reason in GATES:
        assert rows[reason] == 1


def test_short_doc_null_bigram_frac(spark):
    one = spark.createDataFrame([(0, "en", "single")], ["doc_id", "lang", "text"])
    d = curate_table(one).collect()[0]
    assert d["dup_bigram_frac"] is None
    assert d["drop_reason"] == "too_short"


def test_single_corpus_scan(spark, tmp_path):
    """The decision table must read the documents source ONCE: the fanned
    projection is persisted (lineage-preserving — a lost executor's blocks
    recompute from parquet, unlike a localCheckpoint which would fail the
    whole job) and every gate (features, md5 groups, the near-dup shingle
    substrate) consumes the cached blocks.  Before this pin, gate 6 re-ran
    fan_out_scan on the raw input — a second full pass over a 100-TB
    corpus.  The pin reads the plan's LEAVES: every corpus consumer must
    be an InMemoryTableScan and no file-source leaf may appear — the
    parquet scan exists only inside the one cached-relation build."""
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "en", f"unique document body {i} " + "alpha beta gamma " * 8)
         for i in range(30)],
        "doc_id long, lang string, text string",
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    out = curate_table(docs)
    leaves = out._jdf.queryExecution().sparkPlan().collectLeaves()
    names = [leaves.apply(i).nodeName() for i in range(leaves.size())]
    assert names.count("InMemoryTableScan") >= 2  # gates share one cache
    assert not any("FileScan" in n or "Scan parquet" in n for n in names)
    assert out.count() == 30
    spark.catalog.clearCache()  # don't leak the corpus cache to other tests
