"""BM25 keyword search: pure-Python replay parity + physical-plan pins."""

import math

import pytest

from kgist_spark.operators.search import bm25_topk

pytestmark = pytest.mark.spark

DOCS = [
    (1, "spark join hash join"),
    (2, "the quick brown fox"),
    (3, "spark spark spark table"),
    (4, "hash table scan"),
    (5, "join"),
]
TERMS = ["spark", "join", "hash"]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    total_len = sum(len(t) for t in toks.values())
    out = {}
    for d, t in toks.items():
        dl = len(t)
        score = 0.0
        matched = False
        for q in terms:
            tf = t.count(q)
            matched = matched or tf > 0
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            score += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dl * n / total_len)
            )
        if matched:
            out[d] = round(score, 5)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


def test_bm25_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [(r["doc_id"], r["bm25"]) for r in bm25_topk(df, TERMS, k=10).collect()]
    assert got == _py_bm25(DOCS, TERMS)


def test_bm25_zero_match_docs_excluded(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"] for r in bm25_topk(df, TERMS, k=10).collect()}
    assert 2 not in got
    assert got == {1, 3, 4, 5}


def test_bm25_plan_shape(spark):
    """The stats side must broadcast (one-row aggregate) and the top-k must
    be a bounded heap (TakeOrderedAndProject), never a global sort."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = bm25_topk(df, TERMS, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# tf-idf top terms (tfidf_top_terms)


def _py_tfidf(docs, per_doc_k=3, scale=1_000_000):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(toks)
    rows = []
    for d, t in toks.items():
        tf = {}
        for w in t:
            tf[w] = tf.get(w, 0) + 1
        scored = []
        for w, f in tf.items():
            df = sum(1 for tt in toks.values() if w in tt)
            scored.append((d, w, f, df, f * ((n * scale) // df)))
        scored.sort(key=lambda r: (-r[4], r[1]))
        rows += scored[:per_doc_k]
    return sorted(rows)


def test_tfidf_matches_python_replay(spark):
    from kgist_spark.operators.search import tfidf_top_terms

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(tuple(r) for r in tfidf_top_terms(df, per_doc_k=3).collect())
    assert got == _py_tfidf(DOCS, per_doc_k=3)


def test_tfidf_rarity_beats_frequency_within_budget(spark):
    from kgist_spark.operators.search import tfidf_top_terms

    # 'zebra' appears once in one doc (df=1); 'common' is in every doc:
    # the rare term must outrank the frequent-but-ubiquitous one
    docs = [(1, "common zebra common"), (2, "common common"), (3, "common")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["doc_id"], r["term"]): r["score_x1e6"]
           for r in tfidf_top_terms(df, per_doc_k=1).collect()}
    assert got[(1, "zebra")] == 3_000_000  # tf 1 * (3e6 div 1)
    assert (1, "common") not in got


def test_tfidf_no_per_doc_collect_list_in_plan(spark):
    from kgist_spark.operators.search import tfidf_top_terms

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (tfidf_top_terms(df)._jdf.queryExecution().executedPlan()
            .toString())
    assert "collect_list" not in plan and "collect_set" not in plan


def test_build_postings_hand_computed(spark):
    from kgist_spark.operators.search import build_postings

    docs = spark.createDataFrame(
        [(1, "apple banana apple"),
         (2, "banana cherry"),
         (3, "apple banana banana")],
        "doc_id long, text string",
    )
    rows = {r["term"]: r for r in build_postings(docs, min_df=2).collect()}
    # hapax 'cherry' dropped by min_df
    assert set(rows) == {"apple", "banana"}
    a = rows["apple"]
    assert (a["df"], a["cf"], a["n_kept"], a["postings"]) == (2, 3, 2, "1|3")
    b = rows["banana"]
    assert (b["df"], b["cf"], b["n_kept"], b["postings"]) == (3, 4, 3, "1|2|3")


def test_build_postings_cap_keeps_smallest_ids(spark):
    from kgist_spark.operators.search import build_postings

    docs = spark.createDataFrame(
        [(i, "common") for i in range(10)], "doc_id long, text string"
    )
    r = build_postings(docs, max_postings=3, min_df=2).collect()[0]
    # df stays TRUE (10) while the list caps at the 3 smallest ids
    assert (r["df"], r["n_kept"], r["postings"]) == (10, 3, "0|1|2")
