"""HyperLogLog sketch: accuracy bands, parallelism invariance, and the
register-level Python replay (the DuckDB oracle parity itself runs in
tests/test_entry_contract.py like every query)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.sketch import HLL_P, _consts, _lc_table, hll_distinct

pytestmark = pytest.mark.spark


def _py_hll(values, p=HLL_P):
    """Independent register-level replay straight from the definition."""
    m, maxrho, num = _consts(p)
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        j, w = h % m, h // m
        rho = maxrho - (w.bit_length() if w else 0)
        regs[j] = max(regs.get(j, 0), rho)
    s = sum(1 << (maxrho - mj) for mj in regs.values())
    s += (m - len(regs)) * (1 << maxrho)
    raw = int(num / s)
    v_empty = m - len(regs)
    if v_empty > 0 and raw <= (5 * m) // 2:
        return dict(_lc_table(p))[v_empty]
    return raw


def _spark_est(spark, values, parallelism=8):
    df = spark.createDataFrame(
        [(v,) for v in values], "v string"
    ).repartition(parallelism)
    row = hll_distinct(df.withColumn("g", F.lit(1)), ["g"], "v").collect()[0]
    return row["n_distinct_hll"]


def test_hll_matches_python_replay_small_and_large(spark):
    # small range exercises the linear-counting branch, large the raw one
    for n in (50, 400, 20_000):
        vals = [f"v{i}" for i in range(n)]
        assert _spark_est(spark, vals) == _py_hll(vals)


def test_hll_accuracy_bands(spark):
    # corrected small range is tight; raw large range within ~4 stderr
    # (1.04/sqrt(1024) = 3.25 %)
    for n, tol in ((150, 0.05), (1_000, 0.08), (50_000, 0.13)):
        est = _spark_est(spark, [f"u{i}" for i in range(n)])
        assert abs(est - n) / n < tol, (n, est)


def test_hll_invariant_to_parallelism_and_duplicates(spark):
    vals = [f"k{i}" for i in range(3_000)]
    a = _spark_est(spark, vals, parallelism=2)
    b = _spark_est(spark, vals * 3, parallelism=16)  # duplicates are free
    assert a == b


def test_hll_groups_independent(spark):
    # register state must key on the group: a huge group next to a tiny
    # one cannot inflate the tiny one's estimate
    rows = [("big", f"b{i}") for i in range(10_000)] + [
        ("tiny", f"t{i}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["g"]: r["n_distinct_hll"] for r in
           hll_distinct(df, ["g"], "v").collect()}
    assert abs(got["big"] - 10_000) / 10_000 < 0.13
    assert abs(got["tiny"] - 20) <= 2


def test_hll_estimate_is_single_projection(spark):
    # the estimate must come from the aggregates + the broadcast lc table —
    # never a second scan of the input or a collect
    df = spark.createDataFrame([(f"v{i}",) for i in range(100)], "v string")
    plan = (hll_distinct(df.withColumn("g", F.lit(1)), ["g"], "v")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan ExistingRDD") <= 2  # input + 1024-row lc table


# ---------------------------------------------------------------------------
# Bloom filter (bloom_build / bloom_maybe_contains / bloom_ngram_decontaminate)


def test_bloom_no_false_negatives(spark):
    from kgist_spark.operators.sketch import bloom_build, bloom_maybe_contains

    vals = [(f"val{i}",) for i in range(500)]
    df = spark.createDataFrame(vals, "v string")
    bloom = bloom_build(df, "v")
    got = bloom_maybe_contains(bloom, df, "v").where(~F.col("maybe_hit"))
    assert got.count() == 0  # every inserted value MUST test positive


def test_bloom_absent_values_not_flagged(spark):
    # at n=500 / m=2^18 / k=4 the FP rate is ~1e-11 per probe; these fixed
    # probes are deterministic, so this pins both the math and the seeds
    from kgist_spark.operators.sketch import bloom_build, bloom_maybe_contains

    ins = spark.createDataFrame([(f"val{i}",) for i in range(500)], "v string")
    probes = spark.createDataFrame(
        [(f"absent{i}",) for i in range(200)], "v string")
    bloom = bloom_build(ins, "v")
    hits = bloom_maybe_contains(bloom, probes, "v").where("maybe_hit")
    assert hits.count() == 0


def test_bloom_merge_is_word_or(spark):
    # filter(A ∪ B) == OR-merge of filter(A) and filter(B): the property the
    # streaming fold and per-partition pre-builds rely on
    from kgist_spark.operators.sketch import bloom_build

    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], "v string")
    whole = {(r["word_idx"], r["bits"])
             for r in bloom_build(a.unionAll(b), "v").collect()}
    merged = {
        (r["word_idx"], r["bits"])
        for r in (
            bloom_build(a, "v").unionAll(bloom_build(b, "v"))
            .groupBy("word_idx").agg(F.expr("bit_or(bits)").alias("bits"))
        ).collect()
    }
    assert whole == merged


def test_bloom_decontaminate_superset_of_exact(spark):
    # bloom flags ⊇ exact flags (never a false negative), counts bound below
    from kgist_spark.operators.sketch import bloom_ngram_decontaminate
    from kgist_spark.operators.text import ngram_decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, bench_text, "corpus"),                      # fully contaminated
        (2, "one two three four five six seven", "corpus"),  # clean
        (3, "alpha beta gamma delta epsilon nine ten", "corpus"),  # 1 gram
        (4, "short", "corpus"),                         # gram-less
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = spark.createDataFrame([(9, bench_text, "bench")],
                                  "doc_id long, text string, source string")
    exact = {r["doc_id"]: r for r in
             ngram_decontaminate(docs, bench, n=5).collect()}
    fuzzy = {r["doc_id"]: r for r in
             bloom_ngram_decontaminate(docs, bench, n=5).collect()}
    assert set(exact) == set(fuzzy) == {1, 2, 3, 4}
    for d in exact:
        assert fuzzy[d]["n_doc_grams"] == exact[d]["n_doc_grams"]
        assert fuzzy[d]["n_maybe_hits"] >= exact[d]["n_hits"]
        if exact[d]["contaminated"]:
            assert fuzzy[d]["flagged"]
    # and at this tiny scale the FP rate is ~0, so they agree exactly
    assert {d: fuzzy[d]["flagged"] for d in fuzzy} == \
        {d: exact[d]["contaminated"] for d in exact}


def test_bloom_probe_build_side_is_broadcast(spark):
    # the word table must reach the probe side as a broadcast — never a
    # shuffled join (the operator's entire 100-TB story)
    from kgist_spark.operators.sketch import bloom_build, bloom_maybe_contains

    ins = spark.createDataFrame([(f"x{i}",) for i in range(100)], "v string")
    probes = spark.createDataFrame([(f"y{i}",) for i in range(100)], "v string")
    plan = (bloom_maybe_contains(bloom_build(ins, "v"), probes, "v")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
