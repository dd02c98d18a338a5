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
