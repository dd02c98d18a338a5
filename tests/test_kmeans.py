"""Fixed-point k-means + SemDeDup (operators/kmeans.py).

Engine parity with DuckDB (bit-exact assignment + pair hashes at
sf0.001/sf0.01) is pinned by tests/test_entry_contract.py
(``embedding_kmeans`` / ``semdedup_pairs``); this file pins the operator's
own guarantees: recovery of separable structure, determinism, empty-cluster
centroid retention, and that SemDeDup returns EXACTLY the brute-force
near-dup pairs whose endpoints share a cell.
"""

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.kmeans import (
    KM_OFFSET, KM_SCALE, kmeans_fit, semdedup_pairs,
)

pytestmark = pytest.mark.spark


def _blob_rows():
    """Three well-separated 4-d blobs, 8 points each; under the md5-spread
    init the 3 smallest-md5 ids (6, 19, 23) land one per blob."""
    centers = [(10.0, 0.0, 0.0, 0.0), (0.0, 10.0, 0.0, 0.0), (0.0, 0.0, 10.0, 0.0)]
    rows = []
    for i in range(8):
        for b, c in enumerate(centers):
            # deterministic small jitter, distinct per point
            jit = [((i * 7 + d * 3 + b) % 5 - 2) * 0.05 for d in range(4)]
            rows.append((i * 3 + b, [c[d] + jit[d] for d in range(4)], b))
    return rows


@pytest.fixture(scope="module")
def blobs(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], b) for i, v, b in _blob_rows()],
        "vec_id long, embedding array<float>, blob int",
    )


def test_recovers_separable_blobs(blobs):
    assigned, cents = kmeans_fit(blobs, k=3, n_iter=3)
    got = assigned.join(blobs.select("vec_id", "blob"), "vec_id")
    # every blob maps to exactly one cluster and vice versa
    m = got.groupBy("blob").agg(F.countDistinct("cluster").alias("k")).collect()
    assert all(r["k"] == 1 for r in m)
    assert got.select("cluster").distinct().count() == 3
    assert len(cents) == 3 and all(len(c) == 4 for c in cents)


def test_deterministic_rerun(blobs):
    a1, c1 = kmeans_fit(blobs, k=3, n_iter=2)
    a2, c2 = kmeans_fit(blobs, k=3, n_iter=2)
    assert c1 == c2
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_centroids_are_offset_space_ints(blobs):
    _, cents = kmeans_fit(blobs, k=3, n_iter=1)
    for c in cents:
        assert all(isinstance(v, int) for v in c)
        # blob coordinates are in [-0.2, 10.2]: offset keeps all positive
        assert all(0 < v < 2 * KM_OFFSET + 11 * KM_SCALE for v in c)


def test_empty_cluster_keeps_previous_centroid(spark):
    # two identical points, k=2: cluster 1 loses every point after the
    # first update (ties assign to cid 0) and must keep its centroid
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    assigned, cents = kmeans_fit(df, k=2, n_iter=3)
    assert [r["cluster"] for r in assigned.orderBy("vec_id").collect()] == [0, 0]
    assert len(cents) == 2  # no crash, both centroids present


def test_k_larger_than_corpus(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    assigned, cents = kmeans_fit(df, k=8, n_iter=2)
    assert len(cents) == 2  # seeds clamp to the corpus size
    assert assigned.count() == 2


def test_semdedup_equals_in_cell_brute_force(blobs):
    got = {(r["a"], r["b"]) for r in
           semdedup_pairs(blobs, k=3, n_iter=3, threshold=0.9).collect()}
    assigned, _ = kmeans_fit(blobs, k=3, n_iter=3)
    cell = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    rows = {r[0]: r[1] for r in _blob_rows()}

    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        nu = sum(a * a for a in u) ** 0.5
        nv = sum(a * a for a in v) ** 0.5
        return round(d / (nu * nv), 5)

    want = {
        (a, b)
        for a in rows for b in rows
        if a < b and cell[a] == cell[b] and cos(rows[a], rows[b]) >= 0.9
    }
    assert got == want and got  # exact set equality, non-empty


def test_table_path_bit_equals_literal_path(blobs):
    """The large-k (broadcast centroid TABLE) path must produce byte-for-byte
    the same assignments and centroids as the literal path: same seeds, same
    offset-space integer arithmetic, same struct-min tie-break."""
    a_lit, c_lit = kmeans_fit(blobs, k=3, n_iter=3)
    a_tab, c_tab = kmeans_fit(blobs, k=3, n_iter=3, large_k_gate=0)
    assert c_lit == c_tab
    assert sorted(map(tuple, a_lit.collect())) == sorted(map(tuple, a_tab.collect()))


def test_large_k_plan_is_constant_size(spark):
    """At k=512 the assignment plan must carry the centroids as DATA: no
    fixed-point literal in the plan and a plan-string size that does not
    grow with k (the literal path at k=64 is already an order of magnitude
    larger).  This pins the parser/codegen blowup fix: k ≈ n/cell_size at
    web scale means ~1e7 literals in one expression on the old path."""
    import re

    n, dim = 600, 8
    df = spark.createDataFrame(
        [(i, [((i * 31 + d * 7) % 400 - 200) / 100.0 for d in range(dim)])
         for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    assigned, cents = kmeans_fit(df, k=512, n_iter=2)
    plan = assigned._jdf.queryExecution().analyzed().toString()
    # no offset-space centroid literal (all are 7-digit-plus longs) ...
    assert not re.findall(r"\d{7,}", plan)
    # ... and the whole plan stays small regardless of k
    assert len(plan) < 5_000
    assert len(cents) == 512 and len(cents[0]) == dim
    # the gated literal path at a FRACTION of that k is already far bigger
    lit_plan = kmeans_fit(df, k=64, n_iter=1)[0]._jdf.queryExecution()
    assert len(plan) < len(lit_plan.analyzed().toString()) / 2


def test_semdedup_paths_agree(blobs):
    """semdedup_pairs under the table path returns the identical pair set."""
    base = {tuple(r) for r in
            semdedup_pairs(blobs, k=3, n_iter=3, threshold=0.9).collect()}
    tab = {tuple(r) for r in
           semdedup_pairs(blobs, k=3, n_iter=3, threshold=0.9,
                          large_k_gate=0).collect()}
    assert base == tab and base


def test_hash_spread_seeding_survives_degenerate_table_head(spark):
    """A constant boilerplate region holding the SMALLEST ids (a sorted
    web-corpus reality) must not collapse the cells: a first-k init would
    take k identical seeds there (one effective cell); the md5-spread init
    draws from the whole table.  Both paths, same corpus."""
    dim = 4
    rows = [(i, [0.5] * dim) for i in range(8)]  # degenerate head, ids 0-7
    for b in range(4):                            # 4 separated blobs behind it
        for j in range(10):
            v = [0.0] * dim
            v[b] = 1.5 + (j % 3) * 0.01
            rows.append((8 + b * 10 + j, v))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    for gate in (256, 0):  # literal and table paths
        assigned, _ = kmeans_fit(df, k=4, n_iter=3, large_k_gate=gate)
        sizes = [r["n"] for r in assigned.groupBy("cluster")
                 .agg(F.count("*").alias("n")).collect()]
        assert len(sizes) >= 3  # cells did not collapse to one
        assert max(sizes) <= 30  # no single cell swallowed the corpus


def test_fp_bound_is_enforced(spark):
    """x below KM_MIN_X must raise, not silently de-sync the cross-engine
    fixed-point parity (Spark div truncates, DuckDB // floors — they only
    agree while every operand stays positive)."""
    df = spark.createDataFrame(
        [(0, [-3.0, 0.0]), (1, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="out of range"):
        kmeans_fit(df, k=1, n_iter=1)[0].collect()
    big = spark.createDataFrame(
        [(0, [2000.0, 0.0])], "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="out of range"):
        kmeans_fit(big, k=1, n_iter=1)[0].collect()


def test_fp_upper_bound_is_dim_aware(spark):
    """The int64 ceiling must shrink with dimension: the assignment sums
    `dim` squared operand diffs, so a flat per-element cap that admits
    x=500 at dim=2 would let a 64-dim input wrap the distance accumulator
    silently (Spark long arithmetic is non-ANSI) while DuckDB raises —
    the exact cross-engine de-sync the guard exists to prevent."""
    ok_2d = spark.createDataFrame(
        [(0, [500.0, 0.0]), (1, [0.0, 500.0])],
        "vec_id long, embedding array<float>",
    )
    # dim=2 admits |x| up to ~1412: this must fit
    assigned, _ = kmeans_fit(ok_2d, k=1, n_iter=1)
    assert assigned.count() == 2
    bad_64d = spark.createDataFrame(
        [(0, [500.0] * 64), (1, [0.0] * 64)],
        "vec_id long, embedding array<float>",
    )
    # dim=64 caps |x| at ~248: 500 would overflow sum((a-b)^2) over 64 dims
    with pytest.raises(Exception, match="out of range"):
        kmeans_fit(bad_64d, k=1, n_iter=1)[0].collect()


def test_semdedup_keep_best_keeps_farthest_from_centroid(blobs):
    """SemDeDup keeper rule: within each duplicate component the member
    FARTHEST (integer offset-space distance) from its cell centroid
    survives; everyone else maps to it; non-members keep themselves."""
    from kgist_spark.operators.kmeans import (
        _fp, semdedup_keep_best, semdedup_pairs,
    )

    table = {r["vec_id"]: r for r in
             semdedup_keep_best(blobs, k=3, n_iter=3, threshold=0.9).collect()}
    assert set(table) == {r[0] for r in _blob_rows()}
    # recompute the expected keeper per component from first principles
    pairs = semdedup_pairs(blobs, k=3, n_iter=3, threshold=0.9).collect()
    assigned, cents = kmeans_fit(blobs, k=3, n_iter=3)
    cell = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    fpv = {r["vec_id"]: list(r["e"])
           for r in blobs.select("vec_id", _fp("embedding").alias("e")).collect()}
    # union-find over the pairs
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for v in list(parent):
        comps.setdefault(find(v), set()).add(v)
    n_dups = 0
    for comp in comps.values():
        def cdist(v):
            c = cents[cell[v]]
            return sum((a - b) * (a - b) for a, b in zip(fpv[v], c))
        best = min(comp, key=lambda v: (-cdist(v), v))
        for v in comp:
            assert table[v]["keep_id"] == best
            assert table[v]["is_dup"] == (v != best)
            n_dups += v != best
    assert n_dups > 0  # the fixture really exercises the rule
    members = set().union(*comps.values()) if comps else set()
    for v in set(table) - members:
        assert table[v]["keep_id"] == v and not table[v]["is_dup"]


def test_semdedup_cell_cap_drops_are_observed(blobs, spark):
    from pyspark.sql import Observation

    obs = Observation()
    # cap below the blob size (8): every cell is over-cap -> zero pairs,
    # and the observation reports exactly what was dropped
    out = semdedup_pairs(blobs, k=3, n_iter=3, threshold=0.9,
                         max_cell=4, drop_stats=obs)
    assert out.count() == 0
    got = dict(obs.get)
    assert got["dropped_cells"] == 3 and got["dropped_ids"] == 24
    # generous cap: nothing dropped, pairs return
    obs2 = Observation()
    out2 = semdedup_pairs(blobs, k=3, n_iter=3, threshold=0.9,
                          max_cell=100, drop_stats=obs2)
    assert out2.count() > 0
    assert dict(obs2.get)["dropped_cells"] == 0


def test_precomputed_centroids_reproduce_fit(blobs):
    """Passing a fit's returned centroids back runs ZERO iterations and
    reproduces the identical assignment — in both the literal (small-k)
    and table (large-k) regimes.  This is the fit-once/reuse-everywhere
    production path the semantic-dedup query family shares."""
    a_fit, cents = kmeans_fit(blobs, k=3, n_iter=3)
    want = sorted(map(tuple, a_fit.collect()))
    for gate in (256, 1):  # literal path, then force the table path
        a_re, c_re = kmeans_fit(blobs, k=3, n_iter=3, centroids=cents,
                                large_k_gate=gate)
        assert c_re == cents
        assert sorted(map(tuple, a_re.collect())) == want


def test_precomputed_centroids_semdedup_agrees(blobs):
    from kgist_spark.operators.kmeans import semdedup_keep_best, semdedup_keep_table

    _, cents = kmeans_fit(blobs, k=3, n_iter=3)
    for fn in (semdedup_pairs, semdedup_keep_table, semdedup_keep_best):
        fresh = sorted(map(tuple, fn(blobs, k=3, n_iter=3, threshold=0.4).collect()))
        reused = sorted(map(tuple, fn(blobs, k=3, n_iter=3, threshold=0.4,
                                      centroids=cents).collect()))
        assert fresh == reused
