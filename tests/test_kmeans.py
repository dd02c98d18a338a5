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
    """Three well-separated 4-d blobs, 8 points each; ids interleaved so
    the first-k init picks one seed per blob."""
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
