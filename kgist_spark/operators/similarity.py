"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline (JVM-side ``zip_with`` /
``aggregate`` — no UDF), and an LSH-bucketed approximate variant as the
scale path: random-hyperplane signatures narrow candidates to matching
buckets before exact rescoring, turning the O(N) scan into O(N/buckets) per
query at a measured recall.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_to_query(embeddings: DataFrame, query: Sequence[float],
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine similarity of every vector to a constant query vector."""
    q = [float(x) for x in query]
    qn = float(np.sqrt(np.dot(q, q)))
    qcol = F.array(*[F.lit(x).cast("double") for x in q])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # round(…, 5): Spark's F.aggregate and DuckDB's list_dot_product fold the
    # products in different orders, so the raw doubles differ in the last few
    # ulps; 5 decimals masks that while staying far above any real score gap
    # at dim 64.  At much higher dims (more accumulated error, tighter score
    # spacing) revisit the precision before trusting cross-engine compares.
    return embeddings.select(
        F.col(id_col),
        F.round(_dot(v, qcol) / (_norm(v) * F.lit(qn)), 5).alias("cosine"),
    )


def cosine_topk(embeddings: DataFrame, query: Sequence[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine, deterministic tie-break on id
    (TakeOrderedAndProject — the bounded-heap top-k physical op)."""
    return (
        cosine_to_query(embeddings, query, id_col, vec_col)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_signatures(embeddings: DataFrame, n_planes: int = 16, seed: int = 7,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          dim: int | None = None) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of <v, h_i> packed into a long."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []
    for i in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        bits.append(F.when(_dot(v, h) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return embeddings.select(F.col(id_col), sig.cast("long").alias("sig"))


def banded_hyperplane_buckets(embeddings: DataFrame, id_col: str = "vec_id",
                              vec_col: str = "embedding", bits_per_band: int = 8,
                              bands: int = 16, seed: int = 7,
                              dim: int | None = None) -> DataFrame:
    """``(id, vec, band, bucket)`` — banded random-hyperplane LSH.

    ``bands * bits_per_band`` independent hyperplanes; band b's bucket is the
    packed sign pattern of its ``bits_per_band`` planes.  All plane dot
    products for a batch are ONE BLAS GEMM inside a vectorized pandas UDF
    (the plane matrix is a closure constant — bands*bits x dim doubles, a
    few KB); the per-band rows come from a single ``posexplode`` so the
    upstream projection runs once.  Used by the bucketed near-dup kernel
    (:func:`kgist_spark.operators.dedup.embedding_neardup_pairs_lsh`)."""
    from pyspark.sql import types as T

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes_t = rng.randn(bands * bits_per_band, dim).T  # (dim, bands*r)
    n_bands, r = bands, bits_per_band

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def band_buckets(vecs: pd.Series) -> pd.Series:
        import numpy as np

        a = np.array(list(vecs), dtype=np.float64)
        bits = (a @ planes_t) >= 0
        packed = bits.reshape(len(a), n_bands, r) @ (1 << np.arange(r))
        return pd.Series(list(packed.astype(np.int32)))

    return (
        embeddings.select(
            id_col, vec_col, F.posexplode(band_buckets(F.col(vec_col))).alias("band", "bucket")
        )
    )


def ivf_assignments(embeddings: DataFrame, centroids, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: assign each vector to its max-cosine centroid
    (centroids as literal arrays — JVM-side argmax, no UDF)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vn = _norm(v)
    sims = []
    for c in centroids:
        cn = float(np.sqrt(np.dot(c, c))) or 1.0
        carr = F.array(*[F.lit(float(x)) for x in c])
        sims.append(_dot(v, carr) / (vn * F.lit(cn)))
    sim_arr = F.array(*sims)
    return embeddings.select(
        F.col(id_col),
        (F.array_position(sim_arr, F.array_max(sim_arr)) - 1).cast("int").alias("cell"),
    )


def ivf_topk(embeddings: DataFrame, query: Sequence[float], k: int = 10,
             n_centroids: int = 32, n_probe: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k: centroids = the first ``n_centroids`` vectors by
    id (deterministic, sample-based coarse quantizer); the query rescans only
    its ``n_probe`` nearest cells exactly.  At scale the assignment column is
    precomputed/partitioned-by once and queries touch n_probe/n_centroids of
    the data."""
    cents = [
        [float(x) for x in r[vec_col]]
        for r in embeddings.orderBy(id_col).limit(n_centroids).collect()
    ]
    qv = np.array(query, dtype=float)
    sims = [
        float(np.dot(qv, c) / ((np.linalg.norm(qv) * np.linalg.norm(c)) or 1.0))
        for c in cents
    ]
    probe = sorted(range(len(cents)), key=lambda i: -sims[i])[:n_probe]
    assign = ivf_assignments(embeddings, cents, id_col, vec_col)
    cand = assign.where(F.col("cell").isin(probe)).select(id_col)
    # LEFT SEMI, no forced hint: the candidate set is n_probe/n_centroids
    # of the CORPUS (25% at the defaults) — a forced broadcast caps the
    # operator at the broadcast limit on exactly the large inputs ANN
    # exists for.  Unhinted, AQE still picks a broadcast join while the
    # probed cells fit and falls back to a shuffled semi join when they
    # don't; at real scale the `cell` column is precomputed and the table
    # partitioned by it, so the probe prunes partitions instead.
    subset = embeddings.join(cand, id_col, "leftsemi")
    return cosine_topk(subset, query, k, id_col, vec_col)


def ann_topk(embeddings: DataFrame, query: Sequence[float], k: int = 10,
             n_planes: int = 8, seed: int = 7, probe_hamming: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: restrict the exact rescore to vectors whose
    hyperplane signature is within ``probe_hamming`` bits of the query's."""
    dim = len(query)
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    qsig = 0
    for i in range(n_planes):
        if float(np.dot(planes[i], query)) >= 0:
            qsig |= 1 << i
    sigs = hyperplane_signatures(embeddings, n_planes, seed, id_col, vec_col, dim=dim)
    cand = sigs.where(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    ).select(id_col)
    # same discipline as ivf_topk: the Hamming ball can hold a large
    # corpus fraction (probe_hamming=3 of 8 bits covers ~36% of signature
    # space) — let AQE size the join instead of forcing a broadcast
    subset = embeddings.join(cand, id_col, "leftsemi")
    return cosine_topk(subset, query, k, id_col, vec_col)


#: int8 quantization step: unit-ish embedding components in [-2, 2] map to
#: [-128, 128] and clamp to the symmetric int8 range [-127, 127]
Q8_SCALE = 64.0


def _q8_py(x: float, scale: float = Q8_SCALE) -> int:
    """Round-half-AWAY-from-zero int8 quantization for driver-side (query)
    vectors — matches Spark's and DuckDB's ``round`` semantics, NOT
    Python's ``round`` (banker's half-even), which would de-sync the query
    literal from the corpus-side SQL expression on exact .5 products."""
    import math

    v = x * scale
    q = math.floor(abs(v) + 0.5)
    return int(max(-127, min(127, math.copysign(q, v))))


def q8_expr(vec_col: str, scale: float = Q8_SCALE):
    """``array<long>`` int8-quantized view of a float vector column — the
    same clamp-round expression the SQL oracle builds, element-exact."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.round(x.cast("double") * scale)),
        ).cast("long"),
    )


def quantized_topk(embeddings: DataFrame, query: Sequence[float], k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   scale: float = Q8_SCALE) -> DataFrame:
    """Top-k by INT8-QUANTIZED dot product — the memory-bound rung of the
    ANN family: at 10^12 vectors the float32 corpus is 4x the quantized
    one, and scan-and-score throughput is RAM-bandwidth-bound, so int8
    scoring is how a brute-force pass stays feasible (the standard
    scalar-quantization trick under every production ANN index; recall
    loss vs exact cosine is pinned by pytest, not assumed).

    ``(vec_id, qdot)`` ordered by (qdot desc, id) — every score an exact
    int64 (|q| ≤ 127 so dim 10^5 stays far inside int64), ties broken by
    id: fully deterministic at any parallelism, and the oracle replays
    quantization AND scoring exactly, unlike float cosine where only the
    5-decimal rounding is comparable.  One column-pruned corpus pass, no
    shuffle until the O(k) TakeOrderedAndProject."""
    qq = [_q8_py(float(x), scale) for x in query]
    qlit = F.array(*[F.lit(v).cast("long") for v in qq])
    qdot = F.aggregate(
        F.zip_with(q8_expr(vec_col, scale), qlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        embeddings.select(F.col(id_col), qdot.alias("qdot"))
        .orderBy(F.col("qdot").desc(), F.col(id_col))
        .limit(k)
    )
