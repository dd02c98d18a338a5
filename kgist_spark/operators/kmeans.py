"""Fixed-point Lloyd k-means over embedding columns + SemDeDup-style
semantic dedup (intra-cluster cosine pruning).

No reference counterpart (`/root/reference/` has no vector stage); this is
the clustering leg of the dedup/ANN family: k-means buckets the corpus into
semantically coherent cells, and near-duplicate PAIRS are then searched
only WITHIN a cell — the SemDeDup recipe (Abbas et al. 2023): at web scale
``k`` grows with the corpus (k ≈ n / target_cell_size), so per-cell work
stays O((n/k)²) bounded and the all-pairs O(n²) never materializes.

Determinism discipline (the PageRank/lm_score class — bit-identical at any
parallelism AND replayable in ANSI SQL):

* Every centroid coordinate lives in **positive fixed-point offset space**:
  ``fp(x) = cast(round(x * 1e6) as long) + 2^21``.  The offset keeps every
  operand positive, so Spark's truncating ``div`` and DuckDB's ``//`` agree
  (floor == trunc for positives — the exact trap the PageRank oracle
  documents), and it cancels in every distance: (a+o)-(b+o) = a-b.
* Assignment = argmin of INTEGER squared distances, ties to the smaller
  cluster id (lexicographic ``struct(dist, cid)`` min) — no float order
  anywhere, so reassignment is reproducible row-by-row.
* Centroid update = per-dimension ``sum div count`` on longs — integer
  addition commutes, so partition order cannot change the result (a float
  mean here would drift between engines and between runs).
* Iteration count is FIXED (no convergence float test); the DuckDB oracle
  unrolls it as chained CTEs exactly like ``pagerank_oracle_sql``.

Scale shape: each assignment pass is ONE in-row projection against k
literal centroid arrays (zero shuffle — the IVF pattern); each update is
one posexplode + grouped integer aggregation (k × dim result rows, a few
KB collected to the driver per iteration).  Bounds: |x| ≤ 2 pre-scale
(offset dominance), cluster size ≤ ~3e12 rows (sum fits int64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: micro-units per 1.0 of embedding value
KM_SCALE = 1_000_000
#: added to every scaled component so all fixed-point operands are positive
KM_OFFSET = 1 << 21


def _fp(vec_col: str):
    """array<float> -> array<long> in positive fixed-point offset space."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * KM_SCALE).cast("long")
        + F.lit(KM_OFFSET).cast("long"),
    )


def _assign(fp_df: DataFrame, cents: list) -> DataFrame:
    """Add ``cluster`` = argmin integer squared distance to the literal
    centroids (ties to the smaller cid — lexicographic struct min).  One
    in-row projection, built as a SINGLE generated SQL expression: the
    equivalent Column-algebra construction costs one py4j round trip per
    literal (k × dim of them) and measured ~2 s PER ITERATION at k=8,
    dim=64 before any row was touched; one expr string parses JVM-side in
    milliseconds."""
    parts = []
    for cid, c in enumerate(cents):
        arr = ",".join(f"{int(v)}L" for v in c)
        parts.append(
            f"named_struct('dist', aggregate(zip_with(e, array({arr}),"
            f" (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x),"
            f" 'cid', {cid})"
        )
    return fp_df.withColumn(
        "cluster", F.expr(f"array_min(array({','.join(parts)})).cid")
    )


def kmeans_fit(embeddings: DataFrame, k: int = 8, n_iter: int = 3,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Run ``n_iter`` fixed-point Lloyd iterations; returns
    ``(assignments_df, centroids)`` where assignments are
    ``(id_col, cluster)`` under the FINAL centroids and ``centroids`` is a
    ``k × dim`` list of offset-space longs.

    Init: the embeddings of the ``k`` smallest ids (deterministic and
    trivially SQL-replayable; quality-sensitive users pass more iterations
    or a larger k — the engine contract here is reproducibility)."""
    fp = embeddings.select(F.col(id_col), _fp(vec_col).alias("e")).localCheckpoint()
    cents = [
        [int(v) for v in r["e"]]
        for r in fp.orderBy(id_col).limit(k).collect()
    ]
    k = len(cents)  # a corpus smaller than k seeds fewer cells
    for _ in range(n_iter):
        assigned = _assign(fp, cents)
        rows = (
            assigned.select("cluster", F.posexplode("e").alias("d", "v"))
            .groupBy("cluster", "d")
            .agg(F.expr("sum(v) div count(*)").alias("m"))
            .collect()
        )
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], {})[r["d"]] = r["m"]
        cents = [
            [dims[d] for d in sorted(dims)] if (dims := by_cluster.get(cid))
            else cents[cid]  # empty cluster keeps its previous centroid
            for cid in range(k)
        ]
    return _assign(fp, cents).select(F.col(id_col), "cluster"), cents


def semdedup_pairs(embeddings: DataFrame, k: int = 8, n_iter: int = 3,
                   threshold: float = 0.4, id_col: str = "vec_id",
                   vec_col: str = "embedding", max_cell: int = 100_000,
                   drop_stats=None) -> DataFrame:
    """SemDeDup: exact-cosine near-duplicate pairs restricted to k-means
    cells — ``(a, b, cluster, cosine)`` with cosine rounded to 5 decimals
    and ``a < b``.  The cell equi-join is the blocking structure: per-cell
    candidate volume is O((n/k)²) and the cosine runs JVM-side on the
    joined rows (same expression class as ``cosine_topk``, whose oracle
    parity pins the rounding).

    ``max_cell`` guards the same quadratic hazard every capped LSH path
    guards: a degenerate cell (a near-constant embedding region, or a k
    chosen far too small for the corpus) would make the self-join emit
    O(cell²) rows from one key.  Over-cap cells are excluded BEFORE the
    join (two-phase — sizes first, never a collect of members) and the
    loss is counted on ``drop_stats`` (an ``Observation``; readable after
    the first action with zero extra jobs — no silent caps)."""
    from kgist_spark.operators.similarity import _dot, _norm

    assigned, _ = kmeans_fit(embeddings, k=k, n_iter=n_iter,
                             id_col=id_col, vec_col=vec_col)
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("cell_n"))
    if drop_stats is not None:
        # one row per cell here, so plain sums count the drops (observed
        # metrics reject distinct aggregates)
        over = F.col("cell_n") > max_cell
        sizes = sizes.observe(
            drop_stats,
            F.coalesce(F.sum(over.cast("long")), F.lit(0)).alias("dropped_cells"),
            F.coalesce(
                F.sum(F.when(over, F.col("cell_n")).otherwise(0)), F.lit(0)
            ).alias("dropped_ids"),
        ).localCheckpoint()
        # ^ the eager checkpoint (a k-row job) fires the observation
        # unconditionally: left inside the pair query, AQE's empty-relation
        # propagation ELIMINATES the observe node whenever the capped join
        # comes back empty — losing the metric exactly when everything was
        # dropped.  The join below reuses the materialized sizes.
    assigned = assigned.join(sizes, "cluster").where(F.col("cell_n") <= max_cell)
    side = embeddings.join(assigned, id_col).select(
        F.col(id_col), F.col("cluster"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a = side.select(F.col(id_col).alias("a"), "cluster", F.col("v").alias("va"))
    b = side.select(F.col(id_col).alias("b"),
                    F.col("cluster").alias("cluster_b"), F.col("v").alias("vb"))
    cos = F.round(
        _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))),
        5,
    )
    return (
        a.join(b, (F.col("cluster") == F.col("cluster_b")) & (F.col("a") < F.col("b")))
        .select("a", "b", "cluster", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
