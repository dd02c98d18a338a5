"""X4 — connected components over an edge DataFrame (union-find at scale).

Min-label propagation with a driver-controlled fixpoint loop: every node
repeatedly adopts the smallest component id among itself and its neighbors.
Converges in O(component diameter) rounds — similarity graphs from blocking
have tiny diameters (near-cliques), so 3-5 rounds is typical.  Each round is
one join + one aggregation; ``localCheckpoint`` cuts the lineage so plans
don't grow across iterations (the classic iterative-DataFrame pitfall).

For pathological high-diameter graphs the alternating large-star/small-star
algorithm (Kiveris et al.) halves diameters per round; ``max_iter`` plus the
convergence counter make termination explicit either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "a", dst: str = "b",
                         max_iter: int = 50, checkpoint_every: int = 1,
                         driver_threshold: int = 200_000) -> DataFrame:
    """``(node, component)`` where component = min node id in the component
    (a total order over the node id type is assumed: string or numeric).

    :edges: undirected edge list; self-loops/duplicates tolerated.
    :driver_threshold: pair sets at or below this size run classic union-find
        on the driver in one collect (the same size-based physical-strategy
        choice Catalyst makes for broadcast joins: a fixpoint of distributed
        jobs over a few thousand rows is pure scheduling overhead).  Larger
        inputs take the distributed min-label-propagation loop.  Both paths
        produce identical output and both are covered by tests.
    """
    sym = (
        # both directions from one exploded scan (a union of two projections
        # would execute the upstream pair computation twice)
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    )
    if driver_threshold:
        # cheap bounded probe BEFORE deciding whether to persist — a plain
        # count() would pay a full job, and persisting up front leaks the
        # cache for the session when the distributed path is taken
        probe = sym.limit(driver_threshold + 1).count()
        if probe <= driver_threshold:
            pairs = [(r["u"], r["v"]) for r in sym.collect()]
            id_type = sym.schema["u"].dataType
            return _driver_components(edges.sparkSession, pairs, id_type)
    # the fixpoint loop re-reads sym every round — persist for its duration
    sym = sym.persist()
    try:
        comp = (
            sym.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
        ).localCheckpoint()

        for i in range(max_iter):
            # every node pulls the min component over its neighborhood
            neighbor_comp = (
                sym.join(comp.withColumnRenamed("node", "v"), "v")
                .select(F.col("u").alias("node"), "component")
            )
            new_comp = (
                comp.unionByName(neighbor_comp)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
            if (i + 1) % checkpoint_every == 0:
                new_comp = new_comp.localCheckpoint()
            changed = (
                new_comp.alias("n")
                .join(comp.alias("o"), "node")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            comp = new_comp
            if changed == 0:
                break
        return comp
    finally:
        sym.unpersist()


def _driver_components(spark, pairs, id_type):
    """Path-compressed union-find over a collected pair list; component id =
    min member (same contract as the distributed loop)."""
    from pyspark.sql import types as T
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            # keep the smaller id as the root so roots ARE the component ids
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    nodes = {n for p in pairs for n in p}
    rows = [(n, find(n)) for n in sorted(nodes)]
    schema = T.StructType(
        [T.StructField("node", id_type), T.StructField("component", id_type)]
    )
    return spark.createDataFrame(rows, schema)
