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
                         max_iter: int = 50, checkpoint_every: int = 1) -> DataFrame:
    """``(node, component)`` where component = min node id in the component
    (a total order over the node id type is assumed: string or numeric).

    :edges: undirected edge list; self-loops/duplicates tolerated.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    )
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
