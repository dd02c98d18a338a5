"""Distributed dictionary encoding (idify) with the reference's exact id
assignment order (GemsLab/KGist ``graph.py:57-122``):

* **nodes** — labels-file line order first (``graph.py:72-76``), then
  first-seen edge order, subject before object within an edge
  (``graph.py:107-117``);
* **predicates** — first-seen edge order (``graph.py:118-122``);
* **labels** — first-seen order scanning the labels file left to right
  (``graph.py:81-86``).

Each dictionary is ``row_number()`` over the per-key MINIMUM of a packed
first-seen sort key — never ``monotonically_increasing_id`` (partition-
dependent).  The dictionaries are dimension-sized, so the window sort is a
one-time cost and every application is a broadcast join.

Scale contract: idify exists to replay the REFERENCE's sequential-id
semantics (a global first-seen total order), which is what its fixtures
and the full-NELL parity suite exercise — summarization-input scale, not
corpus scale.  The global order makes a total sort and the broadcast-
dictionary joins inherent to the semantics; a corpus-scale KG keeps its
string vocabulary (the engine's operators never require integer ids) and
idify is simply not on that path.

Why this matters beyond shuffle width: the reference CLI defaults to
idify=True, so exact greedy TIE-BREAKS compare integer ids.  Running the
delta-mode greedy over idified tables reproduces the reference's
decision-for-decision ranking vocabulary (see
``tests/test_greedy_delta_nell.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: edge-derived first-seen keys sort after every labels-file key
_EDGE_OFFSET = 1 << 44


def node_dictionary(triples: DataFrame, labels: DataFrame) -> DataFrame:
    """``(node, node_id)`` — labels-file order, then (eid, subj-before-obj)."""
    from_labels = labels.select("node", (F.col("line_no") * 2).alias("k"))
    from_edges = triples.select(
        F.explode(
            F.array(
                F.struct(F.col("subj").alias("node"),
                         (F.lit(_EDGE_OFFSET) + F.col("eid") * 2).alias("k")),
                F.struct(F.col("obj").alias("node"),
                         (F.lit(_EDGE_OFFSET) + F.col("eid") * 2 + 1).alias("k")),
            )
        ).alias("p")
    ).select("p.node", "p.k")
    first_seen = (
        from_labels.unionByName(from_edges).groupBy("node").agg(F.min("k").alias("k"))
    )
    return first_seen.select(
        "node",
        (F.row_number().over(Window.orderBy("k")) - 1).cast("long").alias("node_id"),
    )


def pred_dictionary(triples: DataFrame) -> DataFrame:
    """``(pred, pred_id)`` — first-seen edge order."""
    first_seen = triples.groupBy("pred").agg(F.min("eid").alias("k"))
    return first_seen.select(
        "pred",
        (F.row_number().over(Window.orderBy("k")) - 1).cast("long").alias("pred_id"),
    )


def label_dictionary(labels_flat: DataFrame) -> DataFrame:
    """``(label, label_id)`` — labels-file scan order (line, then position)."""
    first_seen = (
        labels_flat.where(F.col("label").isNotNull())
        .groupBy("label")
        .agg(F.min(F.col("line_no") * 1048576 + F.col("pos")).alias("k"))
    )
    return first_seen.select(
        "label",
        (F.row_number().over(Window.orderBy("k")) - 1).cast("long").alias("label_id"),
    )


def idify_tables(triples: DataFrame, labels: DataFrame, labels_flat: DataFrame):
    """Dictionary-encode (triples, labels_flat) into the integer vocabulary.

    Returns ``(triples_id, labels_flat_id, dicts)`` where ``dicts`` maps
    ``{"node": DataFrame, "pred": DataFrame, "label": DataFrame}``.  All
    joins broadcast the dictionaries (dimension side)."""
    nd = node_dictionary(triples, labels).persist()
    pdct = pred_dictionary(triples)
    ld = label_dictionary(labels_flat)

    triples_id = (
        triples.join(
            F.broadcast(nd).withColumnRenamed("node", "subj"), "subj"
        )
        .withColumnRenamed("node_id", "subj_id")
        .join(F.broadcast(nd).withColumnRenamed("node", "obj"), "obj")
        .withColumnRenamed("node_id", "obj_id")
        .join(F.broadcast(pdct), "pred")
        .select(
            F.col("subj_id").alias("subj"),
            F.col("pred_id").alias("pred"),
            F.col("obj_id").alias("obj"),
            "eid",
        )
    )
    labels_flat_id = (
        labels_flat.join(F.broadcast(nd), "node")
        .join(F.broadcast(ld), "label")
        .select(
            F.col("node_id").alias("node"),
            F.col("label_id").alias("label"),
            "pos",
            "line_no",
        )
    )
    return triples_id, labels_flat_id, {"node": nd, "pred": pdct, "label": ld}
