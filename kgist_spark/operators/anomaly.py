"""Distributed batch anomaly scoring (Q1/Q2 at scale).

Scores EVERY edge of a triples table against a fitted model in one shot,
reproducing the reference's per-edge semantics (GemsLab/KGist
``anomaly_detector.py:40-83``) as joins + one aggregation:

    score(s, p, o) = [eid not covered] · L(A-)/(m - |covered|)
                   + blame(s, p) + blame(o, p)

    blame(n, p) = Σ over rules g with root(g) ⊆ labels(n), p ∈ preds(g),
                  n ∉ heads(g) of  L_binom(assertions, exceptions)/exceptions

The model-side tables (rule roots / preds / heads / per-exception bits) are
tiny (O(|rules|·avg heads)) and broadcast; the applicability test
"root(g) ⊆ labels(n)" is a join + group-by-having count == |root| — the
powerset loop of the reference collapses into a subset check.  Ranking =
``orderBy(desc(score))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgist_spark.functions.ir import RuleTree
from kgist_spark.oracle.anomaly import AnomalyScorer
from kgist_spark.oracle.engine import SummaryModel


def _destring(index, value):
    """Map an idified node/pred back to its source string (identity if raw)."""
    return value


def model_blame_tables(spark: SparkSession, model: SummaryModel):
    """Build the broadcastable model-side tables, in the source (string)
    vocabulary regardless of idify.  Returns (roots, preds, heads, stats)."""
    index = model.index
    scorer = AnomalyScorer(model)

    to_label = (lambda l: index.id_to_label[l]) if index.idify else (lambda l: l)
    to_pred = (lambda p: index.id_to_pred[p]) if index.idify else (lambda p: p)
    to_node = (lambda n: index.id_to_node[n]) if index.idify else (lambda n: n)

    roots, preds, heads, stats = [], [], [], []
    for rid, rule in enumerate(model.rules):
        root = rule.root if isinstance(rule, RuleTree) else rule[0]
        n_assert, n_exc, bits = scorer.rule_exception_bits(rule)
        stats.append((rid, len(root), bits / n_exc if n_exc else 0.0))
        for idx, label in enumerate(root):
            roots.append((rid, to_label(label), idx))
        for p in scorer._rule_preds(rule):
            preds.append((rid, to_pred(p)))
        for h in scorer._rule_heads(rule):
            heads.append((rid, to_node(h)))
    return (
        spark.createDataFrame(roots, "rid int, label string, root_idx int"),
        spark.createDataFrame(preds, "rid int, pred string"),
        spark.createDataFrame(stats, "rid int, root_size int, bits_per_exception double"),
        spark.createDataFrame(heads, "rid int, node string"),
    )


def node_labels_df(spark: SparkSession, model: SummaryModel) -> DataFrame:
    """(node, label, pos) rows from the fitted index (string vocabulary);
    ``pos`` preserves the node's label-tuple order, which the reference's
    blame applicability test depends on."""
    index = model.index
    to_label = (lambda l: index.id_to_label[l]) if index.idify else (lambda l: l)
    to_node = (lambda n: index.id_to_node[n]) if index.idify else (lambda n: n)
    rows = [
        (to_node(n), to_label(l), pos)
        for n, labels in index.node_to_labels.items()
        for pos, l in enumerate(labels)
    ]
    return spark.createDataFrame(rows, "node string, label string, pos int")


def blame_table(spark: SparkSession, model: SummaryModel,
                labels_flat: DataFrame | None = None) -> DataFrame:
    """(node, pred, blame) for every node/pred combination with blame > 0."""
    roots, preds, stats, heads = model_blame_tables(spark, model)
    if labels_flat is None:
        labels_flat = node_labels_df(spark, model)

    # applicability replicates the reference exactly (anomaly_detector.py:50):
    # the rule root tuple must be an *ordered subsequence* of the node's label
    # tuple (the reference enumerates order-preserving combinations of the
    # tuple, so a sorted qualified root only applies when its labels appear in
    # the node's tuple in the same relative order) — checked by requiring the
    # matched root_idx sequence, ordered by node label position, to be 0..k-1
    applicable = (
        labels_flat.join(F.broadcast(roots), "label")
        .groupBy("node", "rid")
        .agg(
            F.count("*").alias("k"),
            F.expr(
                "transform(array_sort(collect_list(struct(pos, root_idx))),"
                " x -> x.root_idx)"
            ).alias("order_seq"),
        )
        .join(F.broadcast(stats), "rid")
        .where(
            (F.col("k") == F.col("root_size"))
            & (F.col("order_seq") == F.expr("sequence(0, root_size - 1)"))
        )
        .select("node", "rid", "bits_per_exception")
    )
    # exclude heads (nodes that satisfy the rule)
    culpable = applicable.join(
        F.broadcast(heads), ["rid", "node"], "left_anti"
    )
    return (
        culpable.join(F.broadcast(preds), "rid")
        .groupBy("node", "pred")
        .agg(F.sum("bits_per_exception").alias("blame"))
    )


def score_edges(spark: SparkSession, model: SummaryModel, triples: DataFrame,
                labels_flat: DataFrame | None = None) -> DataFrame:
    """Score a (subj, pred, obj[, eid]) table; returns the input columns +
    ``score`` (bits).  Edges outside the model's coverage get the shared
    unexplained-edge cost; ranking is a plain orderBy on the result."""
    scorer = AnomalyScorer(model)
    unexplained = scorer.unexplained_edge_bits()
    index = model.index
    to_node = (lambda n: index.id_to_node[n]) if index.idify else (lambda n: n)
    to_pred = (lambda p: index.id_to_pred[p]) if index.idify else (lambda p: p)
    covered_rows = [
        (to_node(s), to_pred(p), to_node(o), eid)
        for eid in model.covered_edges
        for (s, p, o) in [index.id_to_edge[eid]]
    ]
    covered = spark.createDataFrame(
        covered_rows or [("", "", "", -1)],
        "subj string, pred string, obj string, ceid long",
    ).select("subj", "pred", "obj").distinct()

    blame = blame_table(spark, model, labels_flat)

    uncovered_flag = (
        triples.join(covered, ["subj", "pred", "obj"], "left_anti")
        .select("subj", "pred", "obj")
        .withColumn("base", F.lit(float(unexplained)))
    )
    base = triples.join(
        uncovered_flag, ["subj", "pred", "obj"], "left"
    ).withColumn("base", F.coalesce(F.col("base"), F.lit(0.0)))

    b_subj = blame.select(
        F.col("node").alias("subj"), "pred", F.col("blame").alias("blame_s")
    )
    b_obj = blame.select(
        F.col("node").alias("obj"), "pred", F.col("blame").alias("blame_o")
    )
    return (
        base.join(b_subj, ["subj", "pred"], "left")
        .join(b_obj, ["obj", "pred"], "left")
        .withColumn(
            "score",
            F.col("base")
            + F.coalesce(F.col("blame_s"), F.lit(0.0))
            + F.coalesce(F.col("blame_o"), F.lit(0.0)),
        )
        .drop("base", "blame_s", "blame_o")
    )
