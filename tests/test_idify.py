"""Distributed dictionary encoding == the reference's id assignment order
(oracle LocalKG idify dicts), and delta-mode greedy over the idified
vocabulary == exact-mode greedy with idify=True (reference CLI default
tie-break parity)."""

import pytest
from pyspark.sql import functions as F

from kgist_spark.oracle.engine import GreedySearcher, ModelEvaluator
from tests.conftest import FIXTURES, fixture_kg

pytestmark = pytest.mark.spark


def _load(spark, name):
    from kgist_spark.sources.edgelist import explode_labels, load_labels, load_triples

    triples = load_triples(spark, str(FIXTURES / f"{name}.txt"))
    labels = load_labels(spark, str(FIXTURES / f"{name}_labels.txt"))
    return triples, labels, explode_labels(labels)


@pytest.mark.parametrize("name", ["test", "tiny", "tiny1", "repeated"])
def test_dictionaries_match_oracle(spark, name):
    from kgist_spark.sources.idify import idify_tables

    triples, labels, lf = _load(spark, name)
    _, _, dicts = idify_tables(triples, labels, lf)
    kg = fixture_kg(name, idify=True)
    got_nodes = {r["node"]: r["node_id"] for r in dicts["node"].collect()}
    got_preds = {r["pred"]: r["pred_id"] for r in dicts["pred"].collect()}
    got_labels = {r["label"]: r["label_id"] for r in dicts["label"].collect()}
    assert got_nodes == kg.node_to_id
    assert got_preds == kg.pred_to_id
    assert got_labels == kg.label_to_id


def _delta_idified(spark, name, passes=2, qualify=True):
    from kgist_spark.plans.greedy_delta import DeltaGreedy
    from kgist_spark.plans.summarizer import graph_stats
    from kgist_spark.sources.idify import idify_tables

    triples, labels, lf = _load(spark, name)
    t_id, lf_id, _ = idify_tables(triples, labels, lf)
    t_id, lf_id = t_id.persist(), lf_id.persist()
    stats = graph_stats(t_id, lf_id)
    lnc = {
        r["label"]: r["n"]
        for r in lf_id.groupBy("label").agg(F.countDistinct("node").alias("n")).collect()
    }
    return DeltaGreedy(t_id, lf_id, stats, lnc).fit(passes=passes, label_qualify=qualify)


@pytest.mark.parametrize("name", ["test", "tiny1", "repeated", "label_qualifier_1"])
def test_idified_delta_matches_exact_idify_true(spark, name):
    result = _delta_idified(spark, name)
    kg = fixture_kg(name, idify=True)
    model = GreedySearcher(kg).build_model(passes=2, label_qualify=True)
    want = ModelEvaluator(kg).evaluate(model)
    assert set(result["rules"]) == set(model.rules.keys())
    assert result["covered_edges"] == len(model.covered_edges)
    assert abs(result["objective_bits"] - want) < 1e-6
