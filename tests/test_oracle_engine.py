"""Model/evaluator/searcher goldens ported from the reference's
test_model.py / test_evaluator.py / test_searcher.py (GemsLab/KGist)."""

import pytest

from kgist_spark.functions import mdl
from kgist_spark.oracle.engine import GreedySearcher, ModelEvaluator, SummaryModel
from tests.conftest import fixture_kg


@pytest.fixture()
def kg():
    return fixture_kg("test")


def _uncovered_labels(kg, model, node):
    covered = {lab for (lab, n) in model.covered_labels if n == node}
    return set(kg.node_to_labels[node]) - covered


def test_make_assertions_coverage(kg):
    # reference test_model.py:22-37
    rule = (("1927286",), (("6293378", "out", (("7241965",), ())),))
    model = SummaryModel(kg)
    model.add_rule(rule)
    assert kg.m - len(model.covered_edges) == kg.m - 6
    for node in ["36240", "6175574", "2415820", "6341376", "6555563", "879961"]:
        assert _uncovered_labels(kg, model, node) == {"6843923"}


def test_undo_assertions(kg):
    # reference test_model.py:38-57
    rule = (("1927286",), (("6293378", "out", (("7241965",), ())),))
    model = SummaryModel(kg)
    model.add_rule(rule)
    model.remove_rule(rule)
    assert len(model.covered_edges) == 0
    assert len(model.covered_labels) == 0
    assert _uncovered_labels(kg, model, "7499850") == {"1927286"}
    assert _uncovered_labels(kg, model, "36240") == {"7241965", "6843923"}


def test_ca_size_lists(kg):
    # reference test_model.py:123-154 (add_rules)
    rule1 = (("1927286",), (("6293378", "out", (("7241965",), ())),))
    rule2 = (("7241965",), (("5835005", "out", (("5794125",), ())),))
    rule3 = (("8226812",), (("6291253", "in", (("6843923",), ())),))
    model = SummaryModel(kg)
    model.add_rule(rule1)
    assert model.rules[rule1] == [6]
    model.add_rule(rule2)
    assert model.rules[rule2] == [1, 1]
    model.add_rule(rule3)
    assert model.rules[rule3] == [2]
    assert _uncovered_labels(kg, model, "36240") == {"6843923"}
    assert _uncovered_labels(kg, model, "6175574") == set()
    assert _uncovered_labels(kg, model, "308389") == set()


def test_label_matrix_golden_six_rules(kg):
    # reference test_evaluator.py:271-303
    rules = [
        (("1927286",), (("6293378", "out", (("6843923",), ())),)),
        (("8359357",), (("7946920", "in", (("7241965",), ())),)),
        (("1927286",), (("3320538", "out", (("5266930",), ())),)),
        (("3029686",), (("7051738", "in", (("7241965",), ())),)),
        (("6057655",), (("7051738", "in", (("7241965",), ())),)),
        (("7241965",), (("5835005", "out", (("5794125",), ())),)),
    ]
    model = SummaryModel(kg)
    for r in rules:
        model.add_rule(r)
    assert model.covered_labels == {
        ("6843923", "36240"), ("6843923", "6341376"), ("6843923", "919756"),
        ("6843923", "879961"), ("6843923", "2415820"), ("6843923", "6175574"),
        ("6843923", "6555563"), ("7241965", "6175574"), ("5266930", "9054900"),
        ("7241965", "6341376"), ("7241965", "879961"), ("5794125", "308389"),
    }
    expected = mdl.length_binomial(11 * 18 - 12, 27 - 12)
    assert abs(mdl.length_negative_label_error(len(model.covered_labels), kg.stats) - expected) < 1e-6


def test_evaluate_equals_evaluate_change(kg):
    # reference test_evaluator.py:342-383
    ev = ModelEvaluator(kg)
    rule1 = (("1927286",), (("6293378", "out", (("7241965",), ())),))
    rule2 = (("3029686",), (("7051738", "in", (("7241965",), ())),))
    model = SummaryModel(kg)
    gt = SummaryModel(kg)
    gt.add_rule(rule1)
    _, model_len, _, _ = ev.evaluate(model, with_lengths=True)
    val = ev.evaluate(gt)
    model.add_rule(rule1)
    new_val, model_len, _, _ = ev.evaluate_change(model, rule1, model_len)
    assert val == new_val
    gt.add_rule(rule2)
    val = ev.evaluate(gt)
    model.add_rule(rule2)
    new_val = ev.evaluate_change(model, rule2, model_len)[0]
    assert val == new_val


def test_repeated_add_removal_restores_nulls(kg):
    # reference test_model.py:156-175
    searcher = GreedySearcher(kg)
    searcher.rank()
    ev = searcher.evaluator
    model = SummaryModel(kg)
    null = ev.evaluate(model, with_lengths=True)
    null_val, null_model_len, null_neg_edge, null_neg_node = null
    for rule in searcher.cands:
        model.add_rule(rule)
        val, m_len, neg_edge, neg_node = ev.evaluate_change(model, rule, null_model_len)
        assert m_len > null_model_len
        assert neg_edge < null_neg_edge
        assert neg_node <= null_neg_node
        model.remove_rule(rule)
        assert null == ev.evaluate(model, with_lengths=True)


def test_single_rule_lowers_cost(kg):
    # reference test_evaluator.py:305-315
    ev = ModelEvaluator(kg)
    rule = (("1927286",), (("6293378", "out", (("7241965",), ())),))
    null_model = SummaryModel(kg)
    model = SummaryModel(kg)
    model.add_rule(rule)
    assert ev.evaluate(model) < ev.evaluate(null_model)


def test_label_qualify_accepts(tmp_path):
    # reference test_model.py:570-579 on the label_qualifier_1 fixture
    kg = fixture_kg("label_qualifier_1")
    searcher = GreedySearcher(kg)
    assert kg.has((("green",), (("e1", "out", (("blue",), ())),)))
    searcher.label_qualify()
    assert not kg.has((("green",), (("e1", "out", (("blue",), ())),)))
    assert kg.has((("green", "red"), (("e1", "out", (("blue",), ())),)))


def test_label_qualify_rejects(kg):
    # reference test_model.py:581-588
    searcher = GreedySearcher(kg)
    searcher.label_qualify()
    assert kg.has((("7241965",), (("6293378", "in", (("1927286",), ())),)))


def test_build_model_smoke_and_improves(kg):
    searcher = GreedySearcher(kg)
    model = searcher.build_model(passes=2, label_qualify=True)
    ev = ModelEvaluator(kg)
    assert len(model.rules) > 0
    assert ev.evaluate(model) < ev.evaluate(SummaryModel(kg))
    # every covered edge/label is really in the graph
    assert model.covered_edges <= set(kg.id_to_edge.keys())
