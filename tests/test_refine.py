"""Rm/Rn refinement goldens ported from the reference's test_model.py
(GemsLab/KGist ``test_merge_rules_*``, nest invariants)."""

from kgist_spark.functions.ir import RuleTree
from kgist_spark.oracle.engine import ModelEvaluator, SummaryModel
from kgist_spark.oracle.refine import merge_rules, nest_rules, shared_root_graph
from tests.conftest import fixture_kg


def model_with(kg, rules):
    model = SummaryModel(kg)
    for r in rules:
        model.add_rule(r)
    return model


def test_merge_rules_two():
    # reference test_model.py:347-369
    kg = fixture_kg("test")
    model = model_with(kg, [
        (("1927286",), (("6293378", "out", (("7241965",), ())),)),
        (("1927286",), (("412681", "out", (("7490702",), ())),)),
    ])
    merged = merge_rules(model)
    assert len(merged.rules) == 1
    rule = next(iter(merged.rules))
    assert isinstance(rule, RuleTree)
    assert len(rule.children) == 2
    assert {c[0] for c in rule.children} == {"412681", "6293378"}
    assert {c[2].root for c in rule.children} == {("7241965",), ("7490702",)}
    assert len(rule.assertions) == 1
    assert set(rule.assertions[0].nodes.keys()) == {
        "7499850", "36240", "6175574", "2415820", "879961", "6555563", "6341376", "8220493"
    }
    assert len(rule.assertions[0].nodes["7499850"].neighbors_of_type) == 2
    ev = ModelEvaluator(kg)
    assert ev.evaluate(merged) < ev.evaluate(model)


def test_merge_rules_noop_on_unmergeable_model():
    """A model with no same-root pair (edgeless shared-root graph) passes
    through unchanged — regression: the Bron-Kerbosch top-level call used to
    emit an empty clique and crash the merge."""
    kg = fixture_kg("test")
    rules = [(("1927286",), (("6293378", "out", (("7241965",), ())),))]
    model = model_with(kg, rules)
    merged = merge_rules(model)
    assert set(merged.rules) == set(rules)


def test_merge_rules_four_full_clique():
    # reference test_model.py:404-435
    kg = fixture_kg("test")
    rules = [
        (("1927286",), (("6293378", "out", (("7241965",), ())),)),
        (("1927286",), (("412681", "out", (("7490702",), ())),)),
        (("1927286",), (("3320538", "out", (("8226812",), ())),)),
        (("1927286",), (("6291253", "out", (("8226812",), ())),)),
    ]
    model = model_with(kg, rules)
    by_id, adj = shared_root_graph(model)
    assert len(adj) == 4
    assert sum(len(v) for v in adj.values()) // 2 == 6  # full clique on 4
    merged = merge_rules(model)
    assert len(merged.rules) == 1
    rule = next(iter(merged.rules))
    assert len(rule.children) == 4
    assert {c[0] for c in rule.children} == {"412681", "6293378", "3320538", "6291253"}
    assert {c[2].root for c in rule.children} == {("7241965",), ("7490702",), ("8226812",)}
    assert len(rule.assertions) == 1
    assert set(rule.assertions[0].nodes.keys()) == {
        "7499850", "36240", "6175574", "2415820", "879961", "6555563", "6341376",
        "8220493", "9054900", "7992351",
    }
    ev = ModelEvaluator(kg)
    assert ev.evaluate(merged) < ev.evaluate(model)
    # merged coverage equals union of the original rules' candidate edges
    gt_edges = set()
    for r in rules:
        gt_edges |= kg.record(r).edges
    assert rule.edges_covered() == gt_edges


def test_merge_carries_unmergeable_rules():
    # reference test_build_rule_graph_2 setup: rules with distinct roots survive
    kg = fixture_kg("test")
    model = model_with(kg, [
        (("1927286",), (("6293378", "out", (("7241965",), ())),)),
        (("1927286",), (("412681", "out", (("7490702",), ())),)),
        (("7241965",), (("5835005", "out", (("5794125",), ())),)),
        (("7490702",), (("412681", "in", (("7241965",), ())),)),
    ])
    merged = merge_rules(model)
    # one merged rule + two carried-over singletons
    assert len(merged.rules) == 3
    tree_rules = [r for r in merged.rules if isinstance(r, RuleTree)]
    assert len(tree_rules) == 1 and len(tree_rules[0].children) == 2


def test_nest_rules_never_increases_cost():
    # reference test_model.py:330-345 invariant
    kg = fixture_kg("tiny")
    model = model_with(kg, [
        (("green",), (("black", "out", (("blue",), ())),)),
        (("blue",), (("other_black", "out", (("red",), ())),)),
    ])
    ev = ModelEvaluator(kg)
    before = ev.evaluate(model)
    nested = nest_rules(model)
    after = ModelEvaluator(kg).evaluate(nested)
    assert after <= before


def test_nest_rules_on_test_graph():
    kg = fixture_kg("test")
    model = model_with(kg, [
        (("1927286",), (("6293378", "out", (("7241965",), ())),)),
        (("7241965",), (("5835005", "out", (("5794125",), ())),)),
        (("8226812",), (("3320538", "in", (("7241965",), ())),)),
    ])
    ev = ModelEvaluator(kg)
    before = ev.evaluate(model)
    nested = nest_rules(model)
    assert ModelEvaluator(kg).evaluate(nested) <= before
