"""RuleTree / Assertion goldens ported from the reference's test_rule.py
(GemsLab/KGist)."""

import pytest

from kgist_spark.functions.ir import Assertion, RuleTree
from kgist_spark.oracle.engine import SummaryModel
from tests.conftest import fixture_kg


def planted(kg, rule_tuple):
    model = SummaryModel(kg)
    model.add_rule(rule_tuple)
    tree = RuleTree(rule_tuple[0], rule_tuple[1])
    model.plant_forest(tree)
    return model, tree


def test_pin_to_leaf_multiple_dont_overwrite():
    # reference test_rule.py:129-147 (pin twice to same leaf)
    kg = fixture_kg("test")
    model = SummaryModel(kg)
    r1t = (("1927286",), (("6293378", "out", (("7241965",), ())),))
    r2t = (("7241965",), (("412681", "out", (("7490702",), ())),))
    r3t = (("7241965",), (("5835005", "out", (("5794125",), ())),))
    for r in (r1t, r2t, r3t):
        model.add_rule(r)
    rule1, rule2, rule3 = (RuleTree(r[0], r[1]) for r in (r1t, r2t, r3t))
    for t in (rule1, rule2, rule3):
        model.plant_forest(t)
    assert rule1.pin_to_leaf(rule2)
    assert rule1.pin_to_leaf(rule3)
    assert len(rule1.children) == 1
    assert {c[2].root for c in rule1.children[0][2].children} == {("5794125",), ("7490702",)}


def test_pin_to_leaf_tiny_graph():
    # reference test_rule.py:148-191 (full nested-assertion structure)
    kg = fixture_kg("tiny")
    model = SummaryModel(kg)
    r1t = (("green",), (("black", "out", (("blue",), ())),))
    r2t = (("blue",), (("other_black", "out", (("red",), ())),))
    model.add_rule(r1t)
    model.add_rule(r2t)
    rule1 = RuleTree(r1t[0], r1t[1])
    rule2 = RuleTree(r2t[0], r2t[1])
    model.plant_forest(rule1)
    model.plant_forest(rule2)
    assert len(rule1.assertions) == 2
    assert len(rule2.assertions) == 4
    assert rule1.pin_to_leaf(rule2)
    assert len(rule1.assertions) == 2
    for ca, root in zip(rule1.assertions, ["1", "2"]):
        assert ca.root == root
        assert len(ca.nodes[ca.root].neighbors) == 2
        assert set(ca.nodes[ca.root].neighbors_of_type) == {("black", "out", ("blue",))}
    ca1 = rule1.assertions[0]
    assert ca1.nodes["3"].neighbors_of_type[("other_black", "out", ("red",))] == {"8", "9", "10"}
    assert ca1.nodes["4"].neighbors_of_type[("other_black", "out", ("red",))] == {"11"}
    ca2 = rule1.assertions[1]
    assert ca2.nodes["5"].neighbors_of_type[("other_black", "out", ("red",))] == {"12"}
    assert set(ca2.nodes["6"].neighbors_of_type) == {("black", "in", ("green",))}


def test_pin_and_filter_errant_tiny1():
    # reference test_rule.py:192-263: only root '1' survives filtering
    kg = fixture_kg("tiny1")
    model = SummaryModel(kg)
    rules = [
        (("green",), (("black0", "out", (("blue",), ())),)),
        (("blue",), (("black1", "out", (("purple",), ())),)),
        (("blue",), (("black2", "out", (("red",), ())),)),
    ]
    trees = []
    for r in rules:
        model.add_rule(r)
        t = RuleTree(r[0], r[1])
        model.plant_forest(t)
        trees.append(t)
    rule1, rule2, rule3 = trees
    assert rule1.pin_to_leaf(rule2)
    assert rule1.pin_to_leaf(rule3)
    assert {ca.root for ca in rule1.assertions} == {"1", "2"}
    rule1.filter_errant()
    assert len(rule1.assertions) == 1
    assert rule1.assertions[0].root == "1"


def test_filter_errant_on_test_graph():
    # reference test_rule.py:293-329 (filter_errant_1)
    kg = fixture_kg("test")
    model = SummaryModel(kg)
    r1t = (("8226812",), (("3320538", "in", (("7241965",), ())),))
    r2t = (("7241965",), (("412681", "out", (("7490702",), ())),))
    model.add_rule(r1t)
    model.add_rule(r2t)
    rule1 = RuleTree(r1t[0], r1t[1])
    rule2 = RuleTree(r2t[0], r2t[1])
    model.plant_forest(rule1)
    model.plant_forest(rule2)
    assert rule1.pin_to_leaf(rule2)
    assert rule1.assertions[0].root == "7992351"
    assert rule1.assertions[0].nodes["7992351"].neighbors == {"2415820"}
    assert set(rule1.assertions[0].nodes.keys()) == {"7992351", "2415820"}
    assert rule1.assertions[1].root == "2873925"
    assert set(rule1.assertions[1].nodes.keys()) == {"2873925", "36240", "3352101"}
    rule1.filter_errant()
    assert len(rule1.assertions) == 1
    assert rule1.assertions[0].root == "2873925"


def test_filter_errant_drops_all():
    # reference test_rule.py:314-329 (filter_errant_2)
    kg = fixture_kg("test")
    model = SummaryModel(kg)
    r1t = (("1927286",), (("6293378", "out", (("7241965",), ())),))
    r2t = (("7241965",), (("5835005", "out", (("5794125",), ())),))
    model.add_rule(r1t)
    model.add_rule(r2t)
    rule1 = RuleTree(r1t[0], r1t[1])
    rule2 = RuleTree(r2t[0], r2t[1])
    model.plant_forest(rule1)
    model.plant_forest(rule2)
    assert rule1.pin_to_leaf(rule2)
    assert len(rule1.assertions) == 1
    assert rule1.assertions[0].root == "7499850"
    assert set(rule1.assertions[0].nodes.keys()) == {
        "7499850", "6175574", "36240", "6555563", "879961", "2415820", "6341376", "308389"
    }
    rule1.filter_errant()
    assert len(rule1.assertions) == 0


def test_assertion_roots_match_candidate_heads():
    # reference test_rule.py:277-291
    kg = fixture_kg("test")
    model = SummaryModel(kg)
    for rule in list(kg.ordered_rules()):
        model.add_rule(rule)
        tree = RuleTree(rule[0], rule[1])
        model.plant_forest(tree)
        rec = kg.record(rule)
        assert {ca.root for ca in tree.assertions} == set(rec.ca_to_size.keys())
        assert len(tree.assertions) <= sum(rec.ca_to_size.values())


def test_rule_coverage_and_pin():
    # reference test_rule.py:458-497 (coverage 1 & 2)
    kg = fixture_kg("test")
    model, rule1 = planted(kg, (("1927286",), (("6293378", "out", (("7241965",), ())),)))
    model2, rule2 = planted(kg, (("7241965",), (("5835005", "out", (("5794125",), ())),)))
    assert len(rule1.edges_covered()) == 6
    assert len(rule1.labels_covered()) == 6
    assert len(rule2.edges_covered()) == 2
    assert len(rule2.labels_covered()) == 1
    assert rule1.pin_to_leaf(rule2)
    assert len(rule1.edges_covered()) == 8
    assert len(rule1.labels_covered()) == 7
    rule1.filter_errant()
    assert len(rule1.assertions) == 0
    assert len(rule1.edges_covered()) == 0


def test_merge_two_then_three():
    # reference test_rule.py:521-576 (merge 1 & 2)
    kg = fixture_kg("test")
    _, rule1 = planted(kg, (("1927286",), (("6293378", "out", (("7241965",), ())),)))
    _, rule2 = planted(kg, (("1927286",), (("412681", "out", (("7490702",), ())),)))
    _, rule3 = planted(kg, (("1927286",), (("3320538", "out", (("8226812",), ())),)))
    before_edges = set(rule1.edges_covered())
    before_labels = set(rule1.labels_covered())
    assert rule1.merge(rule2)
    assert len(rule1.children) == 2
    assert {c[0] for c in rule1.children} == {"412681", "6293378"}
    assert len(rule1.assertions) == 1
    assert rule1.edges_covered() == before_edges | rule2.edges_covered()
    assert rule1.labels_covered() == before_labels | rule2.labels_covered()
    assert len(rule1.assertions[0].nodes["7499850"].neighbors_of_type) == 2
    assert rule1.merge(rule3)
    assert len(rule1.children) == 3
    assert len(rule1.assertions[0].nodes["7499850"].neighbors_of_type) == 3


def test_jaccard_sim_golden_fractions():
    # reference test_rule.py:578-598
    kg = fixture_kg("test")
    _, rule1 = planted(kg, (("1927286",), (("6293378", "out", (("7241965",), ())),)))
    _, rule2 = planted(kg, (("7241965",), (("412681", "out", (("7490702",), ())),)))
    assert rule1.jaccard_sim(rule2) == 3 / 6

    _, r1 = planted(kg, (("1927286",), (("6293378", "out", (("7241965",), ())),)))
    _, r2 = planted(kg, (("7241965",), (("3320538", "out", (("8226812",), ())),)))
    _, r3 = planted(kg, (("8226812",), (("6291253", "in", (("1927286",), ())),)))
    r1.pin_to_leaf(r2)
    assert r1.jaccard_sim(r3) == 1 / 8


def test_atoms_and_inner_nodes():
    # reference test_rule.py:402-422, 735-762
    rule1 = RuleTree(("8226812",), (("3320538", "in", (("7241965",), ())),))
    rule2 = RuleTree(("7241965",), (("412681", "out", (("7490702",), ())),))
    t1, t2 = rule1.tuplify(), rule2.tuplify()
    assert rule1.atoms()[0] == t1
    assert rule1.pin_to_leaf(rule2)
    assert sorted(rule1.atoms()) == sorted((t1, t2))

    r1 = RuleTree(("sport",), (("has_team", "out", (("team",), ())),))
    r2 = RuleTree(("team",), (("plays", "out", (("sport",), ())),))
    r3 = RuleTree(("sport",), (("has_player", "out", (("athlete",), ())),))
    assert r1.inner_nodes() == {("team",)}
    r1.pin_to_leaf(r2)
    assert r1.inner_nodes() == {("team",), ("sport",)}
    r1.pin_to_leaf(r3)
    assert r1.inner_nodes() == {("team",), ("sport",), ("athlete",)}


def test_compose_depth_4():
    # reference test_rule.py:688-707
    rule1 = RuleTree(("sport",), (("team", "out", (("team",), ())),))
    rule1b = RuleTree(("sport",), (("plays", "in", (("team",), ())),))
    rule1c = RuleTree(("team",), (("playsAgainst", "out", (("team",), ())),))
    rule2 = RuleTree(("date",), (("dateOf", "out", (("sport",), ())),))
    rule2b = RuleTree(("date",), (("atDate", "in", (("sport",), ())),))
    rule3 = RuleTree(("shape",), (("atDate", "out", (("date",), ())),))
    rule3b = RuleTree(("shape",), (("dateOf", "in", (("date",), ())),))
    rule1.merge(rule1b)
    rule1.pin_to_leaf(rule1c)
    rule2.merge(rule2b)
    rule3.merge(rule3b)
    rule2.pin_to_leaf(rule1)
    rule3.pin_to_leaf(rule2)
    assert rule3.max_depth() == 4


def test_plant_forest_goldens():
    # reference test_model.py:271-308
    kg = fixture_kg("test")
    _, rule = planted(kg, (("1927286",), (("6293378", "out", (("7241965",), ())),)))
    assert len(rule.assertions) == 1
    assert len(rule.edges_covered()) == 6
    assert rule.labels_covered() == {
        ("7241965", "36240"), ("7241965", "6555563"), ("7241965", "2415820"),
        ("7241965", "879961"), ("7241965", "6341376"), ("7241965", "6175574"),
    }
    _, rule = planted(kg, (("7241965",), (("6293378", "in", (("1927286",), ())),)))
    assert len(rule.assertions) == 6
    assert len(rule.edges_covered()) == 6
    assert rule.labels_covered() == {("1927286", "7499850")}
    _, rule = planted(kg, (("7241965",), (("5835005", "out", (("5794125",), ())),)))
    assert len(rule.assertions) == 2
    assert rule.labels_covered() == {("5794125", "308389")}


def test_rule_to_dot():
    """S5 — DOT export draws one node per level (doublecircle root) and one
    labeled edge per child, 'in' edges reversed (reference rule.py:222-254)."""
    from kgist_spark.functions.ir import rule_to_dot

    rule = (("concept:company",),
            (("concept:companyceo", "out", (("concept:ceo",), ())),
             ("concept:hasoffice", "in", (("concept:city",), ()))))
    dot = rule_to_dot(rule)
    assert dot.startswith("digraph rule {") and dot.endswith("}")
    assert '"company" [shape=doublecircle];' in dot
    assert '"ceo" [shape=circle];' in dot
    assert '"company" -> "ceo" [label=" companyceo"];' in dot
    # 'in' direction points child -> root
    assert '"city" -> "company" [label=" hasoffice"];' in dot
