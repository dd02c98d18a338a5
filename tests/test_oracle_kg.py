"""Candidate-index goldens ported from the reference's test_graph.py /
test_searcher.py (GemsLab/KGist)."""

import pytest

from tests.conftest import fixture_kg


@pytest.fixture(scope="module")
def kg():
    return fixture_kg("test")


def test_idify_roundtrip():
    kg = fixture_kg("test", idify=True)
    assert kg.n == 18
    assert kg.m == 23
    assert kg.num_edge_labels == 7
    assert kg.num_node_labels == 11
    assert len(kg.node_to_id) == len(kg.id_to_node) == 18
    assert len(kg.pred_to_id) == len(kg.id_to_pred) == 7
    assert all(isinstance(k, int) for k in kg.node_label_counts)
    assert all(isinstance(k, int) for k in kg.edge_label_counts)
    # de-idify restores original vocabulary
    rule = ((kg.label_to_id["1927286"],), ((kg.pred_to_id["6293378"], "out", ((kg.label_to_id["7241965"],), ())),))
    assert kg.tuplify(rule) == (("1927286",), (("6293378", "out", (("7241965",), ())),))


def test_candidate_contents_star_rule(kg):
    # reference test_graph.py:30-42
    rule = (("1927286",), (("6293378", "out", (("7241965",), ())),))
    assert kg.has(rule)
    rec = kg.record(rule)
    assert len(rec.ca_to_size) == 1
    for node in ["36240", "6175574", "2415820", "6341376", "6555563", "879961"]:
        assert ("7241965", node) in rec.label_coverage
    assert len(rec.edges) == 6
    assert len(rec.label_coverage) == 6
    assert sum(rec.ca_to_size.values()) == 6


def test_candidate_contents_two_heads(kg):
    # reference test_graph.py:44-52
    rule = (("7241965",), (("7051738", "out", (("3029686",), ())),))
    rec = kg.record(rule)
    assert len(rec.ca_to_size) == 2
    assert ("3029686", "287927") in rec.label_coverage
    assert sum(rec.ca_to_size.values()) == 2


def test_candidate_contents_in_rule(kg):
    # reference test_graph.py:54-64
    rule = (("7490702",), (("412681", "in", (("7241965",), ())),))
    assert kg.has(rule)
    rec = kg.record(rule)
    assert len(rec.ca_to_size) == 3


def test_nodes_with_type(kg):
    # reference test_graph.py:94-99
    assert kg.nodes_with_type(("7241965",)) == 6
    assert kg.nodes_with_type(("7241965", "6843923")) == 6
    assert kg.nodes_with_type(("766386", "6843923")) == 1


def test_full_candidate_set(kg):
    # the complete 42-rule candidate set, reference test_searcher.py:9-55
    gt = {(("1927286",), (("6293378", "out", (("766386",), ())),)),
          (("1927286",), (("6293378", "out", (("7241965",), ())),)),
          (("1927286",), (("6293378", "out", (("6843923",), ())),)),
          (("1927286",), (("3320538", "out", (("5266930",), ())),)),
          (("1927286",), (("3320538", "out", (("8226812",), ())),)),
          (("1927286",), (("6291253", "out", (("8226812",), ())),)),
          (("1927286",), (("412681", "out", (("7490702",), ())),)),
          (("7241965",), (("6293378", "in", (("1927286",), ())),)),
          (("7241965",), (("5835005", "out", (("5794125",), ())),)),
          (("7241965",), (("412681", "out", (("7490702",), ())),)),
          (("7241965",), (("7051738", "out", (("3029686",), ())),)),
          (("7241965",), (("7051738", "out", (("6057655",), ())),)),
          (("7241965",), (("3320538", "out", (("8226812",), ())),)),
          (("7241965",), (("7946920", "out", (("8359357",), ())),)),
          (("7241965",), (("6291253", "out", (("8226812",), ())),)),
          (("6843923",), (("6293378", "in", (("1927286",), ())),)),
          (("6843923",), (("5835005", "out", (("5794125",), ())),)),
          (("6843923",), (("412681", "out", (("7490702",), ())),)),
          (("6843923",), (("7051738", "out", (("3029686",), ())),)),
          (("6843923",), (("7051738", "out", (("6057655",), ())),)),
          (("6843923",), (("3320538", "out", (("8226812",), ())),)),
          (("6843923",), (("7946920", "out", (("8359357",), ())),)),
          (("6843923",), (("6291253", "out", (("8226812",), ())),)),
          (("5794125",), (("5835005", "in", (("7241965",), ())),)),
          (("5794125",), (("5835005", "in", (("6843923",), ())),)),
          (("8359357",), (("7946920", "in", (("7241965",), ())),)),
          (("8359357",), (("7946920", "in", (("6843923",), ())),)),
          (("5266930",), (("3320538", "in", (("1927286",), ())),)),
          (("8226812",), (("3320538", "in", (("1927286",), ())),)),
          (("8226812",), (("3320538", "in", (("7241965",), ())),)),
          (("8226812",), (("3320538", "in", (("6843923",), ())),)),
          (("7490702",), (("412681", "in", (("1927286",), ())),)),
          (("7490702",), (("412681", "in", (("7241965",), ())),)),
          (("7490702",), (("412681", "in", (("6843923",), ())),)),
          (("3029686",), (("7051738", "in", (("7241965",), ())),)),
          (("3029686",), (("7051738", "in", (("6843923",), ())),)),
          (("6057655",), (("7051738", "in", (("7241965",), ())),)),
          (("6057655",), (("7051738", "in", (("6843923",), ())),)),
          (("766386",), (("6293378", "in", (("1927286",), ())),)),
          (("8226812",), (("6291253", "in", (("1927286",), ())),)),
          (("8226812",), (("6291253", "in", (("7241965",), ())),)),
          (("8226812",), (("6291253", "in", (("6843923",), ())),))}
    assert set(kg.ordered_rules()) == gt
    assert len(kg.ordered_rules()) == 42
