"""MDL encoding-term goldens, ported from the reference's inlined asserts
(test_evaluator.py of GemsLab/KGist)."""

from math import comb, log2

import pytest

from kgist_spark.functions import mdl
from tests.conftest import fixture_kg


@pytest.fixture(scope="module")
def kg():
    return fixture_kg("test")


def test_length_natural_number_basics():
    assert mdl.length_natural_number(0) == 0
    assert mdl.length_natural_number(-3) == 0
    assert mdl.length_natural_number(1) == log2(2.865064)
    # monotone growth
    assert mdl.length_natural_number(2) > mdl.length_natural_number(1)
    assert mdl.length_natural_number(100) > mdl.length_natural_number(10)


def test_length_binomial_matches_exact_comb():
    assert abs(log2(comb(5, 2)) - mdl.length_binomial(5, 2)) <= 1e-10
    assert abs(log2(comb(15, 4)) - mdl.length_binomial(15, 4)) <= 1e-5
    assert abs(log2(comb(13, 13)) - mdl.length_binomial(13, 13)) <= 1e-5
    assert abs(log2(comb(646, 1)) - mdl.length_binomial(646, 1)) <= 1e-5
    assert abs(log2(comb(463, 35)) - mdl.length_binomial(463, 35)) <= 1e-4


def test_graph_stats_test_fixture(kg):
    # reference test_graph.py:8-16
    assert kg.n == 18
    assert kg.m == 23
    assert kg.num_edge_labels == 7
    assert kg.num_node_labels == 11
    assert kg.edge_label_counts["6293378"] == 7
    assert kg.node_label_counts["7241965"] == 6
    assert kg.total_num_labels == 27


def test_length_model_header_null(kg):
    # reference test_evaluator.py:43-47
    assert mdl.length_model_header(kg.stats) == log2(2 * 11 * 7 * 11 + 1)


def test_length_rule_single_label(kg):
    # reference test_evaluator.py:49-69
    rule = (("1927286",), (("6293378", "out", (("7241965",), ())),))
    expected = (
        log2(11)
        + -log2(1 / 18)
        + mdl.length_natural_number(2)
        + 1
        + -log2(7 / 23)
        + log2(11)
        + -log2(6 / 18)
        + mdl.length_natural_number(1)
    )
    assert abs(mdl.length_rule(rule, kg.stats) - expected) < 1e-5


def test_length_rule_qualified_child(kg):
    # reference test_evaluator.py:71-103 (two-label child)
    rule = (("1927286",), (("6293378", "out", (("7241965", "6843923"), ())),))
    expected = (
        log2(11)
        + -log2(1 / 18)
        + mdl.length_natural_number(2)
        + 1
        + -log2(7 / 23)
        + log2(11)
        + -log2(6 / 18)
        + -log2(7 / 18)
        + mdl.length_natural_number(1)
    )
    assert abs(mdl.length_rule(rule, kg.stats) - expected) < 1e-5


def test_length_assertions_flat_single_ca(kg):
    # reference test_evaluator.py:105-113: one head of size 6, no exceptions
    expected = log2(1) + mdl.length_binomial(1, 0) + log2(18) + mdl.length_binomial(17, 6)
    assert abs(mdl.length_assertions_flat(1, [6], kg.stats) - expected) < 1e-10


def test_length_assertions_flat_with_exceptions(kg):
    # reference test_evaluator.py:181-218 (rule 7241965 --7051738--> 3029686):
    # 6 assertions, 2 correct of size 1 each
    expected = (
        log2(6)
        + mdl.length_binomial(6, 4)
        + log2(18)
        + mdl.length_binomial(17, 1)
        + log2(18)
        + mdl.length_binomial(17, 1)
    )
    assert abs(mdl.length_assertions_flat(6, [1, 1], kg.stats) - expected) < 1e-6


def test_length_assertions_histogram_equivalence(kg):
    flat = mdl.length_assertions_flat(6, [1, 1, 3, 3], kg.stats)
    hist = mdl.length_assertions_from_histogram(6, {1: 2, 3: 2}, kg.stats)
    assert abs(flat - hist) < 1e-9


def test_negative_edge_error_null(kg):
    # reference test_evaluator.py:220-231
    expected = mdl.length_binomial(18**2 * 7, 23)
    assert mdl.length_negative_edge_error(0, kg.stats) == expected


def test_negative_edge_error_covered(kg):
    # reference test_evaluator.py:233-245: 9 edges covered, 14 left
    expected = mdl.length_binomial(18**2 * 7 - 9, 14)
    assert mdl.length_negative_edge_error(9, kg.stats) == expected


def test_negative_label_error(kg):
    # reference test_evaluator.py:247-256
    expected = mdl.length_binomial(11 * 18 - 7, 27 - 7)
    assert abs(mdl.length_negative_label_error(7, kg.stats) - expected) < 1e-6
