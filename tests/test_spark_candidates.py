"""Parity: distributed candidate generation == oracle index, and the
Spark-backed summarizer selects the identical model."""

import pytest

from kgist_spark.oracle.engine import GreedySearcher, ModelEvaluator
from tests.conftest import FIXTURES, fixture_kg

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def loaded(spark):
    from kgist_spark.sources.edgelist import load_labels, load_triples

    triples = load_triples(spark, str(FIXTURES / "test.txt"))
    labels = load_labels(spark, str(FIXTURES / "test_labels.txt"))
    return triples, labels


def test_loader_schema_and_counts(loaded):
    triples, labels = loaded
    assert triples.count() == 23
    assert labels.count() == 18
    eids = [r["eid"] for r in triples.orderBy("eid").collect()]
    assert eids == list(range(23))
    first = triples.orderBy("eid").first()
    assert (first["subj"], first["pred"], first["obj"]) == ("7499850", "6293378", "2415820")


@pytest.mark.parametrize("idify", [False, True])
def test_driver_index_matches_oracle(loaded, idify):
    from kgist_spark.plans.summarizer import build_driver_index
    from kgist_spark.sources.edgelist import explode_labels

    triples, labels = loaded
    spark_kg = build_driver_index(triples, labels, explode_labels(labels), idify=idify)
    oracle_kg = fixture_kg("test", idify=idify)

    assert spark_kg.stats == oracle_kg.stats
    assert spark_kg.id_to_edge == oracle_kg.id_to_edge
    # same candidates in the same insertion order
    assert spark_kg.ordered_rules() == oracle_kg.ordered_rules()
    for rule in oracle_kg.ordered_rules():
        a, b = spark_kg.record(rule), oracle_kg.record(rule)
        assert a.edges == b.edges
        assert a.label_coverage == b.label_coverage
        assert a.ca_to_size == b.ca_to_size
        assert list(a.ca_to_size) == list(b.ca_to_size)  # head insertion order


@pytest.mark.parametrize("name", ["tiny", "tiny1", "repeated", "label_qualifier_1"])
def test_driver_index_matches_oracle_other_fixtures(spark, name):
    from kgist_spark.plans.summarizer import build_driver_index
    from kgist_spark.sources.edgelist import explode_labels, load_labels, load_triples

    triples = load_triples(spark, str(FIXTURES / f"{name}.txt"))
    labels = load_labels(spark, str(FIXTURES / f"{name}_labels.txt"))
    spark_kg = build_driver_index(triples, labels, explode_labels(labels), idify=True)
    oracle_kg = fixture_kg(name, idify=True)
    assert spark_kg.stats == oracle_kg.stats
    assert spark_kg.ordered_rules() == oracle_kg.ordered_rules()
    for rule in oracle_kg.ordered_rules():
        a, b = spark_kg.record(rule), oracle_kg.record(rule)
        assert (a.edges, a.label_coverage, a.ca_to_size) == (b.edges, b.label_coverage, b.ca_to_size)


def test_spark_summarizer_matches_oracle_model(loaded):
    from kgist_spark.plans.summarizer import SparkSummarizer

    triples, labels = loaded
    summ = SparkSummarizer(triples, labels, idify=False)
    spark_model = summ.fit(passes=2, label_qualify=True)

    oracle_kg = fixture_kg("test", idify=False)
    oracle_model = GreedySearcher(oracle_kg).build_model(passes=2, label_qualify=True)

    assert set(spark_model.rules.keys()) == set(oracle_model.rules.keys())
    assert spark_model.covered_edges == oracle_model.covered_edges
    assert spark_model.covered_labels == oracle_model.covered_labels
    spark_bits = summ.evaluator().evaluate(spark_model)
    oracle_bits = ModelEvaluator(oracle_kg).evaluate(oracle_model)
    assert abs(spark_bits - oracle_bits) < 1e-9


def test_candidate_stats_distributed(loaded, spark):
    from kgist_spark.operators import candidates as C
    from kgist_spark.sources.edgelist import explode_labels, load_labels

    triples, labels = loaded
    ce = C.candidate_edges(triples, explode_labels(labels))
    stats = {
        (r["root_label"], r["pred"], r["dir"], r["child_label"]): (r["n_edges"], r["n_cas"])
        for r in C.candidate_stats(ce).collect()
    }
    assert len(stats) == 42
    # reference test_graph.py:30-42 goldens
    assert stats[("1927286", "6293378", "out", "7241965")] == (6, 1)
    assert stats[("7241965", "7051738", "out", "3029686")] == (2, 2)
    assert stats[("7490702", "412681", "in", "7241965")] == (3, 3)


def test_candidate_rule_stats_equals_exploded_path(loaded, spark):
    """The folded one-aggregate form (candidate_rule_stats) must equal
    candidate_stats(candidate_edges(...)) on EVERY column, including the
    packed first_seen key — the greedy tie-breaking depends on it."""
    from kgist_spark.operators import candidates as C
    from kgist_spark.sources.edgelist import explode_labels

    triples, labels = loaded
    lf = explode_labels(labels)
    old = {tuple(r) for r in C.candidate_stats(C.candidate_edges(triples, lf)).collect()}
    new = {tuple(r) for r in C.candidate_rule_stats(triples, lf).collect()}
    assert old == new
    assert len(new) == 42


def test_candidate_rule_stats_string_eid_null_first_seen(spark):
    """With a non-numeric eid the folded form emits null first_seen instead
    of an ANSI cast error (the testdata queries use natural-key string
    eids and never read first_seen)."""
    from pyspark.sql import functions as F

    from kgist_spark.operators import candidates as C

    triples = spark.createDataFrame(
        [("a", "p", "b", "a|p|b")], ["subj", "pred", "obj", "eid"]
    )
    lf = spark.createDataFrame(
        [("a", "L", 0), ("b", "M", 0)], ["node", "label", "pos"]
    )
    rows = C.candidate_rule_stats(triples, lf).collect()
    assert {(r["root_label"], r["dir"], r["child_label"]) for r in rows} == {
        ("L", "out", "M"), ("M", "in", "L")
    }
    assert all(r["first_seen"] is None for r in rows)
    assert all(r["n_edges"] == 1 and r["n_cas"] == 1 for r in rows)
