"""Delta-mode (distributed-coverage) greedy == exact-mode greedy: same
selected rules and matching objective on the fixture graphs."""

import pytest
from pyspark.sql import functions as F

from kgist_spark.oracle.engine import GreedySearcher, ModelEvaluator
from tests.conftest import FIXTURES, fixture_kg

pytestmark = pytest.mark.spark


def build_delta(spark, name):
    from kgist_spark.plans.greedy_delta import DeltaGreedy
    from kgist_spark.plans.summarizer import graph_stats
    from kgist_spark.sources.edgelist import explode_labels, load_labels, load_triples

    triples = load_triples(spark, str(FIXTURES / f"{name}.txt"))
    labels = load_labels(spark, str(FIXTURES / f"{name}_labels.txt"))
    lf = explode_labels(labels)
    stats = graph_stats(triples, lf)
    label_node_counts = {
        r["label"]: r["n"]
        for r in lf.groupBy("label").agg(F.countDistinct("node").alias("n")).collect()
    }
    return DeltaGreedy(triples, lf, stats, label_node_counts)


@pytest.mark.parametrize("name,passes,qualify", [
    ("test", 2, True),
    ("test", 2, False),
    ("tiny", 2, True),
    ("tiny1", 2, True),
    ("repeated", 2, True),
    ("label_qualifier_1", 2, True),
    ("symmetric_tie", 2, True),
])
def test_delta_matches_exact(spark, name, passes, qualify):
    delta = build_delta(spark, name)
    result = delta.fit(passes=passes, label_qualify=qualify)

    kg = fixture_kg(name, idify=False)
    model = GreedySearcher(kg).build_model(passes=passes, label_qualify=qualify)
    ev = ModelEvaluator(kg)
    want_val = ev.evaluate(model)

    assert set(result["rules"]) == set(model.rules.keys())
    assert result["covered_edges"] == len(model.covered_edges)
    assert result["covered_labels"] == len(model.covered_labels)
    assert abs(result["objective_bits"] - want_val) < 1e-6


def test_symmetric_tie_resolved_by_per_head_order(spark):
    """The symmetric predicate's out/in candidate pair ties EXACTLY on every
    histogram-level quantity (same edges, labels covered, ca-size multiset);
    the reference's pick — the IN variant here, like full NELL's (24, 73, 24)
    — is decided by the per-head float summation order, which delta mode must
    replay (greedy_delta module docstring, "Float caveat").  Regression for
    the full-NELL nightly divergence: a histogram-only tie-break selects OUT."""
    delta = build_delta(spark, "symmetric_tie")
    result = delta.fit(passes=2, label_qualify=True)
    in_rule = (("A",), (("p", "in", (("A",), ())),))
    assert in_rule in set(result["rules"])


def test_fit_summary_front_door_reaches_both_regimes(spark):
    """ONE entry point picks the regime from a bounded contribution probe;
    both regimes produce the identical model on the fixture."""
    from kgist_spark.plans.summarizer import fit_summary
    from kgist_spark.sources.edgelist import load_labels, load_triples

    triples = load_triples(spark, str(FIXTURES / "test.txt"))
    labels = load_labels(spark, str(FIXTURES / "test_labels.txt"))

    auto = fit_summary(triples, labels)
    assert auto["mode"] == "exact"  # tiny fixture fits the driver budget

    # a 1-contribution budget forces auto into the distributed regime
    forced = fit_summary(triples, labels, exact_threshold=1)
    assert forced["mode"] == "delta"

    explicit = fit_summary(triples, labels, mode="delta")
    assert explicit["mode"] == "delta"

    for other in (forced, explicit):
        assert set(other["rules"]) == set(auto["rules"])
        assert abs(other["objective_bits"] - auto["objective_bits"]) < 1e-6
        assert other["covered_edges"] == auto["covered_edges"]
        assert other["covered_labels"] == auto["covered_labels"]

    with pytest.raises(ValueError):
        fit_summary(triples, labels, mode="bogus")


def test_fit_summary_delta_feeds_anomaly_scoring(spark):
    """The front door's delta handle drives batch anomaly scoring end to end
    AFTER fit_summary returned (i.e. after the raw contribution table was
    unpersisted) — the fit's own persisted projections must carry it."""
    from kgist_spark.operators.anomaly import score_edges, score_edges_delta
    from kgist_spark.plans.summarizer import fit_summary
    from kgist_spark.sources.edgelist import explode_labels, load_labels, load_triples

    triples = load_triples(spark, str(FIXTURES / "test.txt")).persist()
    labels = load_labels(spark, str(FIXTURES / "test_labels.txt")).persist()
    lf = explode_labels(labels)

    delta_fit = fit_summary(triples, labels, mode="delta")
    got = {
        (r["subj"], r["pred"], r["obj"]): r["score"]
        for r in score_edges_delta(
            delta_fit["delta"], delta_fit, triples, lf
        ).collect()
    }

    exact_fit = fit_summary(triples, labels, mode="exact")
    want = {
        (r["subj"], r["pred"], r["obj"]): r["score"]
        for r in score_edges(
            spark, exact_fit["model"], triples.select("subj", "pred", "obj"), lf
        ).collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6, (k, got[k], v)
