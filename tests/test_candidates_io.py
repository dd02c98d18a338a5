"""S3 — candidate-table persist/reload: fitting from a reloaded table must
produce the identical model, for both the exact-mode summarizer and the
delta-mode greedy (restartable across sessions)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import FIXTURES

pytestmark = pytest.mark.spark


def _load(spark, name):
    from kgist_spark.sources.edgelist import explode_labels, load_labels, load_triples

    triples = load_triples(spark, str(FIXTURES / f"{name}.txt"))
    labels = load_labels(spark, str(FIXTURES / f"{name}_labels.txt"))
    return triples, labels, explode_labels(labels)


def test_summarizer_from_reloaded_candidates(spark, tmp_path):
    from kgist_spark.operators.candidates import candidate_edges
    from kgist_spark.plans.summarizer import SparkSummarizer
    from kgist_spark.sources.candidates_io import load_candidates, save_candidates

    triples, labels, lf = _load(spark, "test")
    path = str(tmp_path / "cand")
    save_candidates(candidate_edges(triples, lf), path)

    fresh = SparkSummarizer(triples, labels, idify=True)
    model_fresh = fresh.fit(passes=2, label_qualify=True)

    reloaded = SparkSummarizer(
        triples, labels, idify=True, cand_edges=load_candidates(spark, path)
    )
    model_re = reloaded.fit(passes=2, label_qualify=True)

    want = {fresh.index.tuplify(r) for r in model_fresh.rules}
    got = {reloaded.index.tuplify(r) for r in model_re.rules}
    assert got == want
    assert model_re.covered_edges == model_fresh.covered_edges


def test_delta_greedy_restart_from_reloaded_candidates(spark, tmp_path):
    from kgist_spark.operators.candidates import candidate_edges
    from kgist_spark.plans.greedy_delta import DeltaGreedy
    from kgist_spark.plans.summarizer import graph_stats
    from kgist_spark.sources.candidates_io import load_candidates, save_candidates

    triples, labels, lf = _load(spark, "test")
    stats = graph_stats(triples, lf)
    lnc = {
        r["label"]: r["n"]
        for r in lf.groupBy("label").agg(F.countDistinct("node").alias("n")).collect()
    }
    path = str(tmp_path / "cand")
    save_candidates(candidate_edges(triples, lf), path)

    fresh = DeltaGreedy(triples, lf, stats, lnc).fit(passes=2, label_qualify=True)
    restarted = DeltaGreedy(
        triples, lf, stats, lnc, cand=load_candidates(spark, path)
    ).fit(passes=2, label_qualify=True)

    assert set(restarted["rules"]) == set(fresh["rules"])
    assert restarted["objective_bits"] == pytest.approx(fresh["objective_bits"], abs=1e-9)
    assert restarted["covered_edges"] == fresh["covered_edges"]


def test_load_candidates_rejects_foreign_parquet(spark, tmp_path):
    from kgist_spark.sources.candidates_io import load_candidates

    p = str(tmp_path / "other")
    spark.createDataFrame([(1, "x")], ["a", "b"]).write.parquet(p)
    with pytest.raises(ValueError, match="not a candidate table"):
        load_candidates(spark, p)
