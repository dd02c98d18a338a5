"""Streaming anomaly scoring (streaming/score.py): micro-batch scoring is
EXACTLY batch scoring of the union (coverage is per-edge decidable), and a
replayed run is idempotent."""

import pytest

from kgist_spark.oracle.engine import GreedySearcher
from tests.conftest import fixture_kg

pytestmark = pytest.mark.spark


def _model_and_edges(idify=False):
    kg = fixture_kg("test", idify=idify)
    model = GreedySearcher(kg).build_model(passes=2, label_qualify=True)
    to_node = (lambda n: kg.id_to_node[n]) if idify else (lambda n: n)
    to_pred = (lambda p: kg.id_to_pred[p]) if idify else (lambda p: p)
    edges = sorted(
        {(to_node(s), to_pred(p), to_node(o)) for (s, p, o) in kg.id_to_edge.values()}
    )
    return model, edges


def _write_chunks(spark, edges, input_dir, n_chunks=3):
    step = (len(edges) + n_chunks - 1) // n_chunks
    for i in range(0, len(edges), step):
        (
            spark.createDataFrame(
                edges[i : i + step], "subj string, pred string, obj string"
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(input_dir)
        )


def test_streaming_scores_equal_batch(spark, tmp_path):
    from kgist_spark.operators.anomaly import score_edges
    from kgist_spark.streaming.score import run_streaming_score

    model, edges = _model_and_edges()
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(spark, edges, input_dir, n_chunks=3)

    n = run_streaming_score(
        spark, model, input_dir, out_dir, ckpt, max_files_per_trigger=1
    )
    assert n >= 3  # one micro-batch per file

    triples = spark.createDataFrame(edges, "subj string, pred string, obj string")
    want = {
        (r["subj"], r["pred"], r["obj"]): r["score"]
        for r in score_edges(spark, model, triples).collect()
    }
    got = {
        (r["subj"], r["pred"], r["obj"]): r["score"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert set(got) == set(want)
    for k, v in got.items():
        assert abs(v - want[k]) < 1e-12, (k, v, want[k])


def test_streaming_score_rerun_is_idempotent(spark, tmp_path):
    from kgist_spark.streaming.score import run_streaming_score

    model, edges = _model_and_edges()
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(spark, edges, input_dir, n_chunks=2)

    run_streaming_score(spark, model, input_dir, out_dir, ckpt)
    first = sorted(
        map(tuple, spark.read.parquet(out_dir).drop("batch").collect())
    )
    # a second run over the same checkpoint sees no new files and must not
    # duplicate or change anything
    run_streaming_score(spark, model, input_dir, out_dir, ckpt)
    second = sorted(
        map(tuple, spark.read.parquet(out_dir).drop("batch").collect())
    )
    assert first == second
    assert len(first) == len(edges)
