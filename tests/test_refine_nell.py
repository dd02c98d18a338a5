"""Rm/Rn refinement parity at NELL scale.

Goldens captured from the reference engine run side-by-side in this sandbox:

* full NELL, Rm: 647 merged rules, L(G,M) = 4575872.7225 bits,
  181,874 covered edges, 42,456 covered labels — clique-order-insensitive,
  so exact parity is required and asserted.
* nell3k slice (first 3,000 triples): base 39 rules / 698408.6634 bits and
  merged 27 rules / 697983.4154 bits match exactly.  The reference's NESTED
  result (24 rules / 697185.6022 bits) depends on networkx's maximal-clique
  enumeration order through merged-rule child order (tie-breaking among
  equal-jaccard pairs); this engine uses a canonical sorted order instead
  and must do at least as well — measured 22 rules / 696592.4415 bits.
"""

import zipfile

import pytest

from kgist_spark.oracle import GreedySearcher, LocalKG, ModelEvaluator
from kgist_spark.oracle.refine import merge_rules, nest_rules
from tests.conftest import NELL_ZIP

pytestmark = pytest.mark.nell

REF_NELL_RM = {
    "n_rules": 647,
    "bits": 4575872.722499937,
    "covered_edges": 181874,
    "covered_labels": 42456,
}
REF_3K = {
    "base": (39, 698408.6634216765),
    "merged": (27, 697983.4153721535),
    "nested_reference": (24, 697185.6021559609),
}


@pytest.fixture(scope="module")
def nell_dir(tmp_path_factory):
    if not NELL_ZIP.exists():
        pytest.skip("NELL dataset not available")
    target = tmp_path_factory.mktemp("nell_refine")
    with zipfile.ZipFile(NELL_ZIP) as z:
        z.extractall(target)
    return target


def test_full_nell_merge_matches_reference(nell_dir):
    kg = LocalKG.from_files(str(nell_dir / "nell.txt"), str(nell_dir / "nell_labels.txt"), idify=True)
    model = GreedySearcher(kg).build_model(passes=2, label_qualify=True)
    merged = merge_rules(model)
    ev = ModelEvaluator(kg)
    assert len(merged.rules) == REF_NELL_RM["n_rules"]
    assert abs(ev.evaluate(merged) - REF_NELL_RM["bits"]) < 1e-3
    assert len(merged.covered_edges) == REF_NELL_RM["covered_edges"]
    assert len(merged.covered_labels) == REF_NELL_RM["covered_labels"]

    # The reference README publishes 26.5164 bits for this edge under
    # KGist+m; a LIVE run of the reference itself (scipy/networkx shimmed)
    # on the shipped NELL data scores it 26.542208568396546 under BOTH the
    # base and the Rm-merged model — the published number is not
    # reproducible from the shipped code+data.  We pin parity with the live
    # run, base and merged alike.
    from kgist_spark.oracle.anomaly import AnomalyScorer

    edge = ("concept:company:limited_brands", "concept:companyceo",
            "concept:ceo:leslie_wexner")
    live_reference_score = 26.542208568396546
    assert abs(AnomalyScorer(model).score_edge(edge) - live_reference_score) < 1e-6
    assert abs(AnomalyScorer(merged).score_edge(edge) - live_reference_score) < 1e-6


@pytest.mark.spark
def test_full_nell_merged_model_distributed_readme_edge(nell_dir, spark):
    """The README edge scores 26.5422 through the DISTRIBUTED batch scorer
    under the Rm-merged model, with the covered set reconstructed from the
    merged rules' atom patterns on the cluster (no driver-materialized
    per-edge relation anywhere in the path)."""
    from kgist_spark.operators.anomaly import score_edges

    kg = LocalKG.from_files(
        str(nell_dir / "nell.txt"), str(nell_dir / "nell_labels.txt"), idify=True
    )
    model = GreedySearcher(kg).build_model(passes=2, label_qualify=True)
    merged = merge_rules(model)
    edge = ("concept:company:limited_brands", "concept:companyceo",
            "concept:ceo:leslie_wexner")
    triples = spark.createDataFrame([edge], "subj string, pred string, obj string")
    got = score_edges(spark, merged, triples).collect()
    assert len(got) == 1
    assert abs(got[0]["score"] - 26.542208568396546) < 1e-5


def test_nell3k_full_refinement_chain(nell_dir):
    slice_path = nell_dir / "nell3k.txt"
    with open(nell_dir / "nell.txt") as f:
        lines = [next(f) for _ in range(3000)]
    slice_path.write_text("".join(lines))

    kg = LocalKG.from_files(str(slice_path), str(nell_dir / "nell_labels.txt"), idify=True)
    model = GreedySearcher(kg).build_model(passes=2, label_qualify=True)
    ev = ModelEvaluator(kg)
    assert (len(model.rules), round(ev.evaluate(model), 4)) == (
        REF_3K["base"][0], round(REF_3K["base"][1], 4))

    merged = merge_rules(model)
    assert (len(merged.rules), round(ev.evaluate(merged), 4)) == (
        REF_3K["merged"][0], round(REF_3K["merged"][1], 4))

    nested = nest_rules(merged)
    nested_bits = ModelEvaluator(kg).evaluate(nested)
    assert nested_bits <= ev.evaluate(merged)
    # canonical tie-breaking must do at least as well as the reference run
    assert nested_bits <= REF_3K["nested_reference"][1] + 1e-6
