"""Full-scale NELL parity: rule set, MDL bits and anomaly ranking must match
the reference engine exactly.

``tests/goldens_nell.json`` was captured by running the reference
implementation itself (GemsLab/KGist, idify=True, passes=2, label_qualify)
on the NELL dataset: 1115 rules, L(G,M)=4630889.9845 bits, plus anomaly
scores for 200 seeded sample edges and the README example edge.

Needs the NELL dataset (extracted from the read-only reference checkout);
skipped when unavailable.  Runtime ~30 s.
"""

import json
import hashlib
import os
import zipfile
from pathlib import Path

import pytest

from kgist_spark.oracle import GreedySearcher, LocalKG, ModelEvaluator
from kgist_spark.oracle.anomaly import AnomalyScorer
from tests.conftest import NELL_ZIP

pytestmark = pytest.mark.nell

GOLDENS = Path(__file__).parent / "goldens_nell.json"


@pytest.fixture(scope="module")
def nell_dir(tmp_path_factory):
    if not NELL_ZIP.exists():
        pytest.skip("NELL dataset not available")
    target = tmp_path_factory.mktemp("nell")
    with zipfile.ZipFile(NELL_ZIP) as z:
        z.extractall(target)
    return target


@pytest.fixture(scope="module")
def fitted(nell_dir):
    kg = LocalKG.from_files(str(nell_dir / "nell.txt"), str(nell_dir / "nell_labels.txt"), idify=True)
    n_initial_candidates = len(kg.candidates)  # qualification rekeys in place
    model = GreedySearcher(kg).build_model(passes=2, label_qualify=True)
    return kg, model, n_initial_candidates


@pytest.fixture(scope="module")
def golden():
    return json.loads(GOLDENS.read_text())


def test_nell_graph_stats(fitted):
    kg, _, n_initial_candidates = fitted
    assert kg.n == 46682
    assert kg.m == 231634
    assert kg.num_node_labels == 266
    assert kg.num_edge_labels == 821
    assert kg.total_num_labels == 71391
    assert n_initial_candidates == 66384


def test_nell_rule_set_matches_reference(fitted, golden):
    kg, model, _ = fitted
    assert len(model.rules) == golden["n_rules"]
    rules = sorted(repr(kg.tuplify(r)) for r in model.rules)
    assert hashlib.sha256("\n".join(rules).encode()).hexdigest() == golden["rule_set_sha256"]


def test_nell_mdl_bits_match_reference(fitted, golden):
    kg, model, _ = fitted
    ev = ModelEvaluator(kg)
    val, mlen, ne, nn = ev.evaluate(model, with_lengths=True)
    assert abs(val - golden["bits_total"]) < 1e-4
    assert abs(mlen - golden["bits_model"]) < 1e-4
    assert abs(ne - golden["bits_neg_edge"]) < 1e-4
    assert abs(nn - golden["bits_neg_node"]) < 1e-4
    assert abs(model.percent_edges_explained() - golden["pct_edges_explained"]) < 1e-9


def test_nell_anomaly_scores_match_reference(fitted, golden):
    kg, model, _ = fitted
    scorer = AnomalyScorer(model)
    assert abs(
        scorer.score_edge(("concept:company:limited_brands", "concept:companyceo", "concept:ceo:leslie_wexner"))
        - golden["readme_edge_score"]
    ) < 1e-6
    # per-edge scores — and therefore the anomaly ranking — match
    got, want = [], []
    for eid_str, ref_score in golden["sample_edge_scores"].items():
        sub, pred, obj = kg.id_to_edge[int(eid_str)]
        score = scorer.score_edge((sub, pred, obj))
        assert abs(score - ref_score) < 1e-5, eid_str
        got.append((score, int(eid_str)))
        want.append((ref_score, int(eid_str)))
    assert [e for _, e in sorted(got)] == [e for _, e in sorted(want)]
