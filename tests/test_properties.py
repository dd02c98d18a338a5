"""Property-based invariants on random tiny KGs (hypothesis)."""

from hypothesis import given, settings, strategies as st

from kgist_spark.functions import mdl
from kgist_spark.oracle.engine import GreedySearcher, ModelEvaluator, SummaryModel
from kgist_spark.oracle.kg import LocalKG

NODES = [f"n{i}" for i in range(8)]
LABELS = ["la", "lb", "lc", "ld"]
PREDS = ["p0", "p1", "p2"]


@st.composite
def random_kg(draw):
    label_rows = []
    for n in NODES:
        labels = draw(st.lists(st.sampled_from(LABELS), min_size=1, max_size=3, unique=True))
        label_rows.append((n, tuple(labels)))
    n_edges = draw(st.integers(min_value=1, max_value=15))
    edges = [
        (draw(st.sampled_from(NODES)), draw(st.sampled_from(PREDS)), draw(st.sampled_from(NODES)))
        for _ in range(n_edges)
    ]
    return LocalKG.from_rows(label_rows, edges)


@settings(max_examples=40, deadline=None)
@given(random_kg())
def test_candidate_count_matches_combinatorics(kg):
    combos = set()
    for s, p, o in kg.id_to_edge.values():
        for sl in kg.labels(s):
            for ol in kg.labels(o):
                combos.add((sl, p, "out", ol))
                combos.add((ol, p, "in", sl))
    assert len(kg.candidates) == len(combos)


@settings(max_examples=30, deadline=None)
@given(random_kg())
def test_evaluate_equals_evaluate_change_incrementally(kg):
    ev = ModelEvaluator(kg)
    model = SummaryModel(kg)
    _, m_len, _, _ = ev.evaluate(model, with_lengths=True)
    for rule in list(kg.ordered_rules())[:6]:
        model.add_rule(rule)
        inc_val, m_len, _, _ = ev.evaluate_change(model, rule, m_len)
        full_val = ev.evaluate(model)
        assert abs(inc_val - full_val) < 1e-9


@settings(max_examples=30, deadline=None)
@given(random_kg())
def test_add_then_remove_restores_state(kg):
    ev = ModelEvaluator(kg)
    model = SummaryModel(kg)
    before = ev.evaluate(model, with_lengths=True)
    edges_before = set(model.covered_edges)
    for rule in list(kg.ordered_rules())[:8]:
        model.add_rule(rule)
        model.remove_rule(rule)
        assert ev.evaluate(model, with_lengths=True) == before
        assert model.covered_edges == edges_before


@settings(max_examples=25, deadline=None)
@given(random_kg())
def test_coverage_monotone_and_bounded(kg):
    model = SummaryModel(kg)
    prev_e, prev_l = 0, 0
    for rule in kg.ordered_rules():
        model.add_rule(rule)
        assert len(model.covered_edges) >= prev_e
        assert len(model.covered_labels) >= prev_l
        prev_e, prev_l = len(model.covered_edges), len(model.covered_labels)
    assert model.covered_edges <= set(kg.id_to_edge.keys())
    assert len(model.covered_labels) <= kg.total_num_labels


@settings(max_examples=20, deadline=None)
@given(random_kg())
def test_greedy_never_worse_than_null(kg):
    model = GreedySearcher(kg).build_model(passes=1, label_qualify=True)
    ev = ModelEvaluator(kg)
    assert ev.evaluate(model) <= ev.evaluate(SummaryModel(kg)) + 1e-9


@settings(max_examples=25, deadline=None)
@given(random_kg())
def test_idify_invariant_bits(kg_raw):
    """Dictionary encoding must not change any MDL quantity."""
    label_rows = [(n, labels) for n, labels in kg_raw.node_to_labels.items()]
    edges = [kg_raw.id_to_edge[i] for i in range(kg_raw.m)]
    kg_id = LocalKG.from_rows(label_rows, edges, idify=True)
    assert kg_id.stats.n == kg_raw.stats.n
    assert kg_id.stats.m == kg_raw.stats.m
    assert kg_id.stats.total_num_labels == kg_raw.stats.total_num_labels
    assert len(kg_id.candidates) == len(kg_raw.candidates)
    null_raw = ModelEvaluator(kg_raw).evaluate(SummaryModel(kg_raw))
    null_id = ModelEvaluator(kg_id).evaluate(SummaryModel(kg_id))
    assert abs(null_raw - null_id) < 1e-9


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_length_natural_number_monotone(n):
    assert mdl.length_natural_number(n + 1) >= mdl.length_natural_number(n)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=500), st.integers(min_value=0, max_value=500))
def test_length_binomial_symmetry(n, k):
    if k <= n:
        assert abs(mdl.length_binomial(n, k) - mdl.length_binomial(n, n - k)) < 1e-6
        assert mdl.length_binomial(n, k) >= -1e-9
