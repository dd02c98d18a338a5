"""Anomaly scoring of triples in bits (reference GemsLab/KGist
``anomaly_detector.py``).

A triple is costly (anomalous) when (a) it is not explained by the model —
its share of the negative-edge-error bits — and (b) its endpoints are
exceptions to rules that their labels say should apply
(``score_blame_edge``, ``anomaly_detector.py:40-71``).

``precompute_blame_table`` exposes the per-(node, pred) blame bits as plain
rows, which is what the distributed batch scorer joins against (see
``kgist_spark.operators.anomaly``).
"""

from __future__ import annotations

from itertools import chain, combinations
from typing import Dict

from kgist_spark.functions.mdl import length_binomial, length_negative_edge_error
from kgist_spark.functions.ir import RuleTree
from kgist_spark.oracle.engine import SummaryModel


def _powerset(labels):
    s = list(labels)
    return chain.from_iterable(combinations(s, r) for r in range(1, len(s) + 1))


class AnomalyScorer:
    def __init__(self, model: SummaryModel):
        self.model = model
        self.index = model.index
        self.stats = self.index.stats
        # root label-set -> rules
        self.subject_to_rules: Dict[tuple, set] = {}
        for rule in model.rules:
            root = rule.root if isinstance(rule, RuleTree) else rule[0]
            self.subject_to_rules.setdefault(root, set()).add(rule)
        # (s, p, o) -> eid (first occurrence wins for duplicates)
        self.edge_to_id = {}
        for eid, edge in self.index.id_to_edge.items():
            if edge not in self.edge_to_id:
                self.edge_to_id[edge] = eid
        self._unexplained_bits = None

    # -- per-rule exception stats (the blame table) ------------------------
    def rule_exception_bits(self, rule):
        """(num_assertions, num_exceptions, log2 C(n_a, n_e)) for a rule."""
        if isinstance(rule, RuleTree):
            root = rule.root
            num_correct = len(rule.assertions)
        else:
            root = rule[0]
            num_correct = len(self.index.record(rule).ca_to_size)
        num_assertions = self.index.nodes_with_type(root)
        num_exceptions = num_assertions - num_correct
        return num_assertions, num_exceptions, length_binomial(num_assertions, num_exceptions)

    def _rule_heads(self, rule):
        if isinstance(rule, RuleTree):
            return {real.root for real in rule.assertions}
        return set(self.index.record(rule).ca_to_size.keys())

    def _rule_preds(self, rule):
        if isinstance(rule, RuleTree):
            return rule.preds()
        return {rule[1][0][0]}

    def blame_bits(self, node, pred) -> float:
        """Bits blaming ``node`` for being an exception to applicable rules
        mentioning ``pred`` (reference ``anomaly_detector.py:40-71``)."""
        rules = set()
        for labels in _powerset(self.index.labels(node)):
            rules.update(self.subject_to_rules.get(labels, ()))
        score = 0.0
        for rule in rules:
            if pred not in self._rule_preds(rule):
                continue
            if node in self._rule_heads(rule):
                continue
            num_assertions, num_exceptions, bits = self.rule_exception_bits(rule)
            # a labeled non-head node is itself an exception, so > 0
            assert num_exceptions > 0
            score += bits / num_exceptions
        return score

    # -- per-edge score ----------------------------------------------------
    def unexplained_edge_bits(self) -> float:
        if self._unexplained_bits is None:
            neg = length_negative_edge_error(len(self.model.covered_edges), self.stats)
            remaining = self.stats.m - len(self.model.covered_edges)
            self._unexplained_bits = neg / remaining if remaining else 0.0
        return self._unexplained_bits

    def score_edge(self, edge) -> float:
        """Bits for one (s, p, o) triple (reference ``anomaly_detector.py:73-83``).
        Accepts raw-vocabulary triples when the index was built with idify."""
        if self.index.idify and isinstance(edge[0], str):
            edge = (
                self.index.node_to_id[edge[0]],
                self.index.pred_to_id[edge[1]],
                self.index.node_to_id[edge[2]],
            )
        sub, pred, obj = edge
        eid = self.edge_to_id.get(edge)
        score = 0.0
        if eid is None or eid not in self.model.covered_edges:
            score = self.unexplained_edge_bits()
        return score + self.blame_bits(sub, pred) + self.blame_bits(obj, pred)

    def blame_table(self):
        """Per-rule rows ``(root_labels, pred, heads, bits_per_exception)`` for
        the distributed batch scorer."""
        rows = []
        for rule in self.model.rules:
            root = rule.root if isinstance(rule, RuleTree) else rule[0]
            _, num_exceptions, bits = self.rule_exception_bits(rule)
            rows.append(
                {
                    "root": root,
                    "preds": sorted(self._rule_preds(rule)),
                    "heads": self._rule_heads(rule),
                    "bits_per_exception": bits / num_exceptions if num_exceptions else 0.0,
                }
            )
        return rows
