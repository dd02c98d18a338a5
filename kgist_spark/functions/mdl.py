"""Minimum-description-length (MDL) encoding terms for KGist-style models.

All functions here are pure, driver-side arithmetic over *aggregated counts*.
The distributed plans (see ``kgist_spark.operators``) reduce the graph to
these counts first; doing every floating-point step on the driver in a fixed
order is what makes the distributed engine bit-identical to a single-node run
regardless of partitioning.

Semantics follow the reference implementation (GemsLab/KGist):

* integer / binomial codes: ``evaluator.py:64-97``
* model and rule lengths L(M), L(g): ``evaluator.py:99-163``
* assertion lengths L(alpha(g)): ``evaluator.py:165-238``
* error terms L(A-), L(L-): ``evaluator.py:249-271``

validated against the reference's inlined unit-test expansions
(``test/test_evaluator.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from math import lgamma, log, log2
from typing import Mapping, Sequence

#: log2 of Rissanen's constant c0 ~= 2.865064 (universal integer code).
_RISSANEN = 2.865064

_LN2 = log(2.0)


@lru_cache(maxsize=None)
def length_natural_number(n: int) -> float:
    """Rissanen universal code length L_N(n) in bits; 0 for n <= 0.

    Matches reference ``evaluator.py:64-80`` (incl. the n<=0 guard).
    """
    if n <= 0:
        return 0.0
    c = log2(_RISSANEN)
    i = log2(n)
    while i > 0:
        c += i
        i = log2(i)
    return c


@lru_cache(maxsize=None)
def length_binomial(n: int, k: int) -> float:
    """log2 C(n, k) via lgamma (reference ``evaluator.py:82-97``).

    The reference uses ``scipy.special.gammaln``; ``math.lgamma`` computes the
    same log-Gamma for positive reals to double precision.  For the impossible
    cases k < 0 or k > n there are zero ways to choose (C = 0 → log2 = -inf);
    ``math.lgamma`` raises on the negative-integer pole where scipy returns
    inf, so the guard makes the two agree.
    """
    if k < 0 or k > n:
        return float("-inf")
    return (lgamma(n + 1) - lgamma(k + 1) - lgamma(n + 1 - k)) / _LN2


@dataclass(frozen=True)
class GraphStats:
    """The scalar aggregates the MDL objective consumes.

    In the distributed engine these come from ``count()``/``groupBy().count()``
    jobs over the triples/labels tables; in the local oracle from plain dicts.
    """

    n: int  # |V| — number of nodes
    m: int  # |E| — number of edges (triples, duplicates counted)
    num_node_labels: int  # |L_V|
    num_edge_labels: int  # |L_E|
    total_num_labels: int  # total (node,label) assignments
    node_label_counts: Mapping[object, int] = field(default_factory=dict)
    edge_label_counts: Mapping[object, int] = field(default_factory=dict)


def length_model_header(stats: GraphStats) -> float:
    """Bits to encode the number of rules (reference ``evaluator.py:109``)."""
    return log2(2 * stats.num_node_labels * stats.num_edge_labels * stats.num_node_labels + 1)


def length_rule(rule, stats: GraphStats) -> float:
    """L(g) for a rule in recursive-tuple form
    ``(root_labels, ((pred, dir, child_rule), ...))``.

    Reference ``evaluator.py:115-163`` (the tuple branch; the Rule-tree branch
    is numerically identical, asserted by reference ``test_evaluator.py:416-431``,
    so tree rules are converted with ``.tuplify()`` before calling this).
    """
    root, children = rule
    bits = log2(stats.num_node_labels)
    for label in root:
        bits += -log2(stats.node_label_counts[label] / stats.n)
    bits += length_natural_number(len(children) + 1)
    for pred, _direction, child in children:
        bits += -log2(stats.edge_label_counts[pred] / stats.m)
        bits += 1.0  # direction bit
        bits += length_rule(child, stats)
    return bits


def length_assertions_flat(
    num_assertions: int, ca_sizes: Sequence[int], stats: GraphStats
) -> float:
    """L(alpha(g)) for a level-0 (star) rule from aggregated counts.

    ``num_assertions`` = #nodes carrying the root label set;
    ``ca_sizes`` = per-correct-assertion edge counts (the out/in-degree of each
    head under the rule).  Reference ``evaluator.py:212-238``.
    """
    num_exceptions = num_assertions - len(ca_sizes)
    bits = log2(num_assertions)
    bits += length_binomial(num_assertions, num_exceptions)
    log_v = log2(stats.n)
    for size in ca_sizes:
        bits += log_v + length_binomial(stats.n - 1, size)
    return bits


def length_assertions_from_histogram(
    num_assertions: int, size_histogram: Mapping[int, int], stats: GraphStats
) -> float:
    """Same as :func:`length_assertions_flat` but from a {ca_size: count}
    histogram — the shape a distributed ``groupBy(rule, size).count()``
    naturally produces, so the driver never needs the per-head list.
    """
    num_correct = sum(size_histogram.values())
    num_exceptions = num_assertions - num_correct
    bits = log2(num_assertions)
    bits += length_binomial(num_assertions, num_exceptions)
    log_v = log2(stats.n)
    for size, cnt in size_histogram.items():
        bits += cnt * (log_v + length_binomial(stats.n - 1, size))
    return bits


def length_negative_edge_error(num_covered_edges: int, stats: GraphStats) -> float:
    """L(A-) — bits to transmit unexplained edges (reference ``evaluator.py:249-259``)."""
    num_unexplained = stats.m - num_covered_edges
    return length_binomial(
        (stats.n**2) * stats.num_edge_labels - num_covered_edges, num_unexplained
    )


def length_negative_label_error(num_covered_labels: int, stats: GraphStats) -> float:
    """L(L-) — bits to transmit unexplained label assignments
    (reference ``evaluator.py:261-271``).
    """
    num_unexplained = stats.total_num_labels - num_covered_labels
    return length_binomial(
        stats.num_node_labels * stats.n - num_covered_labels, num_unexplained
    )


def length_error(num_covered_edges: int, num_covered_labels: int, stats: GraphStats) -> float:
    """L(G|M) = L(A-) + L(L-)."""
    return length_negative_edge_error(num_covered_edges, stats) + length_negative_label_error(
        num_covered_labels, stats
    )
