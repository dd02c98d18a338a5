"""Rule-set refinements Rm (merging) and Rn (nesting).

Driver-side operations over the fitted model's rule forest (rule sets are
O(100s)); the assertion forests they manipulate are planted from the
candidate index (reference GemsLab/KGist ``model.py:110-335``).  networkx is
replaced by hand-rolled adjacency dicts + Bron–Kerbosch (not installed here,
and the graphs are tiny).
"""

from __future__ import annotations

from copy import deepcopy
from typing import Dict, List

from kgist_spark.functions.ir import RuleTree
from kgist_spark.oracle.engine import ModelEvaluator, SummaryModel


def _as_tree(model: SummaryModel, rule) -> RuleTree:
    if isinstance(rule, RuleTree):
        tree = rule
    else:
        tree = RuleTree.from_tuple(rule)
    model.plant_forest(tree)
    return tree


def _assertion_roots(tree: RuleTree):
    return {real.root for real in tree.assertions}


# ---------------------------------------------------------------------------
# Rm — merging (reference model.py:110-164 prime graph + :178-206)
# ---------------------------------------------------------------------------

def shared_root_graph(model: SummaryModel):
    """Undirected graph over same-root rules whose assertion-root sets are
    identical (jaccard == 1.0). Returns (trees, adjacency dict)."""
    trees: List[RuleTree] = []
    root_to_trees: Dict[tuple, List[RuleTree]] = {}
    for rule in model.rules:
        tree = _as_tree(model, rule)
        trees.append(tree)
        root_to_trees.setdefault(tree.root, []).append(tree)

    adj: Dict[int, set] = {}
    by_id = {id(t): t for t in trees}
    for tree in trees:
        for other in root_to_trees[tree.root]:
            if other is tree:
                continue
            a, b = _assertion_roots(tree), _assertion_roots(other)
            union = a | b
            if union and len(a & b) == len(union):
                adj.setdefault(id(tree), set()).add(id(other))
                adj.setdefault(id(other), set()).add(id(tree))
    return by_id, adj


def _bron_kerbosch(adj: Dict[int, set]) -> List[List[int]]:
    """Maximal cliques with pivoting; deterministic order (sorted node ids)."""
    cliques: List[List[int]] = []

    def expand(r, p, x):
        if not p and not x:
            if r:  # the top-level call on an edgeless graph reaches here
                   # with r empty — there is no empty clique
                cliques.append(sorted(r))
            return
        pivot = max(p | x, key=lambda v: len(adj.get(v, ())))
        for v in sorted(p - adj.get(pivot, set())):
            expand(r | {v}, p & adj.get(v, set()), x & adj.get(v, set()))
            p = p - {v}
            x = x | {v}

    expand(set(), set(adj.keys()), set())
    return cliques


def merge_rules(model: SummaryModel) -> SummaryModel:
    """Rm: merge every maximal clique of same-root, same-assertion-set rules
    into one multi-branch rule (reference ``model.py:178-206``)."""
    by_id, adj = shared_root_graph(model)
    merged_model = SummaryModel(model.index)

    for clique in _bron_kerbosch(adj):
        members = [by_id[v] for v in clique]
        # deterministic merge order: by tuplified form, like-for-like with the
        # reference's content (child order only perturbs float sums < 1e-9)
        members.sort(key=lambda t: t.tuplify())
        new_rule = deepcopy(members[0])
        for other in members[1:]:
            new_rule.merge(deepcopy(other))
        merged_model.add_rule(new_rule)

    covered = {by_id[v].tuplify() for v in adj}
    for rule in model.rules:
        key = rule.tuplify() if isinstance(rule, RuleTree) else rule
        if key not in covered:
            merged_model.add_rule(rule)
    return merged_model


# ---------------------------------------------------------------------------
# Rn — nesting (reference model.py:237-335)
# ---------------------------------------------------------------------------

def rule_dependency_graph(model: SummaryModel):
    """Directed graph: (r1, r2) iff r2's root is one of r1's leaves and r1's
    root is not one of r2's leaves (no 2-loops); reference ``model.py:133-148``."""
    trees: List[RuleTree] = []
    root_to_trees: Dict[tuple, List[RuleTree]] = {}
    for rule in model.rules:
        tree = _as_tree(model, rule)
        trees.append(tree)
        root_to_trees.setdefault(tree.root, []).append(tree)

    edges = []
    for tree in trees:
        matching = []
        seen = set()
        for leaf in tree.leaves():
            for other in root_to_trees.get(leaf, ()):
                if id(other) not in seen:
                    seen.add(id(other))
                    matching.append(other)
        for other in matching:
            if tree.root in other.leaves():  # no 2-loops
                continue
            edges.append((tree, other))
    return trees, edges


class _DiGraph:
    """Minimal digraph on object identities (nest loop bookkeeping)."""

    def __init__(self, edges):
        self.succ: Dict[int, set] = {}
        self.pred: Dict[int, set] = {}
        self.obj: Dict[int, object] = {}
        for u, v in edges:
            self.add_edge(u, v)

    def add_node(self, u):
        self.obj[id(u)] = u
        self.succ.setdefault(id(u), set())
        self.pred.setdefault(id(u), set())

    def add_edge(self, u, v):
        self.add_node(u)
        self.add_node(v)
        self.succ[id(u)].add(id(v))
        self.pred[id(v)].add(id(u))

    def remove_edge(self, u, v):
        self.succ.get(id(u), set()).discard(id(v))
        self.pred.get(id(v), set()).discard(id(u))

    def edges(self):
        return [
            (self.obj[u], self.obj[v]) for u in self.succ for v in self.succ[u]
        ]

    def out_edges(self, u):
        return [(u, self.obj[v]) for v in self.succ.get(id(u), ())]

    def in_edges(self, u):
        return [(self.obj[v], u) for v in self.pred.get(id(u), ())]

    def contract(self, keep, absorb):
        """Redirect absorb's edges to keep, drop self-loops, remove absorb."""
        for v in list(self.succ.pop(id(absorb), ())):
            self.pred[v].discard(id(absorb))
            if v != id(keep):
                self.succ[id(keep)].add(v)
                self.pred[v].add(id(keep))
        for u in list(self.pred.pop(id(absorb), ())):
            self.succ[u].discard(id(absorb))
            if u != id(keep):
                self.succ[u].add(id(keep))
                self.pred[id(keep)].add(u)
        del self.obj[id(absorb)]

    def relabel(self, old, new):
        oid, nid = id(old), id(new)
        self.obj[nid] = new
        self.succ[nid] = self.succ.pop(oid, set())
        self.pred[nid] = self.pred.pop(oid, set())
        del self.obj[oid]
        for v in self.succ[nid]:
            self.pred[v].discard(oid)
            self.pred[v].add(nid)
        for u in self.pred[nid]:
            self.succ[u].discard(oid)
            self.succ[u].add(nid)


def nest_rules(model: SummaryModel, max_rounds: int | None = None) -> SummaryModel:
    """Rn: repeatedly try composing dependent rule pairs (pin r2 under r1's
    matching leaf), keep a composition whenever it lowers the full objective
    (reference ``model.py:237-335``)."""
    trees, dep_edges = rule_dependency_graph(model)
    evaluator = ModelEvaluator(model.index)
    graph = _DiGraph(dep_edges)

    def compose(r1: RuleTree, r2: RuleTree) -> RuleTree:
        composed = deepcopy(r1)
        assert composed.pin_to_leaf(r2)
        composed.filter_errant()
        return composed

    def checkable(r):
        return r.tuplify() if isinstance(r, RuleTree) else r

    jaccard = {}
    for u, v in graph.edges():
        jaccard[(id(u), id(v))] = u.jaccard_sim(v)

    best_model = model
    best_val = evaluator.evaluate(best_model)
    seen_pairs = set()
    last_model = None
    rounds = 0
    while last_model is not best_model:
        if max_rounds is not None and rounds >= max_rounds:
            break
        rounds += 1
        rules = set(best_model.rules.keys())
        last_model = best_model
        pairs = graph.edges()
        pairs.sort(key=lambda e: [e[0].tuplify()] + [e[1].tuplify()])
        pairs.sort(key=lambda e: jaccard[(id(e[0]), id(e[1]))], reverse=True)
        for r1, r2 in pairs:
            if (id(r1), id(r2)) in seen_pairs or checkable(r1) == checkable(r2):
                continue
            seen_pairs.add((id(r1), id(r2)))
            candidate = compose(r1, r2)
            if not candidate.assertions:
                continue
            # cheap pre-filter before the full re-evaluation (model.py:292-294)
            approx = (
                best_val
                - evaluator.rule_len(r1)
                - evaluator.assertions_len(r1, best_model)
                - evaluator.rule_len(r2)
                - evaluator.assertions_len(r2, best_model)
                + evaluator.rule_len(candidate)
                + evaluator.assertions_len(candidate, best_model)
            )
            if approx >= best_val:
                continue
            trial = SummaryModel(model.index)
            for rule in rules:
                if checkable(rule) != checkable(r1) and checkable(rule) != checkable(r2):
                    trial.add_rule(rule)
            trial.add_rule(candidate)
            new_val = evaluator.evaluate(trial)
            if new_val < best_val:
                best_model = trial
                best_val = new_val
                graph.contract(r1, r2)
                graph.relabel(r1, candidate)
                for a, b in graph.out_edges(candidate) + graph.in_edges(candidate):
                    if (id(a), id(b)) not in jaccard:
                        jaccard[(id(a), id(b))] = a.jaccard_sim(b)
                # prune illegal edges (composed inner nodes must still match)
                for comp, y in graph.out_edges(candidate):
                    if y.root not in comp.inner_nodes():
                        graph.remove_edge(comp, y)
                for y, comp in graph.in_edges(candidate):
                    if comp.root not in y.inner_nodes():
                        graph.remove_edge(y, comp)
                break
    return best_model
