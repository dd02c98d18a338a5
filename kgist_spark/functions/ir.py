"""Rule intermediate representation.

A *level-0* rule is the recursive tuple
``(root_labels, ((pred, 'out'|'in', (child_labels, ())), ...))`` — the exact
value format of the reference engine (GemsLab/KGist ``evaluator.py:117-127``
docstring; examples throughout its ``test_searcher.py``).  Rule sets are tiny
(hundreds), so trees and their realized assertions live on the driver; the
distributed tables only ever carry the flat key columns
``(root_label, pred, dir, child_label)`` plus serialized JSON for nested rules.

``RuleTree`` / ``Assertion`` mirror the semantics of the reference's
``rule.py`` / ``correct_assertion.py`` (merge: ``rule.py:65-76``,
pin_to_leaf: ``rule.py:78-103``, filter_errant: ``rule.py:170-209``,
compose: ``correct_assertion.py:68-72``) — needed for the Rm/Rn refinements
and for encoding nested-rule assertion forests.
"""

from __future__ import annotations

import json
from math import log2
from typing import Iterable

from kgist_spark.functions.mdl import GraphStats, length_binomial


# ---------------------------------------------------------------------------
# tuple-form helpers
# ---------------------------------------------------------------------------

def atom(root_labels, pred, direction, child_labels):
    """Build a level-0 rule tuple."""
    return (tuple(root_labels), ((pred, direction, (tuple(child_labels), ())),))


def reverse_of(rule):
    """The mirrored rule rooted at the child (reference ``searcher.py:195-196``)."""
    root, children = rule
    pred, direction, child = children[0]
    flipped = "in" if direction == "out" else "out"
    return (child[0], ((pred, flipped, (root, ())),))


def rule_to_json(rule) -> str:
    """Serialize a rule tuple to a canonical JSON string (for DataFrame keys)."""

    def conv(r):
        root, children = r
        return {"root": list(root), "children": [[p, d, conv(c)] for p, d, c in children]}

    return json.dumps(conv(rule), separators=(",", ":"), sort_keys=True)


def rule_from_json(s: str):
    def conv(d):
        return (
            tuple(d["root"]),
            tuple((p, dr, conv(c)) for p, dr, c in d["children"]),
        )

    return conv(json.loads(s))


def rule_to_dot(rule) -> str:
    """Graphviz DOT source for a rule (S5; reference ``rule.py:222-254``).

    The reference renders via the ``graphviz`` binding (absent here); the
    graph it draws — one node per rule level named by the root label's last
    ``:``-segment (doublecircle root), one labeled edge per child oriented by
    direction — is emitted as plain DOT text instead, renderable with any
    ``dot`` binary and dependency-free."""

    def seg(v):
        return str(v).split(":")[-1]

    root, _ = rule
    nodes, edges = {}, []
    frontier = [rule]
    while frontier:
        node = frontier.pop()
        nroot, children = node
        shape = "doublecircle" if nroot == root else "circle"
        nodes.setdefault(seg(nroot[0]), shape)
        for pred, direction, child in children:
            frontier.insert(0, child)
            a, b = seg(nroot[0]), seg(child[0][0])
            if direction == "out":
                edges.append((a, seg(pred), b))
            else:
                edges.append((b, seg(pred), a))
    lines = ["digraph rule {"]
    for name, shape in nodes.items():
        lines.append(f'  "{name}" [shape={shape}];')
    for a, p, b in edges:
        lines.append(f'  "{a}" -> "{b}" [label=" {p}"];')
    lines.append("}")
    return "\n".join(lines)


def retuple(rule, label_map=None, pred_map=None):
    """Map ids back to strings through the dictionaries (reference
    ``graph.py:184-187`` ``tuplify``); identity when maps are None."""
    root, children = rule
    new_root = tuple(label_map[l] for l in root) if label_map else root
    return (
        new_root,
        tuple(
            (pred_map[p] if pred_map else p, d, retuple(c, label_map, pred_map))
            for p, d, c in children
        ),
    )


# ---------------------------------------------------------------------------
# realized assertions (rooted subgraphs)
# ---------------------------------------------------------------------------

class AssertionNode:
    """A node inside a realized assertion, with typed adjacency."""

    __slots__ = ("name", "type", "neighbors_of_type", "neighbors")

    def __init__(self, name, typ):
        self.name = name
        self.type = typ
        # (pred, dir, neighbor_type_tuple) -> set of neighbor names
        self.neighbors_of_type = {}
        self.neighbors = set()

    def link(self, pred, direction, node_type, node):
        key = (pred, direction, node_type)
        self.neighbors_of_type.setdefault(key, set()).add(node)
        self.neighbors.add(node)


class Assertion:
    """A realized rule: a rooted subgraph plus the edge ids / label pairs it
    covers (reference ``correct_assertion.py:18-72``)."""

    __slots__ = ("root", "nodes", "edges", "edge_ids", "labels")

    def __init__(self, root):
        self.root = root
        self.nodes = {}
        self.edges = set()
        self.edge_ids = set()
        self.labels = set()

    def add_edge(self, edge, eid=None, track_labels=False):
        """:edge: ``(u, u_typ, pred, dir, v, v_typ)`` with dir seen from u."""
        u, u_typ, pred, direction, v, v_typ = edge
        sub, sub_typ = (u, u_typ) if direction == "out" else (v, v_typ)
        obj, obj_typ = (u, u_typ) if direction == "in" else (v, v_typ)
        if u not in self.nodes:
            self.nodes[u] = AssertionNode(u, u_typ)
        if v not in self.nodes:
            self.nodes[v] = AssertionNode(v, v_typ)
        self.nodes[sub].link(pred, "out", obj_typ, obj)
        self.nodes[obj].link(pred, "in", sub_typ, sub)
        self.edges.add(edge)
        if eid is not None:
            self.edge_ids.add(eid)
        if track_labels:
            # the ROOT's own labels are never covered (reference quirk:
            # graph.py:154-158 is dead code; validated by its test_model.py:22-37)
            if u != self.root:
                for label in u_typ:
                    self.labels.add((label, u))
            if v != self.root:
                for label in v_typ:
                    self.labels.add((label, v))

    def merge(self, other: "Assertion"):
        assert self.root == other.root
        for edge in other.edges:
            self.add_edge(edge)
        self.edge_ids.update(other.edge_ids)
        self.labels.update(other.labels)

    def compose(self, other: "Assertion"):
        """Graft another assertion (rooted at one of our nodes) into this one."""
        for edge in other.edges:
            self.add_edge(edge)
        self.edge_ids.update(other.edge_ids)
        self.labels.update(other.labels)


# ---------------------------------------------------------------------------
# rule trees
# ---------------------------------------------------------------------------

class RuleTree:
    """Driver-side tree form of a (possibly nested) rule."""

    def __init__(self, root, children: Iterable = ()):
        self.root = tuple(root)
        self.children = []  # list of (pred, dir, RuleTree)
        self.assertions = []  # realized Assertion forest (roots only)
        for branch in children or ():
            self.add_branch(branch)

    # -- construction ------------------------------------------------------
    def add_branch(self, branch):
        pred, direction, child = branch
        if isinstance(child, tuple):  # (labels, ()) tuple leaf
            child = RuleTree(child[0])
        self.children.append((pred, direction, child))

    @classmethod
    def from_tuple(cls, rule):
        root, children = rule
        tree = cls(root)
        for pred, direction, child in children:
            tree.children.append((pred, direction, cls.from_tuple(child)))
        return tree

    def tuplify(self):
        return (
            self.root,
            tuple((p, d, c.tuplify()) for p, d, c in self.children),
        )

    # -- structure queries -------------------------------------------------
    def has_children(self):
        return bool(self.children)

    def instantiated(self):
        return bool(self.assertions)

    def leaves(self):
        out = []

        def walk(node):
            if not node.children:
                out.append(node.root)
            else:
                for _, _, child in node.children:
                    walk(child)

        walk(self)
        return out

    def inner_nodes(self):
        inner = set()
        for _, _, child in self.children:
            inner.add(child.root)
            inner.update(child.inner_nodes())
        return inner

    def atoms(self):
        """Decompose into level-0 tuples (reference ``rule.py:146-151``)."""
        result = []
        for pred, direction, child in self.children:
            result.append((self.root, ((pred, direction, (child.root, ())),)))
            result.extend(child.atoms())
        return result

    def preds(self):
        out = set()
        for pred, _, child in self.children:
            out.add(pred)
            out.update(child.preds())
        return out

    def max_depth(self):
        if not self.children:
            return 0
        return 1 + max(c.max_depth() for _, _, c in self.children)

    def min_depth(self):
        if not self.children:
            return 0
        return 1 + min(c.min_depth() for _, _, c in self.children)

    # -- coverage ----------------------------------------------------------
    def edges_covered(self):
        covered = set()
        for real in self.assertions:
            covered.update(real.edge_ids)
        return covered

    def labels_covered(self):
        covered = set()
        for real in self.assertions:
            covered.update(real.labels)
        return covered

    # -- refinement ops ----------------------------------------------------
    def merge(self, other: "RuleTree"):
        """Same-root union of branch sets; assertions merged pairwise after
        sorting by root (reference ``rule.py:65-76`` — assumes identical
        assertion root sets, which Rm's clique construction guarantees)."""
        assert other.root == self.root
        self.children.extend(other.children)
        self.assertions.sort(key=lambda real: real.root)
        other.assertions = sorted(other.assertions, key=lambda real: real.root)
        for mine, theirs in zip(self.assertions, other.assertions):
            mine.merge(theirs)
        return True

    def pin_to_leaf(self, leaf: "RuleTree"):
        """Graft ``leaf``'s children under every child of self whose root
        label-set equals ``leaf.root``; compose matching assertions
        (reference ``rule.py:78-103``)."""
        found = False
        for _, _, child in self.children:
            if child.root == leaf.root:
                if self.instantiated():
                    for leaf_real in leaf.assertions:
                        for real in self.assertions:
                            if leaf_real.root in real.nodes:
                                real.compose(leaf_real)
                child.children.extend(leaf.children)
                found = True
        if not found:
            for _, _, child in self.children:
                found = child.pin_to_leaf(leaf) or found
        return found

    def jaccard_sim(self, other: "RuleTree"):
        """|non-root nodes of our assertions ∩ other's assertion roots| over
        the union (reference ``rule.py:134-139``)."""
        fringe = set()
        for real in self.assertions:
            fringe.update(set(real.nodes.keys()) - {real.root})
        roots = {real.root for real in other.assertions}
        union = fringe | roots
        return len(fringe & roots) / len(union) if union else 0

    # -- correctness filtering --------------------------------------------
    def _assertion_correct(self, real, node_name, rule_node):
        expected = [(p, d, c.root) for p, d, c in rule_node.children]
        real_node = real.nodes[node_name]
        for key in expected:
            if key not in real_node.neighbors_of_type:
                return False
        for pred, direction, child in rule_node.children:
            for nb in real_node.neighbors_of_type[(pred, direction, child.root)]:
                if not self._assertion_correct(real, nb, child):
                    return False
        return True

    def correct_assertions(self):
        return [
            real
            for real in self.assertions
            if self._assertion_correct(real, real.root, self)
        ]

    def filter_errant(self):
        self.assertions = self.correct_assertions()

    def __repr__(self):
        return f"RuleTree{self.tuplify()!r}"


def length_assertions_tree(
    tree: RuleTree, num_assertions: int, stats: GraphStats
) -> float:
    """L(alpha(g)) for a tree rule from its realized assertion forest
    (reference ``evaluator.py:169-210``)."""
    num_exceptions = num_assertions - len(tree.assertions)
    bits = log2(num_assertions)
    bits += length_binomial(num_assertions, num_exceptions)
    log_v = log2(stats.n)

    def encode(real, node_name, rule_node):
        sub = 0.0
        for pred, direction, child in rule_node.children:
            sub += log_v
            spokes = real.nodes[node_name].neighbors_of_type[(pred, direction, child.root)]
            sub += length_binomial(stats.n - 1, len(spokes))
            for nb in spokes:
                sub += encode(real, nb, child)
        return sub

    for real in tree.assertions:
        bits += encode(real, real.root, tree)
    return bits
