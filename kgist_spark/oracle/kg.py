"""In-memory labeled multigraph + candidate-rule index (oracle side).

Reproduces the loader semantics of the reference (GemsLab/KGist
``graph.py:48-171``): sequential edge ids in file order, dictionary encoding
in labels-file-then-first-seen-edge order when ``idify=True``, and the
candidate index built by crossing subject labels x object labels per edge in
both directions (``graph.py:127-148``).  Candidate *insertion order* is
preserved (a plain dict) because the greedy search tie-breaks on it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Sequence, Tuple

from kgist_spark.functions.mdl import GraphStats


@dataclass
class CandRecord:
    """Aggregates for one candidate rule (reference ``graph.py:134-148``)."""

    edges: set = field(default_factory=set)  # edge ids explained by the rule
    label_coverage: set = field(default_factory=set)  # (child_label, child_node)
    ca_to_size: dict = field(default_factory=dict)  # head node -> #edges under rule


class LocalKG:
    """A knowledge graph held in plain Python structures."""

    def __init__(self, idify: bool = False):
        self.idify = idify
        self.node_to_labels: Dict[object, tuple] = {}
        self.label_nodes: Dict[object, set] = {}  # label -> nodes carrying it
        self.node_label_counts: Dict[object, int] = {}
        self.edge_label_counts: Dict[object, int] = {}
        self.id_to_edge: Dict[int, tuple] = {}
        self.candidates: Dict[tuple, CandRecord] = {}
        self._node_set = set()
        self.m = 0
        # dictionaries (populated only when idify=True)
        self.node_to_id: Dict[str, int] = {}
        self.id_to_node: Dict[int, str] = {}
        self.pred_to_id: Dict[str, int] = {}
        self.id_to_pred: Dict[int, str] = {}
        self.label_to_id: Dict[str, int] = {}
        self.id_to_label: Dict[int, str] = {}

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @classmethod
    def from_files(cls, edge_path: str, labels_path: str, delimiter: str = " ",
                   idify: bool = False) -> "LocalKG":
        def label_rows():
            with open(labels_path) as f:
                for line in f:
                    parts = line.strip().split(delimiter)
                    if parts and parts[0]:
                        yield parts[0], tuple(parts[1:])

        def edge_rows():
            with open(edge_path) as f:
                for line in f:
                    parts = line.strip().split(delimiter)
                    if len(parts) == 3:
                        yield tuple(parts)

        return cls.from_rows(label_rows(), edge_rows(), idify=idify)

    @classmethod
    def from_rows(cls, label_rows: Iterable[Tuple[str, Sequence[str]]],
                  edge_rows: Iterable[Tuple[str, str, str]],
                  idify: bool = False) -> "LocalKG":
        kg = cls(idify=idify)
        for node, labels in label_rows:
            kg._add_label_row(node, labels)
        for sub, pred, obj in edge_rows:
            kg._add_edge(sub, pred, obj)
        kg._finalize()
        return kg

    def _encode_node(self, node):
        if node not in self.node_to_id:
            nid = len(self.node_to_id)
            self.node_to_id[node] = nid
            self.id_to_node[nid] = node
        return self.node_to_id[node]

    def _add_label_row(self, node, labels):
        raw_labels = tuple(labels)
        if self.idify:
            node = self._encode_node(node)
            encoded = []
            for label in raw_labels:
                if label not in self.label_to_id:
                    lid = len(self.label_to_id)
                    self.label_to_id[label] = lid
                    self.id_to_label[lid] = label
                encoded.append(self.label_to_id[label])
            raw_labels = tuple(encoded)
        self._node_set.add(node)
        self.node_to_labels[node] = raw_labels
        for label in raw_labels:
            self.node_label_counts[label] = self.node_label_counts.get(label, 0) + 1
            self.label_nodes.setdefault(label, set()).add(node)

    def _add_edge(self, sub, pred, obj):
        if self.idify:
            sub = self._encode_node(sub)
            obj = self._encode_node(obj)
            if pred not in self.pred_to_id:
                pid = len(self.pred_to_id)
                self.pred_to_id[pred] = pid
                self.id_to_pred[pid] = pred
            pred = self.pred_to_id[pred]
        self.edge_label_counts[pred] = self.edge_label_counts.get(pred, 0) + 1
        self._node_set.add(sub)
        self._node_set.add(obj)
        eid = self.m
        self.id_to_edge[eid] = (sub, pred, obj)
        self.m += 1
        # candidate index: every (subject-label, object-label) pair spawns an
        # out-rooted and an in-rooted star rule covering this edge
        for sl in self.labels(sub):
            for ol in self.labels(obj):
                fwd = ((sl,), ((pred, "out", ((ol,), ())),))
                rec = self.candidates.get(fwd)
                if rec is None:
                    rec = self.candidates[fwd] = CandRecord()
                rec.label_coverage.add((ol, obj))
                rec.edges.add(eid)
                rec.ca_to_size[sub] = rec.ca_to_size.get(sub, 0) + 1

                rev = ((ol,), ((pred, "in", ((sl,), ())),))
                rec = self.candidates.get(rev)
                if rec is None:
                    rec = self.candidates[rev] = CandRecord()
                rec.label_coverage.add((sl, sub))
                rec.edges.add(eid)
                rec.ca_to_size[obj] = rec.ca_to_size.get(obj, 0) + 1

    def _finalize(self):
        self.n = len(self._node_set)
        self.num_node_labels = len(self.label_nodes)
        self.num_edge_labels = len(self.edge_label_counts)
        self.total_num_labels = sum(len(v) for v in self.label_nodes.values())
        self.stats = GraphStats(
            n=self.n,
            m=self.m,
            num_node_labels=self.num_node_labels,
            num_edge_labels=self.num_edge_labels,
            total_num_labels=self.total_num_labels,
            node_label_counts=self.node_label_counts,
            edge_label_counts=self.edge_label_counts,
        )

    # ------------------------------------------------------------------
    # queries (the CandidateIndex protocol consumed by the searcher)
    # ------------------------------------------------------------------
    def labels(self, node) -> tuple:
        """Label tuple of a node; empty for nodes absent from the labels table
        (the shipped reference datasets label every endpoint, so this relaxation
        of the reference's KeyError changes nothing on them)."""
        return self.node_to_labels.get(node, ())

    def nodes_with_type(self, typ, num_only: bool = True):
        """Nodes carrying ALL labels in ``typ`` (reference ``graph.py:179-182``)."""
        if len(typ) == 1:
            nodes = self.label_nodes.get(typ[0], set())
        else:
            nodes = set.intersection(*(self.label_nodes[l] for l in typ))
        return len(nodes) if num_only else nodes

    def ordered_rules(self) -> List[tuple]:
        return list(self.candidates.keys())

    def record(self, rule) -> CandRecord:
        return self.candidates[rule]

    def has(self, rule) -> bool:
        return rule in self.candidates

    def rekey(self, old_rule, new_rule):
        """Replace a candidate's key (label qualification accepts); the new key
        moves to the end of the iteration order, matching dict semantics in
        the reference (``searcher.py:120-122``)."""
        self.candidates[new_rule] = self.candidates.pop(old_rule)

    def tuplify(self, rule):
        """De-idify a rule back to the original string vocabulary."""
        if not self.idify:
            return rule
        root, children = rule
        return (
            tuple(self.id_to_label[l] for l in root),
            tuple((self.id_to_pred[p], d, self.tuplify(c)) for p, d, c in children),
        )
