"""M2 — greedy rule selection at scale (delta mode).

The exact-mode summarizer collects per-rule edge-id sets to the driver; that
caps out around NELL scale.  Delta mode keeps ALL edge/label-coverage data on
the cluster and the driver holds only O(#candidates) counters:

* per-candidate scalars (n_edges, n_labels_cov, n_cas, ca-size histogram,
  first-seen order) collected once from the distributed aggregates;
* two running overlap counters per candidate: |edges(g) ∩ covered| and
  |labels(g) ∩ covered|.

The key identity making this exact: when rule r is accepted, the newly
covered set Δ = edges(r) − covered is disjoint from the old covered set, so
for every candidate g the overlap increment is |edges(g) ∩ Δ| — additive.
Trials are pure driver float math; one broadcast-join + group-by job per
accepted BATCH (not per accept, not per trial) maintains every counter.
Accepts are batched as long as each subsequent trial's rule has a predicate
and child label provably disjoint from every pending accept (different
predicate ⇒ disjoint edge sets; different child label ⇒ disjoint label
coverage), which keeps every decision identical to the sequential schedule
while collapsing the per-accept job chain — O(batches) Spark jobs total,
independent of candidate count (reference semantics from
``searcher.py:168-244`` preserved decision-for-decision).

Float caveat: L(alpha(g)) is computed from the ca-size histogram (count ×
term) rather than the reference's per-head summation order; the two differ
by < 1e-9 bits, which can only matter on exact MDL ties.  Such a tie is
real, not hypothetical: a symmetric predicate yields an out-rule and an
in-rule with IDENTICAL edges, label coverage and ca-size multisets (full
NELL has one — (24, 73, 24) — where the reference's pick is decided by a
6.5e-10-bit difference between the two per-head summation orders).  When a
rule/reverse trial ties exactly on the histogram values, the loop therefore
re-runs the comparison with the reference's own float shape: the per-head
size sequences in candidate insertion order (ascending first-seen eid —
one tiny filtered aggregate per tied pair, the only per-head data that
ever reaches the driver) summed head-by-head exactly as
``evaluator.py:226-232`` does.  The exact-mode path remains the bit-parity
reference; tests assert both modes select the same model on the fixtures.
"""

from __future__ import annotations

from math import log2
from typing import Dict, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgist_spark.functions import mdl
from kgist_spark.functions.ir import reverse_of
from kgist_spark.operators import candidates as C
from kgist_spark.operators.qualify import nodes_with_all_labels, shared_head_labels

_SEP = "\x1f"


def _df_key_col():
    return F.concat_ws(_SEP, "root_label", "pred", "dir", "child_label").alias("key")


def _key(r) -> str:
    """Driver-side mirror of ``_df_key_col`` — stringifies components so the
    idified (integer) vocabulary produces identical keys to concat_ws."""
    return _SEP.join(
        str(x) for x in (r["root_label"], r["pred"], r["dir"], r["child_label"])
    )


class CandidateMeta:
    __slots__ = (
        "rule", "df_key", "n_edges", "n_labels", "n_cas", "ca_hist",
        "first_seen", "num_assertions",
    )

    def __init__(self, rule, df_key, n_edges, n_labels, n_cas, ca_hist, first_seen):
        self.rule = rule
        self.df_key = df_key
        self.n_edges = n_edges
        self.n_labels = n_labels
        self.n_cas = n_cas
        self.ca_hist = ca_hist  # {ca_size: n_heads}, iterated sorted
        self.first_seen = first_seen
        self.num_assertions = None  # nodes_with_type(root); filled lazily


class DeltaGreedy:
    """Distributed-coverage greedy selection over candidate tables."""

    def __init__(self, triples: DataFrame, labels_flat: DataFrame,
                 stats: mdl.GraphStats, label_node_counts: Dict[str, int],
                 cand: DataFrame | None = None):
        """:triples: (subj, pred, obj, eid); :labels_flat: (node, label, pos);
        :label_node_counts: label -> #distinct nodes carrying it (the
        ``nodes_with_type`` map for single-label roots);
        :cand: optional pre-computed/reloaded candidate contribution table
        (S3 — :mod:`kgist_spark.sources.candidates_io`), making repeat
        delta-greedy runs restartable without re-running candidate
        generation."""
        self.spark = triples.sparkSession
        self.stats = stats
        self.label_node_counts = label_node_counts
        self.labels_flat = labels_flat

        if cand is None:
            cand = C.candidate_edges(triples, labels_flat)
        self.cand_edges = (
            cand.select(_df_key_col(), "eid", "root_node").distinct().persist()
        )
        self.cand_labels = (
            cand.select(_df_key_col(), "child_label", "child_node").distinct().persist()
        )
        self._cand_raw = cand

        # one-time driver metadata
        stats_rows = C.candidate_stats(cand).collect()
        hist_rows = C.ca_size_histogram(cand).collect()
        hist: Dict[str, Dict[int, int]] = {}
        for r in hist_rows:
            k = _key(r)
            hist.setdefault(k, {})[r["ca_size"]] = r["n_heads"]
        self.meta: Dict[tuple, CandidateMeta] = {}
        order = []
        for r in stats_rows:
            k = _key(r)
            rule = ((r["root_label"],), ((r["pred"], r["dir"], ((r["child_label"],), ())),))
            m = CandidateMeta(
                rule, k, r["n_edges"], r["n_labels_cov"], r["n_cas"], hist.get(k, {}),
                r["first_seen"],  # packed scan-order long
            )
            order.append(m)
        order.sort(key=lambda m: m.first_seen)
        for m in order:
            self.meta[m.rule] = m

        # coverage state: ONE tagged DataFrame (kind 'e'|'l') so each accept
        # needs a single delta checkpoint and a single covered checkpoint
        self.covered: DataFrame | None = None
        self._batch_no = 0
        self.n_covered_e = 0
        self.n_covered_l = 0
        self.overlap_e: Dict[tuple, int] = {}
        self.overlap_l: Dict[tuple, int] = {}
        self._assert_len_cache: Dict[tuple, float] = {}
        self._assert_len_ordered_cache: Dict[tuple, float] = {}

    # -- MDL terms ---------------------------------------------------------
    def _num_assertions(self, meta: CandidateMeta) -> int:
        if meta.num_assertions is None:
            root = meta.rule[0]
            assert len(root) == 1
            meta.num_assertions = self.label_node_counts[root[0]]
        return meta.num_assertions

    def _assert_len(self, meta: CandidateMeta) -> float:
        rule = meta.rule
        if rule in self._assert_len_cache:
            return self._assert_len_cache[rule]
        hist = dict(sorted(meta.ca_hist.items()))
        bits = mdl.length_assertions_from_histogram(
            self._num_assertions(meta), hist, self.stats
        )
        self._assert_len_cache[rule] = bits
        return bits

    def _rule_len(self, rule) -> float:
        return mdl.length_rule(rule, self.stats)

    def _assert_len_ordered(self, meta: CandidateMeta, peer: CandidateMeta) -> float:
        """L(alpha(g)) summed per-head in the reference's insertion order
        (reference ``evaluator.py:226-232``; ``ca_to_size`` inserts a head at
        its first contributing edge, ``graph.py:140,148``, so ascending
        first-seen eid reproduces the order).  Only called on an exact
        rule-vs-reverse histogram tie, where the reference's decision is the
        float difference between the two summation orders; fetches the tied
        PAIR's per-head sizes in one filtered aggregate (``peer`` rides along
        so the reverse's lookup is a cache hit, not a second job)."""
        if meta.rule in self._assert_len_ordered_cache:
            return self._assert_len_ordered_cache[meta.rule]
        by_key = {m.df_key: m for m in (meta, peer)}
        rows = (
            self.cand_edges.where(F.col("key").isin(list(by_key)))
            .groupBy("key", "root_node")
            .agg(F.count("*").alias("ca_size"), F.min("eid").alias("first_eid"))
            .collect()
        )
        sizes: Dict[str, list] = {k: [] for k in by_key}
        for r in sorted(rows, key=lambda r: r["first_eid"]):
            sizes[r["key"]].append(r["ca_size"])
        for k, m in by_key.items():
            self._assert_len_ordered_cache[m.rule] = mdl.length_assertions_flat(
                self._num_assertions(m), sizes[k], self.stats
            )
        return self._assert_len_ordered_cache[meta.rule]

    # -- qualification (A5 distributed) ------------------------------------
    def label_qualify(self) -> int:
        shared_rows = shared_head_labels(self._cand_raw, self.labels_flat).collect()
        shared = {}
        for r in shared_rows:
            k = _key(r)
            shared[k] = tuple(r["shared_labels"])
        proposals = [
            (m, shared[m.df_key]) for m in self.meta.values() if m.df_key in shared
        ]
        new_counts = nodes_with_all_labels(
            self.labels_flat, [labels for _, labels in proposals]
        )
        qual_cache: Dict[tuple, float] = {}

        def cost(rule, num_assertions, hist):
            if rule in qual_cache:
                alen = qual_cache[rule]
            else:
                alen = mdl.length_assertions_from_histogram(
                    num_assertions, dict(sorted(hist.items())), self.stats
                )
                qual_cache[rule] = alen
            return self._rule_len(rule) + alen

        n_qualified = 0
        for m, new_labels in proposals:
            old_rule = m.rule
            new_rule = (new_labels, old_rule[1])
            old_cost = cost(old_rule, self._num_assertions(m), m.ca_hist)
            new_cost = cost(new_rule, new_counts[new_labels], m.ca_hist)
            if new_cost < old_cost:
                # rekey: dict-overwrite semantics (existing key keeps position)
                del self.meta[old_rule]
                m.rule = new_rule
                m.num_assertions = new_counts[new_labels]
                self.meta[new_rule] = m
                n_qualified += 1
        return n_qualified

    # -- ranking (W1 driver-side over counts) ------------------------------
    def rank(self) -> List[CandidateMeta]:
        null_err = mdl.length_error(0, 0, self.stats)

        def key(m: CandidateMeta):
            err = mdl.length_error(m.n_edges, m.n_labels, self.stats)
            return (null_err - err, m.n_cas, m.rule[0])

        return sorted(self.meta.values(), key=key, reverse=True)

    # -- accept bookkeeping (ONE Spark job per accepted BATCH) -------------
    def _apply_batch(self, metas: List[CandidateMeta]):
        """Run the delta/overlap/covered maintenance for a batch of accepted
        rules whose coverage footprints are pairwise disjoint (guaranteed by
        the caller: distinct predicates ⇒ disjoint edge sets, distinct child
        labels ⇒ disjoint label-coverage sets).  Disjointness makes the
        batched delta Δ = (∪ edges(rᵢ)) − covered the disjoint union of the
        per-rule deltas, so one pass yields exactly the overlap increments a
        sequential per-rule application would.  ``n_covered_e/l`` are NOT
        updated here — the caller already advanced them at accept time from
        the counter identity |Δᵢ| = n_edges(rᵢ) − overlap_e(rᵢ).

        Physical shape — ONE Spark job per batch: the new covered state
        ``covered ∪ Δ`` (delta rows tagged with this batch's serial) is a
        LAZY local checkpoint, and the single overlap-counter action joins
        the candidate tables against the just-tagged slice of it, so that
        collect both maintains every counter AND materializes the flat
        checkpointed coverage as a side effect.  This replaced a 3-job
        schedule (delta checkpoint, counter collect, covered-union
        checkpoint); lineage depth stays pinned at 1 and rows never leave
        the cluster.  (An even earlier design collected each delta and
        re-broadcast it as a local relation; that caps coverage at driver
        memory, and the growing union-of-local-relations lineage made accept
        latency climb 2.8 -> 15 s between periodic checkpoints.)"""
        keys = [m.df_key for m in metas]
        in_batch = F.col("key").isin(keys) if len(keys) > 1 else F.col("key") == keys[0]
        r_edges = self.cand_edges.where(in_batch).select("eid").distinct()
        r_labels = (
            self.cand_labels.where(in_batch)
            .select("child_label", "child_node")
            .distinct()
        )
        if self.covered is not None:
            cov_e = self.covered.where(F.col("kind") == "e").select("eid")
            cov_l = self.covered.where(F.col("kind") == "l").select(
                "child_label", "child_node"
            )
            delta_e = r_edges.join(cov_e, "eid", "left_anti")
            delta_l = r_labels.join(cov_l, ["child_label", "child_node"], "left_anti")
        else:
            delta_e, delta_l = r_edges, r_labels
        self._batch_no += 1
        cur = self._batch_no
        eid_type = dict(self.cand_edges.dtypes)["eid"]
        delta = (
            delta_e.select(
                F.lit("e").alias("kind"), "eid",
                F.lit(None).cast("string").alias("child_label"),
                F.lit(None).cast("string").alias("child_node"),
            )
            .unionByName(
                delta_l.select(
                    F.lit("l").alias("kind"),
                    F.lit(None).cast(eid_type).alias("eid"),
                    "child_label", "child_node",
                )
            )
            .select("*", F.lit(cur).alias("batch"))
        )
        new_covered = (
            delta if self.covered is None else self.covered.unionByName(delta)
        ).localCheckpoint(eager=False)
        d_e = new_covered.where(
            (F.col("batch") == cur) & (F.col("kind") == "e")
        ).select("eid")
        d_l = new_covered.where(
            (F.col("batch") == cur) & (F.col("kind") == "l")
        ).select("child_label", "child_node")

        # The ONE action: per-(key, kind) match counts against the tagged
        # delta slice.  (key, eid) and (key, label, node) rows are distinct
        # by construction → count(*).  No broadcast hint: AQE picks broadcast
        # while deltas are small and falls back to shuffle join when not.
        incs = (
            self.cand_edges.join(d_e, "eid")
            .select("key", F.lit("e").alias("kind"))
            .unionByName(
                self.cand_labels.join(
                    d_l, ["child_label", "child_node"]
                ).select("key", F.lit("l").alias("kind"))
            )
            .groupBy("key", "kind")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        by_key = {m.df_key: m.rule for m in self.meta.values()}
        for r in incs:
            if r["kind"] == "e":
                target = self.overlap_e
            else:
                target = self.overlap_l
            rule = by_key.get(r["key"])
            if rule is not None:
                target[rule] = target.get(rule, 0) + r["n"]

        # the collect above materialized the lazy checkpoint; dropping the
        # old `covered` reference lets Spark's ContextCleaner reclaim the
        # superseded checkpoint blocks
        self.covered = new_covered

    # -- distributed coverage accessors (consumed by the batch anomaly
    # scorer, kgist_spark.operators.anomaly.score_edges_delta) --------------
    def covered_edges_df(self) -> DataFrame:
        """Distinct covered edge ids as a DataFrame — the fit's own
        checkpointed coverage state; never collected."""
        if self.covered is None:
            return self.cand_edges.select("eid").where(F.lit(False))
        return self.covered.where(F.col("kind") == "e").select("eid")

    def covered_triples(self, triples: DataFrame) -> DataFrame:
        """Covered ``(subj, pred, obj)`` rows via an eid join against the
        input triples (which must carry the same ``eid`` column the candidate
        tables were built from)."""
        return (
            triples.join(self.covered_edges_df(), "eid")
            .select("subj", "pred", "obj")
            .distinct()
        )

    # -- the greedy loop ----------------------------------------------------
    def fit(self, passes: int = 2, label_qualify: bool = True,
            loop_shuffle_partitions: int | None = 8):
        """:loop_shuffle_partitions: shuffle width for the accept-loop jobs,
        restored afterwards.  Every reduce stage in the loop is tiny (the
        per-key overlap partials collapse to O(#candidates) rows and the
        delta side rides an AQE broadcast, so the big table never shuffles);
        the session-wide width only adds per-task scheduling overhead —
        measured 1.51 -> 1.05 s/accept going 64 -> 8 on a NELL slice.
        ``None`` keeps the session setting."""
        conf = self.spark.conf
        old_parts = conf.get("spark.sql.shuffle.partitions")
        if loop_shuffle_partitions:
            conf.set("spark.sql.shuffle.partitions", str(loop_shuffle_partitions))
        try:
            return self._fit(passes, label_qualify)
        finally:
            if loop_shuffle_partitions:
                conf.set("spark.sql.shuffle.partitions", old_parts)

    def _fit(self, passes: int, label_qualify: bool):
        if label_qualify:
            self.label_qualify()
        ranked = self.rank()

        stats = self.stats
        selected: Dict[tuple, CandidateMeta] = {}
        best_model_len = mdl.length_model_header(stats)
        best_val = best_model_len + mdl.length_error(0, 0, stats)

        # Batched accepts.  A trial only reads (a) the candidate's two overlap
        # counters and (b) the global covered counts, so a just-accepted rule
        # can stay "pending" — its delta job deferred — as long as every
        # subsequent trial is provably unaffected by the pending deltas:
        #   * edge sets of candidate rules with different PREDICATES are
        #     disjoint (every covered edge of (root, p, dir, child) has
        #     predicate p; the same eid can reappear only under the same p);
        #   * label-coverage sets with different CHILD LABELS are disjoint
        #     (covered labels are (child_label, child_node) pairs).
        # Before trialing a rule (and its reverse) whose predicate or child
        # label intersects the pending footprint, flush: ONE delta job for
        # the whole batch (see _apply_batch).  The global covered counts
        # advance at accept time from the exact counter identity
        # |Δ| = n_edges − overlap_e, so decisions are identical to the
        # sequential schedule, job count drops from O(accepts) to O(batches).
        pending: List[CandidateMeta] = []
        pending_preds: set = set()
        pending_labels: set = set()
        batch_sizes: List[int] = []

        def footprint(meta: CandidateMeta):
            pred, _dir, child = meta.rule[1][0]
            return {pred}, set(child[0])

        def flush():
            if pending:
                batch_sizes.append(len(pending))
                self._apply_batch(pending)
                pending.clear()
                pending_preds.clear()
                pending_labels.clear()

        def pend(meta: CandidateMeta):
            self.n_covered_e += meta.n_edges - self.overlap_e.get(meta.rule, 0)
            self.n_covered_l += meta.n_labels - self.overlap_l.get(meta.rule, 0)
            preds, labels = footprint(meta)
            pending.append(meta)
            pending_preds.update(preds)
            pending_labels.update(labels)

        def trial_val(meta: CandidateMeta):
            new_e = meta.n_edges - self.overlap_e.get(meta.rule, 0)
            new_l = meta.n_labels - self.overlap_l.get(meta.rule, 0)
            m_len = best_model_len + self._rule_len(meta.rule) + self._assert_len(meta)
            err = mdl.length_error(
                self.n_covered_e + new_e, self.n_covered_l + new_l, stats
            )
            return m_len + err, m_len

        for _ in range(passes):
            for meta in ranked:
                rule = meta.rule
                reverse_rule = reverse_of(rule)
                rev_meta = self.meta.get(reverse_rule)
                if rev_meta is not None:
                    if rule in selected or reverse_rule in selected:
                        continue
                if rev_meta is None and rule in selected:
                    continue
                if pending:
                    preds, labels = footprint(meta)
                    if rev_meta is not None:
                        p2, l2 = footprint(rev_meta)
                        preds |= p2
                        labels |= l2
                    if (preds & pending_preds) or (labels & pending_labels):
                        flush()
                if rev_meta is not None:
                    val, m_len = trial_val(meta)
                    rev_val, rev_m_len = trial_val(rev_meta)
                    take_rule = val <= rev_val
                    if val == rev_val and rev_val < best_val:
                        # exact histogram tie (symmetric predicate): replay
                        # the reference's `val <= rev_val` with the per-head
                        # summation ORDER it actually uses — see module
                        # docstring "Float caveat"
                        a = self._assert_len_ordered(meta, rev_meta)
                        b = self._assert_len_ordered(rev_meta, meta)
                        # re-add at full objective magnitude so the compare
                        # rounds where the reference's does (val and the
                        # subtracted histogram terms are equal floats on a
                        # tie, so both sides share one base)
                        take_rule = (
                            val - self._assert_len(meta) + a
                            <= rev_val - self._assert_len(rev_meta) + b
                        )
                    if rev_val < best_val:
                        if take_rule:
                            selected[rule] = meta
                            pend(meta)
                            best_val, best_model_len = val, m_len
                        else:
                            selected[reverse_rule] = rev_meta
                            pend(rev_meta)
                            best_val, best_model_len = rev_val, rev_m_len
                else:
                    val, m_len = trial_val(meta)
                    if val < best_val:
                        selected[rule] = meta
                        pend(meta)
                        best_val, best_model_len = val, m_len
        flush()
        return {
            "rules": list(selected.keys()),
            "objective_bits": best_val,
            "model_bits": best_model_len,
            "covered_edges": self.n_covered_e,
            "covered_labels": self.n_covered_l,
            "n_delta_jobs": len(batch_sizes),
            "batch_sizes": batch_sizes,
        }
