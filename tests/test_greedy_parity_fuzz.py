"""Randomized delta-vs-exact parity fuzz.

The delta path keeps only counters on the driver and reconstructs the
reference's greedy decisions from them; its two float-sensitive spots are
MDL near-ties (rule-vs-reverse, qualification) where the reference's
per-head summation order decides.  The symmetric-tie fixture pins the one
family found in the wild (full NELL); this fuzz sweeps seeded KG-shaped
graphs — star motifs, optional symmetric in-group relations (the tie
factory), multi-label distractors — asserting delta selects the oracle's
exact rule set on every one.  Seeds are fixed so failures reproduce.
"""

import random

import pytest
from pyspark.sql import functions as F

from kgist_spark.oracle.engine import GreedySearcher, ModelEvaluator
from kgist_spark.oracle.kg import LocalKG

pytestmark = pytest.mark.spark

# 0-9: broad sweep; 23 and 30: regressions — both diverged under a naive
# tie replay that reassembled floats in a different order than the
# reference's evaluate_change (caught by the offline 50-seed sweep)
SEEDS = list(range(10)) + [23, 30]


def gen_graph(seed):
    """KG-shaped random graph: hub->leaf star motifs (MDL-positive rules),
    an optional symmetric relation (exact-tie candidates), labeled
    distractors (mass for the label-error term)."""
    rng = random.Random(seed)
    edges, labels = [], []
    nid = 0

    def new_nodes(k, lab):
        nonlocal nid
        out = [f"n{nid + i}" for i in range(k)]
        nid += k
        labels.extend((x, (lab,)) for x in out)
        return out

    pool = ["A", "B", "C", "D", "E", "F"]
    rng.shuffle(pool)
    preds = ["p", "q", "r"]
    for i in range(rng.randint(1, 3)):
        hubs = new_nodes(rng.randint(2, 5), pool[2 * i])
        leaves = new_nodes(rng.randint(8, 20), pool[2 * i + 1])
        pr = preds[i % 3]
        for h in hubs:
            for leaf in rng.sample(leaves, rng.randint(3, len(leaves))):
                edges.append((h, pr, leaf))
    if rng.random() < 0.5:
        grp = new_nodes(rng.randint(10, 20), "S")
        pairs = set()
        want = rng.randint(len(grp), 2 * len(grp))
        while len(pairs) < want:
            a, b = rng.sample(grp, 2)
            if (a, b) not in pairs and (b, a) not in pairs:
                pairs.add((a, b))
        sym = []
        for a, b in sorted(pairs):
            sym.append((a, "s", b))
            sym.append((b, "s", a))
        rng.shuffle(sym)
        edges.extend(sym)
    d = new_nodes(rng.randint(10, 30), "Z")
    for i, x in enumerate(d):
        labels[-len(d) + i] = (x, (pool[5 - (i % 3)],))
    for i in range(0, len(d) - 1, 2):
        edges.append((d[i], "r", d[i + 1]))
    rng.shuffle(edges)
    return labels, edges


def test_delta_matches_exact_on_seeded_random_graphs(spark, tmp_path):
    from kgist_spark.plans.greedy_delta import DeltaGreedy
    from kgist_spark.plans.summarizer import graph_stats
    from kgist_spark.sources.edgelist import explode_labels, load_labels, load_triples

    failures = []
    for seed in SEEDS:
        labels, edges = gen_graph(seed)
        epath = tmp_path / f"g{seed}.txt"
        lpath = tmp_path / f"g{seed}_labels.txt"
        epath.write_text("\n".join(" ".join(e) for e in edges) + "\n")
        lpath.write_text(
            "\n".join(n + " " + " ".join(ls) for n, ls in labels) + "\n"
        )

        triples = load_triples(spark, str(epath))
        lab = load_labels(spark, str(lpath))
        lf = explode_labels(lab)
        stats = graph_stats(triples, lf)
        lnc = {
            r["label"]: r["n"]
            for r in lf.groupBy("label")
            .agg(F.countDistinct("node").alias("n"))
            .collect()
        }
        result = DeltaGreedy(triples, lf, stats, lnc).fit(
            passes=2, label_qualify=True
        )

        kg = LocalKG.from_files(str(epath), str(lpath), idify=False)
        model = GreedySearcher(kg).build_model(passes=2, label_qualify=True)
        want = ModelEvaluator(kg).evaluate(model)

        got_rules = set(result["rules"])
        want_rules = set(model.rules.keys())
        if (
            got_rules != want_rules
            or result["covered_edges"] != len(model.covered_edges)
            or result["covered_labels"] != len(model.covered_labels)
            or abs(result["objective_bits"] - want) > 1e-6
        ):
            failures.append(
                (seed, got_rules - want_rules, want_rules - got_rules,
                 result["objective_bits"] - want)
            )
    assert not failures, f"delta != exact on seeds: {failures}"


def test_delta_matches_exact_idified(spark, tmp_path):
    """Same parity sweep over the idified (integer) vocabulary — the
    reference CLI's default — on a subset of seeds including the symmetric
    knife-edge ones, so the exact-replay machinery is exercised end-to-end
    over integer keys too."""
    from kgist_spark.plans.greedy_delta import DeltaGreedy
    from kgist_spark.plans.summarizer import graph_stats
    from kgist_spark.sources.edgelist import explode_labels, load_labels, load_triples
    from kgist_spark.sources.idify import idify_tables

    failures = []
    for seed in [3, 8, 23, 30]:
        labels, edges = gen_graph(seed)
        epath = tmp_path / f"g{seed}.txt"
        lpath = tmp_path / f"g{seed}_labels.txt"
        epath.write_text("\n".join(" ".join(e) for e in edges) + "\n")
        lpath.write_text(
            "\n".join(n + " " + " ".join(ls) for n, ls in labels) + "\n"
        )

        triples = load_triples(spark, str(epath))
        lab = load_labels(spark, str(lpath))
        lf = explode_labels(lab)
        t_id, lf_id, _ = idify_tables(triples, lab, lf)
        t_id, lf_id = t_id.persist(), lf_id.persist()
        stats = graph_stats(t_id, lf_id)
        lnc = {
            r["label"]: r["n"]
            for r in lf_id.groupBy("label")
            .agg(F.countDistinct("node").alias("n"))
            .collect()
        }
        result = DeltaGreedy(t_id, lf_id, stats, lnc).fit(
            passes=2, label_qualify=True
        )

        kg = LocalKG.from_files(str(epath), str(lpath), idify=True)
        model = GreedySearcher(kg).build_model(passes=2, label_qualify=True)
        want = ModelEvaluator(kg).evaluate(model)

        if (
            set(result["rules"]) != set(model.rules.keys())
            or abs(result["objective_bits"] - want) > 1e-6
        ):
            failures.append(
                (seed, set(result["rules"]) ^ set(model.rules.keys()),
                 result["objective_bits"] - want)
            )
    assert not failures, f"idified delta != exact on seeds: {failures}"
