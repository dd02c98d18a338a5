"""S4 — model persistence.

Saves a fitted summary model as:

* ``model.json`` — rules (recursive JSON), objective bits, coverage counts
* ``rules.txt``  — one tuplified rule per line, in the reference's exact
  parenthetical repr (GemsLab/KGist ``model.py:356-362``) for side-by-side
  diffing against reference ``.rules`` output
* ``blame/``     — parquet tables (roots/preds/heads/stats) that make the
  batch anomaly scorer reloadable without refitting

Pickle is deliberately avoided (non-portable, code-coupled).
"""

from __future__ import annotations

import json
import os

from kgist_spark.functions.ir import RuleTree, rule_to_json
from kgist_spark.oracle.engine import ModelEvaluator, SummaryModel


def _rule_tuple(index, rule):
    t = rule.tuplify() if isinstance(rule, RuleTree) else rule
    return index.tuplify(t)


def save_model(model: SummaryModel, out_dir: str, spark=None) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    index = model.index
    ev = ModelEvaluator(index)
    val, m_len, neg_e, neg_l = ev.evaluate(model, with_lengths=True)

    tuples = [_rule_tuple(index, r) for r in model.rules]
    with open(os.path.join(out_dir, "rules.txt"), "w") as f:
        for t in tuples:
            f.write(f"{t}\n")

    meta = {
        "n_rules": len(tuples),
        "objective_bits": val,
        "model_bits": m_len,
        "neg_edge_bits": neg_e,
        "neg_label_bits": neg_l,
        "covered_edges": len(model.covered_edges),
        "covered_labels": len(model.covered_labels),
        "pct_edges_explained": model.percent_edges_explained(),
        "rules": [rule_to_json(t) for t in tuples],
    }
    with open(os.path.join(out_dir, "model.json"), "w") as f:
        json.dump(meta, f, indent=1)

    if spark is not None:
        from kgist_spark.operators.anomaly import model_blame_tables

        roots, preds, stats, heads = model_blame_tables(spark, model)
        for name, df in [("roots", roots), ("preds", preds), ("stats", stats), ("heads", heads)]:
            df.write.mode("overwrite").parquet(os.path.join(out_dir, "blame", name))
    return meta


def load_model_meta(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "model.json")) as f:
        return json.load(f)


def load_rules(out_dir: str):
    from kgist_spark.functions.ir import rule_from_json

    return [rule_from_json(s) for s in load_model_meta(out_dir)["rules"]]
