"""Driver-contract queries over the synthetic testdata tables.

Each function here is one operator from the engine's inventory (SURVEY.md §2)
exercised on the TPC-H-ish testdata: a KG is derived deterministically from
the relational tables (entities = customers/suppliers/nations/orders/parts;
edges = foreign-key relationships) and the engine's operators run over it.
``ORACLE_SQL`` carries the DuckDB-equivalent SQL for every SQL-expressible
query — the driver executes both sides and compares row counts, schemas and
value hashes.

Semantics notes for engine-comparability:
* every float column is rounded to 5 decimals on BOTH sides;
* aggregates are aliased identically on both sides;
* top-k queries carry total tie-break orderings so the result *set* is
  deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgist_spark.operators import candidates as C
from kgist_spark.operators import similarity as SIM
from kgist_spark.operators import text as TX


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# derived KG (shared by the KGist-operator queries)
# ---------------------------------------------------------------------------

def derived_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")

    def tr(df, s_prefix, s_col, pred, o_prefix, o_col):
        # no .distinct(): the subject key is the table's primary key, so the
        # branch is duplicate-free by construction — a distinct here is a
        # pure extra shuffle of the branch
        return df.select(
            F.concat(F.lit(s_prefix), F.col(s_col)).alias("subj"),
            F.lit(pred).alias("pred"),
            F.concat(F.lit(o_prefix), F.col(o_col)).alias("obj"),
        )

    # the lineitem branches are the only ones that can hold duplicates
    # ((orderkey, partkey) / (partkey, suppkey) repeat across lineitems);
    # their dedup runs over the RAW int key pairs — hashing and shuffling
    # (int, int) instead of ~15-char concatenated strings — and the string
    # node ids are built after the dedup, on roughly half the rows.  Each
    # branch keeps its LITERAL pred so a pred-filtered consumer
    # (coverage_anti, the perturbed-KG queries) constant-folds non-matching
    # branches away and never scans their source tables.
    def tr_dedup(df, s_prefix, s_col, pred, o_prefix, o_col):
        return (
            df.select(F.col(s_col).alias("a"), F.col(o_col).alias("b"))
            .distinct()
            .select(
                F.concat(F.lit(s_prefix), F.col("a")).alias("subj"),
                F.lit(pred).alias("pred"),
                F.concat(F.lit(o_prefix), F.col("b")).alias("obj"),
            )
        )

    return (
        tr(customer, "c", "c_custkey", "in_nation", "n", "c_nationkey")
        .unionAll(tr(supplier, "s", "s_suppkey", "in_nation", "n", "s_nationkey"))
        .unionAll(tr(orders, "o", "o_orderkey", "placed_by", "c", "o_custkey"))
        .unionAll(tr_dedup(lineitem, "o", "l_orderkey", "contains_part", "p", "l_partkey"))
        .unionAll(tr_dedup(lineitem, "p", "l_partkey", "supplied_by", "s", "l_suppkey"))
    )


DERIVED_TRIPLES_SQL = """
    SELECT DISTINCT 'c' || c_custkey AS subj, 'in_nation' AS pred, 'n' || c_nationkey AS obj FROM customer
    UNION ALL SELECT DISTINCT 's' || s_suppkey, 'in_nation', 'n' || s_nationkey FROM supplier
    UNION ALL SELECT DISTINCT 'o' || o_orderkey, 'placed_by', 'c' || o_custkey FROM orders
    UNION ALL SELECT DISTINCT 'o' || l_orderkey, 'contains_part', 'p' || l_partkey FROM lineitem
    UNION ALL SELECT DISTINCT 'p' || l_partkey, 'supplied_by', 's' || l_suppkey FROM lineitem
"""


def derived_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")

    def lab(df, prefix, key, label_col):
        return df.select(
            F.concat(F.lit(prefix), F.col(key)).alias("node"), label_col.alias("label")
        )

    slug = lambda c: F.lower(F.regexp_replace(F.col(c), "[ #]", "_"))
    return (
        lab(customer, "c", "c_custkey", F.lit("customer"))
        .unionAll(lab(customer, "c", "c_custkey", slug("c_mktsegment")))
        .unionAll(lab(supplier, "s", "s_suppkey", F.lit("supplier")))
        .unionAll(lab(nation, "n", "n_nationkey", F.lit("nation")))
        .unionAll(lab(nation, "n", "n_nationkey", slug("n_name")))
        .unionAll(lab(orders, "o", "o_orderkey", F.lit("order")))
        .unionAll(lab(orders, "o", "o_orderkey", slug("o_orderpriority")))
        .unionAll(lab(part, "p", "p_partkey", F.lit("part")))
        .unionAll(lab(part, "p", "p_partkey", slug("p_brand")))
    )


DERIVED_LABELS_SQL = """
    SELECT 'c' || c_custkey AS node, 'customer' AS label FROM customer
    UNION ALL SELECT 'c' || c_custkey, lower(replace(replace(c_mktsegment, ' ', '_'), '#', '_')) FROM customer
    UNION ALL SELECT 's' || s_suppkey, 'supplier' FROM supplier
    UNION ALL SELECT 'n' || n_nationkey, 'nation' FROM nation
    UNION ALL SELECT 'n' || n_nationkey, lower(replace(replace(n_name, ' ', '_'), '#', '_')) FROM nation
    UNION ALL SELECT 'o' || o_orderkey, 'order' FROM orders
    UNION ALL SELECT 'o' || o_orderkey, lower(replace(replace(o_orderpriority, ' ', '_'), '#', '_')) FROM orders
    UNION ALL SELECT 'p' || p_partkey, 'part' FROM part
    UNION ALL SELECT 'p' || p_partkey, lower(replace(replace(p_brand, ' ', '_'), '#', '_')) FROM part
"""

_KG_CTE = f"WITH triples AS ({DERIVED_TRIPLES_SQL}), labels AS ({DERIVED_LABELS_SQL})"


# ---------------------------------------------------------------------------
# perturbed KG for the anomaly query: the clean derived KG is perfectly
# regular (its 5-rule model covers 100% of the edges with zero exceptions),
# so every anomaly score degenerates to 0.  Mirroring the reference's
# corrupted-edge evaluation protocol, the anomaly query fits AND scores over
# a deterministically perturbed KG instead:
#   * hold out the placed_by assertions of every 7th customer — those
#     customers become applicable-but-not-head exceptions of the
#     (customer, placed_by, in, order) rule, giving the blame term real mass;
#   * inject a same-pred noise edge from each held-out customer's nation
#     (the edges that pick the blame up);
#   * inject a 9-edge ring between unlabeled ghost nodes x0..x24 — no labels
#     means no candidate rule can ever cover them, so they stay uncovered and
#     the unexplained-edge constant becomes nonzero.
# Result: three score levels (unexplained ~28.6 x9, blame ~4.1 x215 at
# sf0.01, zero for the rest), exercising the covered-set reconstruction, the
# applicable/culpable blame pipeline and the negative-error constant.
# ---------------------------------------------------------------------------

PERTURBED_TRIPLES_SQL = f"""
    SELECT * FROM ({DERIVED_TRIPLES_SQL})
    WHERE NOT (pred = 'placed_by' AND CAST(substring(obj, 2) AS BIGINT) % 7 = 0)
    UNION ALL
    SELECT DISTINCT 'n' || c_nationkey, 'placed_by', 'c' || c_custkey
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT 'x' || n_nationkey, 'linked_to', 'x' || ((n_nationkey + 1) % 25)
    FROM nation WHERE n_nationkey % 3 = 0
"""

_PERTURBED_KG_CTE = (
    f"WITH triples AS ({PERTURBED_TRIPLES_SQL}), labels AS ({DERIVED_LABELS_SQL})"
)


def perturbed_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    base = derived_triples(spark, sf_dir).where(
        F.expr("NOT (pred = 'placed_by' AND CAST(substring(obj, 2) AS BIGINT) % 7 = 0)")
    )
    injected = (
        customer.where(F.col("c_custkey") % 7 == 0)
        .select(
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("subj"),
            F.lit("placed_by").alias("pred"),
            F.concat(F.lit("c"), F.col("c_custkey")).alias("obj"),
        )
        .distinct()
    )
    ghosts = nation.where(F.col("n_nationkey") % 3 == 0).select(
        F.concat(F.lit("x"), F.col("n_nationkey")).alias("subj"),
        F.lit("linked_to").alias("pred"),
        F.concat(F.lit("x"), ((F.col("n_nationkey") + 1) % 25).cast("string")).alias("obj"),
    )
    return base.unionAll(injected).unionAll(ghosts)

_CAND_CTE = (
    _KG_CTE
    + """,
 cand AS (
    SELECT ls.label AS root_label, t.pred AS pred, 'out' AS dir, lo.label AS child_label,
           t.subj AS root_node, t.obj AS child_node
    FROM triples t JOIN labels ls ON t.subj = ls.node JOIN labels lo ON t.obj = lo.node
    UNION ALL
    SELECT lo.label, t.pred, 'in', ls.label, t.obj, t.subj
    FROM triples t JOIN labels ls ON t.subj = ls.node JOIN labels lo ON t.obj = lo.node
 )"""
)


def _labels_flat(spark, sf_dir):
    return derived_labels(spark, sf_dir).withColumn("pos", F.lit(0))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_kg_triples(spark, sf_dir):
    return derived_triples(spark, sf_dir)


def q_kg_labels(spark, sf_dir):
    return derived_labels(spark, sf_dir)


def q_candidate_stats(spark, sf_dir):
    """A1 — the flagship candidate-generation aggregation (folded form:
    both directions from one un-exploded aggregate, half the shuffle-input
    of aggregating ``candidate_edges`` — see
    :func:`kgist_spark.operators.candidates.candidate_rule_stats`)."""
    return C.candidate_rule_stats(
        derived_triples(spark, sf_dir), _labels_flat(spark, sf_dir)
    ).select(
        "root_label", "pred", "dir", "child_label", "n_edges", "n_cas", "n_labels_cov"
    )


def q_label_freq(spark, sf_dir):
    return (
        derived_labels(spark, sf_dir)
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )


def q_pred_freq(spark, sf_dir):
    return derived_triples(spark, sf_dir).groupBy("pred").agg(F.count("*").alias("n"))


def q_nodes_with_type(spark, sf_dir):
    """P2 — nodes carrying BOTH labels (set intersection as group-by+having)."""
    lf = derived_labels(spark, sf_dir)
    both = (
        lf.where(F.col("label").isin("customer", "building"))
        .groupBy("node")
        .agg(F.countDistinct("label").alias("k"))
        .where(F.col("k") == 2)
    )
    return both.agg(F.count("*").alias("n_nodes"))


def q_topk_rules_by_cas(spark, sf_dir):
    """W2 — bounded top-k with total tie-break ordering."""
    return (
        q_candidate_stats(spark, sf_dir)
        .orderBy(
            F.desc("n_cas"), F.asc("root_label"), F.asc("pred"), F.asc("dir"),
            F.asc("child_label"),
        )
        .limit(20)
    )


def q_ca_size_histogram(spark, sf_dir):
    """A2 — assertion-size histogram for the rule
    (nation <-in_nation- customer).

    The rule key fixes the pred and both labels, so the join inputs are
    pre-filtered by hand — Catalyst cannot push the key filter through the
    direction explode inside ``candidate_edges``, and without the pushdown
    this one-rule query would join and explode the ENTIRE KG.  The pred
    filter also constant-folds the non-matching derived-triples branches,
    so only the two in_nation source tables are scanned at all."""
    triples = derived_triples(spark, sf_dir).where(F.col("pred") == "in_nation")
    lf = _labels_flat(spark, sf_dir).where(F.col("label").isin("nation", "customer"))
    hist = C.ca_size_histogram(
        C.candidate_edges(
            triples.withColumn("eid", F.concat_ws("|", "subj", "pred", "obj")), lf
        )
    )
    return (
        hist.where(
            (F.col("root_label") == "nation")
            & (F.col("pred") == "in_nation")
            & (F.col("dir") == "in")
            & (F.col("child_label") == "customer")
        )
        .select("ca_size", "n_heads")
    )


def q_coverage_anti(spark, sf_dir):
    """G2/J2 — edges of a predicate NOT covered by a rule (anti-join count)."""
    triples = derived_triples(spark, sf_dir)
    labels = derived_labels(spark, sf_dir)
    covered_subj = labels.where(F.col("label") == "customer").select("node")
    uncovered = (
        triples.where(F.col("pred") == "in_nation")
        .join(covered_subj.withColumnRenamed("node", "subj"), "subj", "left_anti")
    )
    return uncovered.agg(F.count("*").alias("n_uncovered"))


def q_dedup_exact(spark, sf_dir):
    return TX.exact_dup_groups(_t(spark, sf_dir, "documents")).select(
        "text_md5", "n_docs", "keep_id"
    )


def q_token_stats(spark, sf_dir):
    return TX.token_stats(_t(spark, sf_dir, "documents"))


def q_quality(spark, sf_dir):
    return TX.quality_scores(_t(spark, sf_dir, "documents"))


def q_lang_score(spark, sf_dir):
    return TX.english_char_score(_t(spark, sf_dir, "documents"))


def _query_vec(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]


def q_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(emb, _query_vec(spark, sf_dir), k=10)


def _fit_model_over(spark, sf_dir, triples_df, cache_key):
    """Exact-mode summarizer over a triple set (cached per (sf_dir, kind))."""
    if cache_key in _MODEL_CACHE:
        return _MODEL_CACHE[cache_key]
    from kgist_spark.plans.summarizer import SparkSummarizer
    from kgist_spark.pipeline.materialize import deterministic_dense_ids

    triples = deterministic_dense_ids(triples_df, ["subj", "pred", "obj"], "eid")
    labels = (
        derived_labels(spark, sf_dir)
        .groupBy("node")
        .agg(F.array_sort(F.collect_set("label")).alias("labels"))
    )
    labels = deterministic_dense_ids(labels, ["node"], "line_no")
    summ = SparkSummarizer(triples, labels, idify=True)
    model = summ.fit(passes=1, label_qualify=True)
    _MODEL_CACHE[cache_key] = (summ, model)
    return summ, model


def _fit_derived_model(spark, sf_dir):
    return _fit_model_over(
        spark, sf_dir, derived_triples(spark, sf_dir), (sf_dir, "clean")
    )


def _fit_perturbed_model(spark, sf_dir):
    return _fit_model_over(
        spark, sf_dir, perturbed_triples(spark, sf_dir), (sf_dir, "perturbed")
    )


_MODEL_CACHE: dict = {}


def q_kg_model_rules(spark, sf_dir):
    """End-to-end flagship (rows-only): fit the MDL model on the derived KG
    and return its rule set with assertion counts."""
    summ, model = _fit_derived_model(spark, sf_dir)
    rows = []
    for rule, ca in model.rules.items():
        t = summ.index.tuplify(rule)
        rows.append((repr(t), len(ca), sum(ca)))
    return spark.createDataFrame(rows, "rule string, n_cas long, n_edges long")


def _rule_rows(summ, model):
    """(repr(de-idified rule), #cas, #edges) rows; refined models may hold
    RuleTree values (Rm/Rn products) alongside level-0 tuples."""
    rows = []
    for rule, ca in model.rules.items():
        if hasattr(rule, "tuplify"):  # RuleTree (Rm/Rn product)
            t = rule.tuplify()
            n_cas, n_edges = len(rule.assertions), len(rule.edges_covered())
        else:
            t, n_cas, n_edges = rule, len(ca), sum(ca)
        rows.append((repr(summ.index.tuplify(t)), n_cas, n_edges))
    return rows


def q_kg_rules_merged(spark, sf_dir):
    """R6 (Rm) — same-root rule merging over the fitted model (rows-only):
    the merged rule set with assertion counts."""
    from kgist_spark.oracle.refine import merge_rules

    summ, model = _fit_derived_model(spark, sf_dir)
    merged = merge_rules(model)
    return spark.createDataFrame(
        _rule_rows(summ, merged), "rule string, n_cas long, n_edges long"
    )


def q_kg_rules_nested(spark, sf_dir):
    """R7 (Rn) — rule nesting refinement over the fitted model (rows-only);
    nesting never increases the MDL objective."""
    from kgist_spark.oracle.refine import nest_rules

    summ, model = _fit_derived_model(spark, sf_dir)
    nested = nest_rules(model, max_rounds=2)
    return spark.createDataFrame(
        _rule_rows(summ, nested), "rule string, n_cas long, n_edges long"
    )


def q_anomaly_topk(spark, sf_dir):
    """Q1 batch anomaly ranking: the 25 most anomalous edges of the
    deterministically perturbed KG (see :data:`PERTURBED_TRIPLES_SQL`) under
    a model fitted on that same KG — the clean derived KG is fully regular,
    so the perturbation is what gives the scorer real anomalies to rank
    (9 uncovered ghost-ring edges at the unexplained-edge constant, then
    noise edges carrying blame from held-out customer assertions)."""
    from kgist_spark.operators.anomaly import score_edges

    summ, model = _fit_perturbed_model(spark, sf_dir)
    triples = perturbed_triples(spark, sf_dir)
    return (
        score_edges(spark, model, triples)
        .select("subj", "pred", "obj", F.round("score", 5).alias("score"))
        .orderBy(F.desc("score"), "subj", "pred", "obj")
        .limit(25)
    )


def q_ranked_rules(spark, sf_dir):
    """W1 — MDL reduction-in-error ranking, top 30 (lexicographic tie-break
    instead of scan order so a SQL oracle can reproduce the exact set)."""
    from kgist_spark.plans.summarizer import graph_stats
    from kgist_spark.sources.edgelist import explode_labels

    triples = derived_triples(spark, sf_dir)
    lf = _labels_flat(spark, sf_dir)
    stats = graph_stats(triples, lf.select("node", "label", "pos"))
    ranked = C.rank_candidates(C.candidate_rule_stats(triples, lf), stats)
    return (
        ranked.select(
            "root_label", "pred", "dir", "child_label", "n_cas",
            F.round("reduction_in_error", 4).alias("red_bits"),
        )
        .orderBy(
            F.desc("red_bits"), F.desc("n_cas"), F.desc("root_label"),
            F.asc("pred"), F.asc("dir"), F.asc("child_label"),
        )
        .limit(30)
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact word-5-gram Jaccard near-dup pairs over documents."""
    from kgist_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.4)
    return pairs.select("a", "b", F.round("jaccard", 5).alias("jaccard"))


def q_minhash_neardup(spark, sf_dir):
    """MinHash-LSH blocked near-dup pairs.  The verification stage computes
    EXACT jaccard over candidates, so the result is a subset of the exact
    ngram-jaccard pairs; on this corpus the near-dup pairs are high-jaccard
    and LSH recall is complete, so the exact-SQL oracle matches in full —
    any LSH recall loss would surface as a row-count mismatch."""
    from kgist_spark.operators.dedup import minhash_neardup_pairs

    pairs = minhash_neardup_pairs(_t(spark, sf_dir, "documents"), threshold=0.4)
    return pairs.select("a", "b", F.round("jaccard", 5).alias("jaccard"))


def q_simhash(spark, sf_dir):
    """SimHash fingerprints (md5-based JVM expressions; bit-exact DuckDB
    oracle replays the same tokenization/hash/sign-sum pipeline)."""
    from kgist_spark.operators.dedup import simhash64

    return simhash64(_t(spark, sf_dir, "documents"))


def q_embedding_ann(spark, sf_dir):
    """Approximate nearest neighbors via IVF coarse quantization.  Fully
    deterministic (centroids = first 32 vectors by id, first-max argmax,
    stable probe ordering), so the DuckDB oracle replays the entire IVF
    pipeline, not just the final top-k."""
    from kgist_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, _query_vec(spark, sf_dir), k=10)


def q_salted_pred_fanout(spark, sf_dir):
    """X6 — skew-safe distinct-count by a hot group key: distinct subjects
    per predicate via the two-phase salted aggregation.  The oracle is the
    plain COUNT(DISTINCT) — exactness of the salting scheme is the point."""
    from kgist_spark.operators.salting import salted_count_distinct

    return salted_count_distinct(
        derived_triples(spark, sf_dir), ["pred"], "subj", out_col="n_subj"
    )


def q_bpe_tokens(spark, sf_dir):
    """Regex pre-tokenizer (BPE-ish) counts + alpha-token share."""
    return TX.bpe_token_stats(_t(spark, sf_dir, "documents"))


def q_user_sessions(spark, sf_dir):
    """Gap sessionization over events (30-min timeout): one window + one
    groupBy, both hash-partitioned on the user key."""
    from kgist_spark.operators.timeseries import sessionize

    return sessionize(_t(spark, sf_dir, "events"))


def q_asof_enrich(spark, sf_dir):
    """Backward as-of join: every click enriched with the most recent prior
    view's value per user — union-tag timeline + running last(ignorenulls),
    ONE shuffle on the key (no range-join explosion).  DuckDB's native
    ASOF JOIN is the oracle."""
    from kgist_spark.operators.timeseries import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "value", "event_id"
    )
    # inner as-of for the gate, dropping null-VALUED matches too (both here
    # and in the oracle's WHERE: a null float hashes differently across
    # engines, and an inner ASOF alone would keep a matched-row-with-null-
    # value that this filter drops); the operator's left/null semantics are
    # pinned by unit tests instead
    return asof_join(
        clicks, views, ["user_id"], "ts", "value", out_col="last_view_value"
    ).where(F.col("last_view_value").isNotNull()).select(
        "event_id", "user_id",
        F.round("value", 5).alias("click_value"),
        F.round("last_view_value", 5).alias("last_view_value"),
    )


def q_neardup_clusters(spark, sf_dir):
    """Dedup DECISION table: near-dup pairs closed into clusters by
    distributed connected components; every doc maps to its cluster's
    min-id representative (keep_id) with an is_dup flag."""
    from kgist_spark.operators.dedup import neardup_keep_table

    return neardup_keep_table(_t(spark, sf_dir, "documents"), threshold=0.4)


def q_neardup_keep_best(spark, sf_dir):
    """Keep-BEST dedup decision table: near-dup clusters keep their longest
    member (n_chars, ties by min doc_id) instead of the min id — what a
    real pipeline retains."""
    from kgist_spark.operators.dedup import neardup_keep_best

    return neardup_keep_best(
        _t(spark, sf_dir, "documents"), weight_col="n_chars", threshold=0.4
    )


def q_bpe_real_tokens(spark, sf_dir):
    """REAL merge-table BPE token counts (trained 64-merge table, rank
    encoder over the distinct word vocabulary only — Python cost is
    O(|vocab|), see :mod:`kgist_spark.operators.bpe`)."""
    from kgist_spark.operators.bpe import bpe_token_counts

    return bpe_token_counts(_t(spark, sf_dir, "documents"))


def q_lang_id(spark, sf_dir):
    """Function-word language-ID scores + argmax prediction."""
    return TX.lang_id_scores(_t(spark, sf_dir, "documents"))


def q_doc_fingerprint(spark, sf_dir):
    """Order-sensitive rolling-hash document fingerprint (md5-portable)."""
    return TX.doc_fingerprint_md5(_t(spark, sf_dir, "documents"))


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (brute-force exact baseline)."""
    from kgist_spark.operators.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


def q_embedding_ann_lsh(spark, sf_dir):
    """Hyperplane-LSH approximate nearest neighbors.  The seeded random
    planes are embedded as literal constants in the DuckDB oracle, which
    replays the signature computation, Hamming gate and exact rescore."""
    from kgist_spark.operators.similarity import ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ann_topk(emb, _query_vec(spark, sf_dir), k=10)


def _lsh_planes_values_sql(n_planes: int = 8, seed: int = 7, dim: int = 64) -> str:
    """The ann_topk hyperplanes as a DuckDB VALUES clause — same RandomState
    stream as :func:`kgist_spark.operators.similarity.ann_topk`, serialized
    with repr() (shortest round-trip form, parses back to the identical
    double)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in planes[i])}]::DOUBLE[])"
        for i in range(n_planes)
    )
    return f"(VALUES {rows}) AS planes(i, pl)"


def q_events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("HOUR", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 5).alias("avg_value"))
    )


_MIX_RATES = {"en": 0.25, "zh": 1.0, "es": 0.5}
_MIX_DEFAULT = 0.1
_MIX_SALT = "mix-v1"


def q_stratified_sample(spark, sf_dir):
    """Deterministic hash-gated stratified sample of documents (per-lang
    mixing rates).  Retry-safe and engine-reproducible: the keep decision
    is md5(salt||doc_id)'s 32-bit hex prefix against a per-stratum
    threshold literal — one scan, no shuffle, no RNG state."""
    from kgist_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", _MIX_RATES,
        default_rate=_MIX_DEFAULT, salt=_MIX_SALT,
    ).select("doc_id", "lang", "source", "n_chars")


def q_sample_mixture(spark, sf_dir):
    """Post-sampling mixture audit: rows + chars per language stratum."""
    from kgist_spark.operators.sampling import mixture_report, stratified_sample

    docs = _t(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "doc_id", "lang", _MIX_RATES,
        default_rate=_MIX_DEFAULT, salt=_MIX_SALT,
    )
    return mixture_report(kept, "lang", weight_col="n_chars")


def _mix_gate_sql() -> str:
    """The sampling gate as DuckDB SQL — thresholds come from the SAME
    rate_threshold() the Spark operator uses, so the two can never drift."""
    from kgist_spark.operators.sampling import rate_threshold

    whens = " ".join(
        f"WHEN '{s}' THEN '{rate_threshold(r)}'"
        for s, r in sorted(_MIX_RATES.items())
    )
    case = f"CASE lang {whens} ELSE '{rate_threshold(_MIX_DEFAULT)}' END"
    prefix = f"substr(md5('{_MIX_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)"
    return f"{prefix} < {case}"


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag corpus documents (source != src0)
    sharing any distinct word 5-gram with the src0 'eval set'.  Benchmark
    grams broadcast; corpus grams are deduped in-row and partially
    aggregated back to one row per document before the only shuffle."""
    from kgist_spark.operators.text import ngram_decontaminate

    docs = _t(spark, sf_dir, "documents")
    return ngram_decontaminate(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
        n=5,
    )


def q_domain_cap(spark, sf_dir):
    """Per-source document cap (RefinedWeb-style anti-domination guard):
    keep at most 5 docs per source, ranked by a deterministic md5 of the
    doc key — partitioning/retry/engine-independent."""
    from kgist_spark.operators.sampling import domain_cap

    docs = _t(spark, sf_dir, "documents")
    return domain_cap(docs, "doc_id", "source", cap=5, salt=_MIX_SALT).select(
        "doc_id", "source", "rk"
    )


def q_repetition(spark, sf_dir):
    """Gopher-style within-document repetition quality gates."""
    from kgist_spark.operators.text import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


#: PageRank query params — shared by the Spark query and its SQL oracle so
#: the two always replay the same fixed-point arithmetic
_PR_ITERS = 8


def q_kg_pagerank(spark, sf_dir):
    """Fixed-point integer PageRank over the derived KG (simple-graph
    semantics: distinct (subj, obj) pairs, predicates ignored) — bit-exact
    at any parallelism, see :mod:`kgist_spark.operators.graph`."""
    from kgist_spark.operators.graph import pagerank_fixed_point

    edges = derived_triples(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    ).distinct()
    return pagerank_fixed_point(edges, iterations=_PR_ITERS)


#: HITS iteration count — shared by the Spark query and its SQL oracle
_HITS_ITERS = 6


def q_kg_hits(spark, sf_dir):
    """Integer fixed-point HITS hubs/authorities over the derived KG
    (distinct (subj, obj) pairs) — max-normalized so every op is exact
    int64, bit-identical at any parallelism; unrolled-CTE oracle."""
    from kgist_spark.operators.graph import hits_fixed_point

    edges = derived_triples(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    ).distinct()
    return hits_fixed_point(edges, iterations=_HITS_ITERS)


#: BM25 query terms — shared by the Spark query and the oracle
_BM25_TERMS = ["spark", "join", "hash"]


#: synchronous min-label rounds for kg_components — the derived KG is one
#: giant component (nations hub everything) with min-label convergence
#: measured at round 7 on BOTH sf0.001 and sf0.01; 8 leaves a margin and
#: the fixed count keeps Spark and the oracle round-for-round identical
#: whether or not the graph has converged.
_CC_ROUNDS = 8


def q_kg_components(spark, sf_dir):
    """Connected components of the derived KG (undirected) via EXACTLY
    ``_CC_ROUNDS`` synchronous min-label rounds — the oracle-replayable
    variant of the X4 components family (the adaptive
    ``connected_components`` driver/star paths are pinned by pytest;
    this row pins the distributed min-label loop itself against chained
    unrolled CTEs, the PageRank pattern)."""
    from kgist_spark.operators.components import minlabel_rounds

    t = derived_triples(spark, sf_dir)
    return minlabel_rounds(
        t.select(F.col("subj").alias("a"), F.col("obj").alias("b")),
        rounds=_CC_ROUNDS,
    )


def q_bm25_topk(spark, sf_dir):
    """BM25 keyword search over documents: top-10 for a 3-term query —
    one corpus pass, fixed-order float expression (no sum-order drift),
    TakeOrderedAndProject top-k."""
    from kgist_spark.operators.search import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=10)


def q_kg_degree_stats(spark, sf_dir):
    """Per-(predicate, direction) degree/skew stats over the derived KG —
    the planning table that tells the engine which predicates need salting
    before their joins run."""
    from kgist_spark.operators.graph import pred_degree_stats

    return pred_degree_stats(derived_triples(spark, sf_dir))


def q_kg_path2_stats(spark, sf_dir):
    """Length-2 path counts per predicate pair via the degree-product
    aggregation (no path enumeration); the oracle ENUMERATES the naive
    self-join — hash equality proves the rewrite."""
    from kgist_spark.operators.graph import path2_stats

    return path2_stats(derived_triples(spark, sf_dir))


def _pii_enriched_docs(spark, sf_dir):
    """The documents table with deterministic synthetic PII appended to
    every third document (the testdata corpus has none) — the SAME
    expression the oracle builds in SQL, so the scrub has real work and
    the hash check is meaningful."""
    docs = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1 tel 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, injected).otherwise(F.col("text")),
    )


def q_incident_clicks(spark, sf_dir):
    """Banded interval join: every error event opens a 10-minute incident
    window; count the clicks (any user) falling inside it and their
    fixed-point value sum.  The bin equi-join replaces the
    BroadcastNestedLoopJoin a raw theta join plans; errors with no clicks
    keep a zero row (left fill).  Value cents are summed as integers —
    order-free, hash-exact."""
    from kgist_spark.operators.timeseries import range_join_pairs

    ev = _t(spark, sf_dir, "events")
    incidents = ev.where(F.col("event_type") == "error").select(
        F.col("event_id"), F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("end"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    pairs = range_join_pairs(incidents, clicks, bin_seconds=600)
    hits = pairs.groupBy("event_id").agg(
        F.count("*").alias("n_clicks"),
        F.sum("cents").alias("click_value_x100"),
    )
    return incidents.select("event_id").join(hits, "event_id", "left").select(
        "event_id",
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("click_value_x100", F.lit(0)).alias("click_value_x100"),
    )


def q_corpus_percentiles(spark, sf_dir):
    """Per-language document-length distribution report: exact interpolated
    percentiles computed scale-safely (value histogram + cumulative window
    — never a per-group buffer of raw values, unlike Spark's built-in
    exact percentile aggregate); the oracle is DuckDB's native
    quantile_cont, whose interpolation the histogram walk reproduces."""
    from kgist_spark.operators.sampling import distribution_report

    return distribution_report(
        _t(spark, sf_dir, "documents"), "lang", "n_chars"
    ).withColumnRenamed("stratum", "lang")


#: co-occurrence group cap — shared by the Spark query and the oracle
_COOCCUR_CAP = 32


def q_part_triangles(spark, sf_dir):
    """Triangle census of the part co-occurrence graph (parts sharing an
    order): capped co-occurrence pair generation (hot groups dropped
    two-phase, Observation-counted) feeding the degree-oriented exact
    triangle count.  The oracle ENUMERATES the naive 3-way self-join —
    hash equality of the count proves the O(m^1.5) oriented rewrite."""
    from kgist_spark.operators.graph import cooccur_edges, triangle_count

    edges = cooccur_edges(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey",
        max_group=_COOCCUR_CAP,
    )
    return triangle_count(edges)


def q_lm_score(spark, sf_dir):
    """CCNet-style unigram-LM quality scoring: bits-per-token of every
    corpus document under an add-one unigram LM trained on the src0 slice
    (the 'trusted reference'); integer fixed-point end to end."""
    from kgist_spark.operators.lm import lm_score

    docs = _t(spark, sf_dir, "documents")
    return lm_score(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    )


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    bag log-likelihood ratio of every corpus document under
    target(src0)-vs-raw add-one bucket distributions; md5-prefix bucket
    hash and fixed-point log-ratios make the whole computation
    integer-hash-replayable by the DuckDB oracle."""
    from kgist_spark.operators.dsir import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_weights(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    )


def q_embedding_ann_q8(spark, sf_dir):
    """Top-10 by int8-quantized dot product — the memory-bound ANN rung:
    quantization and scoring are EXACT integers, so the oracle replays the
    whole computation, not just a rounded result."""
    from kgist_spark.operators.similarity import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    return quantized_topk(emb, _query_vec(spark, sf_dir), k=10)


def q_kg_reciprocity(spark, sf_dir):
    """Per-predicate reciprocity over the derived KG — symmetric-predicate
    detection for canonicalization + extraction-bug triage; deduped pair
    set self-probed once, integer-DIV fraction.

    The derived KG's predicates are typed (customer->nation etc.), so its
    raw reciprocity is identically zero — a hash-green all-zero table
    would pin nothing.  Like ``pii_scrub``'s synthetic-PII enrichment, the
    query input unions in the REVERSE of an md5-gated ~third of the
    triples (the same expression the oracle builds), so every predicate
    gets a known partial reciprocity the DIV arithmetic must reproduce."""
    from kgist_spark.operators.graph import pred_reciprocity

    t = derived_triples(spark, sf_dir)
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", "subj", "pred", "obj")), 1, 8
            ),
            16, 10,
        ).cast("long")
        % 3
        == 0
    )
    # conditional explode, not a union: a union's two branches would each
    # re-execute the derived-KG join pipeline (the symmetric-edge lesson —
    # one scan, rows fanned in-row)
    fwd = F.struct(F.col("subj"), F.col("pred"), F.col("obj"))
    rev = F.struct(
        F.col("obj").alias("subj"), F.col("pred"), F.col("subj").alias("obj")
    )
    enriched = t.select(
        F.explode(
            F.when(gate, F.array(fwd, rev)).otherwise(F.array(fwd))
        ).alias("x")
    ).select("x.subj", "x.pred", "x.obj")
    return pred_reciprocity(enriched)


def q_part_clustering(spark, sf_dir):
    """Per-node triangle counts + local clustering coefficients of the part
    co-occurrence graph — same degree-oriented O(m^1.5) kernel as
    part_triangles, plus a 3-row-per-triangle explode and integer-DIV
    coefficients; the oracle enumerates the naive 3-way self-join per
    node."""
    from kgist_spark.operators.graph import clustering_coefficients, cooccur_edges

    edges = cooccur_edges(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey",
        max_group=_COOCCUR_CAP,
    )
    return clustering_coefficients(edges)


#: event-drift trailing window — shared by the Spark query and its oracle.
#: 24 observed hourly buckets ≈ one day of warm-up per event type.
_DRIFT_W = 24


def q_event_drift(spark, sf_dir):
    """Hourly volume-drift z-scores per event type against the trailing
    ``_DRIFT_W`` observed buckets — integer window sums, one fixed-order
    float expression rounded to int.  The operator emits warm-up /
    constant-window buckets with a NULL score (pinned by pytest); the
    contract row compares the SCORED buckets, because a NULL in a BIGINT
    oracle column round-trips through pandas as NaN and the row-normalizer
    cannot tell the two apart."""
    from kgist_spark.operators.timeseries import event_drift

    return event_drift(_t(spark, sf_dir, "events"), trailing=_DRIFT_W).where(
        F.col("z_x1e6").isNotNull()
    )


def q_lm2_score(spark, sf_dir):
    """Interpolated bigram-LM bits-per-transition under a src0-trained
    model — the word-ORDER-aware rung above lm_score; per-transition
    log-probs fixed-point BEFORE the per-doc integer sum."""
    from kgist_spark.operators.lm import bigram_score

    docs = _t(spark, sf_dir, "documents")
    return bigram_score(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    )


def q_dup_ngrams(spark, sf_dir):
    """Per-document repeated-5-gram statistics (the Lee et al. 2022
    ExactSubstr dedup signal over word windows): windows built in-row,
    32-byte md5 gram keys, two shuffles total, integer-DIV duplicate
    fraction so the row is float-free."""
    from kgist_spark.operators.dedup import dup_ngram_stats

    return dup_ngram_stats(_t(spark, sf_dir, "documents"), n=5)


#: PMI query params — shared by the Spark query and its SQL oracle
_PMI_WINDOW, _PMI_MIN_COUNT, _PMI_K = 5, 10, 50


def q_token_pmi(spark, sf_dir):
    """Top-50 within-window token pairs by PMI (Church & Hanks 1990) —
    the relation-proposal mining pass of a KG pipeline; in-row pair
    generation, fixed-order log2 expression rounded straight to an int."""
    from kgist_spark.operators.text import pmi_pairs

    return pmi_pairs(
        _t(spark, sf_dir, "documents"),
        window=_PMI_WINDOW, min_count=_PMI_MIN_COUNT, k=_PMI_K,
    )


#: k-core query params — k=5 peels ~40% of the derived KG and converges at
#: round 5 on the test SFs; 6 leaves a margin, and the FIXED round count
#: keeps Spark and the oracle round-for-round identical either way
_KCORE_K, _KCORE_ROUNDS = 5, 6


def q_kg_kcore(spark, sf_dir):
    """k-core of the derived KG (undirected) via EXACTLY ``_KCORE_ROUNDS``
    synchronous peel rounds — the density filter that drops the sparse
    fringe before expensive mining; same loop discipline (size-gated
    broadcast, scoped shuffle width, lazy checkpoints) as kg_pagerank /
    kg_components."""
    from kgist_spark.operators.graph import kcore_rounds

    t = derived_triples(spark, sf_dir)
    return kcore_rounds(
        t.select(F.col("subj").alias("a"), F.col("obj").alias("b")),
        k=_KCORE_K, rounds=_KCORE_ROUNDS,
    )


def q_pii_scrub(spark, sf_dir):
    """PII redaction audit: emails / IPv4s / phone numbers counted and
    replaced in one zero-shuffle codegen pass; ``clean_fp`` fingerprints
    the scrubbed text."""
    from kgist_spark.operators.scrub import pii_scrub

    return pii_scrub(_pii_enriched_docs(spark, sf_dir))


def q_line_dedup(spark, sf_dir):
    """Cross-document line dedup (CCNet-style boilerplate removal) over a
    line structure derived deterministically from the corpus (every
    ' table ' becomes a newline — the tiny vocabulary makes short lines
    repeat across documents exactly like site boilerplate does)."""
    from kgist_spark.operators.scrub import line_dedup

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr("replace(text, ' table ', '\n')").alias("text")
    )
    return line_dedup(docs, min_docs=4)


def q_curate(spark, sf_dir):
    """Composite corpus-curation decision table: lang admission, length,
    diversity, repetition, exact-dup and near-dup gates folded into ONE
    keep/drop row per document with the first failing gate as
    ``drop_reason`` (see :mod:`kgist_spark.operators.curate`)."""
    from kgist_spark.operators.curate import curate_table

    return curate_table(_t(spark, sf_dir, "documents"), threshold=0.4)


def q_curate_summary(spark, sf_dir):
    """Per-reason rollup of the curation decision table — the one-page
    audit report (kept docs counted under reason 'kept')."""
    from kgist_spark.operators.curate import curate_summary, curate_table

    return curate_summary(
        curate_table(_t(spark, sf_dir, "documents"), threshold=0.4)
    )


#: one k-means fit per (sf_dir, k, n_iter) shared by the four semantic-dedup
#: queries — the production shape (a pipeline fits once and feeds every
#: downstream consumer), same memo pattern as ``_fit_model_over``.  The
#: cached value is the plain offset-space centroid list: engine- and
#: session-independent integers, so reuse is safe across SparkSessions.
_KMEANS_CENTS_CACHE: dict = {}


def _kmeans_cents(spark, sf_dir, k=8, n_iter=3):
    from kgist_spark.operators.kmeans import kmeans_fit

    key = (os.path.abspath(sf_dir), k, n_iter)
    if key not in _KMEANS_CENTS_CACHE:
        _, cents = kmeans_fit(_t(spark, sf_dir, "embeddings"), k=k, n_iter=n_iter)
        _KMEANS_CENTS_CACHE[key] = cents
    return _KMEANS_CENTS_CACHE[key]


def q_embedding_kmeans(spark, sf_dir):
    """Fixed-point Lloyd k-means cell assignment over the embeddings table
    (all-integer arithmetic — bit-identical at any parallelism and
    replayed by iteration-unrolled DuckDB CTEs, the PageRank pattern)."""
    from kgist_spark.operators.kmeans import kmeans_fit

    assigned, _ = kmeans_fit(_t(spark, sf_dir, "embeddings"), k=8, n_iter=3,
                             centroids=_kmeans_cents(spark, sf_dir))
    return assigned


def q_semdedup_pairs(spark, sf_dir):
    """SemDeDup: exact-cosine near-dup pairs restricted to k-means cells
    (the blocking structure that keeps per-cell work O((n/k)²))."""
    from kgist_spark.operators.kmeans import semdedup_pairs

    return semdedup_pairs(_t(spark, sf_dir, "embeddings"),
                          k=8, n_iter=3, threshold=0.4,
                          centroids=_kmeans_cents(spark, sf_dir))


def q_semdedup_clusters(spark, sf_dir):
    """Semantic-dedup DECISION table: semdedup pairs closed into clusters
    by distributed connected components; every vector maps to its
    cluster's min-id representative (keep_id) with an is_dup flag — the
    SemDeDup analogue of ``neardup_clusters``."""
    from kgist_spark.operators.kmeans import semdedup_keep_table

    return semdedup_keep_table(_t(spark, sf_dir, "embeddings"),
                               k=8, n_iter=3, threshold=0.4,
                               centroids=_kmeans_cents(spark, sf_dir))


def q_semdedup_keep_best(spark, sf_dir):
    """Keep-BEST semantic dedup: each duplicate cluster keeps the member
    farthest from its cell centroid (SemDeDup's lowest-centroid-similarity
    keeper rule), computed in the same integer offset-space metric the
    assignment uses."""
    from kgist_spark.operators.kmeans import semdedup_keep_best

    return semdedup_keep_best(_t(spark, sf_dir, "embeddings"),
                              k=8, n_iter=3, threshold=0.4,
                              centroids=_kmeans_cents(spark, sf_dir))



#: synchronous BFS frontier rounds for kg_bfs — the derived KG's diameter
#: from the nation seed class is 3 (n→c/s→o/p closes at round 3 on both
#: test SFs); 4 leaves a margin and the fixed count keeps Spark and the
#: oracle round-for-round identical either way
_BFS_ROUNDS = 4
#: synchronous label-propagation rounds for kg_labelprop (fixed-round
#: semantics — EXACTLY this many rounds IS the contract, convergence not
#: required; see labelprop_rounds)
_LP_ROUNDS = 4
#: link-prediction knobs: junction degree cutoff (hub discount ~0 there
#: anyway — the quadratic wedge cost is dropped exactly where the signal
#: vanishes) and the returned top-k
_LINKPRED_MAX_DEG = 64
_LINKPRED_K = 50


def q_kg_bfs(spark, sf_dir):
    """Multi-source BFS over the undirected derived KG from the nation
    seed class ('n'-prefixed nodes): (node, dist) = min hops within
    EXACTLY _BFS_ROUNDS synchronous frontier rounds — integer min over a
    self-loop-carrying symmetric list, bit-exact at any parallelism."""
    from kgist_spark.operators.graph import bfs_rounds

    t = derived_triples(spark, sf_dir)
    return bfs_rounds(
        t.select(F.col("subj").alias("a"), F.col("obj").alias("b")),
        seed_predicate=F.col("node").startswith("n"),
        rounds=_BFS_ROUNDS,
    )


def q_kg_labelprop(spark, sf_dir):
    """Synchronous label-propagation communities over the undirected
    derived KG — EXACTLY _LP_ROUNDS rounds, most-frequent neighbor label
    with ties to the smallest (lexicographic min of (-n, label)): dense
    local communities, not components."""
    from kgist_spark.operators.graph import labelprop_rounds

    t = derived_triples(spark, sf_dir)
    return labelprop_rounds(
        t.select(F.col("subj").alias("a"), F.col("obj").alias("b")),
        rounds=_LP_ROUNDS,
    )


def q_kg_linkpred(spark, sf_dir):
    """Resource-allocation link prediction over the undirected derived KG:
    top-50 non-adjacent pairs by integer fixed-point RA score
    (sum of 1e6 div deg(z) over common neighbors z, junction degree
    capped by semantics) — candidate missing edges for a QA queue."""
    from kgist_spark.operators.graph import linkpred_ra

    t = derived_triples(spark, sf_dir)
    return linkpred_ra(
        t.select(F.col("subj").alias("a"), F.col("obj").alias("b")),
        max_junction_deg=_LINKPRED_MAX_DEG, k=_LINKPRED_K,
    )


#: personalized-PageRank iterations for kg_ppr (frontier closure from the
#: nation seed class is complete by round 3 on the test KGs; 6 keeps the
#: ranks converging and Spark/oracle round-for-round identical)
_PPR_ITERS = 6


def q_kg_ppr(spark, sf_dir):
    """Personalized PageRank over the derived KG (directed, simple-graph
    semantics like kg_pagerank) with restart mass confined to the ORDER
    seed class — the KG's only sources, so rank flows the full
    o -> c/p -> s -> n closure; only reached nodes emit rows (the
    sparse-frontier property IS the operator's scale story)."""
    from kgist_spark.operators.graph import ppr_fixed_point

    edges = derived_triples(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    ).distinct()
    return ppr_fixed_point(
        edges, F.col("node").startswith("o"), iterations=_PPR_ITERS
    )


def q_events_hll(spark, sf_dir):
    """HyperLogLog distinct users per event type — the md5-register sketch
    whose registers AND estimate replay bit-for-bit in DuckDB (Spark's own
    approx_count_distinct hash is engine-private); linear-counting
    correction from a Python-precomputed table shared by both engines."""
    from kgist_spark.operators.sketch import hll_distinct

    return hll_distinct(
        _t(spark, sf_dir, "events"), ["event_type"], "user_id"
    )


def q_cohort_retention(spark, sf_dir):
    """Cohort-retention table over the events stream: users grouped by
    first active calendar day, distinct-active counts per day offset,
    integer fixed-point retention fraction."""
    from kgist_spark.operators.timeseries import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"))


def q_cms_user_counts(spark, sf_dir):
    """Count-min-sketch frequency estimates for the exact top-16 users:
    the d=4 × w=64 sketch is deliberately narrow so the min-over-rows
    estimate visibly absorbs collisions (overcount ≥ 0 by construction);
    both the seeded md5 cell hashes and the integer counters replay
    bit-for-bit in DuckDB."""
    from kgist_spark.operators.sketch import cms_build, cms_probe

    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    exact = ev.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    probes = exact.orderBy(F.desc("n_exact"), "user_id").limit(16)
    est = cms_probe(
        cms_build(ev, "user_id", d=4, w=64),
        probes.select("user_id"), "user_id", d=4, w=64,
    )
    return probes.join(est, "user_id").select(
        "user_id", "n_exact", "n_cms",
        (F.col("n_cms") - F.col("n_exact")).alias("overcount"),
    )


def q_event_funnel(spark, sf_dir):
    """Ordered view→click→purchase funnel: per-user greedy earliest-chain
    depth via one JVM fold over the sorted in-group event array (one
    shuffle on user), integer-basis-point conversions."""
    from kgist_spark.operators.timeseries import funnel

    return funnel(_t(spark, sf_dir, "events"))


def q_tfidf_terms(spark, sf_dir):
    """Per-document keyword extraction: top-3 terms per document by
    integer fixed-point tf-idf (linear rarity weight — log-free so the
    truncating div is bit-identical across engines)."""
    from kgist_spark.operators.search import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), per_doc_k=3)


#: k-truss query params — its OWN co-occurrence cap (16, tighter than the
#: census's 32: truss rounds pay the wedge pass per round), k=5 (edges must
#: sit in >= 3 triangles), 2 fixed peel rounds (round-for-round oracle)
_TRUSS_CAP, _TRUSS_K, _TRUSS_ROUNDS = 16, 5, 2


def q_part_truss(spark, sf_dir):
    """k-truss peel of the part co-occurrence graph: EXACTLY
    ``_TRUSS_ROUNDS`` synchronous support-recompute-and-filter rounds —
    the EDGE-level density filter k-core can't give (bridge edges with
    high-degree endpoints survive the core but carry no triangles);
    keeps the cliquish catalog fabric, sheds attachment noise."""
    from kgist_spark.operators.graph import cooccur_edges, ktruss_rounds

    edges = cooccur_edges(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey",
        max_group=_TRUSS_CAP,
    )
    return ktruss_rounds(edges, k=_TRUSS_K, rounds=_TRUSS_ROUNDS)


def q_dup_spans(spark, sf_dir):
    """Maximal duplicated-substring spans — the Lee et al. 2022 ExactSubstr
    CUT LIST `dup_ngrams` stops short of: WHERE the cross-document
    duplicated substrings sit (1-based inclusive token positions), so a
    curation pass can excise spans instead of dropping documents."""
    from kgist_spark.operators.dedup import dup_spans

    return dup_spans(_t(spark, sf_dir, "documents"), n=5, min_docs=2)


#: priority-sample size (k largest priorities; the (k+1)-th is the
#: Horvitz-Thompson threshold)
_PSAMPLE_K = 200


def q_priority_sample(spark, sf_dir):
    """Deterministic priority sampling (Duffield-Lund-Thorup): k documents
    weighted by n_chars with bit-replayable integer priorities and
    unbiased subset-sum `est_weight` contributions."""
    from kgist_spark.operators.sampling import priority_sample

    return priority_sample(
        _t(spark, sf_dir, "documents"), k=_PSAMPLE_K,
        weight_col="n_chars", key_col="doc_id",
    )



#: random-walk params shared by the Spark query and the SQL oracle
_WALK_LEN, _WALK_DEG = 3, 16


def q_kg_walks(spark, sf_dir):
    """Deterministic DeepWalk-style random-walk corpus over the directed
    derived KG: one walk per out-node, seeded md5 next-hop draws, md5-order
    capped adjacency — the KG -> embedding-training-corpus bridge,
    bit-replayable at any parallelism."""
    from kgist_spark.operators.graph import random_walks

    edges = derived_triples(spark, sf_dir).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return random_walks(edges, walk_len=_WALK_LEN, max_degree=_WALK_DEG)



def q_kg_churn(spark, sf_dir):
    """Per-predicate churn between two KG snapshots (the clean derived KG
    vs its deterministic perturbation — the same pair the anomaly queries
    use): added/removed/kept triple counts and an integer churn rate, the
    monitoring table an incremental crawl's KG versioning is judged by."""
    from kgist_spark.operators.graph import snapshot_diff

    return snapshot_diff(
        derived_triples(spark, sf_dir), perturbed_triples(spark, sf_dir)
    )


#: per-subject fact cap in the textual serialization (semantic, replayed
#: by the oracle)
_SENT_CAP = 64


def q_kg_sentences(spark, sf_dir):
    """Per-subject verbalized-triple documents ("subj pred obj. ..." in
    sorted order, capped at _SENT_CAP facts) — the KG -> LLM-training-text
    exporter; n_facts carries the TRUE count so weighting sees the cap."""
    from kgist_spark.operators.graph import kg_sentences

    return kg_sentences(derived_triples(spark, sf_dir),
                        max_facts=_SENT_CAP)



#: packing context length (tokens per training chunk) — small enough that
#: sf-test documents span chunk boundaries
_PACK_CTX = 512


def q_pack_layout(spark, sf_dir):
    """Concat-and-chunk packing layout (the GPT-style pretraining format):
    each document's landing position in the ctx-token chunk stream, via a
    two-phase distributed prefix sum (prefix-bucketed windows) instead of
    the single-partition global window."""
    from kgist_spark.operators.pack import pack_layout

    return pack_layout(_t(spark, sf_dir, "documents"), ctx=_PACK_CTX)



def q_containment_pairs(spark, sf_dir):
    """Shingle containment pairs (|A∩B| / min sizes) — the asymmetric
    quote/boilerplate signal Jaccard misses; exact verification over full
    shingle sets, df-capped candidate generation."""
    from kgist_spark.operators.dedup import containment_pairs

    return containment_pairs(_t(spark, sf_dir, "documents"),
                             threshold_x1e6=600_000)



def q_bloom_decontaminate(spark, sf_dir):
    """Benchmark decontamination through a Bloom membership sketch: same
    distinct-5-gram semantics as `decontaminate`, but the executor-resident
    structure is the FIXED 8,192-word bitmap instead of the benchmark's
    unbounded gram set — the shape that survives a web-scale benchmark
    side.  Deterministic false positives replay in the oracle bit-for-bit
    (`n_maybe_hits` >= the exact path's `n_hits`, never under)."""
    from kgist_spark.operators.sketch import bloom_ngram_decontaminate

    docs = _t(spark, sf_dir, "documents")
    return bloom_ngram_decontaminate(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
        n=5,
    )


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event streams:
    consecutive-pair counts (``(ts, event_id)`` ordering, so same-ts ties
    are deterministic) row-normalized to truncating integer fixed-point
    probabilities — the next-event prior behind abandonment prediction."""
    from kgist_spark.operators.timeseries import event_transitions

    return event_transitions(_t(spark, sf_dir, "events"))


#: neighbor-jaccard params — same junction-degree cap rationale as
#: kg_linkpred (hubs carry no resolution signal but quadratic wedge cost)
_NJ_MAX_DEG, _NJ_K = 64, 50


def q_kg_neighbor_jaccard(spark, sf_dir):
    """Top-50 non-adjacent node pairs of the undirected derived KG by
    neighborhood Jaccard (integer fixed point, junction degree capped by
    semantics, full-degree denominator) — duplicate-entity candidates
    for the canonicalization queue."""
    from kgist_spark.operators.graph import neighbor_jaccard

    t = derived_triples(spark, sf_dir)
    return neighbor_jaccard(
        t.select(F.col("subj").alias("a"), F.col("obj").alias("b")),
        max_junction_deg=_NJ_MAX_DEG, k=_NJ_K,
    )


def q_kg_assortativity(spark, sf_dir):
    """Degree assortativity of the undirected derived KG: four BIGINT
    edge-level sums + ONE fixed-order double correlation expression
    rounded to r_x1e6 — the one-number extraction-mix drift detector.
    NULL-scored rows (zero variance) are filtered like event_drift so
    the BIGINT column survives the pandas round-trip."""
    from kgist_spark.operators.graph import degree_assortativity

    t = derived_triples(spark, sf_dir)
    return degree_assortativity(
        t.select(F.col("subj").alias("a"), F.col("obj").alias("b"))
    ).where(F.col("r_x1e6").isNotNull())


def q_kg_schema(spark, sf_dir):
    """Per-predicate domain/range type profile of the derived KG —
    dominant type + share, type counts, and fixed-point Shannon entropy
    per (pred, side): the ontology-induction report a construction
    pipeline publishes after every crawl (entropy drift = extractor
    firing on the wrong entity class)."""
    from kgist_spark.operators.graph import predicate_schema

    return predicate_schema(
        derived_triples(spark, sf_dir), derived_labels(spark, sf_dir)
    )


def q_kg_component_sizes(spark, sf_dir):
    """Component-size histogram of the derived KG (via the same
    fixed-round min-label loop kg_components pins): the crawl-health
    rollup — node share per component size, giant-component alarm."""
    from kgist_spark.operators.components import (
        component_size_stats,
        minlabel_rounds,
    )

    t = derived_triples(spark, sf_dir)
    return component_size_stats(
        minlabel_rounds(
            t.select(F.col("subj").alias("a"), F.col("obj").alias("b")),
            rounds=_CC_ROUNDS,
        )
    )


def q_winnow_fp(spark, sf_dir):
    """Winnowing fingerprints (MOSS, Schleimer et al. 2003): rightmost-min
    window selection over 5-gram hashes with the shared-substring
    detection guarantee; per-doc fingerprint counts + cross-document
    overlap — the copy-tracing signal between the whole-doc resemblance
    families and the exact span-cut list."""
    from kgist_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"))


#: deterministic MESSY-URL harness for the canonicalizer — one SQL
#: fragment shared verbatim by Spark and DuckDB (both parse this dialect
#: subset), exercising every canonicalization step: scheme case, www,
#: default ports (paired with their scheme), tracking params, param
#: order, trailing slash, fragments.  doc_id % 50 collides ~n/50 docs
#: per path so the frontier dedup produces real variant groups.
_MESSY_URL_SQL = (
    "CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || '://' ||"
    " CASE WHEN doc_id % 4 < 2 THEN 'WWW.' || source || '.Example.COM'"
    "      ELSE source || '.example.com' END ||"
    " CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END ||"
    " '/docs/' || CAST(doc_id % 50 AS STRING) ||"
    " CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||"
    " CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1'"
    "      WHEN doc_id % 3 = 1 THEN '?b=2&a=1' ELSE '' END ||"
    " CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END"
)


def q_url_frontier(spark, sf_dir):
    """Crawl-frontier URL dedup: canonicalize every URL spelling (scheme
    case, default ports, www, tracking params, param order, trailing
    slash, fragment) and keep the minimum id per canonical URL — the
    first dedup stage of every crawler, here over a deterministic
    messy-URL harness both engines construct identically."""
    from kgist_spark.operators.url import url_frontier_dedup

    pages = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_MESSY_URL_SQL).alias("url")
    )
    return url_frontier_dedup(pages, url_col="url", id_col="doc_id")


def q_kg_violations(spark, sf_dir):
    """Induced-constraint violation audit over the PERTURBED KG snapshot
    (the anomaly fixtures' noisy crawl): (pred, side) slots with a ≥0.9
    dominant type become induced constraints; labeled slot nodes missing
    the expected type count as violations — the schema-based complement
    of the MDL anomaly scorer, no model fit needed."""
    from kgist_spark.operators.graph import schema_violations

    return schema_violations(
        perturbed_triples(spark, sf_dir), derived_labels(spark, sf_dir)
    )


#: pseudo-diameter sweep depth — sized to the derived KG's radius (the
#: customer-order-part-supplier chain is ~6 hops end to end)
_PD_ROUNDS = 6


def q_kg_diameter(spark, sf_dir):
    """Double-sweep pseudo-diameter of the derived KG: BFS from the
    min-id node, re-BFS from its periphery — the classic 2-sweep
    diameter lower bound (exact on trees, tight on web graphs), bounded
    by the fixed sweep depth per the package's loop-oracle contract."""
    from kgist_spark.operators.graph import pseudo_diameter

    t = derived_triples(spark, sf_dir)
    return pseudo_diameter(
        t.select(F.col("subj").alias("a"), F.col("obj").alias("b")),
        rounds=_PD_ROUNDS,
    )


def q_hash_split(spark, sf_dir):
    """Deterministic disjoint-and-complete train/val/test split: each doc
    assigned by its md5-interval — stable under repartitioning and
    incremental corpus growth, exactly disjoint (one hash space
    partitioned, not independent per-split draws)."""
    from kgist_spark.operators.sampling import hash_split

    return hash_split(_t(spark, sf_dir, "documents"), "doc_id",
                      salt=_MIX_SALT)


def q_postings(spark, sf_dir):
    """Inverted-index postings materialization: per-term df/cf + a
    64-entry smallest-id posting list with n_kept truncation visibility
    — the artifact a served search index stores (bm25_topk scores
    against stats on the fly; this is the build step)."""
    from kgist_spark.operators.search import build_postings

    return build_postings(_t(spark, sf_dir, "documents"))


def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix vs the corpus ground truth: per true
    language, where its documents land under the function-word
    classifier (diagonal = recall) — the QA table read before trusting
    a lang filter."""
    from kgist_spark.operators.text import lang_confusion

    return lang_confusion(_t(spark, sf_dir, "documents"))


def q_kg_negatives(spark, sf_dir):
    """Filtered corrupt-tail negative sampling over the derived KG: two
    deterministic md5 tail draws per triple from a densely-indexed node
    set (two-phase prefix-sum index, no global window), true-edge
    corruptions filtered — the KG-embedding training-pair generator."""
    from kgist_spark.operators.graph import negative_samples

    return negative_samples(derived_triples(spark, sf_dir), n_neg=2)


def q_kg_pivot_scc(spark, sf_dir):
    """The min-id pivot node's strongly connected component of the
    DIRECTED derived KG (forward ∩ backward bounded reachability — the
    FW-BW step at the one pivot that needs no recursion): the
    mutual-reachability core the undirected components family can't
    see."""
    from kgist_spark.operators.graph import pivot_scc

    t = derived_triples(spark, sf_dir)
    return pivot_scc(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")),
        rounds=_PD_ROUNDS,
    )


def q_kg_schema_drift(spark, sf_dir):
    """Schema-profile drift between the clean and perturbed KG snapshots:
    per-(pred, side) entropy delta + dominant-type-flip alarm — the
    extractor-drift monitoring table the schema profile feeds."""
    from kgist_spark.operators.graph import schema_drift

    return schema_drift(
        derived_triples(spark, sf_dir),
        perturbed_triples(spark, sf_dir),
        derived_labels(spark, sf_dir),
    )


def q_ann_recall(spark, sf_dir):
    """ANN quality audit: recall@10 of the IVF index against the exact
    cosine top-10 for the shared query vector — the measurement that
    turns 'approximate' from a hope into a number (both sides fully
    deterministic, so the recall itself is bit-replayable)."""
    from kgist_spark.operators import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    exact = SIM.cosine_topk(emb, qv, k=10).select("vec_id")
    ann = SIM.ivf_topk(emb, qv, k=10).select(
        "vec_id", F.lit(1).alias("hit")
    )
    return exact.join(ann, "vec_id", "left").agg(
        F.count("*").alias("k"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_overlap"),
        F.expr(
            "CAST(coalesce(sum(hit), 0) * 1000000 div count(*) AS BIGINT)"
        ).alias("recall_x1e6"),
    )


def q_source_overlap(spark, sf_dir):
    """Cross-source distinct-token Jaccard: the corpus-comparison table
    that catches mirrors and contaminated slices before they skew a
    training mixture."""
    from kgist_spark.operators.text import source_overlap

    return source_overlap(_t(spark, sf_dir, "documents"))


def q_zipf_slope(spark, sf_dir):
    """Zipf rank-frequency slope per source — the one-number natural
    -language detector (s ≈ −1 on real text; template/spam slices bend
    it): fixed-point log terms, integer regression sums, one float."""
    from kgist_spark.operators.text import zipf_slope

    return zipf_slope(_t(spark, sf_dir, "documents"))


def q_corpus_report(spark, sf_dir):
    """Per-source corpus QA dashboard: volume, exact-dup mass, language
    concentration, and Zipf shape in one integer table — what an
    operator reads before admitting a slice into a training mixture."""
    from kgist_spark.operators.text import corpus_report

    return corpus_report(_t(spark, sf_dir, "documents"))


def q_lm3_score(spark, sf_dir):
    """Stupid-backoff trigram-LM bits-per-trigram under a src0-trained
    model (Brants et al. 2007) — the third rung of the quality ladder;
    per-trigram bits fixed-point BEFORE the per-doc integer sum."""
    from kgist_spark.operators.lm import trigram_score

    docs = _t(spark, sf_dir, "documents")
    return trigram_score(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    )


#: the customer ← order → part → supplier dependence meta-path
_METAPATH = [("placed_by", "rev"), ("contains_part", "fwd"),
             ("supplied_by", "fwd")]


def q_kg_metapath(spark, sf_dir):
    """PathSim meta-path counting: top-50 (customer, supplier) pairs by
    the number of order→part paths connecting them — the endpoint-aware
    question the 2-hop pred-pair census can't answer."""
    from kgist_spark.operators.graph import metapath_topk

    return metapath_topk(derived_triples(spark, sf_dir), _METAPATH, k=50)


def q_hll_error(spark, sf_dir):
    """Sketch error audit: HLL distinct-user estimates vs the exact
    counts per event type, with signed absolute and relative error —
    the honesty check that turns an approximate operator's accuracy
    claim into a measured, bit-replayable number (the ann_recall
    pattern applied to cardinality)."""
    from kgist_spark.operators.sketch import hll_distinct

    ev = _t(spark, sf_dir, "events")
    hll = hll_distinct(ev, ["event_type"], "user_id").select(
        "event_type", "n_distinct_hll"
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(hll, "event_type").select(
        "event_type",
        "n_exact",
        "n_distinct_hll",
        (F.col("n_distinct_hll") - F.col("n_exact")).cast("long").alias(
            "err"
        ),
        F.expr(
            "CAST((n_distinct_hll - n_exact) * 1000000 div n_exact"
            " AS BIGINT)"
        ).alias("rel_err_x1e6"),
    )


def q_tfidf_pairs(spark, sf_dir):
    """TF-IDF-weighted cosine document pairs: the weighted lexical
    similarity Jaccard misses (rare shared terms dominate, stopwords
    score nothing); quantized integer weights, integer dot/norm sums,
    one float cosine chain per surviving pair."""
    from kgist_spark.operators.dedup import tfidf_pairs

    return tfidf_pairs(_t(spark, sf_dir, "documents"))


def q_editdist_pairs(spark, sf_dir):
    """Exact Levenshtein verification over shared-shingle candidates:
    the character-level near-dup check token Jaccard can't give — an
    exact integer metric both engines compute natively."""
    from kgist_spark.operators.dedup import editdist_pairs

    return editdist_pairs(_t(spark, sf_dir, "documents"))


#: mixture spec for the plan query: over-weight src0 so a deficit
#: surfaces (rate caps at 1.0, shortfall reported), leave one source
#: unweighted (rate 0, listed)
_MIX_WEIGHTS = [("src0", 500_000), ("src1", 300_000), ("src2", 100_000)]
_MIX_BUDGET = 200_000


def q_mixture_plan(spark, sf_dir):
    """Training-mixture planning table: per-source sampling rates from a
    weight spec + token budget — truncating integer arithmetic, deficit
    reported instead of silent upsampling (epoch policy is the
    caller's)."""
    from kgist_spark.operators.sampling import mixture_plan

    return mixture_plan(_t(spark, sf_dir, "documents"), _MIX_WEIGHTS,
                        _MIX_BUDGET)


def q_pack_chunks(spark, sf_dir):
    """Inverse packing table (per chunk: its document segments, gapless
    tiling) — what a training loader reads; pack_layout answers the
    per-document question, this the per-chunk one."""
    from kgist_spark.operators.pack import pack_chunks

    return pack_chunks(_t(spark, sf_dir, "documents"), ctx=_PACK_CTX)


def q_kg_negatives_head(spark, sf_dir):
    """Head-corruption negatives (the other half of the standard 50/50
    corruption protocol): subjects replaced from an independent draw
    stream, (neg_subj, pred, obj) true edges filtered."""
    from kgist_spark.operators.graph import negative_samples

    return negative_samples(derived_triples(spark, sf_dir), n_neg=2,
                            corrupt="head")


def q_split_leakage(spark, sf_dir):
    """Cross-split near-dup leakage audit — THE classic contamination
    check a random split misses: near-duplicate pairs whose members land
    in different train/val/test splits leak evaluation data into
    training; this table counts pairs per (ordered) split pair, so the
    off-diagonal rows are the leak."""
    from kgist_spark.operators.dedup import minhash_neardup_pairs
    from kgist_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(docs, threshold=0.4).select("a", "b")
    splits = hash_split(docs, "doc_id", salt=_MIX_SALT)
    j = (
        pairs.join(splits.select(F.col("doc_id").alias("a"),
                                 F.col("split").alias("sa")), "a")
        .join(splits.select(F.col("doc_id").alias("b"),
                            F.col("split").alias("sb")), "b")
    )
    return (
        j.select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count("*").alias("n_pairs"))
    )


#: evidence-weighted KG edge list: lineitem MULTIPLICITY is the weight on
#: the order->part and part->supplier edges (the signal the simple-graph
#: derivation's distinct throws away); the other branches weigh 1
_WEIGHTED_EDGES_SQL = """
    SELECT 'o' || l_orderkey AS src, 'p' || l_partkey AS dst,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM lineitem GROUP BY 'o' || l_orderkey, 'p' || l_partkey
    UNION ALL
    SELECT 'p' || l_partkey, 's' || l_suppkey, CAST(COUNT(*) AS BIGINT)
    FROM lineitem GROUP BY 'p' || l_partkey, 's' || l_suppkey
    UNION ALL
    SELECT 'o' || o_orderkey, 'c' || o_custkey, CAST(1 AS BIGINT) FROM orders
    UNION ALL
    SELECT 'c' || c_custkey, 'n' || c_nationkey, CAST(1 AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 's' || s_suppkey, 'n' || s_nationkey, CAST(1 AS BIGINT)
    FROM supplier
"""

_WPR_ITERS = 8


def weighted_edges(spark, sf_dir):
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")

    def grp(df, s_pre, s_col, o_pre, o_col):
        return (
            df.groupBy(
                F.concat(F.lit(s_pre), F.col(s_col)).alias("src"),
                F.concat(F.lit(o_pre), F.col(o_col)).alias("dst"),
            ).agg(F.count("*").cast("long").alias("w"))
        )

    def one(df, s_pre, s_col, o_pre, o_col):
        return df.select(
            F.concat(F.lit(s_pre), F.col(s_col)).alias("src"),
            F.concat(F.lit(o_pre), F.col(o_col)).alias("dst"),
            F.lit(1).cast("long").alias("w"),
        )

    return (
        grp(lineitem, "o", "l_orderkey", "p", "l_partkey")
        .unionAll(grp(lineitem, "p", "l_partkey", "s", "l_suppkey"))
        .unionAll(one(orders, "o", "o_orderkey", "c", "o_custkey"))
        .unionAll(one(customer, "c", "c_custkey", "n", "c_nationkey"))
        .unionAll(one(supplier, "s", "s_suppkey", "n", "s_nationkey"))
    )


def q_kg_pagerank_weighted(spark, sf_dir):
    """Evidence-weighted PageRank: lineitem multiplicity weights the
    order->part->supplier edges, contributions split strength
    -proportionally ((r*w) div W) — bit-exact integer iterations vs the
    unrolled-CTE oracle."""
    from kgist_spark.operators.graph import pagerank_weighted

    return pagerank_weighted(weighted_edges(spark, sf_dir),
                             iterations=_WPR_ITERS)


def q_tfidf_clusters(spark, sf_dir):
    """TF-IDF near-dup decision table: the weighted-lexical pairs closed
    into components, each cluster keeping its minimum id — the APPLY
    table of the tfidf_pairs signal (filter is_dup), mirroring the
    other dedup families' decision tables."""
    from kgist_spark.operators.components import connected_components
    from kgist_spark.operators.dedup import tfidf_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = tfidf_pairs(docs).select("a", "b").localCheckpoint()
    comp = connected_components(pairs, "a", "b")
    return (
        docs.select(F.col("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("keep_id"),
        )
        .withColumn("is_dup", F.col("keep_id") != F.col("doc_id"))
    )


def q_containment_keep(spark, sf_dir):
    """Containment decision table (ASYMMETRIC — no closure): every doc
    contained in another is dropped, pointing at its min-id container
    as lineage (the container may itself be contained in something
    bigger: the pointer is evidence, not a transitive keeper — all
    contained docs drop regardless)."""
    from kgist_spark.operators.dedup import containment_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = containment_pairs(docs, threshold_x1e6=600_000)
    keeper = (
        pairs.select(
            "contained_id",
            F.when(F.col("contained_id") == F.col("a"), F.col("b"))
            .otherwise(F.col("a")).alias("other"),
        )
        .groupBy("contained_id")
        .agg(F.min("other").alias("container_id"))
    )
    return (
        docs.select(F.col("doc_id"))
        .join(keeper.withColumnRenamed("contained_id", "doc_id"),
              "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("container_id", "doc_id").alias("container_id"),
        )
        .withColumn("is_contained", F.col("container_id") != F.col("doc_id"))
    )


def q_excise_spans(spark, sf_dir):
    """ExactSubstr EXCISION — the step the cut list exists for (Lee et
    al. 2022's finding: cutting duplicated substrings beats dropping
    documents): rebuild each document's text with every cross-document
    duplicated span removed — (doc_id, n_tokens, n_cut, clean_text)."""
    from pyspark.sql.window import Window  # noqa: F401
    from kgist_spark.operators.dedup import dup_spans

    docs = _t(spark, sf_dir, "documents")
    spans = dup_spans(docs)
    cov = (
        spans.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("span_start"), F.col("span_end"))
            ).alias("p"),
        )
        .distinct()
    )
    t = F.split(F.trim(F.col("text")), r"\s+")
    tokpos = docs.select(
        "doc_id", F.posexplode(t).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("p"), "tok")
    kept = tokpos.join(cov, ["doc_id", "p"], "left_anti")
    return (
        tokpos.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
        .join(
            kept.groupBy("doc_id").agg(
                F.count("*").alias("n_kept"),
                F.expr(
                    "array_join(transform(array_sort(collect_list("
                    "struct(p, tok))), s -> s.tok), ' ')"
                ).alias("clean_text"),
            ),
            "doc_id", "left",
        )
        .select(
            "doc_id", "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long").alias("n_cut"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def q_quality_deciles(spark, sf_dir):
    """Per-source quality deciles — the curriculum/mixture bucketing
    table (train on the top deciles first, or weight by decile): each
    document's n_chars decile WITHIN its source by deterministic rank
    arithmetic ``(rank-1)*10 div count`` (ties broken by doc_id, so the
    bucketing is engine-stable; no float percentile anywhere)."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.asc("n_chars"),
                                             F.asc("doc_id"))
    wc = Window.partitionBy("source")
    return docs.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    ).withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wc)
    ).select(
        "doc_id", "source", "n_chars",
        F.expr("CAST((rk - 1) * 10 div n AS BIGINT)").alias("decile"),
    )


QUERIES = {
    "kg_triples": q_kg_triples,
    "kg_labels": q_kg_labels,
    "candidate_stats": q_candidate_stats,
    "label_freq": q_label_freq,
    "pred_freq": q_pred_freq,
    "nodes_with_type": q_nodes_with_type,
    "topk_rules_by_cas": q_topk_rules_by_cas,
    "ca_size_histogram": q_ca_size_histogram,
    "coverage_anti": q_coverage_anti,
    "dedup_exact": q_dedup_exact,
    "token_stats": q_token_stats,
    "quality": q_quality,
    "lang_score": q_lang_score,
    "cosine_topk": q_cosine_topk,
    "events_hourly": q_events_hourly,
    "ranked_rules": q_ranked_rules,
    "kg_model_rules": q_kg_model_rules,
    "kg_rules_merged": q_kg_rules_merged,
    "kg_rules_nested": q_kg_rules_nested,
    "anomaly_topk": q_anomaly_topk,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "minhash_neardup": q_minhash_neardup,
    "neardup_clusters": q_neardup_clusters,
    "neardup_keep_best": q_neardup_keep_best,
    "user_sessions": q_user_sessions,
    "asof_enrich": q_asof_enrich,
    "simhash": q_simhash,
    "embedding_ann": q_embedding_ann,
    "embedding_ann_lsh": q_embedding_ann_lsh,
    "salted_pred_fanout": q_salted_pred_fanout,
    "bpe_tokens": q_bpe_tokens,
    "bpe_real_tokens": q_bpe_real_tokens,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "dedup_embedding": q_dedup_embedding,
    "stratified_sample": q_stratified_sample,
    "sample_mixture": q_sample_mixture,
    "decontaminate": q_decontaminate,
    "repetition": q_repetition,
    "domain_cap": q_domain_cap,
    "kg_pagerank": q_kg_pagerank,
    "kg_components": q_kg_components,
    "kg_degree_stats": q_kg_degree_stats,
    "kg_path2_stats": q_kg_path2_stats,
    "bm25_topk": q_bm25_topk,
    "pii_scrub": q_pii_scrub,
    "line_dedup": q_line_dedup,
    "lm_score": q_lm_score,
    "dsir_weights": q_dsir_weights,
    "part_triangles": q_part_triangles,
    "corpus_percentiles": q_corpus_percentiles,
    "incident_clicks": q_incident_clicks,
    "curate": q_curate,
    "curate_summary": q_curate_summary,
    "embedding_kmeans": q_embedding_kmeans,
    "semdedup_pairs": q_semdedup_pairs,
    "semdedup_clusters": q_semdedup_clusters,
    "semdedup_keep_best": q_semdedup_keep_best,
    "dup_ngrams": q_dup_ngrams,
    "token_pmi": q_token_pmi,
    "kg_kcore": q_kg_kcore,
    "lm2_score": q_lm2_score,
    "event_drift": q_event_drift,
    "part_clustering": q_part_clustering,
    "kg_reciprocity": q_kg_reciprocity,
    "embedding_ann_q8": q_embedding_ann_q8,
    "kg_bfs": q_kg_bfs,
    "kg_labelprop": q_kg_labelprop,
    "kg_linkpred": q_kg_linkpred,
    "tfidf_terms": q_tfidf_terms,
    "kg_ppr": q_kg_ppr,
    "events_hll": q_events_hll,
    "cohort_retention": q_cohort_retention,
    "event_funnel": q_event_funnel,
    "cms_user_counts": q_cms_user_counts,
    "kg_hits": q_kg_hits,
    "event_transitions": q_event_transitions,
    "kg_neighbor_jaccard": q_kg_neighbor_jaccard,
    "kg_assortativity": q_kg_assortativity,
    "bloom_decontaminate": q_bloom_decontaminate,
    "part_truss": q_part_truss,
    "dup_spans": q_dup_spans,
    "priority_sample": q_priority_sample,
    "kg_walks": q_kg_walks,
    "kg_churn": q_kg_churn,
    "kg_sentences": q_kg_sentences,
    "pack_layout": q_pack_layout,
    "containment_pairs": q_containment_pairs,
    "kg_schema": q_kg_schema,
    "kg_component_sizes": q_kg_component_sizes,
    "winnow_fp": q_winnow_fp,
    "url_frontier": q_url_frontier,
    "kg_violations": q_kg_violations,
    "kg_diameter": q_kg_diameter,
    "hash_split": q_hash_split,
    "postings": q_postings,
    "lang_confusion": q_lang_confusion,
    "kg_negatives": q_kg_negatives,
    "kg_pivot_scc": q_kg_pivot_scc,
    "kg_schema_drift": q_kg_schema_drift,
    "ann_recall": q_ann_recall,
    "source_overlap": q_source_overlap,
    "zipf_slope": q_zipf_slope,
    "corpus_report": q_corpus_report,
    "lm3_score": q_lm3_score,
    "kg_metapath": q_kg_metapath,
    "hll_error": q_hll_error,
    "tfidf_pairs": q_tfidf_pairs,
    "editdist_pairs": q_editdist_pairs,
    "mixture_plan": q_mixture_plan,
    "pack_chunks": q_pack_chunks,
    "kg_negatives_head": q_kg_negatives_head,
    "split_leakage": q_split_leakage,
    "kg_pagerank_weighted": q_kg_pagerank_weighted,
    "tfidf_clusters": q_tfidf_clusters,
    "containment_keep": q_containment_keep,
    "excise_spans": q_excise_spans,
    "quality_deciles": q_quality_deciles,
}

_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"
_STOP = "['the','of','and','a','to','in']"

ORACLE_SQL = {
    "kg_triples": f"{DERIVED_TRIPLES_SQL}",
    "kg_labels": f"{DERIVED_LABELS_SQL}",
    "candidate_stats": _CAND_CTE
    + """
        SELECT root_label, pred, dir, child_label,
               COUNT(*) AS n_edges,
               COUNT(DISTINCT root_node) AS n_cas,
               COUNT(DISTINCT child_node) AS n_labels_cov
        FROM cand GROUP BY root_label, pred, dir, child_label
    """,
    "label_freq": f"{_KG_CTE} SELECT label, COUNT(*) AS n FROM labels GROUP BY label",
    "pred_freq": f"{_KG_CTE} SELECT pred, COUNT(*) AS n FROM triples GROUP BY pred",
    "nodes_with_type": f"""{_KG_CTE}
        SELECT COUNT(*) AS n_nodes FROM (
            SELECT node FROM labels WHERE label IN ('customer', 'building')
            GROUP BY node HAVING COUNT(DISTINCT label) = 2
        )
    """,
    "topk_rules_by_cas": _CAND_CTE
    + """
        SELECT root_label, pred, dir, child_label,
               COUNT(*) AS n_edges,
               COUNT(DISTINCT root_node) AS n_cas,
               COUNT(DISTINCT child_node) AS n_labels_cov
        FROM cand GROUP BY root_label, pred, dir, child_label
        ORDER BY n_cas DESC, root_label, pred, dir, child_label
        LIMIT 20
    """,
    "ca_size_histogram": f"""{_KG_CTE}
        SELECT ca_size, COUNT(*) AS n_heads FROM (
            SELECT t.obj AS head, COUNT(*) AS ca_size
            FROM triples t
            JOIN labels ls ON t.subj = ls.node AND ls.label = 'customer'
            JOIN labels lo ON t.obj = lo.node AND lo.label = 'nation'
            WHERE t.pred = 'in_nation'
            GROUP BY t.obj
        ) GROUP BY ca_size
    """,
    "coverage_anti": f"""{_KG_CTE}
        SELECT COUNT(*) AS n_uncovered FROM triples t
        WHERE t.pred = 'in_nation'
          AND t.subj NOT IN (SELECT node FROM labels WHERE label = 'customer')
    """,
    "dedup_exact": """
        SELECT md5(text) AS text_md5, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
        FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
    """,
    "token_stats": f"""
        SELECT doc_id,
               len({_TOKENS}) AS n_tokens,
               length(text) AS n_chars_text,
               round(CAST(list_sum(list_transform({_TOKENS}, t -> length(t))) AS DOUBLE)
                     / len({_TOKENS}), 5) AS avg_token_len
        FROM documents
    """,
    "quality": f"""
        SELECT doc_id,
               round(CAST(len(list_filter({_TOKENS}, t -> list_contains({_STOP}, t))) AS DOUBLE)
                     / len({_TOKENS}), 5) AS stopword_ratio,
               round(CAST(len(list_distinct({_TOKENS})) AS DOUBLE) / len({_TOKENS}), 5) AS unique_ratio,
               round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
                     / length(text), 5) AS punct_ratio,
               round(CAST(len(list_filter({_TOKENS}, t -> list_contains({_STOP}, t))) AS DOUBLE)
                     / len({_TOKENS}) * 0.5
                   + CAST(len(list_distinct({_TOKENS})) AS DOUBLE) / len({_TOKENS}) * 0.5, 5) AS quality
        FROM documents
    """,
    "lang_score": """
        SELECT doc_id,
               round(CAST(length(text) - length(regexp_replace(text, '[etaoinshr ]', '', 'g')) AS DOUBLE)
                     / length(text), 5) AS eng_score
        FROM documents
    """,
    "cosine_topk": """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_dot_product(embedding::DOUBLE[], qv::DOUBLE[])
                     / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]))), 5) AS cosine
        FROM embeddings, q
        ORDER BY cosine DESC, vec_id ASC
        LIMIT 10
    """,
    "events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n, round(avg(value), 5) AS avg_value
        FROM events GROUP BY 1, 2
    """,
    "ranked_rules": _CAND_CTE
    + """,
 agg AS (
    SELECT root_label, pred, dir, child_label,
           COUNT(*) AS n_edges,
           COUNT(DISTINCT root_node) AS n_cas,
           COUNT(DISTINCT child_node) AS n_labels_cov
    FROM cand GROUP BY root_label, pred, dir, child_label
 ),
 stats AS (
    SELECT
      (SELECT COUNT(*) FROM (SELECT node FROM labels UNION SELECT subj FROM triples UNION SELECT obj FROM triples)) AS n,
      (SELECT COUNT(*) FROM triples) AS m,
      (SELECT COUNT(DISTINCT label) FROM labels) AS nl,
      (SELECT COUNT(DISTINCT pred) FROM triples) AS ne,
      (SELECT COUNT(*) FROM labels) AS total_l
 )
 SELECT root_label, pred, dir, child_label, n_cas,
        round(
          ((lgamma(n*n*ne + 1) - lgamma(m + 1) - lgamma(n*n*ne + 1 - m)) / ln(2)
           + (lgamma(nl*n + 1) - lgamma(total_l + 1) - lgamma(nl*n + 1 - total_l)) / ln(2))
          - ((lgamma(n*n*ne - n_edges + 1) - lgamma(m - n_edges + 1) - lgamma(n*n*ne - n_edges + 1 - (m - n_edges))) / ln(2)
           + (lgamma(nl*n - n_labels_cov + 1) - lgamma(total_l - n_labels_cov + 1) - lgamma(nl*n - n_labels_cov + 1 - (total_l - n_labels_cov))) / ln(2)),
          4) AS red_bits
 FROM agg, stats
 ORDER BY red_bits DESC, n_cas DESC, root_label DESC, pred ASC, dir ASC, child_label ASC
 LIMIT 30
    """,
    "salted_pred_fanout": f"""{_KG_CTE}
        SELECT pred, COUNT(DISTINCT subj) AS n_subj FROM triples GROUP BY pred
    """,
    "bpe_tokens": r"""
        WITH toks AS (
            SELECT doc_id,
                   regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS t
            FROM documents
        )
        SELECT doc_id,
               len(t) AS n_bpe_tokens,
               len(list_distinct(t)) AS n_unique_bpe,
               round(CAST(len(list_filter(t, x -> regexp_matches(x, '^[A-Za-z]+$'))) AS DOUBLE)
                     / len(t), 5) AS word_ratio
        FROM toks
    """,
    "lang_id": f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        s AS (
            SELECT doc_id,
                round(CAST(len(list_filter(t, x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) / len(t), 5) AS score_en,
                round(CAST(len(list_filter(t, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS DOUBLE) / len(t), 5) AS score_de,
                round(CAST(len(list_filter(t, x -> list_contains(['le','la','et','les','des','est'], x))) AS DOUBLE) / len(t), 5) AS score_fr
            FROM toks
        )
        SELECT doc_id, score_en, score_de, score_fr,
               CASE WHEN score_fr > greatest(score_en, score_de) THEN 'fr'
                    WHEN score_de > score_en THEN 'de'
                    ELSE 'en' END AS pred_lang
        FROM s
    """,
    "doc_fingerprint": f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents)
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(t, x ->
                           CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) % 1000003)),
                   (acc, x) -> (acc * 31 + x) % 1000003) AS fingerprint
        FROM toks
    """,
    "dedup_embedding": """
        WITH n AS (
            SELECT vec_id, embedding::DOUBLE[] AS e,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 5) AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 5) >= 0.4
    """,
    # MinHash-LSH verifies candidates with EXACT jaccard, and on this corpus
    # near-dup pairs are high-jaccard (complete LSH recall), so the result
    # must equal the exact shingle-join computation — the oracle is the same
    # SQL as ngram_jaccard_pairs; a recall miss fails the row-count check.
    "minhash_neardup": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id AS id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, greatest(len(t) - 4, 1)),
                           i -> array_to_string(t[i:i+4], ' '))) AS shingle
                FROM toks
            ) WHERE length(shingle) > 0
        ),
        sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
        inter AS (
            SELECT x.id AS a, y.id AS b, COUNT(*) AS n_inter
            FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
            GROUP BY x.id, y.id
        )
        SELECT a, b, round(n_inter * 1.0 / (na.n + nb.n - n_inter), 5) AS jaccard
        FROM inter
        JOIN sizes na ON inter.a = na.id
        JOIN sizes nb ON inter.b = nb.id
        WHERE n_inter * 1.0 / (na.n + nb.n - n_inter) >= 0.4
    """,
    # bit-exact replay of the md5-based 60-bit simhash pipeline
    "simhash": r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                      x -> x != '')) AS tok
            FROM documents
        ),
        h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS hv FROM tok),
        bits AS (
            SELECT doc_id, b AS b, SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
            FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b)
            GROUP BY doc_id, b
        ),
        fp AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                        AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id
        )
        SELECT d.doc_id, COALESCE(fp.simhash, CAST(0 AS BIGINT)) AS simhash
        FROM documents d LEFT JOIN fp USING (doc_id)
    """,
    # full IVF replay: deterministic centroids, first-max cell assignment,
    # stable probe ordering, exact rescore of the probed cells
    "embedding_ann": """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        qn AS (SELECT sqrt(list_dot_product(qv, qv)) AS qn FROM q),
        cnorm AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding::DOUBLE[] AS ce,
                   sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 32)
        ),
        probe AS (
            SELECT cid FROM cnorm, q, qn
            ORDER BY list_dot_product(q.qv, ce) / (qn.qn * cn) DESC, cid ASC
            LIMIT 8
        ),
        vn AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
               FROM embeddings),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT v.vec_id, c.cid,
                       row_number() OVER (PARTITION BY v.vec_id
                                          ORDER BY list_dot_product(v.e, c.ce) / (v.vn * c.cn) DESC,
                                                   c.cid ASC) AS rn
                FROM vn v CROSS JOIN cnorm c
            ) WHERE rn = 1
        )
        SELECT v.vec_id, round(list_dot_product(v.e, q.qv) / (v.vn * qn.qn), 5) AS cosine
        FROM vn v, q, qn
        WHERE v.vec_id IN (SELECT vec_id FROM assign WHERE cid IN (SELECT cid FROM probe))
        ORDER BY cosine DESC, vec_id ASC
        LIMIT 10
    """,
    "ngram_jaccard_pairs": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id AS id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, greatest(len(t) - 4, 1)),
                           i -> array_to_string(t[i:i+4], ' '))) AS shingle
                FROM toks
            ) WHERE length(shingle) > 0
        ),
        sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
        inter AS (
            SELECT x.id AS a, y.id AS b, COUNT(*) AS n_inter
            FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
            GROUP BY x.id, y.id
        )
        SELECT a, b, round(n_inter * 1.0 / (na.n + nb.n - n_inter), 5) AS jaccard
        FROM inter
        JOIN sizes na ON inter.a = na.id
        JOIN sizes nb ON inter.b = nb.id
        WHERE n_inter * 1.0 / (na.n + nb.n - n_inter) >= 0.4
    """,
}

# gap sessionization: identical break rule (wall-clock interval gap
# STRICTLY > 30 min) and identical (ts, event_id) tie order
ORACLE_SQL["user_sessions"] = """
    WITH g AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    b AS (
        -- wall-clock INTERVAL comparison, mirroring the engine's tz- and
        -- DST-independent gap arithmetic on the raw NTZ timestamps
        SELECT *, CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 1800 SECONDS
                  THEN 1 ELSE 0 END AS brk FROM g
    ),
    s AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM b
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
           round(SUM(value), 5) AS sum_value
    FROM s GROUP BY user_id, session_seq
"""

# backward as-of join: DuckDB's NATIVE ASOF JOIN replays the union-tag
# window implementation; the view side is deduped to one row per (user, ts)
# in BOTH engines so equal-timestamp ties are deterministic
ORACLE_SQL["asof_enrich"] = """
    WITH clicks AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, ts, max_by(value, event_id) AS last_view_value
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, round(c.value, 5) AS click_value,
           round(v.last_view_value, 5) AS last_view_value
    FROM clicks c ASOF JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    WHERE v.last_view_value IS NOT NULL
"""

# near-dup clusters: the pair CTE is the SAME exact-jaccard SQL as
# minhash_neardup (complete LSH recall on this corpus, already hash-pinned);
# the closure is a recursive CTE and keep_id = min id of the component
ORACLE_SQL["neardup_clusters"] = """
    WITH RECURSIVE toks AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id AS id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(t) - 4, 1)),
                       i -> array_to_string(t[i:i+4], ' '))) AS shingle
            FROM toks
        ) WHERE length(shingle) > 0
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    pairs AS (
        SELECT a, b FROM (
            SELECT x.id AS a, y.id AS b, COUNT(*) AS n_inter
            FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
            GROUP BY x.id, y.id
        ) inter
        JOIN sizes na ON inter.a = na.id
        JOIN sizes nb ON inter.b = nb.id
        WHERE n_inter * 1.0 / (na.n + nb.n - n_inter) >= 0.4
    ),
    und AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b AS u, a AS v FROM pairs),
    reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u WHERE e.v != r.u
    ),
    comp AS (SELECT u AS doc_id, least(u, min(v)) AS keep_id FROM reach GROUP BY u)
    SELECT d.doc_id,
           COALESCE(c.keep_id, d.doc_id) AS keep_id,
           COALESCE(c.keep_id, d.doc_id) != d.doc_id AS is_dup
    FROM documents d LEFT JOIN comp c USING (doc_id)
"""

# keep-BEST dedup: same recursive-CTE component closure, then each
# cluster's keeper is its longest member (n_chars desc, doc_id asc)
ORACLE_SQL["neardup_keep_best"] = """
    WITH RECURSIVE toks AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id AS id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(t) - 4, 1)),
                       i -> array_to_string(t[i:i+4], ' '))) AS shingle
            FROM toks
        ) WHERE length(shingle) > 0
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    pairs AS (
        SELECT a, b FROM (
            SELECT x.id AS a, y.id AS b, COUNT(*) AS n_inter
            FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
            GROUP BY x.id, y.id
        ) inter
        JOIN sizes na ON inter.a = na.id
        JOIN sizes nb ON inter.b = nb.id
        WHERE n_inter * 1.0 / (na.n + nb.n - n_inter) >= 0.4
    ),
    und AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b AS u, a AS v FROM pairs),
    reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u WHERE e.v != r.u
    ),
    comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u),
    keeper AS (
        SELECT cluster, doc_id AS best_id FROM (
            SELECT c.cluster, c.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.cluster
                       ORDER BY d.n_chars DESC, c.doc_id ASC
                   ) AS rn
            FROM comp c JOIN documents d USING (doc_id)
        ) WHERE rn = 1
    )
    SELECT d.doc_id,
           COALESCE(k.best_id, d.doc_id) AS keep_id,
           COALESCE(k.best_id, d.doc_id) != d.doc_id AS is_dup
    FROM documents d
    LEFT JOIN comp c USING (doc_id)
    LEFT JOIN keeper k USING (cluster)
"""

# real merge-table BPE: the trained 64-merge table is a constant of the
# engine (seed word frequencies are code-embedded), so the oracle embeds it
# as a MAP literal and replays the identical rank encoder as a recursive CTE
def _bpe_oracle():
    from kgist_spark.operators.bpe import bpe_token_counts_oracle_sql

    return bpe_token_counts_oracle_sql()


ORACLE_SQL["bpe_real_tokens"] = _bpe_oracle()

ORACLE_SQL["repetition"] = r"""
    WITH d AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id,
            CASE WHEN len(toks) >= 2 THEN
                [array_to_string(toks[i : i + 1], ' ')
                 FOR i IN generate_series(1, len(toks) - 1)]
            ELSE [] END AS bg,
            CASE WHEN len(toks) >= 3 THEN
                [array_to_string(toks[i : i + 2], ' ')
                 FOR i IN generate_series(1, len(toks) - 2)]
            ELSE [] END AS tg
        FROM d
    )
    SELECT doc_id,
        CASE WHEN len(bg) > 0 THEN
            round(1 - len(list_distinct(bg)) * 1.0 / len(bg), 5) END
            AS dup_bigram_frac,
        CASE WHEN len(bg) > 0 THEN
            round(list_max(list_transform(list_distinct(bg),
                x -> len(list_filter(bg, y -> y = x)))) * 1.0 / len(bg), 5) END
            AS top_bigram_frac,
        CASE WHEN len(tg) > 0 THEN
            round(1 - len(list_distinct(tg)) * 1.0 / len(tg), 5) END
            AS dup_trigram_frac
    FROM g
"""

ORACLE_SQL["decontaminate"] = r"""
    WITH d AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id, source, array_to_string(toks[i : i + 4], ' ') AS gram
        FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks) - 4)) AS i)
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
    corpus AS (
        SELECT doc_id, gram FROM g WHERE source <> 'src0'
        GROUP BY doc_id, gram
    ),
    stats AS (
        SELECT c.doc_id,
               COUNT(*) AS n_doc_grams,
               COUNT(b.gram) AS n_hits
        FROM corpus c LEFT JOIN bench b USING (gram)
        GROUP BY c.doc_id
    )
    SELECT d0.doc_id,
           CAST(COALESCE(s.n_doc_grams, 0) AS BIGINT) AS n_doc_grams,
           CAST(COALESCE(s.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(s.n_hits, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d0
    LEFT JOIN stats s USING (doc_id)
"""

ORACLE_SQL["stratified_sample"] = f"""
    SELECT doc_id, lang, source, n_chars FROM documents WHERE {_mix_gate_sql()}
"""

ORACLE_SQL["sample_mixture"] = f"""
    SELECT lang, COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS total_weight
    FROM documents WHERE {_mix_gate_sql()} GROUP BY lang
"""

# hyperplane-LSH ANN: the seeded planes are literal constants shared with the
# Spark implementation (same RandomState stream), so the oracle replays the
# signature computation, the Hamming-ball gate, and the exact rescore
ORACLE_SQL["embedding_ann_lsh"] = rf"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    qn AS (SELECT sqrt(list_dot_product(qv, qv)) AS qn FROM q),
    planes AS (SELECT * FROM {_lsh_planes_values_sql()}),
    sigs AS (
        SELECT e.vec_id,
               SUM(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pl) >= 0
                        THEN (CAST(1 AS BIGINT) << p.i) ELSE 0 END) AS sig
        FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
    ),
    qsig AS (
        SELECT SUM(CASE WHEN list_dot_product(q.qv, p.pl) >= 0
                        THEN (CAST(1 AS BIGINT) << p.i) ELSE 0 END) AS qs
        FROM q CROSS JOIN planes p
    ),
    cand AS (SELECT vec_id FROM sigs, qsig WHERE bit_count(xor(sig, qs)) <= 3)
    SELECT e.vec_id,
           round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * qn.qn),
                 5) AS cosine
    FROM embeddings e, q, qn
    WHERE e.vec_id IN (SELECT vec_id FROM cand)
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
"""


def _pagerank_oracle() -> str:
    from kgist_spark.operators.graph import pagerank_oracle_sql

    edges = (
        f"SELECT DISTINCT subj AS src, obj AS dst FROM ({DERIVED_TRIPLES_SQL})"
    )
    return pagerank_oracle_sql(edges, iterations=_PR_ITERS)


# integer fixed-point PageRank: bit-exact in both engines (truncating int
# division, order-independent int sums), iterations unrolled as chained CTEs
ORACLE_SQL["kg_pagerank"] = _pagerank_oracle()


def _components_oracle() -> str:
    from kgist_spark.operators.components import minlabel_oracle_sql

    edges = f"SELECT subj AS a, obj AS b FROM ({DERIVED_TRIPLES_SQL})"
    return minlabel_oracle_sql(edges, rounds=_CC_ROUNDS)


# fixed-round synchronous min-label: both engines run exactly _CC_ROUNDS
# rounds, so the tables agree round-for-round (convergence at round 7 on the
# test SFs makes the result true connected components — pinned by pytest)
ORACLE_SQL["kg_components"] = _components_oracle()


def _kcore_oracle() -> str:
    from kgist_spark.operators.graph import kcore_oracle_sql

    edges = f"SELECT subj AS a, obj AS b FROM ({DERIVED_TRIPLES_SQL})"
    return kcore_oracle_sql(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


# fixed-round synchronous k-core peel, rounds unrolled as chained CTEs (one
# predecessor reference per round: both endpoint degrees come from two
# window counts over the symmetric list in a single subquery)
ORACLE_SQL["kg_kcore"] = _kcore_oracle()


def _bfs_oracle() -> str:
    from kgist_spark.operators.graph import bfs_oracle_sql

    edges = f"SELECT subj AS a, obj AS b FROM ({DERIVED_TRIPLES_SQL})"
    return bfs_oracle_sql(edges, seed_where="node LIKE 'n%'",
                          rounds=_BFS_ROUNDS)


# fixed-round multi-source BFS: integer min over a self-loop-carrying
# symmetric list, rounds unrolled as chained CTEs (one predecessor
# reference per round)
ORACLE_SQL["kg_bfs"] = _bfs_oracle()


def _labelprop_oracle() -> str:
    from kgist_spark.operators.graph import labelprop_oracle_sql

    edges = f"SELECT subj AS a, obj AS b FROM ({DERIVED_TRIPLES_SQL})"
    return labelprop_oracle_sql(edges, rounds=_LP_ROUNDS)


# fixed-round synchronous label propagation: the oracle's per-round
# ROW_NUMBER pick (n DESC, community ASC) is the same total order as
# Spark's grouped min-struct on (-n, community)
ORACLE_SQL["kg_labelprop"] = _labelprop_oracle()

# resource-allocation link prediction: identical junction-degree cutoff,
# truncating integer div contribution, anti-join of existing canonical
# edges, and (score DESC, a, b) top-k in both engines
ORACLE_SQL["kg_linkpred"] = f"""
    WITH e AS (
        SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
        FROM ({DERIVED_TRIPLES_SQL}) WHERE subj != obj
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e
        ) GROUP BY node
    ),
    adj AS (
        SELECT x.z, x.nbr, d.deg FROM (
            SELECT a AS z, b AS nbr FROM e
            UNION ALL SELECT b, a FROM e
        ) x JOIN deg d ON d.node = x.z
        WHERE d.deg BETWEEN 2 AND {_LINKPRED_MAX_DEG}
    ),
    wedges AS (
        SELECT x.nbr AS a, y.nbr AS b, CAST(1000000 // x.deg AS BIGINT) AS c
        FROM adj x JOIN adj y ON x.z = y.z AND x.nbr < y.nbr
    ),
    scored AS (
        SELECT w.a, w.b, CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM(w.c) AS BIGINT) AS ra_x1e6
        FROM wedges w
        LEFT JOIN e ON e.a = w.a AND e.b = w.b
        WHERE e.a IS NULL
        GROUP BY w.a, w.b
    )
    SELECT a, b, n_common, ra_x1e6 FROM scored
    ORDER BY ra_x1e6 DESC, a ASC, b ASC
    LIMIT {_LINKPRED_K}
"""


def _tfidf_oracle() -> str:
    from kgist_spark.operators.search import tfidf_oracle_sql

    return tfidf_oracle_sql(per_doc_k=3)


# integer fixed-point tf-idf (linear rarity weight — log-free, truncating
# div), same tokenization and (score DESC, term ASC) per-doc pick
ORACLE_SQL["tfidf_terms"] = _tfidf_oracle()


def _ppr_oracle() -> str:
    from kgist_spark.operators.graph import ppr_oracle_sql

    edges = (f"SELECT DISTINCT subj AS src, obj AS dst"
             f" FROM ({DERIVED_TRIPLES_SQL})")
    return ppr_oracle_sql(edges, seed_where="node LIKE 'o%'",
                          iterations=_PPR_ITERS)


# personalized PageRank: iterations unrolled as chained CTEs, seed base
# rows UNIONed into the damped contribution sum, r > 0 sparsity filter
# applied per round exactly like the engine
ORACLE_SQL["kg_ppr"] = _ppr_oracle()


def _hll_oracle() -> str:
    from kgist_spark.operators.sketch import hll_oracle_sql

    return hll_oracle_sql(
        "SELECT event_type, user_id FROM events", ["event_type"], "user_id"
    )


# HyperLogLog sketch: identical md5-derived registers, integer harmonic
# sum, single shared-literal float division, and the Python-precomputed
# linear-counting VALUES table — the whole sketch replays bit-for-bit
ORACLE_SQL["events_hll"] = _hll_oracle()


# hll_error: the bit-replayable HLL estimate joined against the exact
# distinct count; signed + truncating-div relative error.  NOTE Spark's
# `div` truncates toward zero while DuckDB's // floors — they differ on
# NEGATIVE operands, so the relative error uses explicit
# trunc-toward-zero arithmetic on both sides via sign decomposition
ORACLE_SQL["hll_error"] = f"""
    WITH hll AS ({_hll_oracle()}),
    exact AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events
        GROUP BY event_type
    )
    SELECT e.event_type, CAST(e.n_exact AS BIGINT) AS n_exact,
           h.n_distinct_hll,
           CAST(h.n_distinct_hll - e.n_exact AS BIGINT) AS err,
           CAST(CASE WHEN h.n_distinct_hll >= e.n_exact
                THEN (h.n_distinct_hll - e.n_exact) * 1000000 // e.n_exact
                ELSE -(((e.n_exact - h.n_distinct_hll) * 1000000)
                       // e.n_exact) END AS BIGINT) AS rel_err_x1e6
    FROM exact e JOIN hll h USING (event_type)
"""


def _cohort_oracle() -> str:
    from kgist_spark.operators.timeseries import cohort_retention_oracle_sql

    return cohort_retention_oracle_sql()


# cohort retention: distinct (user, day) basis, calendar-day truncation,
# truncating integer-div retention fraction
ORACLE_SQL["cohort_retention"] = _cohort_oracle()


def _funnel_oracle() -> str:
    from kgist_spark.operators.timeseries import funnel_oracle_sql

    return funnel_oracle_sql()


# Ordered funnel: greedy earliest chain as chained min-rank CTEs over the
# same (ts, event_id) per-user timeline the Spark fold sorts by
ORACLE_SQL["event_funnel"] = _funnel_oracle()


def _cms_oracle() -> str:
    from kgist_spark.operators.sketch import cms_oracle_sql

    return cms_oracle_sql("SELECT user_id FROM events", "user_id", d=4, w=64)


# Count-min sketch: identical seeded md5 cell hashes, integer counters,
# min-over-rows point estimates for the exact top-16 probe set
ORACLE_SQL["cms_user_counts"] = _cms_oracle()


def _hits_oracle() -> str:
    from kgist_spark.operators.graph import hits_oracle_sql

    edges = (
        f"SELECT DISTINCT subj AS src, obj AS dst FROM ({DERIVED_TRIPLES_SQL})"
    )
    return hits_oracle_sql(edges, iterations=_HITS_ITERS)


# integer fixed-point HITS: max-normalized hubs/authorities, iterations
# unrolled as chained CTEs (the PageRank oracle pattern)
ORACLE_SQL["kg_hits"] = _hits_oracle()

# dup_ngrams: the oracle replays the identical in-row 5-gram windows (md5
# over the space-joined token slice), the distinct-(gram, doc) collapse,
# and the integer-DIV fraction — every output column is integer-exact
ORACLE_SQL["dup_ngrams"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    grams AS (
        SELECT doc_id, md5(array_to_string(t[i:i+4], ' ')) AS g
        FROM toks, LATERAL unnest(range(1, len(t) - 3)) s(i)
        WHERE len(t) >= 5
    ),
    gcnt AS (
        SELECT g, COUNT(*) AS nd
        FROM (SELECT DISTINCT g, doc_id FROM grams) GROUP BY g
    )
    SELECT grams.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_grams,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                AS BIGINT) AS dup_frac_x1e6
    FROM grams JOIN gcnt USING (g)
    GROUP BY grams.doc_id
"""

# event_drift: the oracle replays the same hourly pre-aggregation, the same
# trailing integer window sums, and the same fixed-order z expression; NULLs
# (warm-up, constant window) must agree too
ORACLE_SQL["event_drift"] = f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    win AS (
        SELECT event_type, hour, n,
               CAST(SUM(n) OVER w AS BIGINT) AS s,
               CAST(SUM(n * n) OVER w AS BIGINT) AS q,
               COUNT(n) OVER w AS c
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN {_DRIFT_W} PRECEDING AND 1 PRECEDING)
    )
    SELECT * FROM (
        SELECT event_type, hour, n,
               CASE WHEN c = {_DRIFT_W}
                         AND q / {float(_DRIFT_W)} - (s / {float(_DRIFT_W)})
                             * (s / {float(_DRIFT_W)}) > 0
                    THEN CAST(round((CAST(n AS DOUBLE) - s / {float(_DRIFT_W)})
                                    / sqrt(q / {float(_DRIFT_W)}
                                           - (s / {float(_DRIFT_W)})
                                           * (s / {float(_DRIFT_W)}))
                                    * 1000000) AS BIGINT)
               END AS z_x1e6
        FROM win
    ) WHERE z_x1e6 IS NOT NULL
"""

# lm2_score: the oracle trains the identical interpolated bigram tables on
# the src0 slice and replays the ONE fixed-order per-transition double
# expression, rounded to int before the per-doc sum — same discipline as
# lm_score/dsir_weights, so hash equality pins model AND scoring arithmetic
ORACLE_SQL["lm2_score"] = r"""
    WITH ref AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE source = 'src0'
    ),
    cor AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE source <> 'src0'
    ),
    rtok AS (SELECT unnest(t) AS token FROM ref),
    uni AS (SELECT token, COUNT(*) AS cnt FROM rtok GROUP BY token),
    du AS (SELECT CAST(SUM(cnt) + COUNT(*) + 1 AS BIGINT) AS denom FROM uni),
    vv AS (SELECT COUNT(*) AS v FROM uni),
    rbi AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM ref, LATERAL unnest(range(1, len(t))) s(i)
        WHERE len(t) > 1
    ),
    bi AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM rbi GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(SUM(cnt2) AS BIGINT) AS ctx_cnt FROM bi GROUP BY w1),
    ctr AS (
        SELECT doc_id, len(t) AS n_tokens, t[i] AS w1, t[i + 1] AS w2
        FROM cor, LATERAL unnest(range(1, len(t))) s(i)
        WHERE len(t) > 1
    ),
    sc AS (
        SELECT doc_id, n_tokens,
               CAST(round(log2((7.0 * ((COALESCE(cnt2, 0) + 1.0)
                                       / (COALESCE(ctx_cnt, 0) + v + 1.0))
                                + 3.0 * ((COALESCE(cnt, 0) + 1.0) / denom))
                               / 10.0) * 1000000) AS BIGINT) AS logp
        FROM ctr
        LEFT JOIN bi USING (w1, w2)
        LEFT JOIN ctx USING (w1)
        LEFT JOIN uni ON uni.token = ctr.w2, du, vv
    )
    SELECT doc_id,
           MIN(n_tokens) AS n_tokens,
           COUNT(*) AS n_trans,
           CAST((-SUM(logp)) // COUNT(*) AS BIGINT) AS bits_per_trans_x1e6
    FROM sc GROUP BY doc_id
"""

# lm3_score: identical trigram/bigram/unigram count tables, identical
# CASE backoff ladder (seen-trigram ratio / 0.4 bigram / 0.16 add-one
# unigram backstop), the single float chain rounded to the int the hash
# compares
ORACLE_SQL["lm3_score"] = r"""
    WITH ref AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE source = 'src0'
    ),
    cor AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE source <> 'src0'
    ),
    rtok AS (SELECT unnest(t) AS token FROM ref),
    uni AS (SELECT token, COUNT(*) AS cnt FROM rtok GROUP BY token),
    du AS (SELECT CAST(SUM(cnt) + COUNT(*) + 1 AS BIGINT) AS denom FROM uni),
    rbi AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM ref, LATERAL unnest(range(1, len(t))) s(i)
        WHERE len(t) > 1
    ),
    bi AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM rbi GROUP BY w1, w2),
    rtri AS (
        SELECT t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
        FROM ref, LATERAL unnest(range(1, len(t) - 1)) s(i)
        WHERE len(t) > 2
    ),
    tri AS (SELECT w1, w2, w3, COUNT(*) AS cnt3 FROM rtri
            GROUP BY w1, w2, w3),
    ctr AS (
        SELECT doc_id, len(t) AS n_tokens,
               t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
        FROM cor, LATERAL unnest(range(1, len(t) - 1)) s(i)
        WHERE len(t) > 2
    ),
    sc AS (
        SELECT ctr.doc_id, ctr.n_tokens,
               CAST(round(-log2(CASE
                   WHEN tri.cnt3 IS NOT NULL
                       THEN CAST(tri.cnt3 AS DOUBLE) / bi.cnt2
                   WHEN b2.cnt2b IS NOT NULL
                       THEN 0.4 * CAST(b2.cnt2b AS DOUBLE) / u2.cnt
                   ELSE 0.16 * (COALESCE(u3.cnt, 0) + 1.0) / denom
               END) * 1000000) AS BIGINT) AS bits
        FROM ctr
        LEFT JOIN tri ON tri.w1 = ctr.w1 AND tri.w2 = ctr.w2
                     AND tri.w3 = ctr.w3
        LEFT JOIN bi ON bi.w1 = ctr.w1 AND bi.w2 = ctr.w2
        LEFT JOIN (SELECT w1 AS w2, w2 AS w3, cnt2 AS cnt2b FROM bi) b2
               ON b2.w2 = ctr.w2 AND b2.w3 = ctr.w3
        LEFT JOIN uni u2 ON u2.token = ctr.w2
        LEFT JOIN uni u3 ON u3.token = ctr.w3, du
    )
    SELECT doc_id,
           MIN(n_tokens) AS n_tokens,
           COUNT(*) AS n_tri,
           CAST(SUM(bits) // COUNT(*) AS BIGINT) AS bits_per_tri_x1e6
    FROM sc GROUP BY doc_id
"""


# token_pmi: the oracle enumerates position pairs by self-join where Spark
# builds them in-row (same multiset); the PMI float enters ONE fixed-order
# expression, identical literal structure on both sides, rounded straight
# to the int the hash compares
ORACLE_SQL["token_pmi"] = rf"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    tok AS (
        SELECT doc_id, i, t[i] AS w
        FROM toks, LATERAL unnest(range(1, len(t) + 1)) s(i)
    ),
    pairs AS (
        SELECT least(x.w, y.w) AS a, greatest(x.w, y.w) AS b
        FROM tok x JOIN tok y
          ON x.doc_id = y.doc_id AND y.i > x.i AND y.i <= x.i + {_PMI_WINDOW}
    ),
    uni AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    nt AS (SELECT SUM(c) AS n_tok FROM uni),
    pc AS (SELECT a, b, COUNT(*) AS n_pair FROM pairs GROUP BY a, b),
    pt AS (SELECT SUM(n_pair) AS n_pairs FROM pc)
    SELECT pc.a, pc.b, pc.n_pair,
           CAST(round((log2(n_pair) - log2(n_pairs) - log2(ua.c) - log2(ub.c)
                       + 2.0 * log2(n_tok)) * 1000000) AS BIGINT) AS pmi_x1e6
    FROM pc
    JOIN uni ua ON ua.w = pc.a
    JOIN uni ub ON ub.w = pc.b, nt, pt
    WHERE n_pair >= {_PMI_MIN_COUNT}
    ORDER BY pmi_x1e6 DESC, pc.a, pc.b
    LIMIT {_PMI_K}
"""


def _bm25_oracle() -> str:
    from kgist_spark.operators.search import bm25_topk_oracle_sql

    return bm25_topk_oracle_sql(_BM25_TERMS, k=10)


ORACLE_SQL["bm25_topk"] = _bm25_oracle()

ORACLE_SQL["domain_cap"] = f"""
    SELECT doc_id, source, rk FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('{_MIX_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= 5
"""

# the oracle ENUMERATES every length-2 path with the naive self-join that
# the Spark plan deliberately avoids (degree-product aggregation) — hash
# equality between the two IS the proof of the rewrite
ORACLE_SQL["kg_path2_stats"] = f"""{_KG_CTE}
    SELECT t1.pred AS pred1, t2.pred AS pred2, COUNT(*) AS n_paths
    FROM triples t1 JOIN triples t2 ON t1.obj = t2.subj
    GROUP BY t1.pred, t2.pred
"""

ORACLE_SQL["kg_degree_stats"] = f"""{_KG_CTE},
    per AS (
        SELECT pred, dir, node, COUNT(*) AS d FROM (
            SELECT pred, 'out' AS dir, subj AS node FROM triples
            UNION ALL SELECT pred, 'in' AS dir, obj AS node FROM triples
        ) GROUP BY pred, dir, node
    )
    SELECT pred, dir,
           CAST(SUM(d) AS BIGINT) AS n_edges,
           COUNT(*) AS n_nodes,
           MAX(d) AS max_deg,
           CAST(SUM(d) * 1000 // COUNT(*) AS BIGINT) AS avg_deg_x1000
    FROM per GROUP BY pred, dir
"""


def _pii_oracle() -> str:
    """Replays q_pii_scrub: the SAME injection expression, then the SAME
    ordered count-and-replace chain, pattern literals imported from the
    operator so the two can never drift (patterns are restricted to
    Java-regex/RE2-common syntax — see ``operators/scrub.py``)."""
    from kgist_spark.operators.scrub import PII_PATTERNS

    inject = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com via 10.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.0.1 tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
        " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    sql = (
        "WITH s0 AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0"
        f" THEN {inject} ELSE text END AS t0 FROM documents)"
    )
    cols = []
    for i, (name, pat, rep) in enumerate(PII_PATTERNS):
        cols.append(f"n_{name}")
        sql += (
            f", s{i + 1} AS (SELECT doc_id{''.join(', ' + c for c in cols[:-1])},"
            f" CAST(len(regexp_extract_all(t{i}, '{pat}')) AS BIGINT) AS n_{name},"
            f" regexp_replace(t{i}, '{pat}', '{rep}', 'g') AS t{i + 1}"
            f" FROM s{i})"
        )
    last = len(PII_PATTERNS)
    return (
        sql
        + f" SELECT doc_id, {', '.join(cols)}, md5(t{last}) AS clean_fp"
        + f" FROM s{last}"
    )


ORACLE_SQL["pii_scrub"] = _pii_oracle()

# incident_clicks: the oracle runs the RAW theta join the banding rewrite
# avoids — result equality proves the bin cover is exact
ORACLE_SQL["incident_clicks"] = """
    WITH inc AS (
        SELECT event_id, ts AS s, ts + INTERVAL 10 MINUTE AS e
        FROM events WHERE event_type = 'error'
    ),
    clk AS (
        SELECT ts, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'click'
    )
    SELECT i.event_id,
           COUNT(c.ts) AS n_clicks,
           CAST(COALESCE(SUM(c.cents), 0) AS BIGINT) AS click_value_x100
    FROM inc i LEFT JOIN clk c ON c.ts >= i.s AND c.ts < i.e
    GROUP BY i.event_id
"""

ORACLE_SQL["corpus_percentiles"] = """
    -- WHERE mirrors the operator's NULL semantics exactly: NULL values are
    -- excluded from n_rows AND an all-NULL stratum disappears (quantile_cont
    -- alone ignores NULLs but COUNT(*)/GROUP BY would not — a half-applied
    -- filter de-syncs on nullable columns)
    SELECT lang,
           COUNT(*) AS n_rows,
           round(quantile_cont(n_chars, 0.25), 5) AS p25,
           round(quantile_cont(n_chars, 0.50), 5) AS p50,
           round(quantile_cont(n_chars, 0.75), 5) AS p75,
           round(quantile_cont(n_chars, 0.95), 5) AS p95
    FROM documents WHERE n_chars IS NOT NULL GROUP BY lang
"""

# part_triangles: the oracle builds the same capped co-occurrence graph and
# counts triangles by NAIVE 3-way enumeration (id-ordered a<b<c) — the Spark
# side uses degree orientation; count equality proves the rewrite
ORACLE_SQL["part_triangles"] = f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS g, l_partkey AS it FROM lineitem
    ),
    sizes AS (SELECT g, COUNT(*) AS n FROM items GROUP BY g),
    keep AS (
        SELECT it, i.g FROM items i JOIN sizes s ON i.g = s.g
        WHERE s.n >= 2 AND s.n <= {_COOCCUR_CAP}
    ),
    ed AS (
        SELECT DISTINCT x.it AS a, y.it AS b
        FROM keep x JOIN keep y ON x.g = y.g AND x.it < y.it
    ),
    nodes AS (
        SELECT COUNT(*) AS n_nodes
        FROM (SELECT a AS v FROM ed UNION SELECT b FROM ed)
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM ed e1
        JOIN ed e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN ed e3 ON e3.a = e1.b AND e3.b = e2.b
    )
    SELECT (SELECT n_nodes FROM nodes) AS n_nodes,
           (SELECT COUNT(*) FROM ed) AS n_edges,
           (SELECT n_triangles FROM tri) AS n_triangles
"""

# embedding_ann_q8: the oracle quantizes the query AND every corpus vector
# with the identical clamp-round expression and sums the SAME integer
# products — exact replay of quantization and scoring, no float rounding
# anywhere (the only ANN row where the score itself is hash-exact)
ORACLE_SQL["embedding_ann_q8"] = """
    WITH q AS (
        SELECT list_transform(
                   embedding,
                   x -> CAST(GREATEST(-127.0, LEAST(127.0,
                            round(CAST(x AS DOUBLE) * 64.0))) AS BIGINT)
               ) AS qv
        FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id,
           CAST(list_sum(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(GREATEST(-127.0, LEAST(127.0,
                        round(CAST(embedding[i] AS DOUBLE) * 64.0))) AS BIGINT)
                    * qv[i]
           )) AS BIGINT) AS qdot
    FROM embeddings, q
    ORDER BY qdot DESC, vec_id ASC
    LIMIT 10
"""

# kg_reciprocity: the oracle builds the same md5-gated reverse-edge
# enrichment (the derived KG is typed — raw reciprocity is identically 0),
# probes the same deduped (pred, s, o) pair set for its (pred, o, s)
# reverse, and replays the integer-DIV fraction
ORACLE_SQL["kg_reciprocity"] = f"""
    WITH base AS ({DERIVED_TRIPLES_SQL}),
    enriched AS (
        SELECT subj, pred, obj FROM base
        UNION ALL
        SELECT obj, pred, subj FROM base
        WHERE CAST(('0x' || substr(md5(subj || '|' || pred || '|' || obj), 1, 8))
                   AS BIGINT) % 3 = 0
    ),
    pairs AS (
        SELECT DISTINCT pred, subj AS s, obj AS o
        FROM enriched WHERE subj <> obj
    )
    SELECT p.pred,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_reciprocal,
           CAST(SUM(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS reciprocity_x1e6
    FROM pairs p
    LEFT JOIN pairs r ON r.pred = p.pred AND r.s = p.o AND r.o = p.s
    GROUP BY p.pred
"""

# part_clustering: naive per-node triangle enumeration + the same integer
# coefficient arithmetic; hash equality proves the oriented rewrite AND the
# 3-member explode (each triangle counted once per member, never more)
ORACLE_SQL["part_clustering"] = f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS g, l_partkey AS it FROM lineitem
    ),
    sizes AS (SELECT g, COUNT(*) AS n FROM items GROUP BY g),
    keep AS (
        SELECT it, i.g FROM items i JOIN sizes s ON i.g = s.g
        WHERE s.n >= 2 AND s.n <= {_COOCCUR_CAP}
    ),
    ed AS (
        SELECT DISTINCT x.it AS a, y.it AS b
        FROM keep x JOIN keep y ON x.g = y.g AND x.it < y.it
    ),
    deg AS (
        SELECT node, COUNT(*) AS deg FROM (
            SELECT a AS node FROM ed UNION ALL SELECT b FROM ed
        ) GROUP BY node
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM ed e1
        JOIN ed e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN ed e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    tn AS (
        SELECT node, COUNT(*) AS n_tri FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ) GROUP BY node
    )
    SELECT d.node, d.deg,
           CAST(COALESCE(tn.n_tri, 0) AS BIGINT) AS n_tri,
           CASE WHEN d.deg >= 2
                THEN CAST(2 * COALESCE(tn.n_tri, 0) * 1000000
                          // (d.deg * (d.deg - 1)) AS BIGINT)
           END AS coeff_x1e6
    FROM deg d LEFT JOIN tn ON tn.node = d.node
"""

# lm_score: add-one unigram LM trained on src0, scored over the rest; the
# per-token log2 probs round to fixed-point BEFORE summing (both engines),
# so every aggregate is integer arithmetic — order-free, hash-exact
ORACLE_SQL["lm_score"] = r"""
    WITH rt AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents WHERE source = 'src0'
    ),
    counts AS (SELECT token, COUNT(*) AS cnt FROM rt GROUP BY token),
    d AS (SELECT SUM(cnt) + COUNT(*) + 1 AS denom FROM counts),
    ct AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents WHERE source <> 'src0'
    ),
    j AS (
        SELECT c.doc_id,
               CAST(round((log2(COALESCE(l.cnt, 0) + 1.0)
                           - log2((SELECT denom FROM d))) * 1000000)
                    AS BIGINT) AS logp,
               l.cnt IS NULL AS oov
        FROM ct c LEFT JOIN counts l USING (token)
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           COUNT(*) FILTER (WHERE oov) AS n_oov,
           CAST((-SUM(logp)) // COUNT(*) AS BIGINT) AS bits_per_token_x1e6
    FROM j GROUP BY doc_id
"""

# dsir_weights: the oracle replays the identical hashed-gram bucketing
# (md5-prefix hex -> int, the engine's only cross-engine hash) and the
# identical fixed-point log-ratio table; per-document sums are integer, so
# hash equality pins bucketing, smoothing, and weight arithmetic at once.
# N_BUCKETS is imported from the operator so the two sides cannot diverge.
from kgist_spark.operators.dsir import N_BUCKETS as _DSIR_B

ORACLE_SQL["dsir_weights"] = rf"""
    WITH tgt AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE source = 'src0'
    ),
    cor AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE source <> 'src0'
    ),
    tg AS (
        SELECT CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT)
               % {_DSIR_B} AS bucket
        FROM (
            SELECT unnest(t) AS gram FROM tgt
            UNION ALL
            SELECT unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i + 1]))
            FROM tgt
        )
    ),
    cg AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT)
               % {_DSIR_B} AS bucket
        FROM (
            SELECT doc_id, unnest(t) AS gram FROM cor
            UNION ALL
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i + 1]))
            FROM cor
        )
    ),
    q AS (SELECT bucket, COUNT(*) AS q_cnt FROM cg GROUP BY bucket),
    p AS (SELECT bucket, COUNT(*) AS p_cnt FROM tg GROUP BY bucket),
    qt AS (SELECT COALESCE(SUM(q_cnt), 0) AS q_tot FROM q),
    pt AS (SELECT COALESCE(SUM(p_cnt), 0) AS p_tot FROM p),
    ratio AS (
        SELECT q.bucket,
               CAST(round((log2(COALESCE(p.p_cnt, 0) + 1.0)
                           - log2(pt.p_tot + {_DSIR_B}.0)
                           - log2(q.q_cnt + 1.0)
                           + log2(qt.q_tot + {_DSIR_B}.0)) * 1000000)
                    AS BIGINT) AS logr
        FROM q LEFT JOIN p USING (bucket), qt, pt
    )
    SELECT cg.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(r.logr) AS BIGINT) AS importance_x1e6
    FROM cg JOIN ratio r USING (bucket)
    GROUP BY cg.doc_id
"""

ORACLE_SQL["line_dedup"] = """
    WITH d AS (
        SELECT doc_id, replace(text, ' table ', chr(10)) AS text
        FROM documents
    ),
    ex AS (
        SELECT doc_id,
               unnest(string_split(text, chr(10))) AS line,
               generate_subscripts(string_split(text, chr(10)), 1) AS pos
        FROM d
    ),
    freq AS (
        SELECT line FROM ex WHERE length(line) >= 1
        GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 4
    ),
    tagged AS (
        SELECT e.doc_id, e.pos, e.line, f.line IS NOT NULL AS dropped
        FROM ex e LEFT JOIN freq f USING (line)
    )
    SELECT doc_id,
           COUNT(*) AS n_lines,
           COUNT(*) FILTER (WHERE NOT dropped) AS n_kept,
           md5(COALESCE(
               string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE NOT dropped),
               '')) AS clean_fp
    FROM tagged GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# anomaly_topk oracle: the fitted model's side tables as SQL literals
# ---------------------------------------------------------------------------

def anomaly_topk_oracle_sql(sf_dir: str | None = None) -> str:
    """DuckDB replay of :func:`q_anomaly_topk`.

    The score formula (reference ``anomaly_detector.py:40-83``) is
    ``[uncovered]*c + blame(subj, pred) + blame(obj, pred)``; everything
    data-sized (covered set, rule heads, blame applicability) is replayed as
    SQL over the derived-KG CTEs, and only the fitted model's O(|rules|)
    side tables (pred/dir/child pattern keys, root labels, per-exception
    bits, the unexplained-edge constant) ship as literal VALUES — the same
    pattern as the LSH hyperplane literals.  The model itself is re-fitted
    WITHOUT a JVM via :func:`kgist_spark.oracle.duck_model.fit_testdata_model`
    over the PERTURBED KG the query scores (``PERTURBED_TRIPLES_SQL``); the
    replay's row orders replicate the Spark fit bit for bit (tested equal at
    sf0.001 and sf0.01: same rules, same objective bits, same coverage).
    """
    from kgist_spark.oracle.anomaly import AnomalyScorer

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    kg, model = _duck_fit(sf_dir, perturbed=True)
    scorer = AnomalyScorer(model)
    unexplained = scorer.unexplained_edge_bits()

    def lab(l):
        return kg.id_to_label[l] if kg.idify else l

    def prd(p):
        return kg.id_to_pred[p] if kg.idify else p

    def q(s):
        return "'" + s.replace("'", "''") + "'"

    meta_rows, root_rows, stat_rows = [], [], []
    for rid, rule in enumerate(model.rules):
        root, children = rule
        (pred, dirv, (child_labels, _grand)), = children
        meta_rows.append(
            f"({rid}, {q(prd(pred))}, {q(dirv)}, {q(lab(child_labels[0]))}, {len(root)})"
        )
        for idx, l in enumerate(root):
            root_rows.append(f"({rid}, {q(lab(l))}, {idx})")
        _na, _ne, bits = scorer.rule_exception_bits(rule)
        stat_rows.append(f"({rid}, {bits / _ne if _ne else 0.0!r})")

    return f"""{_PERTURBED_KG_CTE},
 {_sf_guard_cte(sf_dir)},
 nld AS (SELECT DISTINCT node, label FROM labels),
 nl AS (
   SELECT node, label,
          row_number() OVER (PARTITION BY node ORDER BY label) - 1 AS pos
   FROM nld
 ),
 meta(rid, pred, dir, child_label, root_size) AS (VALUES {", ".join(meta_rows)}),
 roots(rid, label, root_idx) AS (VALUES {", ".join(root_rows)}),
 rstats(rid, bits_per_exception) AS (VALUES {", ".join(stat_rows)}),
 root_ok AS (
   SELECT r.rid, n.node
   FROM nld n JOIN roots r ON n.label = r.label
   JOIN meta m ON m.rid = r.rid
   GROUP BY r.rid, n.node, m.root_size
   HAVING count(*) = m.root_size
 ),
 matched AS (
   -- two equi-join branches (out/in) instead of CASE expressions in join
   -- conditions, which would defeat hash-join planning
   SELECT t.subj, t.pred, t.obj, m.rid, t.subj AS rn
   FROM triples t
   JOIN meta m ON t.pred = m.pred AND m.dir = 'out'
   JOIN nld cn ON cn.node = t.obj AND cn.label = m.child_label
   JOIN root_ok ro ON ro.rid = m.rid AND ro.node = t.subj
   UNION ALL
   SELECT t.subj, t.pred, t.obj, m.rid, t.obj AS rn
   FROM triples t
   JOIN meta m ON t.pred = m.pred AND m.dir = 'in'
   JOIN nld cn ON cn.node = t.subj AND cn.label = m.child_label
   JOIN root_ok ro ON ro.rid = m.rid AND ro.node = t.obj
 ),
 covered AS (SELECT DISTINCT subj, pred, obj FROM matched),
 heads AS (SELECT DISTINCT rid, rn AS node FROM matched),
 applicable AS (
   -- ordered-subsequence applicability: the matched root_idx sequence,
   -- ordered by the node's label-tuple position, must be 0..k-1
   SELECT nl.node, r.rid
   FROM nl JOIN roots r ON nl.label = r.label
   JOIN meta m ON m.rid = r.rid
   GROUP BY nl.node, r.rid, m.root_size
   HAVING count(*) = m.root_size
      AND list(CAST(r.root_idx AS BIGINT) ORDER BY nl.pos)
          = range(CAST(m.root_size AS BIGINT))
 ),
 culpable AS (
   SELECT a.node, a.rid FROM applicable a
   LEFT JOIN heads h ON h.rid = a.rid AND h.node = a.node
   WHERE h.node IS NULL
 ),
 blame AS (
   SELECT c.node, m.pred, sum(s.bits_per_exception) AS blame
   FROM culpable c
   JOIN meta m ON m.rid = c.rid
   JOIN rstats s ON s.rid = c.rid
   GROUP BY c.node, m.pred
 )
SELECT t.subj, t.pred, t.obj,
       round(CASE WHEN c.subj IS NULL THEN {unexplained!r} ELSE 0.0 END
             + coalesce(bs.blame, 0.0) + coalesce(bo.blame, 0.0), 5) AS score
FROM triples t
LEFT JOIN covered c ON c.subj = t.subj AND c.pred = t.pred AND c.obj = t.obj
LEFT JOIN blame bs ON bs.node = t.subj AND bs.pred = t.pred
LEFT JOIN blame bo ON bo.node = t.obj AND bo.pred = t.pred
WHERE (SELECT ok FROM sf_guard) = 1
ORDER BY score DESC, t.subj, t.pred, t.obj
LIMIT 25"""


# ---------------------------------------------------------------------------
# model-output oracles: kg_model_rules / kg_rules_merged / kg_rules_nested
# ---------------------------------------------------------------------------

_DUCK_FIT_CACHE: dict = {}
_SF_CARD_CACHE: dict = {}


def _sf_guard_cte(sf_dir: str) -> str:
    """A ``sf_guard`` CTE that makes a model-literal oracle FAIL LOUDLY when
    the harness attaches tables from a different scale factor than the one
    the embedded literals were fitted on (the fit reads ``sf_dir`` directly;
    the surrounding CTEs read whatever the harness attached — a silent
    mismatch would fail every model-backed query with an opaque hash diff).
    Reference the CTE as ``WHERE (SELECT ok FROM sf_guard) = 1`` so the
    check cannot be pruned."""
    if sf_dir not in _SF_CARD_CACHE:
        import duckdb

        _SF_CARD_CACHE[sf_dir] = tuple(
            duckdb.sql(
                f"SELECT count(*) FROM '{sf_dir}/{t}.parquet'"
            ).fetchone()[0]
            for t in ("customer", "orders")
        )
    n_cust, n_ord = _SF_CARD_CACHE[sf_dir]
    msg = (
        f"model oracle literals were fitted on {sf_dir} "
        f"(customer={n_cust}, orders={n_ord}) but the attached tables "
        f"differ -- set SPARK_GRAFT_ORACLE_SF_DIR to the harness sf dir"
    ).replace("'", "''")
    return (
        f"sf_guard AS (SELECT CASE WHEN (SELECT count(*) FROM customer) = {n_cust} "
        f"AND (SELECT count(*) FROM orders) = {n_ord} "
        f"THEN 1 ELSE error('{msg}') END AS ok)"
    )


def _duck_fit(sf_dir: str, perturbed: bool = False):
    from kgist_spark.oracle.duck_model import fit_testdata_model

    key = (sf_dir, perturbed)
    if key not in _DUCK_FIT_CACHE:
        _DUCK_FIT_CACHE[key] = fit_testdata_model(sf_dir, perturbed=perturbed)
    return _DUCK_FIT_CACHE[key]


def model_rules_oracle_sql(kind: str, sf_dir: str | None = None) -> str:
    """DuckDB oracle for the fitted/merged/nested rule-set queries.

    These results are themselves O(|rules|) — the model — so the whole
    oracle is the literal VALUES serialization of an INDEPENDENT fit: the
    KG is re-derived by DuckDB and the model re-fitted (and re-refined, for
    ``merged``/``nested``) by the pure-Python engine
    (:func:`kgist_spark.oracle.duck_model.fit_testdata_model`), sharing no
    code path with the distributed Spark fit the query runs.  Row contents
    replicate :func:`q_kg_model_rules` / :func:`_rule_rows`.
    """
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    kg, model = _duck_fit(sf_dir)
    if kind == "merged":
        from kgist_spark.oracle.refine import merge_rules

        model = merge_rules(model)
    elif kind == "nested":
        from kgist_spark.oracle.refine import nest_rules

        model = nest_rules(model, max_rounds=2)

    rows = []
    for rule, ca in model.rules.items():
        if hasattr(rule, "tuplify"):  # RuleTree (Rm/Rn product)
            t = rule.tuplify()
            n_cas, n_edges = len(rule.assertions), len(rule.edges_covered())
        else:
            t, n_cas, n_edges = rule, len(ca), sum(ca)
        rows.append((repr(kg.tuplify(t)), n_cas, n_edges))

    def q(s):
        return "'" + s.replace("'", "''") + "'"

    values = ", ".join(f"({q(r)}, {c}, {e})" for r, c, e in rows)
    return f"""
    WITH {_sf_guard_cte(sf_dir)}
    SELECT rule, CAST(n_cas AS BIGINT) AS n_cas, CAST(n_edges AS BIGINT) AS n_edges
    FROM (VALUES {values}) AS t(rule, n_cas, n_edges)
    WHERE (SELECT ok FROM sf_guard) = 1
"""


def _kmeans_cte_chain(k: int = 8, n_iter: int = 3, dim: int = 64) -> str:
    """The fixed-point k-means iterations as chained CTEs ending in ``af``
    (the final assignment) — every constant imported from
    :mod:`kgist_spark.operators.kmeans` so the engines cannot drift.
    Positive offset space makes DuckDB ``//`` equal Spark ``div``."""
    from kgist_spark.operators.kmeans import KM_OFFSET, KM_SCALE

    def assign(name, cents):
        return f"""{name} AS (
        SELECT vec_id, cid AS cluster FROM (
            SELECT x.vec_id, c.cid,
                   row_number() OVER (PARTITION BY x.vec_id ORDER BY
                       list_sum([(x.e[j] - c.c[j]) * (x.e[j] - c.c[j])
                                 FOR j IN generate_series(1, {dim})]),
                       c.cid) AS rn
            FROM e x CROSS JOIN {cents} c
        ) WHERE rn = 1)"""

    ctes = [
        f"""e AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                   x -> CAST(round(x * {KM_SCALE}.0) AS BIGINT) + {KM_OFFSET}) AS e
        FROM embeddings)""",
        f"""c0 AS (
        -- hash-spread seeding in lockstep with kmeans_fit: k smallest
        -- md5(id), ties by id (NOT first-k ids — see the operator
        -- docstring on degenerate front-of-table corpora)
        SELECT CAST(rn - 1 AS INT) AS cid, e AS c FROM (
            SELECT row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn, e
            FROM e
        ) WHERE rn <= {k})""",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(assign(f"a{i}", f"c{i - 1}"))
        ctes.append(f"""c{i} AS (
        SELECT p.cid, COALESCE(m.c, p.c) AS c
        FROM c{i - 1} p LEFT JOIN (
            SELECT cluster AS cid, list(m ORDER BY d) AS c FROM (
                SELECT cluster, d, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m
                FROM (
                    SELECT a.cluster, unnest(e.e) AS v,
                           generate_subscripts(e.e, 1) AS d
                    FROM a{i} a JOIN e USING (vec_id)
                ) GROUP BY cluster, d
            ) GROUP BY cluster
        ) m ON p.cid = m.cid)""")
    ctes.append(assign("af", f"c{n_iter}"))
    return "WITH " + ",\n".join(ctes)


ORACLE_SQL["embedding_kmeans"] = (
    _kmeans_cte_chain() + "\nSELECT vec_id, cluster FROM af"
)

#: the in-cell exact-cosine pair CTE shared by the semdedup oracles — the
#: same select the ``semdedup_pairs`` query returns directly
_SEMDEDUP_PAIRS_SELECT = """
    SELECT a, b, cluster, cosine FROM (
        SELECT al.vec_id AS a, ar.vec_id AS b, al.cluster,
               round(list_dot_product(l.embedding::DOUBLE[], r.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(l.embedding::DOUBLE[], l.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(r.embedding::DOUBLE[], r.embedding::DOUBLE[]))),
                     5) AS cosine
        FROM af al
        JOIN af ar ON al.cluster = ar.cluster AND al.vec_id < ar.vec_id
        JOIN embeddings l ON l.vec_id = al.vec_id
        JOIN embeddings r ON r.vec_id = ar.vec_id
    ) WHERE cosine >= 0.4
"""

ORACLE_SQL["semdedup_pairs"] = _kmeans_cte_chain() + _SEMDEDUP_PAIRS_SELECT

# semdedup decision table: the pair CTE closed by the SAME recursive
# reachability closure the neardup_clusters oracle uses (min reachable id
# is the cluster representative)
ORACLE_SQL["semdedup_clusters"] = (
    _kmeans_cte_chain().replace("WITH ", "WITH RECURSIVE ", 1)
    + f""",
    pr AS ({_SEMDEDUP_PAIRS_SELECT}),
    und AS (SELECT a AS u, b AS v FROM pr UNION SELECT b AS u, a AS v FROM pr),
    reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u WHERE e.v != r.u
    ),
    comp AS (SELECT u AS vec_id, least(u, min(v)) AS keep_id FROM reach GROUP BY u)
    SELECT e.vec_id,
           COALESCE(c.keep_id, e.vec_id) AS keep_id,
           COALESCE(c.keep_id, e.vec_id) != e.vec_id AS is_dup
    FROM embeddings e LEFT JOIN comp c USING (vec_id)
"""
)

# keep-BEST semantic dedup: same pair closure, then each component keeps
# its member FARTHEST from the final (c3) cell centroid — the identical
# integer offset-space distance the assignment CTE computes, ties to the
# smaller id (SemDeDup's lowest-centroid-similarity keeper)
ORACLE_SQL["semdedup_keep_best"] = (
    _kmeans_cte_chain().replace("WITH ", "WITH RECURSIVE ", 1)
    + f""",
    pr AS ({_SEMDEDUP_PAIRS_SELECT}),
    und AS (SELECT a AS u, b AS v FROM pr UNION SELECT b AS u, a AS v FROM pr),
    reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u WHERE e.v != r.u
    ),
    comp AS (SELECT u AS vec_id, least(u, min(v)) AS comp FROM reach GROUP BY u),
    members AS (
        SELECT m.vec_id, m.comp,
               list_sum([(x.e[j] - c.c[j]) * (x.e[j] - c.c[j])
                         FOR j IN generate_series(1, 64)]) AS cdist
        FROM comp m
        JOIN af a ON a.vec_id = m.vec_id
        JOIN e x ON x.vec_id = m.vec_id
        JOIN c3 c ON a.cluster = c.cid
    ),
    keeper AS (
        SELECT comp, vec_id AS best_id FROM (
            SELECT comp, vec_id,
                   row_number() OVER (
                       PARTITION BY comp ORDER BY cdist DESC, vec_id ASC
                   ) AS rn
            FROM members
        ) WHERE rn = 1
    )
    SELECT emb.vec_id,
           COALESCE(k.best_id, emb.vec_id) AS keep_id,
           COALESCE(k.best_id, emb.vec_id) != emb.vec_id AS is_dup
    FROM embeddings emb
    LEFT JOIN comp c ON c.vec_id = emb.vec_id
    LEFT JOIN keeper k ON k.comp = c.comp
"""
)


def _curate_oracle(final_select: str) -> str:
    """The curation decision chain as one flat WITH RECURSIVE pipeline:
    the near-dup closure CTEs are shared verbatim with the
    ``neardup_clusters`` oracle (exact shingle-jaccard pairs — any LSH
    recall loss on the Spark side surfaces as a hash mismatch), the
    feature expressions with the ``quality``/``repetition`` oracles, and
    the thresholds + CASE chain are imported from
    :mod:`kgist_spark.operators.curate` so the engines cannot drift.
    ``final_select`` picks the detail table or the per-reason rollup."""
    from kgist_spark.operators.curate import (
        KEEP_LANG, MAX_DUP_BIGRAM_FRAC, MIN_TOKENS, MIN_UNIQUE_RATIO,
    )

    return rf"""
    WITH RECURSIVE ltoks AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id AS id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(t) - 4, 1)),
                       i -> array_to_string(t[i:i+4], ' '))) AS shingle
            FROM ltoks
        ) WHERE length(shingle) > 0
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    nd_pairs AS (
        SELECT a, b FROM (
            SELECT x.id AS a, y.id AS b, COUNT(*) AS n_inter
            FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
            GROUP BY x.id, y.id
        ) inter
        JOIN sizes na ON inter.a = na.id
        JOIN sizes nb ON inter.b = nb.id
        WHERE n_inter * 1.0 / (na.n + nb.n - n_inter) >= 0.4
    ),
    und AS (
        SELECT a AS u, b AS v FROM nd_pairs
        UNION SELECT b AS u, a AS v FROM nd_pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u WHERE e.v != r.u
    ),
    nd AS (
        SELECT u AS doc_id FROM reach GROUP BY u
        HAVING least(u, min(v)) != u
    ),
    f AS (
        SELECT doc_id, lang,
               len({_TOKENS}) AS n_tokens,
               round(CAST(len(list_distinct({_TOKENS})) AS DOUBLE)
                     / len({_TOKENS}), 5) AS unique_ratio,
               CASE WHEN len({_TOKENS}) >= 2 THEN
                   round(1 - CAST(len(list_distinct(
                       [array_to_string(({_TOKENS})[i : i + 1], ' ')
                        FOR i IN generate_series(1, len({_TOKENS}) - 1)]))
                       AS DOUBLE) / (len({_TOKENS}) - 1), 5)
               END AS dup_bigram_frac,
               md5(text) AS text_md5
        FROM documents
    ),
    e AS (
        SELECT text_md5, MIN(doc_id) AS grp_keep_id
        FROM f GROUP BY text_md5 HAVING COUNT(*) > 1
    ),
    dec AS (
        SELECT f.doc_id, f.lang, f.n_tokens, f.unique_ratio, f.dup_bigram_frac,
               COALESCE(f.doc_id != e.grp_keep_id, FALSE) AS is_exact_dup,
               (nd.doc_id IS NOT NULL) AS is_near_dup
        FROM f LEFT JOIN e USING (text_md5) LEFT JOIN nd USING (doc_id)
    ),
    final AS (
        SELECT *, CASE
            WHEN lang != '{KEEP_LANG}' THEN 'lang'
            WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
            WHEN unique_ratio < {MIN_UNIQUE_RATIO!r} THEN 'low_diversity'
            WHEN dup_bigram_frac > {MAX_DUP_BIGRAM_FRAC!r} THEN 'repetitive'
            WHEN is_exact_dup THEN 'exact_dup'
            WHEN is_near_dup THEN 'near_dup'
        END AS drop_reason
        FROM dec
    )
    {final_select}
    """


ORACLE_SQL["curate"] = _curate_oracle(
    """SELECT doc_id, lang, n_tokens, unique_ratio, dup_bigram_frac,
              is_exact_dup, is_near_dup,
              drop_reason IS NULL AS keep, drop_reason
       FROM final"""
)

ORACLE_SQL["curate_summary"] = _curate_oracle(
    """SELECT COALESCE(drop_reason, 'kept') AS drop_reason,
              COUNT(*) AS n_docs
       FROM final GROUP BY 1"""
)


def _truss_cooccur_sql(cap: int) -> str:
    """Capped part co-occurrence edges as a plain subquery (the
    part_triangles `ed` CTE inlined — the truss oracle materializes it
    once as its e0)."""
    items = "SELECT DISTINCT l_orderkey AS g, l_partkey AS it FROM lineitem"
    keep = (f"SELECT it, i.g FROM ({items}) i JOIN "
            f"(SELECT g, COUNT(*) AS n FROM ({items}) GROUP BY g) s "
            f"ON i.g = s.g WHERE s.n >= 2 AND s.n <= {cap}")
    return (f"SELECT DISTINCT x.it AS a, y.it AS b FROM ({keep}) x "
            f"JOIN ({keep}) y ON x.g = y.g AND x.it < y.it")


def _part_truss_oracle() -> str:
    from kgist_spark.operators.graph import ktruss_oracle_sql

    return ktruss_oracle_sql(
        _truss_cooccur_sql(_TRUSS_CAP), k=_TRUSS_K, rounds=_TRUSS_ROUNDS
    )


# part_truss: same capped co-occurrence edges, same fixed peel rounds —
# naive triangle enumeration per round, 3-edge fan-out, grouped count
ORACLE_SQL["part_truss"] = _part_truss_oracle()


def _kg_walks_oracle() -> str:
    from kgist_spark.operators.graph import random_walks_oracle_sql

    edges = f"SELECT subj AS src, obj AS dst FROM ({DERIVED_TRIPLES_SQL})"
    return random_walks_oracle_sql(
        edges, walk_len=_WALK_LEN, max_degree=_WALK_DEG
    )


# kg_walks: identical md5-ordered capped adjacency, identical seeded
# per-step draws, steps chained as materialized CTEs
ORACLE_SQL["kg_walks"] = _kg_walks_oracle()


def _kg_churn_oracle() -> str:
    from kgist_spark.operators.graph import snapshot_diff_oracle_sql

    return snapshot_diff_oracle_sql(DERIVED_TRIPLES_SQL,
                                    PERTURBED_TRIPLES_SQL)


# kg_churn: same distincts, same full outer join on the triple key, same
# truncating-integer churn (NULL for predicates with no old base)
ORACLE_SQL["kg_churn"] = _kg_churn_oracle()


def _kg_sentences_oracle() -> str:
    from kgist_spark.operators.graph import kg_sentences_oracle_sql

    return kg_sentences_oracle_sql(DERIVED_TRIPLES_SQL, max_facts=_SENT_CAP)


# kg_sentences: same distinct sentences, rank cap, and sorted '. '-joined
# serialization — the string column hashes byte-for-byte
ORACLE_SQL["kg_sentences"] = _kg_sentences_oracle()


def _pack_layout_oracle() -> str:
    from kgist_spark.operators.pack import pack_layout_oracle_sql

    return pack_layout_oracle_sql(
        "SELECT doc_id, text FROM documents", ctx=_PACK_CTX
    )


# pack_layout: the oracle's ONE global-order window is the semantics the
# two-phase distributed prefix sum must reproduce exactly
ORACLE_SQL["pack_layout"] = _pack_layout_oracle()


# containment_pairs: same shingle construction as ngram_jaccard_pairs,
# same uncapped exact self-join (the capped Spark path matches in full on
# this corpus — any recall loss fails the row-count check), containment as
# a truncating integer DIV with the smaller-set side as contained_id
ORACLE_SQL["containment_pairs"] = """
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id AS id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(t) - 4, 1)),
                       i -> array_to_string(t[i:i+4], ' '))) AS shingle
            FROM toks
        ) WHERE length(shingle) > 0
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    inter AS (
        SELECT x.id AS a, y.id AS b, COUNT(*) AS n_inter
        FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
        GROUP BY x.id, y.id
    )
    SELECT a, b,
           CASE WHEN na.n <= nb.n THEN a ELSE b END AS contained_id,
           n_inter, na.n AS na, nb.n AS nb,
           CAST(n_inter * 1000000 // least(na.n, nb.n) AS BIGINT)
               AS cont_x1e6
    FROM inter
    JOIN sizes na ON inter.a = na.id
    JOIN sizes nb ON inter.b = nb.id
    WHERE n_inter * 1000000 // least(na.n, nb.n) >= 600000
"""


# dup_spans: identical in-row 5-gram windows and cross-document
# distinct-doc gate as dup_ngrams, then the gaps-and-islands merge —
# lag/case/running-sum replayed column-for-column (NULL lag opens island 1
# in both engines)
ORACLE_SQL["dup_spans"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS p,
               md5(array_to_string(t[i:i+4], ' ')) AS g
        FROM toks, LATERAL unnest(range(1, len(t) - 3)) s(i)
        WHERE len(t) >= 5
    ),
    dupg AS (
        SELECT g FROM (SELECT DISTINCT g, doc_id FROM grams)
        GROUP BY g HAVING COUNT(*) >= 2
    ),
    dup AS (SELECT doc_id, p FROM grams JOIN dupg USING (g)),
    brk AS (
        SELECT doc_id, p,
               CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                         <= 5
                    THEN 0 ELSE 1 END AS b
        FROM dup
    ),
    isl AS (
        SELECT doc_id, p,
               SUM(b) OVER (PARTITION BY doc_id ORDER BY p) AS island
        FROM brk
    )
    SELECT doc_id, MIN(p) AS span_start,
           CAST(MAX(p) + 4 AS BIGINT) AS span_end,
           COUNT(*) AS n_windows
    FROM isl GROUP BY doc_id, island
"""

# priority_sample: same 40-bit md5 randomizer, truncating integer
# priority, total (priority DESC, doc_id) order, (k+1)-th threshold and
# greatest(weight, tau) estimate — the whole scheme replays bit-for-bit
ORACLE_SQL["priority_sample"] = f"""
    WITH pri AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               CAST(n_chars AS BIGINT) * {1 << 40}
                 // (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10)
                          AS BIGINT) + 1) AS priority
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, weight, priority,
               row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
        FROM pri
    ),
    tau AS (
        SELECT MAX(priority) AS tau FROM ranked WHERE rn = {_PSAMPLE_K + 1}
    )
    SELECT doc_id, weight, priority,
           CAST(greatest(weight, COALESCE(tau, 0)) AS BIGINT) AS est_weight
    FROM ranked CROSS JOIN tau WHERE rn <= {_PSAMPLE_K}
"""


def _bloom_decontaminate_oracle() -> str:
    from kgist_spark.operators.sketch import bloom_decontaminate_oracle_sql

    return bloom_decontaminate_oracle_sql(n=5)


# bloom_decontaminate: identical seeded bit positions, word packing and
# all-k-bits test — the replay pins the sketch itself, false positives and all
ORACLE_SQL["bloom_decontaminate"] = _bloom_decontaminate_oracle()


def _event_transitions_oracle() -> str:
    from kgist_spark.operators.timeseries import event_transitions_oracle_sql

    return event_transitions_oracle_sql()


# event_transitions: same (ts, event_id) lead ordering, same truncating
# row-normalized fixed point — the lead window and GROUP BY replay 1:1
ORACLE_SQL["event_transitions"] = _event_transitions_oracle()


_DERIVED_AB_SQL = (
    f"SELECT subj AS a, obj AS b FROM ({DERIVED_TRIPLES_SQL})"
)


def _neighbor_jaccard_oracle() -> str:
    from kgist_spark.operators.graph import neighbor_jaccard_oracle_sql

    return neighbor_jaccard_oracle_sql(
        _DERIVED_AB_SQL, max_junction_deg=_NJ_MAX_DEG, k=_NJ_K
    )


# kg_neighbor_jaccard: canonical edges, capped junction wedges, uncapped
# denominator degrees, truncating div, (jac DESC, a, b) cut
ORACLE_SQL["kg_neighbor_jaccard"] = _neighbor_jaccard_oracle()


def _assortativity_oracle() -> str:
    from kgist_spark.operators.graph import assortativity_oracle_sql

    return (
        "SELECT * FROM ("
        + assortativity_oracle_sql(_DERIVED_AB_SQL)
        + ") WHERE r_x1e6 IS NOT NULL"
    )


# kg_assortativity: identical BIGINT sums + the IDENTICAL fixed-order float
# expression; NULL (zero-variance) rows filtered on both sides
ORACLE_SQL["kg_assortativity"] = _assortativity_oracle()


def _kg_schema_oracle() -> str:
    from kgist_spark.operators.graph import predicate_schema_oracle_sql

    return predicate_schema_oracle_sql(DERIVED_TRIPLES_SQL, DERIVED_LABELS_SQL)


# kg_schema: identical (pred, side, label) pair construction, identical
# per-row fixed-point entropy term (ONE log2+mul+div+round chain on exact
# integer operands — the lm_score float discipline), identical
# (c DESC, label) dominance tie-break
ORACLE_SQL["kg_schema"] = _kg_schema_oracle()


def _kg_component_sizes_oracle() -> str:
    from kgist_spark.operators.components import (
        component_size_oracle_sql,
        minlabel_oracle_sql,
    )

    edges = f"SELECT subj AS a, obj AS b FROM ({DERIVED_TRIPLES_SQL})"
    return component_size_oracle_sql(minlabel_oracle_sql(edges, rounds=_CC_ROUNDS))


# kg_component_sizes: the kg_components min-label chain (identical rounds)
# aggregated to the size histogram; shares are truncating integer fixed
# point on positive operands (div == //)
ORACLE_SQL["kg_component_sizes"] = _kg_component_sizes_oracle()


def _winnow_oracle() -> str:
    from kgist_spark.operators.dedup import winnow_oracle_sql

    return winnow_oracle_sql()


# winnow_fp: identical md5-prefix gram hashes, identical rightmost-min
# window selection (packed pos*2^32+hash int64s so list_distinct works in
# both engines), identical cross-document shared-hash semantics
ORACLE_SQL["winnow_fp"] = _winnow_oracle()


def _url_frontier_oracle() -> str:
    from kgist_spark.operators.url import canonical_url_oracle_expr

    canon = canonical_url_oracle_expr("url")
    return f"""
    WITH pages AS (
        SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents
    ),
    canon AS (
        SELECT doc_id, {canon} AS canon_url FROM pages
    ),
    sited AS (
        SELECT doc_id, canon_url,
               regexp_extract(regexp_replace(lower(regexp_extract(
                   canon_url, '^[^:/?#]+://([^/?#:]*)', 1)), '^www\\.', ''),
                   '([^.]+\\.[^.]+)$', 1) AS site
        FROM canon
    )
    SELECT doc_id, canon_url, site,
           CAST(COUNT(*) OVER (PARTITION BY canon_url) AS BIGINT)
               AS n_variants,
           MIN(doc_id) OVER (PARTITION BY canon_url) AS keep_id,
           MIN(doc_id) OVER (PARTITION BY canon_url) <> doc_id AS is_dup
    FROM sited
    """


# url_frontier: both engines construct the IDENTICAL messy url (shared SQL
# fragment) and canonicalize with the same six regexp/array steps; the
# decision table is the engine-wide min-id-keeper window
ORACLE_SQL["url_frontier"] = _url_frontier_oracle()


def _kg_violations_oracle() -> str:
    from kgist_spark.operators.graph import schema_violations_oracle_sql

    return schema_violations_oracle_sql(
        PERTURBED_TRIPLES_SQL, DERIVED_LABELS_SQL
    )


# kg_violations: constraints induced by the shared predicate_schema SQL
# (share gate imported from the operator), probed with the identical
# labeled-occurrence / expected-membership aggregation
ORACLE_SQL["kg_violations"] = _kg_violations_oracle()


def _kg_diameter_oracle() -> str:
    from kgist_spark.operators.graph import pseudo_diameter_oracle_sql

    return pseudo_diameter_oracle_sql(_DERIVED_AB_SQL, rounds=_PD_ROUNDS)


# kg_diameter: both sweeps unrolled as materialized CTE chains; the seed
# handoff replays the identical (dist DESC, node) 1-row selection
ORACLE_SQL["kg_diameter"] = _kg_diameter_oracle()


def _hash_split_oracle() -> str:
    from kgist_spark.operators.sampling import hash_split_oracle_sql

    return hash_split_oracle_sql("documents", "doc_id", salt=_MIX_SALT)


# hash_split: identical md5 prefix + cumulative string thresholds
# (thresholds generated by the SAME rate_threshold the operator uses)
ORACLE_SQL["hash_split"] = _hash_split_oracle()


def _postings_oracle() -> str:
    from kgist_spark.operators.search import postings_oracle_sql

    return postings_oracle_sql()


# postings: identical tokens, identical smallest-ids cap, identical '|'
# string serialization (string_agg ORDER BY == sorted-struct array_join)
ORACLE_SQL["postings"] = _postings_oracle()


def _kg_negatives_oracle() -> str:
    from kgist_spark.operators.graph import negative_samples_oracle_sql

    return negative_samples_oracle_sql(DERIVED_TRIPLES_SQL, n_neg=2)


# kg_negatives: the oracle's single global ROW_NUMBER index is what the
# two-phase distributed index must reproduce; draws + filtered anti-join
# replay verbatim
ORACLE_SQL["kg_negatives"] = _kg_negatives_oracle()


def _kg_pivot_scc_oracle() -> str:
    from kgist_spark.operators.graph import pivot_scc_oracle_sql

    return pivot_scc_oracle_sql(
        f"SELECT subj AS src, obj AS dst FROM ({DERIVED_TRIPLES_SQL})",
        rounds=_PD_ROUNDS,
    )


# kg_pivot_scc: both directed sweeps unrolled as materialized CTE chains
# over the identical self-loop-augmented edge list
ORACLE_SQL["kg_pivot_scc"] = _kg_pivot_scc_oracle()


def _kg_metapath_oracle() -> str:
    from kgist_spark.operators.graph import metapath_oracle_sql

    return metapath_oracle_sql(DERIVED_TRIPLES_SQL, _METAPATH, k=50)


def _tfidf_pairs_oracle() -> str:
    from kgist_spark.operators.dedup import tfidf_pairs_oracle_sql

    return tfidf_pairs_oracle_sql()


# tfidf_pairs: identical df strip + quantized weights (caps imported from
# the operator), integer dot/norm sums, one float cosine chain
ORACLE_SQL["tfidf_pairs"] = _tfidf_pairs_oracle()


def _editdist_pairs_oracle() -> str:
    from kgist_spark.operators.dedup import editdist_pairs_oracle_sql

    return editdist_pairs_oracle_sql()


# editdist_pairs: identical shared-shingle candidates + length cap +
# integer Levenshtein (a builtin in both engines) + truncating ratio
ORACLE_SQL["editdist_pairs"] = _editdist_pairs_oracle()


def _mixture_plan_oracle() -> str:
    from kgist_spark.operators.sampling import mixture_plan_oracle_sql

    return mixture_plan_oracle_sql(_MIX_WEIGHTS, _MIX_BUDGET)


# mixture_plan: identical token rollup + truncating rate/deficit
# arithmetic; the weight spec literals are shared by construction
ORACLE_SQL["mixture_plan"] = _mixture_plan_oracle()


def _pack_chunks_oracle() -> str:
    from kgist_spark.operators.pack import pack_chunks_oracle_sql

    return pack_chunks_oracle_sql("SELECT doc_id, text FROM documents",
                                  ctx=_PACK_CTX)


# pack_chunks: the pack_layout oracle's single global window + identical
# per-chunk explode and interval-intersection arithmetic
ORACLE_SQL["pack_chunks"] = _pack_chunks_oracle()


def _kg_negatives_head_oracle() -> str:
    from kgist_spark.operators.graph import negative_samples_oracle_sql

    return negative_samples_oracle_sql(DERIVED_TRIPLES_SQL, n_neg=2,
                                       corrupt="head")


# kg_negatives_head: the head-corruption twin — independent draw stream
# (distinct internal salt), (neg_subj, pred, obj) anti-join
ORACLE_SQL["kg_negatives_head"] = _kg_negatives_head_oracle()


def _split_leakage_oracle() -> str:
    from kgist_spark.operators.sampling import hash_split_oracle_sql

    split_sql = hash_split_oracle_sql("documents", "doc_id", salt=_MIX_SALT)
    pairs_sql = ORACLE_SQL["minhash_neardup"]
    return f"""
    WITH pairs AS ({pairs_sql}),
    splits AS ({split_sql})
    SELECT least(sa.split, sb.split) AS split_a,
           greatest(sa.split, sb.split) AS split_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN splits sa ON p.a = sa.doc_id
    JOIN splits sb ON p.b = sb.doc_id
    GROUP BY least(sa.split, sb.split), greatest(sa.split, sb.split)
    """


# split_leakage: the two oracled components (exact near-dup pairs, md5
# -interval splits) composed; off-diagonal rows are the contamination
ORACLE_SQL["split_leakage"] = _split_leakage_oracle()


def _kg_pagerank_weighted_oracle() -> str:
    from kgist_spark.operators.graph import pagerank_weighted_oracle_sql

    return pagerank_weighted_oracle_sql(_WEIGHTED_EDGES_SQL,
                                        iterations=_WPR_ITERS)


# kg_pagerank_weighted: identical weighted edge derivation, identical
# strength-proportional integer contributions, iterations unrolled
ORACLE_SQL["kg_pagerank_weighted"] = _kg_pagerank_weighted_oracle()


def _tfidf_clusters_oracle() -> str:
    from kgist_spark.operators.dedup import tfidf_pairs_oracle_sql

    pairs = tfidf_pairs_oracle_sql()
    return f"""
    WITH RECURSIVE pairs AS ({pairs}),
    und AS (
        SELECT a AS u, b AS v FROM pairs
        UNION SELECT b AS u, a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM und
        UNION
        SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u
        WHERE e.v != r.u
    ),
    comp AS (
        SELECT u AS doc_id, least(u, min(v)) AS keep_id
        FROM reach GROUP BY u
    )
    SELECT d.doc_id,
           COALESCE(c.keep_id, d.doc_id) AS keep_id,
           COALESCE(c.keep_id, d.doc_id) != d.doc_id AS is_dup
    FROM documents d LEFT JOIN comp c USING (doc_id)
    """


# tfidf_clusters: the tfidf_pairs oracle closed by the shared recursive
# -CTE component closure (the neardup_clusters pattern verbatim)
ORACLE_SQL["tfidf_clusters"] = _tfidf_clusters_oracle()


def _containment_keep_oracle() -> str:
    pairs = ORACLE_SQL["containment_pairs"]
    return f"""
    WITH pairs AS ({pairs}),
    keeper AS (
        SELECT contained_id AS doc_id,
               MIN(CASE WHEN contained_id = a THEN b ELSE a END)
                   AS container_id
        FROM pairs GROUP BY contained_id
    )
    SELECT d.doc_id,
           COALESCE(k.container_id, d.doc_id) AS container_id,
           COALESCE(k.container_id, d.doc_id) != d.doc_id AS is_contained
    FROM documents d LEFT JOIN keeper k USING (doc_id)
    """


# containment_keep: the containment oracle + the asymmetric min-container
# keeper (no closure BY SEMANTICS — all contained docs drop)
ORACLE_SQL["containment_keep"] = _containment_keep_oracle()


def _excise_spans_oracle() -> str:
    spans = ORACLE_SQL["dup_spans"]
    return rf"""
    WITH spans AS ({spans}),
    cov AS (
        SELECT DISTINCT doc_id, CAST(u.p AS BIGINT) AS p
        FROM spans, LATERAL unnest(range(span_start, span_end + 1)) u(p)
    ),
    tokpos AS (
        SELECT doc_id, CAST(i AS BIGINT) AS p, t[i] AS tok
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(text), '\s+') AS t
              FROM documents),
             LATERAL unnest(range(1, len(t) + 1)) s(i)
    ),
    kept AS (
        SELECT tp.doc_id, tp.p, tp.tok
        FROM tokpos tp
        WHERE NOT EXISTS (SELECT 1 FROM cov c
                          WHERE c.doc_id = tp.doc_id AND c.p = tp.p)
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tokpos
            GROUP BY doc_id),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(tok, ' ' ORDER BY p) AS clean_text
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_tokens,
           CAST(t.n_tokens - COALESCE(a.n_kept, 0) AS BIGINT) AS n_cut,
           COALESCE(a.clean_text, '') AS clean_text
    FROM tot t LEFT JOIN agg a USING (doc_id)
    """


# excise_spans: the dup_spans oracle expanded to covered positions, the
# identical anti-join rebuild, byte-identical ' '-joined clean text
ORACLE_SQL["excise_spans"] = _excise_spans_oracle()


# quality_deciles: identical (n_chars, doc_id) rank order and the same
# truncating decile arithmetic — no float percentile anywhere
ORACLE_SQL["quality_deciles"] = """
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST((ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) - 1) * 10
                // COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS decile
    FROM documents
"""


# kg_metapath: identical step edges, identical junction cap (part of the
# operator's SEMANTICS, not a silent truncation), identical
# (n DESC, start, end) top-k
ORACLE_SQL["kg_metapath"] = _kg_metapath_oracle()


def _kg_schema_drift_oracle() -> str:
    from kgist_spark.operators.graph import schema_drift_oracle_sql

    return schema_drift_oracle_sql(
        DERIVED_TRIPLES_SQL, PERTURBED_TRIPLES_SQL, DERIVED_LABELS_SQL
    )


# kg_schema_drift: two shared predicate_schema profiles full-outer-joined
# with identical sentinel/COALESCE discipline (NULL-free columns — the
# funnel pandas lesson)
ORACLE_SQL["kg_schema_drift"] = _kg_schema_drift_oracle()


# ann_recall: the two already-oracled retrieval pipelines (exact cosine
# top-k, full IVF replay) composed — recall is a LEFT join + integer
# aggregate over their 10-row results
ORACLE_SQL["ann_recall"] = f"""
    WITH exact AS ({ORACLE_SQL["cosine_topk"]}),
    ann AS ({ORACLE_SQL["embedding_ann"]})
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COUNT(a.vec_id) AS BIGINT) AS n_overlap,
           CAST(COUNT(a.vec_id) * 1000000 // COUNT(*) AS BIGINT)
               AS recall_x1e6
    FROM exact e LEFT JOIN ann a ON e.vec_id = a.vec_id
"""


def _zipf_oracle() -> str:
    from kgist_spark.operators.text import zipf_slope_oracle_sql

    return zipf_slope_oracle_sql()


# zipf_slope: identical (f DESC, token) rank tie-break, identical
# fixed-point ln terms (1e3 scale — int64-safe products), identical
# single-float slope expression
ORACLE_SQL["zipf_slope"] = _zipf_oracle()


# corpus_report: the four per-source rollups replayed and joined; the
# zipf CTE is the shared zipf_slope oracle verbatim
ORACLE_SQL["corpus_report"] = rf"""
    WITH base AS (
        SELECT source AS src, COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                    AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS avg_chars,
               CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
                   AS n_dup_docs
        FROM documents GROUP BY source
    ),
    lc AS (
        SELECT source AS src, lang, COUNT(*) AS c
        FROM documents GROUP BY source, lang
    ),
    top AS (
        SELECT src, lang AS top_lang,
               CAST(c * 1000000 // SUM(c) OVER (PARTITION BY src)
                    AS BIGINT) AS top_lang_share_x1e6,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY c DESC, lang) AS rn
        FROM lc
    ),
    zf AS ({_zipf_oracle()})
    SELECT b.src, b.n_docs, b.n_tokens, b.avg_chars, b.n_dup_docs,
           t.top_lang, t.top_lang_share_x1e6,
           CAST(COALESCE(z.slope_x1e6, 0) AS BIGINT) AS zipf_slope_x1e6
    FROM base b
    JOIN top t ON b.src = t.src AND t.rn = 1
    LEFT JOIN zf z ON b.src = z.src
"""


# source_overlap: identical distinct-(source, token) collapse, identical
# truncating Jaccard on positive operands
ORACLE_SQL["source_overlap"] = rf"""
    WITH st AS (
        SELECT DISTINCT source AS src,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    sizes AS (SELECT src, COUNT(*) AS n FROM st GROUP BY src),
    inter AS (
        SELECT x.src AS src_a, y.src AS src_b, COUNT(*) AS n_common
        FROM st x JOIN st y ON x.token = y.token AND x.src < y.src
        GROUP BY x.src, y.src
    )
    SELECT i.src_a, i.src_b, a.n AS n_a, b.n AS n_b, i.n_common,
           CAST(i.n_common * 1000000 // (a.n + b.n - i.n_common)
                AS BIGINT) AS jaccard_x1e6
    FROM inter i
    JOIN sizes a ON i.src_a = a.src
    JOIN sizes b ON i.src_b = b.src
"""


# lang_confusion: the lang_id oracle (identical scores + profile-order
# tie-break) aggregated to the row-normalized matrix
ORACLE_SQL["lang_confusion"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    s AS (
        SELECT doc_id,
            round(CAST(len(list_filter(t, x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) / len(t), 5) AS score_en,
            round(CAST(len(list_filter(t, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS DOUBLE) / len(t), 5) AS score_de,
            round(CAST(len(list_filter(t, x -> list_contains(['le','la','et','les','des','est'], x))) AS DOUBLE) / len(t), 5) AS score_fr
        FROM toks
    ),
    pred AS (
        SELECT doc_id,
               CASE WHEN score_fr > greatest(score_en, score_de) THEN 'fr'
                    WHEN score_de > score_en THEN 'de'
                    ELSE 'en' END AS pred_lang
        FROM s
    ),
    c AS (
        SELECT d.lang, p.pred_lang, COUNT(*) AS n
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.pred_lang
    )
    SELECT lang, pred_lang, n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY lang) AS BIGINT)
               AS share_of_true_x1e6
    FROM c
"""


_ORACLE_SQL_FULL: dict | None = None

_MODEL_ORACLE_KINDS = {
    "kg_model_rules": "flat",
    "kg_rules_merged": "merged",
    "kg_rules_nested": "nested",
}


def oracle_sql_keys() -> list:
    """All oracle-backed query names WITHOUT generating the model-literal
    SQL (cheap — safe for pytest collection)."""
    return sorted(set(ORACLE_SQL) | {"anomaly_topk"} | set(_MODEL_ORACLE_KINDS))


def oracle_sql_dict() -> dict:
    """The full oracle map, including entries whose SQL embeds a fitted
    model's literals (computed once per process — the model fits replay
    in a few seconds at sf0.01, pure Python, no JVM)."""
    global _ORACLE_SQL_FULL
    if _ORACLE_SQL_FULL is None:
        full = dict(ORACLE_SQL)
        full["anomaly_topk"] = anomaly_topk_oracle_sql()
        for name, kind in _MODEL_ORACLE_KINDS.items():
            full[name] = model_rules_oracle_sql(kind)
        _ORACLE_SQL_FULL = full
    return dict(_ORACLE_SQL_FULL)
