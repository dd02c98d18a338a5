#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the flagship candidate-generation aggregation over the derived
KG, top-k ranking, text/dedup/similarity operators over documents/embeddings,
an hourly window aggregation over events, and the stage-1 extraction
throughput over a generated web corpus (docs/sec recorded under "extra").

Protocol: every timed region runs SPARK_GRAFT_BENCH_REPS times (default 3)
and the MEDIAN is reported; per-query [min, max] spreads and the discarded
cold run ship in the $SPARK_GRAFT_BENCH_DETAIL side file (default
bench_detail.json) — the printed line stays compact because the driver
records only the trailing bytes of stdout.  One cold run per round proved
noise-dominated on this box
(±40% run-to-run from GC/idle state — see BENCH.md), so round-over-round
deltas compare medians, and the spread shows how settled the box was.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 100k docs: at 20k the timed region is dominated by Python-worker
    # startup and the docs/sec figure swung 1.2k-26k run to run
    n_bench_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from kgist_spark.session import get_spark
    from kgist_spark.plans import testdata_queries as Q
    from kgist_spark.pipeline.extract import extract_triples
    from kgist_spark.sources.webpages import World, generate_pages

    # no console progress bars: they are carriage-return spam that polluted
    # the driver's recorded bench tails (round 3's tail was 100% progress
    # bars); the result must be the ONLY thing on stdout
    spark = get_spark(
        app_name="kgist-bench", cpus=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = [
        "candidate_stats",
        "topk_rules_by_cas",
        "ca_size_histogram",
        "coverage_anti",
        "dedup_exact",
        "stratified_sample",
        "domain_cap",
        "decontaminate",
        "repetition",
        "token_stats",
        "quality",
        "lang_score",
        "cosine_topk",
        "events_hourly",
        "bpe_tokens",
        "bpe_real_tokens",
        "neardup_clusters",
        "curate",
        "user_sessions",
        "asof_enrich",
        "dedup_embedding",
        "semdedup_pairs",
        "semdedup_clusters",
        "semdedup_keep_best",
        "kg_degree_stats",
        "kg_path2_stats",
        "kg_pagerank",
        "kg_components",
        "bm25_topk",
        "pii_scrub",
        "line_dedup",
        "lm_score",
        "lm2_score",
        "dsir_weights",
        "dup_ngrams",
        "token_pmi",
        "kg_kcore",
        "kg_reciprocity",
        "part_clustering",
        "event_drift",
        "embedding_ann_q8",
        "part_triangles",
        "corpus_percentiles",
        "incident_clicks",
        "kg_bfs",
        "kg_labelprop",
        "kg_linkpred",
        "tfidf_terms",
        "kg_ppr",
        "events_hll",
        "cohort_retention",
        "event_funnel",
        "cms_user_counts",
        "kg_hits",
        "event_transitions",
        "kg_neighbor_jaccard",
        "kg_assortativity",
        "bloom_decontaminate",
        "part_truss",
        "dup_spans",
        "priority_sample",
        "kg_walks",
        "kg_churn",
        "kg_sentences",
        "pack_layout",
        "containment_pairs",
        "kg_schema",
        "kg_component_sizes",
        "winnow_fp",
        "url_frontier",
        "kg_violations",
        "kg_diameter",
        "hash_split",
        "postings",
        "lang_confusion",
        "kg_negatives",
        "kg_pivot_scc",
        "kg_schema_drift",
        "ann_recall",
        "source_overlap",
        "zipf_slope",
        "corpus_report",
        "lm3_score",
        "kg_metapath",
        "hll_error",
        "tfidf_pairs",
        "editdist_pairs",
        "mixture_plan",
        "pack_chunks",
        "kg_negatives_head",
        "split_leakage",
        "kg_pagerank_weighted",
        "tfidf_clusters",
        "containment_keep",
        "excise_spans",
        "quality_deciles",
    ]

    # warm up the JVM + parquet footers with one cheap action
    Q.q_pred_freq(spark, sf_dir).count()

    timings, spread, cold = {}, {}, {}

    def record(name, runs):
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]

    for name in bench_queries:
        fn = Q.QUERIES[name]
        # BASELINE.md protocol: one warm-up run discarded from the median
        # (it pays parquet footer reads + codegen compilation, not operator
        # cost) but RECORDED under extra.cold so the cold-start story stays
        # visible.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(reps):
            # queries that persist() an intermediate (e.g. curate's fanned
            # corpus scan) register it with the session CacheManager, which
            # dedupes by plan — without this clear, rep N would silently
            # read rep N-1's cache and the median would time a warm plan
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop write, not count(): a bare count on an aggregate lets
            # Catalyst prune the aggregate expressions, timing a cheaper plan
            # than the one the driver's correctness harness actually runs;
            # noop forces every output column without driver-side collection.
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        record(name, runs)

    # stage-1 extraction throughput over a generated corpus
    world = World(42)
    pages = generate_pages(spark, n_bench_docs, seed=42, world=world).cache()
    pages.count()  # materialize generation outside the timed region
    runs, n_triples = [], 0
    for _ in range(reps):
        t0 = time.perf_counter()
        n_triples = extract_triples(pages).count()
        runs.append(time.perf_counter() - t0)
    record("extract_triples", runs)
    docs_per_sec = round(n_bench_docs / timings["extract_triples"], 1)

    # same fused extraction through the all-Catalyst fast path (the
    # pipeline default) — no Python workers in the timed region
    from kgist_spark.pipeline.extract_jvm import extract_facts_jvm

    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        extract_facts_jvm(pages).where("kind = 't'").count()
        runs.append(time.perf_counter() - t0)
    record("extract_facts_jvm", runs)
    jvm_docs_per_sec = round(n_bench_docs / timings["extract_facts_jvm"], 1)

    # full 3-stage pipeline (extraction -> canonicalization -> materialized
    # KG tables with lineage manifest) — the north-star headline
    import shutil
    import tempfile

    from kgist_spark.pipeline.run import construct_kg

    runs, n_kg_triples = [], 0
    for _ in range(reps):
        out = tempfile.mkdtemp(prefix="bench_kg_")
        t0 = time.perf_counter()
        triples, labels = construct_kg(spark, pages, out_dir=out)
        runs.append(time.perf_counter() - t0)
        n_kg_triples = triples.count()
        triples.unpersist(), labels.unpersist()
        shutil.rmtree(out, ignore_errors=True)
    record("pipeline_e2e", runs)
    pages.unpersist()

    total = round(sum(timings.values()), 3)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    extra = {
        "cpus": cpus,
        "reps": reps,
        "extract_docs_per_sec": docs_per_sec,
        "extract_jvm_docs_per_sec": jvm_docs_per_sec,
        "pipeline_docs_per_sec": round(n_bench_docs / timings["pipeline_e2e"], 1),
        "n_bench_docs": n_bench_docs,
        "n_extracted_triples": n_triples,
        "n_kg_triples": n_kg_triples,
    }
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extra": extra,
    }
    # per-query spread/cold detail goes to a SIDE file: the driver records
    # only the trailing bytes of stdout, and a final line fat enough to
    # overflow that window loses its head (round 4 lost the start of the
    # per-query dict).  The printed line stays compact and self-contained.
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")
    try:
        with open(detail_path, "w") as f:
            json.dump({**out, "extra": {**extra, "spread": spread, "cold": cold}},
                      f, indent=1)
    except OSError:
        pass  # detail is best-effort; the headline line below is the record
    # stop Spark BEFORE printing so no executor-shutdown logging can trail
    # the result: the JSON must be the final line on stdout
    spark.stop()
    sys.stderr.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())
