"""Structured-Streaming ingestion: incremental extraction equals batch
extraction, processes new files exactly once on restart, and the watermarked
window aggregation matches its batch equivalent."""

import pytest
from pyspark.sql import functions as F

from kgist_spark.sources.webpages import World, generate_pages

pytestmark = pytest.mark.spark


def test_incremental_extraction_matches_batch_and_resumes(spark, tmp_path):
    from kgist_spark.pipeline.extract import extract_triples
    from kgist_spark.streaming.ingest import run_incremental_extraction

    world = World(42)
    in_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    batch1 = generate_pages(spark, 100, seed=42, world=world)
    batch1.write.mode("append").parquet(in_dir)
    run_incremental_extraction(spark, in_dir, out_dir, ckpt)
    got1 = spark.read.parquet(out_dir)
    want1 = extract_triples(batch1)
    assert got1.count() == want1.count()

    # new files arrive; a re-run processes ONLY them (stream checkpoint)
    batch2 = generate_pages(spark, 60, seed=777, world=world)
    batch2.write.mode("append").parquet(in_dir)
    run_incremental_extraction(spark, in_dir, out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    want_total = want1.count() + extract_triples(batch2).count()
    assert got2.count() == want_total

    # idempotent: nothing new -> nothing appended
    run_incremental_extraction(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == want_total

    # content equality (set of extracted triples)
    batch_all = spark.read.parquet(in_dir)
    want_set = {
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in extract_triples(batch_all).collect()
    }
    got_set = {
        (r["url"], r["subj"], r["pred"], r["obj"]) for r in got2.collect()
    }
    assert got_set == want_set


def test_windowed_event_counts_match_batch(spark, tmp_path):
    from kgist_spark.streaming.ingest import windowed_event_counts

    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    src_dir = tmp_path / "events"
    src_dir.mkdir()
    shutil.copy(src, src_dir / "part-0.parquet")  # file streams need a directory
    events_stream = (
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(str(src_dir))
    )
    out = windowed_event_counts(events_stream)
    q = (
        out.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["avg_value"], 6))
        for r in spark.sql("select * from wincounts").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n"], round(r["avg_value"], 6))
        for r in spark.read.parquet(src)
        .groupBy(F.date_trunc("HOUR", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.avg("value").alias("avg_value"))
        .collect()
    }
    assert got == want


def test_stateful_dedup_across_batches_and_restarts(spark, tmp_path):
    """applyInPandasWithState dedup: the first doc per md5 wins across
    micro-batches AND across stream restarts (state restored from the
    checkpoint); later duplicates are never re-emitted."""
    from kgist_spark.streaming.ingest import PAGES_DDL, run_incremental_dedup

    inp = tmp_path / "in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    inp.mkdir()

    def page(url, text):
        return (url, None, None, text, "en")

    spark.createDataFrame(
        [page("u1", "alpha text"), page("u2", "beta text")], PAGES_DDL
    ).write.parquet(str(inp / "f1.parquet"))
    run_incremental_dedup(spark, str(inp) + "/*", out, ckpt)
    first = {r["text_md5"] for r in spark.read.parquet(out).collect()}
    assert len(first) == 2

    # new arrivals: one duplicate of an old doc, one genuinely new
    spark.createDataFrame(
        [page("u3", "alpha text"), page("u4", "gamma text")], PAGES_DDL
    ).write.parquet(str(inp / "f2.parquet"))
    run_incremental_dedup(spark, str(inp) + "/*", out, ckpt)
    rows = spark.read.parquet(out).collect()
    md5s = [r["text_md5"] for r in rows]
    assert len(md5s) == 3 and len(set(md5s)) == 3  # dup NOT re-emitted

    # keep_id is the md5 of 'gamma text' holder only among new rows
    got_new = set(md5s) - first
    assert len(got_new) == 1
