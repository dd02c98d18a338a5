"""Streaming frontier admission: admitted set equals the batch
url_frontier_dedup keepers over the union, across restarts; replays
append nothing."""

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.url import url_frontier_dedup
from kgist_spark.streaming.frontier import run_incremental_frontier

pytestmark = pytest.mark.spark


def _pages(spark, ids):
    # URL spellings cycle so the same canonical URL arrives under
    # different variants across batches (id % 20 -> 20 canonical paths)
    rows = []
    for i in ids:
        variant = [
            f"http://WWW.site.com:80/p{i % 20}/",
            f"http://site.com/p{i % 20}?utm_source=x",
            f"http://site.com/p{i % 20}",
        ][i % 3]
        rows.append((i, variant))
    return spark.createDataFrame(rows, "doc_id long, url string")


def _admitted(spark, out_dir):
    return {
        (r["canon_url"], r["keep_id"])
        for r in spark.read.parquet(out_dir).collect()
    }


def test_stream_equals_batch_across_restart(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()

    _pages(spark, range(0, 40)).write.parquet(str(inp / "f1.parquet"))
    run_incremental_frontier(spark, str(inp) + "/*", out, ckpt)

    # later ids re-spell the SAME canonical urls -> nothing new admitted
    # except none (all 20 paths seen in batch 1)
    _pages(spark, range(40, 90)).write.parquet(str(inp / "f2.parquet"))
    run_incremental_frontier(spark, str(inp) + "/*", out, ckpt)

    got = _admitted(spark, out)
    want = {
        (r["canon_url"], r["keep_id"])
        for r in url_frontier_dedup(_pages(spark, range(0, 90)))
        .where(~F.col("is_dup"))
        .select("canon_url", F.col("keep_id")).collect()
    }
    assert got == want
    assert len(got) == 20  # one admission per canonical path


def test_replay_appends_nothing(spark, tmp_path):
    inp = tmp_path / "in"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    inp.mkdir()
    _pages(spark, range(0, 30)).write.parquet(str(inp / "f1.parquet"))
    run_incremental_frontier(spark, str(inp) + "/*", out, ckpt)
    before = _admitted(spark, out)
    run_incremental_frontier(spark, str(inp) + "/*", out, ckpt)
    assert _admitted(spark, out) == before
