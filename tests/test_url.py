"""URL canonicalization: hand-pinned spellings, idempotence, and the
frontier decision table."""

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.url import (
    canonical_url_expr,
    site_key_expr,
    url_frontier_dedup,
)

pytestmark = pytest.mark.spark

CASES = [
    # (input, canonical)
    ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2"),
    ("https://news.site.org:443/path", "https://news.site.org/path"),
    ("https://news.site.org:8443/path", "https://news.site.org:8443/path"),
    # http keeps :443 (only the scheme's OWN default port strips)
    ("http://h.io:443/x", "http://h.io:443/x"),
    ("https://a.b.c.de", "https://a.b.c.de/"),          # empty path -> /
    ("http://x.com/?gclid=123&fbclid=9", "http://x.com/"),
    ("http://x.com/p?z=1&y=2&z=0", "http://x.com/p?y=2&z=0&z=1"),
    ("not a url at all", "not a url at all"),            # pass-through
]


def test_canonical_url_hand_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r[0] for r in df.select(canonical_url_expr("url")).collect()]
    assert got == [c for _, c in CASES]


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) — the property a frontier relies on."""
    df = spark.createDataFrame([(u,) for u, _ in CASES if "://" in u],
                               "url string")
    once = df.select(canonical_url_expr("url").alias("url"))
    twice = once.select(canonical_url_expr("url").alias("url"))
    assert [r[0] for r in once.collect()] == [r[0] for r in twice.collect()]


def test_site_key_two_label_approximation(spark):
    df = spark.createDataFrame(
        [("https://a.b.example.com/x",), ("http://WWW.Foo.ORG/",)],
        "url string",
    )
    got = [r[0] for r in df.select(site_key_expr("url")).collect()]
    assert got == ["example.com", "foo.org"]


def test_url_frontier_dedup_groups_variants(spark):
    pages = spark.createDataFrame(
        [(1, "http://WWW.a.com:80/p/"),
         (2, "http://a.com/p?utm_source=z"),
         (3, "http://a.com/p"),
         (4, "http://a.com/other")],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in url_frontier_dedup(pages).collect()}
    assert rows[1]["canon_url"] == rows[2]["canon_url"] == rows[3]["canon_url"]
    assert rows[1]["n_variants"] == 3 and rows[1]["keep_id"] == 1
    assert not rows[1]["is_dup"] and rows[2]["is_dup"] and rows[3]["is_dup"]
    assert rows[4]["n_variants"] == 1 and not rows[4]["is_dup"]
