"""URL canonicalization + crawl-frontier dedup.

A Common-Crawl-style pipeline sees the same page under dozens of URL
spellings — scheme/host case, default ports, ``www.``, tracking params
(``utm_*``/``gclid``/``fbclid``), param order, trailing slashes,
fragments.  Canonicalizing BEFORE fetch/dedup is the first dedup stage of
every crawler (it collapses duplicates for free, no content hashing), and
the canonical URL is the natural partition/bucket key for everything
downstream.

The canonicalizer here is a PURE STRING FUNCTION built only from
regexp/array primitives available in both Spark and ANSI-ish SQL
(no ``parse_url``), so the DuckDB oracle replays it byte-for-byte:

1. drop the fragment (``#...``);
2. lowercase scheme and host;
3. strip the scheme's default port (``:80`` http, ``:443`` https);
4. strip a leading ``www.`` label;
5. drop tracking query params, SORT the survivors (byte order);
6. collapse trailing path slashes (empty path -> ``/``).

All patterns are RE2-safe (no backreferences/lookahead), the engine-wide
regex discipline (`operators/scrub.py`).  Public-suffix-aware registered
-domain extraction needs the PSL list; ``site_key`` approximates it with
the last two host labels and says so — the standard approximation when
the list isn't shipped.

100 TB shape: one zero-shuffle projection per page (a single generated
expression — no UDF, full codegen); the frontier dedup's only shuffle is
the canonical-key window, partition-bounded by per-URL duplicate counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: query params that never change page identity (analytics/affiliate tags)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|icid)="


def canonical_url_expr(col: str) -> "F.Column":
    """The canonical form of URL column ``col`` as ONE composed JVM
    expression (steps in the module docstring).  Non-URL strings (no
    ``scheme://``) pass through lowercased-scheme-free unchanged."""
    u = F.regexp_replace(F.col(col), r"#.*$", "")          # 1. fragment
    scheme = F.lower(F.regexp_extract(u, r"^([^:/?#]+)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1))
    pathq = F.regexp_replace(u, r"^[^:/?#]+://[^/?#]*", "")
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    host = F.regexp_replace(host, r"^www\.", "")           # 4. www
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"^[^?]*\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    path = F.regexp_replace(path, r"/+$", "")              # 6. trailing /
    path = F.when(path == "", F.lit("/")).otherwise(path)
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon).otherwise(F.col(col))


def site_key_expr(col: str) -> "F.Column":
    """Approximate registered domain: the last two labels of the
    canonical host (``a.b.example.com -> example.com``).  A real crawler
    substitutes the public-suffix list; the two-label fallback is the
    standard approximation when it isn't shipped."""
    host = F.lower(F.regexp_extract(F.col(col), r"^[^:/?#]+://([^/?#:]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def url_frontier_dedup(pages: DataFrame, url_col: str = "url",
                       id_col: str = "doc_id") -> DataFrame:
    """The frontier-dedup decision table — ``(id, canon_url, site,
    n_variants, keep_id, is_dup)``: every row canonicalized, duplicates
    grouped by canonical URL, each group keeping its minimum id (the
    engine-wide min-id keeper convention).  ``n_variants`` is the
    group's size, so crawl monitoring reads the URL-spelling collapse
    rate straight off this table.

    Scale shape: canonicalization is a zero-shuffle codegen projection;
    the ONLY shuffle is the canonical-key window (partition size =
    per-URL variant count, never corpus-scale)."""
    canon = pages.select(
        F.col(id_col),
        canonical_url_expr(url_col).alias("canon_url"),
    ).withColumn("site", site_key_expr("canon_url"))
    w = Window.partitionBy("canon_url")
    return (
        canon
        .withColumn("n_variants", F.count("*").over(w).cast("long"))
        .withColumn("keep_id", F.min(id_col).over(w))
        .withColumn("is_dup", F.col("keep_id") != F.col(id_col))
    )


def canonical_url_oracle_expr(col: str = "url") -> str:
    """The DuckDB replay of :func:`canonical_url_expr` as a SQL scalar
    expression over column ``col`` (same six steps, same RE2 patterns,
    same byte-order param sort)."""
    u = f"regexp_replace({col}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([^:/?#]+)://', 1))"
    hostport = f"lower(regexp_extract({u}, '^[^:/?#]+://([^/?#]*)', 1))"
    pathq = f"regexp_replace({u}, '^[^:/?#]+://[^/?#]*', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '')"
        f" WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '')"
        f" ELSE {hostport} END"
    )
    host = f"regexp_replace({host}, '^www\\.', '')"
    path0 = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    query = f"regexp_extract({pathq}, '^[^?]*\\?(.*)$', 1)"
    kept = (
        f"array_to_string(list_sort(list_filter(string_split({query}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p,"
        f" '{TRACKING_PARAM_RE}'))), '&')"
    )
    path = f"regexp_replace({path0}, '/+$', '')"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    canon = (
        f"({scheme} || '://' || {host} || {path} ||"
        f" CASE WHEN {kept} <> '' THEN '?' || {kept} ELSE '' END)"
    )
    return f"CASE WHEN {scheme} <> '' THEN {canon} ELSE {col} END"
