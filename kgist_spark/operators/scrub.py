"""Corpus-scrubbing operators: PII redaction and cross-document line dedup.

Both are standard web-text training-data cleaning stages (the reference has
no text stage at all — these extend the engine the way `text.py` does):

* :func:`pii_scrub` — regex redaction of emails / IPv4s / phone numbers,
  entirely JVM-side (``regexp_replace`` + ``regexp_count``), zero shuffles.
* :func:`line_dedup` — CCNet/RefinedWeb-style removal of lines that repeat
  across many documents (boilerplate: nav bars, cookie banners, footers).

Float-free outputs; fingerprints are md5 hex so results are
engine-comparable (the driver's DuckDB oracle hashes values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) — patterns restricted to syntax with
#: IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB oracle):
#: character classes, ``\d``/``\b``, bounded+greedy quantifiers; no
#: backrefs, no lookaround.  Replacements avoid ``$`` (special in Java
#: replacement strings) and ``\\`` (special in RE2 replacements).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
)


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns=PII_PATTERNS,
) -> DataFrame:
    """Redact PII spans and count what was redacted, per document.

    Patterns apply IN ORDER, each counting and replacing on the text as
    left by the previous pattern (so an IPv4 inside an already-redacted
    email is not double-counted) — the oracle replays the same chain.

    Output: ``(id, n_<name> per pattern, clean_fp)`` where ``clean_fp`` is
    the md5 of the fully scrubbed text (the scrubbed text itself stays on
    the cluster; at 100 TB you'd write it back as the cleaned corpus — the
    fingerprint is what the audit table needs).

    100 TB shape: a pure per-row map — no shuffle, no Python workers, whole
    row pipeline stays inside one WholeStageCodegen span; scales linearly
    with input splits.  The conditional narrow-scan fan-out only fires on
    a small-file corpus (the regex chain is the per-row cost here; a real
    wide scan passes through untouched)."""
    from kgist_spark.operators.dedup import fan_out_scan

    docs = fan_out_scan(docs)
    cur = F.col(text_col)
    counts = []
    for name, pat, rep in patterns:
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, rep)
    return docs.select(F.col(id_col), *counts, F.md5(cur).alias("clean_fp"))


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    min_line_chars: int = 1,
) -> DataFrame:
    """Remove lines that occur in ``>= min_docs`` DISTINCT documents (the
    CCNet/RefinedWeb cross-document boilerplate filter: navigation bars,
    cookie banners, footers repeat across a site's pages and would dominate
    training data if left in).

    Lines shorter than ``min_line_chars`` are exempt — never counted,
    never dropped (an empty line is structure, not boilerplate).

    Output: ``(id, n_lines, n_kept, clean_fp)`` — ``clean_fp`` is the md5
    of the document rebuilt from surviving lines in original order
    (``md5('')`` when nothing survives, matching the oracle's
    ``coalesce(string_agg(...), '')``).

    100 TB shape: the classic line-frequency plan — explode lines once,
    ONE aggregation builds the global ``line -> n_distinct_docs`` table,
    a left join tags repeats, and one regroup per document rebuilds the
    text; three shuffles total, all keyed wide (line, then id).  The
    frequent-line table is NOT broadcast (at web scale it is itself huge);
    the join key is the raw line, so a viral boilerplate line is a skewed
    key — AQE skew-join splits it, and the per-line count aggregation
    partial-aggregates map-side so the skew never concentrates raw rows.
    At 10^12 lines you would key the frequency table by a 128-bit hash to
    cut shuffle bytes; a 64-bit key has a non-negligible birthday bound at
    that scale, and the raw string is exact, so exactness wins here."""
    from kgist_spark.operators.dedup import fan_out_scan

    lines = F.split(F.col(text_col), "\n", -1)
    exploded = fan_out_scan(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.posexplode(lines).alias("pos", "line")
    )
    freq = (
        exploded.where(F.length("line") >= min_line_chars)
        .groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("line", F.lit(1).alias("hit"))
    )
    tagged = exploded.join(freq, "line", "left")
    kept_struct = F.when(
        F.col("hit").isNull(), F.struct(F.col("pos"), F.col("line"))
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.count(F.when(F.col("hit").isNull(), 1)).alias("n_kept"),
            F.array_sort(F.collect_list(kept_struct)).alias("kept"),
        )
        .select(
            F.col(id_col),
            "n_lines",
            "n_kept",
            F.md5(
                F.concat_ws("\n", F.transform("kept", lambda x: x["line"]))
            ).alias("clean_fp"),
        )
    )
