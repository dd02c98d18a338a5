"""Corpus-scrubbing operators (operators/scrub.py).

Engine parity with DuckDB is pinned by tests/test_entry_contract.py
(pii_scrub / line_dedup rows+schema+values); this file pins the operators'
own semantic guarantees: ordered redaction, count/replace agreement,
line-exemption rules, original-order reassembly, and the all-lines-dropped
edge case.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from kgist_spark.operators.scrub import PII_PATTERNS, line_dedup, pii_scrub

pytestmark = pytest.mark.spark


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_counts_and_redacts(spark):
    rows = [
        (1, "mail me at a.b-c@ex-ample.co.uk or x@y.io now"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "call 555-123-4567 please"),
        (4, "clean text with no pii at all"),
    ]
    out = {r["doc_id"]: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 0, 0)
    assert out[1]["clean_fp"] == _md5("mail me at [EMAIL] or [EMAIL] now")
    assert out[2]["n_ipv4"] == 2
    assert out[2]["clean_fp"] == _md5("server [IP] and [IP] up")
    assert out[3]["n_phone"] == 1
    assert out[3]["clean_fp"] == _md5("call [PHONE] please")
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)
    assert out[4]["clean_fp"] == _md5("clean text with no pii at all")


def test_pii_scrub_chain_order_no_double_count(spark):
    # the digits in an email must not ALSO count as an IP/phone once the
    # email pattern has consumed them: counts run on the progressively
    # scrubbed text, in PII_PATTERNS order
    rows = [(1, "u 10.1.1.1@host.com z"), (2, "a@b.co 10.1.1.1 555-000-1111")]
    out = {r["doc_id"]: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"]) == (1, 0)
    assert out[1]["clean_fp"] == _md5("u [EMAIL] z")
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (1, 1, 1)
    assert out[2]["clean_fp"] == _md5("[EMAIL] [IP] [PHONE]")


def test_pii_patterns_are_re2_safe():
    # the oracle replays these in DuckDB's RE2 — keep them in the common
    # subset (no backrefs, no lookaround) and '$'-free replacements
    for _, pat, rep in PII_PATTERNS:
        assert "(?=" not in pat and "(?<" not in pat and "\\1" not in pat
        assert "$" not in rep


def test_line_dedup_drops_repeated_lines_keeps_order(spark):
    rows = [
        (1, "boiler\nunique one\nboiler"),
        (2, "boiler\nunique two"),
        (3, "solo document"),
    ]
    out = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, rows), min_docs=2).collect()
    }
    # 'boiler' appears in 2 distinct docs -> dropped everywhere (both
    # occurrences in doc 1); unique lines survive in original order
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 1)
    assert out[1]["clean_fp"] == _md5("unique one")
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 1)
    assert out[2]["clean_fp"] == _md5("unique two")
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (1, 1)
    assert out[3]["clean_fp"] == _md5("solo document")


def test_line_dedup_all_dropped_and_short_exemption(spark):
    rows = [
        (1, "same\n\nsame"),
        (2, "same\n\nother"),
        (3, "same"),
    ]
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            _docs(spark, rows), min_docs=2, min_line_chars=1
        ).collect()
    }
    # empty lines are exempt (kept, never counted toward min_docs even
    # though they appear in 2 docs); a doc reduced to nothing fingerprints
    # as md5(''), not NULL
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 1)
    assert out[1]["clean_fp"] == _md5("")
    assert out[2]["clean_fp"] == _md5("\nother")
    assert out[3]["clean_fp"] == _md5("")


def test_line_dedup_distinct_docs_not_occurrences(spark):
    # 3 occurrences inside ONE doc stay below a min_docs=2 threshold —
    # the count is distinct documents, not total occurrences
    rows = [(1, "rep\nrep\nrep"), (2, "other line")]
    out = {
        r["doc_id"]: r
        for r in line_dedup(_docs(spark, rows), min_docs=2).collect()
    }
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 3)
    assert out[1]["clean_fp"] == _md5("rep\nrep\nrep")
