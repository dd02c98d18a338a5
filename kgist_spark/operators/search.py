"""BM25 keyword search over the document corpus.

No reference counterpart (GemsLab/KGist has no text stage); this is the
lexical retrieval complement to the embedding ANN operators
(:mod:`kgist_spark.operators.similarity`) — a training-data pipeline uses
it for corpus QA ("show me the documents about X") and for building
retrieval eval sets.

Scale + determinism shape:

* ONE pass over the corpus: the per-document token length and the per-term
  term frequencies for ALL query terms come out of a single grouped
  aggregation (conditional integer sums — the query is a handful of
  literal terms, so the tf columns are a fixed narrow projection, not an
  exploded join against a term table);
* corpus statistics (N, total length, per-term document frequencies) are a
  ONE-ROW aggregate broadcast into the scoring projection — no second
  shuffle, no driver round-trip baked into the plan;
* the score is a FIXED-ORDER column expression (term 0 + term 1 + ...),
  never a float ``sum()`` aggregation, so there is no partition-order
  float drift — the same determinism discipline as the fixed-point
  PageRank (``operators/graph.py``); DuckDB replays the identical
  expression text, and the top-k orders by the ROUNDED score (then doc id)
  so a sub-rounding ulp difference can't flip the k boundary between
  engines;
* top-k is ``orderBy(...).limit(k)`` — Spark's TakeOrderedAndProject
  (bounded per-partition heaps + driver merge of k rows, never a global
  sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _score_expr(terms: list[str], k1: float, b: float) -> str:
    """The BM25 score as one expression string over columns
    ``tf{i}, df{i}, dl, n_docs, total_len`` — shared verbatim with the SQL
    oracle so both engines evaluate the identical fixed-order arithmetic.
    ``dl/avgdl`` is computed as ``dl * n_docs / total_len`` (integer
    products first) to keep the only float inputs exact."""
    parts = []
    for i in range(len(terms)):
        idf = f"ln(1 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))"
        tf_norm = (
            f"(tf{i} * ({k1} + 1)) / "
            f"(tf{i} + {k1} * (1 - {b} + {b} * dl * n_docs / total_len))"
        )
        parts.append(f"{idf} * {tf_norm}")
    return " + ".join(parts)


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k documents by BM25 for literal query ``terms`` (lowercase,
    whitespace tokenization — same convention as ``operators/text.py``):
    ``(doc_id, bm25)``, score rounded to 5 decimals, ties broken by doc id.
    Documents matching no term are filtered BEFORE scoring (a zero-score
    doc never reaches the heap)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum((F.col("tok") == t).cast("long")).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    any_tf = " + ".join(f"tf{i}" for i in range(len(terms)))
    return (
        per_doc.where(F.expr(f"({any_tf}) > 0"))
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(F.expr(_score_expr(terms, k1, b)), 5).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_oracle_sql(terms: list[str], k: int = 10,
                         k1: float = 1.2, b: float = 0.75,
                         table: str = "documents") -> str:
    """DuckDB replay of :func:`bm25_topk` — same tokenization, same one-row
    stats, and the IDENTICAL fixed-order score expression string."""
    tf_cols = ",\n               ".join(
        f"CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n               ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    any_tf = " + ".join(f"tf{i}" for i in range(len(terms)))
    return f"""
    WITH tok AS (
        SELECT doc_id, t.tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
            FROM {table}
        ) t WHERE t.tok <> ''
    ),
    per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl,
               {tf_cols}
        FROM tok GROUP BY doc_id
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS total_len,
               {df_cols}
        FROM per_doc
    )
    SELECT doc_id, round({_score_expr(terms, k1, b)}, 5) AS bm25
    FROM per_doc, stats
    WHERE ({any_tf}) > 0
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT {k}
    """
