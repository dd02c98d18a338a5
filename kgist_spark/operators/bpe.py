"""Merge-table BPE tokenization (training-data pipeline op).

Real byte-pair-encoding over the regex pre-tokens of
:mod:`kgist_spark.operators.text` (``BPE_TOKEN_RE``): a deterministic merge
table is TRAINED by classic BPE (count adjacent symbol pairs over a seed
word-frequency table, repeatedly merge the most frequent pair — ties broken
lexicographically so training is order-independent), and documents are
encoded against it with the standard rank encoder (repeatedly merge the
lowest-rank pair present, leftmost occurrence first, one merge per step —
each step is one priority-queue pop of the classic encoder).  No end-of-word
marker: merges never cross the regex pre-token boundary, which plays the
role of the word separator.

Physical shape (the 100 TB story):

* pre-tokenization and per-doc word frequencies are pure JVM expressions
  (``regexp_extract_all`` + explode + one groupBy);
* the Python encoder runs over the DISTINCT word vocabulary only (Arrow
  batches via ``mapInPandas``), so Python cost is O(|vocab|) — corpus-size
  independent for natural-language corpora — and the merge table ships in
  the task closure (it is O(n_merges), never corpus-dependent);
* per-doc counts come back via one equi-join of the word-frequency table
  against the encoded vocabulary (AQE broadcasts the vocab while it is
  small and shuffle-joins once it is not).

Every step is replayable in ANSI-ish SQL: the DuckDB oracle embeds the
merge table as a MAP literal and runs the identical encoder as a recursive
CTE (:func:`bpe_token_counts_oracle_sql`).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgist_spark.operators.text import BPE_TOKEN_RE

#: rank assigned to pairs absent from the merge table (both engines)
_NO_MERGE = 1_000_000


def train_bpe_merges(word_freqs: Iterable[Tuple[str, int]],
                     n_merges: int = 64) -> List[Tuple[str, str]]:
    """Classic BPE training: starting from characters, repeatedly merge the
    most frequent adjacent symbol pair (ties broken by the pair itself, so
    the table is independent of input order).  Returns the ranked merge
    list; deterministic for a fixed input."""
    vocab: Dict[Tuple[str, ...], int] = {}
    for word, freq in word_freqs:
        key = tuple(word)
        vocab[key] = vocab.get(key, 0) + freq
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Dict[Tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + freq
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Dict[Tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out: List[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


#: seed word-frequency table the default merge table is trained from — a
#: fixed, code-embedded spec (high-frequency English forms), NOT derived
#: from any runtime corpus, so the table is a constant of the engine and
#: the DuckDB oracle can embed it as a literal.
_SEED_WORD_FREQS: Tuple[Tuple[str, int], ...] = (
    ("the", 330), ("of", 210), ("and", 200), ("to", 190), ("in", 170),
    ("that", 100), ("is", 100), ("was", 90), ("for", 85), ("it", 80),
    ("with", 70), ("as", 70), ("his", 65), ("on", 60), ("be", 60),
    ("at", 55), ("by", 55), ("had", 50), ("not", 50), ("are", 45),
    ("but", 45), ("from", 45), ("or", 40), ("have", 40), ("an", 40),
    ("they", 38), ("which", 35), ("one", 35), ("you", 35), ("were", 33),
    ("her", 32), ("all", 32), ("she", 30), ("there", 30), ("would", 28),
    ("their", 28), ("when", 26), ("this", 26), ("them", 24), ("these", 22),
    ("about", 20), ("other", 20), ("into", 20), ("more", 19), ("your", 18),
    ("some", 18), ("could", 17), ("after", 16), ("than", 16), ("then", 15),
    ("under", 14), ("over", 14), ("such", 13), ("through", 12),
    ("between", 11), ("information", 10), ("people", 10), ("years", 10),
    ("national", 9), ("company", 9), ("world", 9), ("water", 8),
    ("system", 8), ("being", 8), ("working", 7), ("station", 7),
    ("invention", 6), ("question", 6), ("different", 6), ("interest", 6),
)

#: the engine's default merge table (rank = list position)
DEFAULT_MERGES: Tuple[Tuple[str, str], ...] = tuple(
    train_bpe_merges(_SEED_WORD_FREQS, n_merges=64)
)


def merge_ranks(merges: Sequence[Tuple[str, str]]) -> Dict[Tuple[str, str], int]:
    return {pair: rank for rank, pair in enumerate(merges)}


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Rank encoder: merge the lowest-rank pair present (leftmost occurrence
    on ties), one merge per step, until no pair is in the table."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = _NO_MERGE
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]), _NO_MERGE)
            if r < best_rank:
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _word_freqs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(doc_id, word, cnt)`` per-document pre-token frequencies — one JVM
    projection + one groupBy."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )


def _encoded_vocab(words: DataFrame,
                   merges: Sequence[Tuple[str, str]]) -> DataFrame:
    """``(word, n_sub)`` for every distinct word — the only Python stage,
    Arrow-batched and O(|vocab|)."""
    import pandas as pd

    ranks = merge_ranks(merges)

    def enc(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "word": pdf["word"],
                "n_sub": [len(encode_word(w, ranks)) for w in pdf["word"]],
            })

    return words.mapInPandas(enc, "word string, n_sub int")


def bpe_token_counts(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     merges: Sequence[Tuple[str, str]] = DEFAULT_MERGES) -> DataFrame:
    """Per-document REAL-BPE token counts against the merge table:
    ``(doc_id, n_words, n_bpe_tokens)`` where ``n_bpe_tokens`` is the total
    number of BPE symbols after encoding every pre-token."""
    wf = _word_freqs(docs, id_col, text_col)
    vocab = _encoded_vocab(wf.select("word").distinct(), merges)
    return (
        wf.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_sub")).alias("n_bpe_tokens"),
        )
    )


def bpe_token_counts_oracle_sql(table: str = "documents",
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                merges: Sequence[Tuple[str, str]] = DEFAULT_MERGES) -> str:
    """DuckDB replay of :func:`bpe_token_counts`: the merge table as a MAP
    literal (pair key = ``left || ' ' || right`` — symbols never contain a
    space, the pre-tokenizer excludes whitespace) and the identical
    lowest-rank/leftmost/one-merge-per-step encoder as a recursive CTE over
    the distinct word vocabulary."""
    entries = ", ".join(
        "'{} {}': {}".format(a.replace("'", "''"), b.replace("'", "''"), r)
        for r, (a, b) in enumerate(merges)
    )
    rank_map = "MAP {%s}" % entries
    big = _NO_MERGE
    return f"""
WITH RECURSIVE
wf AS (
  SELECT {id_col} AS doc_id, unnest(regexp_extract_all({text_col}, '{BPE_TOKEN_RE}')) AS word
  FROM {table}
),
word_freqs AS (
  SELECT doc_id, word, count(*) AS cnt FROM wf GROUP BY doc_id, word
),
vocab AS (SELECT DISTINCT word FROM word_freqs),
enc(word, syms) AS (
  SELECT word, list_transform(range(1, length(word) + 1), i -> word[i]) FROM vocab
  UNION ALL
  SELECT word, syms[1:bi-1] || [syms[bi] || syms[bi+1]] || syms[bi+2:]
  FROM (
    SELECT word, syms,
           list_position(ranks, list_min(ranks)) AS bi,
           list_min(ranks) AS br
    FROM (
      SELECT word, syms,
             list_transform(
               range(1, len(syms)),
               i -> coalesce(({rank_map})[syms[i] || ' ' || syms[i+1]][1], {big})
             ) AS ranks
      FROM enc
    )
  ) WHERE br < {big}
),
final_enc AS (
  SELECT word, len(syms) AS n_sub
  FROM enc
  WHERE len(syms) = 1 OR {big} <= list_min(list_transform(
    range(1, len(syms)),
    i -> coalesce(({rank_map})[syms[i] || ' ' || syms[i+1]][1], {big})
  ))
)
SELECT f.doc_id AS doc_id,
       CAST(sum(f.cnt) AS BIGINT) AS n_words,
       CAST(sum(f.cnt * e.n_sub) AS BIGINT) AS n_bpe_tokens
FROM word_freqs f JOIN final_enc e USING (word)
GROUP BY f.doc_id
"""
