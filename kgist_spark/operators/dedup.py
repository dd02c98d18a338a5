"""Document-level deduplication operators (training-data pipeline ops).

* exact dedup — see :func:`kgist_spark.operators.text.exact_dup_groups`
* n-gram Jaccard near-dup — exact pairwise similarity over word shingles
  (SQL-expressible; quadratic only within shared-shingle groups)
* MinHash-LSH near-dup — :mod:`kgist_spark.operators.minhash` pipeline
* SimHash — 64-bit sign-sum fingerprints via an Arrow-batched pandas UDF,
  near-dup candidates = identical band slices of the fingerprint
* embedding near-dup — cosine threshold over hyperplane-LSH buckets
  (:mod:`kgist_spark.operators.similarity`)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgist_spark.operators import minhash as MH


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        k: int = 5, threshold: float = 0.4) -> DataFrame:
    """Exact word-k-gram Jaccard over all pairs sharing >= 1 shingle."""
    sh = MH.word_shingles(docs.select(id_col, text_col), id_col, text_col, k=k)
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    return MH.jaccard_verified_pairs(pairs, sh, threshold)


def minhash_neardup_pairs(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 5, num_perm: int = 32,
                          bands: int = 8, threshold: float = 0.4) -> DataFrame:
    """MinHash-LSH blocking + exact-Jaccard verification (the scale path —
    candidate pairs come from band buckets, not a full shingle self-join)."""
    sh = MH.word_shingles(docs.select(id_col, text_col), id_col, text_col, k=k)
    sigs = MH.minhash_signatures(sh, num_perm=num_perm)
    buckets = MH.lsh_buckets(sigs, bands=bands, rows_per_band=num_perm // bands)
    pairs = MH.candidate_pairs(buckets)
    return MH.jaccard_verified_pairs(pairs, sh, threshold)


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash fingerprints (vectorized pandas UDF over Arrow batches)."""

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        from hashlib import blake2b

        import numpy as np

        out = []
        for t in texts:
            counts = np.zeros(64, dtype=np.int64)
            for tok in (t or "").lower().split():
                # blake2b: deterministic across processes (unlike built-in hash)
                h = int.from_bytes(blake2b(tok.encode(), digest_size=8).digest(), "little")
                bits = np.unpackbits(
                    np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8)
                ).astype(np.int64)
                counts += 2 * bits - 1
            fp = 0
            for i, c in enumerate(counts):
                if c > 0:
                    fp |= 1 << i
            out.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
        return pd.Series(out, dtype="int64")

    return docs.select(F.col(id_col), _simhash(F.col(text_col)).alias("simhash"))


def simhash_candidates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       bands: int = 4) -> DataFrame:
    """Near-dup candidate pairs: documents sharing any 16-bit band of their
    SimHash (classic rotate-and-block scheme)."""
    fp = simhash64(docs, id_col, text_col)
    width = 64 // bands
    parts = []
    for b in range(bands):
        band_val = F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        parts.append(fp.select(F.col(id_col).alias("id"), F.lit(b).alias("band"),
                               band_val.alias("bucket")))
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionByName(p)
    return MH.candidate_pairs(buckets)
