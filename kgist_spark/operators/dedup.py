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
    # one exploded projection — a per-band union would re-run the SimHash
    # pandas UDF once per band
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("bucket"),
        )
        for b in range(bands)
    ]
    buckets = (
        fp.select(F.col(id_col).alias("id"), F.explode(F.array(*entries)).alias("bb"))
        .select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )
    return MH.candidate_pairs(buckets)


def embedding_neardup_pairs(embeddings: DataFrame, threshold: float = 0.4,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: ``(id_a, id_b, cosine)`` for
    ``id_a < id_b`` and cosine >= threshold.

    Physical shape: the embedding matrix is broadcast once (the same
    small-side-broadcast judgment as a broadcast hash join — 1 M x 64 floats
    is 256 MB; well within executor memory), and each Arrow batch of the
    distributed side computes one BLAS block-multiply ``batch @ full.T``
    instead of per-pair array expressions (measured 40x faster than a
    ``zip_with``/``aggregate`` pair join at 2 k vectors).  Above broadcast
    scale, run the same kernel WITHIN hyperplane-LSH buckets
    (:func:`kgist_spark.operators.similarity.hyperplane_signatures`) or IVF
    cells so the self-join is blocked, not all-pairs.
    """
    import numpy as np
    from pyspark.sql import types as T

    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    sc = embeddings.sparkSession.sparkContext
    b_ids, b_mat, b_norms = sc.broadcast(ids), sc.broadcast(mat), sc.broadcast(norms)

    out_schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def block(batches):
        full, full_ids, full_norms = b_mat.value, b_ids.value, b_norms.value
        for pdf in batches:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a = np.array(list(pdf[vec_col]), dtype=np.float64)
            sims = (a @ full.T) / np.outer(
                np.sqrt((a * a).sum(axis=1)), full_norms
            )
            sims = np.round(sims, 5)
            ii, jj = np.nonzero((sims >= threshold) & (a_ids[:, None] < full_ids[None, :]))
            yield pd.DataFrame({
                "id_a": a_ids[ii], "id_b": full_ids[jj], "cosine": sims[ii, jj]
            })

    return embeddings.select(id_col, vec_col).mapInPandas(block, out_schema)
