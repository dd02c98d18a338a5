"""JVM-free replay of the testdata model fit (for DuckDB oracle generation).

The driver's correctness gate runs ``oracle_sql()`` WITHOUT a SparkSession,
but the ``anomaly_topk`` query scores edges under a model FITTED from the
data.  This module reproduces that fit in pure Python so the fitted model's
tiny side tables can be serialized into the oracle SQL as literals:

* :func:`spark_hash32` — bit-exact replica of Spark's ``F.hash`` (Murmur3
  x86 32-bit, seed 42, with Spark's per-byte tail handling) so the
  hash-bucketed id orders of
  :func:`kgist_spark.pipeline.materialize.deterministic_dense_ids` can be
  replayed driver-side;
* :func:`dense_id_order` — the (bucket, sort-key) total order those ids
  induce;
* :func:`fit_testdata_model` — DuckDB-derived KG rows -> :class:`LocalKG`
  -> :class:`GreedySearcher` fit, row orders identical to the Spark path
  (``plans.testdata_queries._fit_derived_model``), so the selected model is
  the same one the Spark query scores under.
"""

from __future__ import annotations

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_MASK = 0xFFFFFFFF


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK
    k1 = ((k1 << 15) | (k1 >> 17)) & _MASK
    return (k1 * _C2) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _MASK
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _hash_bytes(data: bytes, seed: int) -> int:
    """Spark ``Murmur3_x86_32.hashUnsafeBytes``: aligned 4-byte little-endian
    words, then each TAIL BYTE gets its own full mix round (sign-extended) —
    unlike standard murmur3's accumulate-then-mix tail.  Returns the signed
    int32 Spark produces."""
    h1 = seed & _MASK
    n = len(data) & ~3
    for i in range(0, n, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(data[i:i + 4], "little")))
    for i in range(n, len(data)):
        b = data[i]
        if b >= 0x80:
            b -= 0x100
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    h1 = _fmix(h1, len(data))
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def spark_hash32(*values: str, seed: int = 42) -> int:
    """``F.hash(col1, col2, ...)`` for string columns: each column's hash
    seeds the next (signed int32 result)."""
    h = seed
    for v in values:
        h = _hash_bytes(v.encode("utf-8"), h)
    return h


def dense_id_order(rows, key_values, n_buckets: int = 64):
    """Sort ``rows`` into the id order produced by
    ``deterministic_dense_ids(df, sort_cols, ...)``: hash-bucket on the sort
    key (``pmod(hash(*sort_cols), n_buckets)``), then the sort key within
    each bucket, buckets concatenated in index order.  ``key_values(row)``
    must return the tuple of sort-column string values."""
    def order_key(row):
        vals = key_values(row)
        return (spark_hash32(*vals) % n_buckets, vals)

    return sorted(rows, key=order_key)


def fit_testdata_model(sf_dir: str, passes: int = 1, label_qualify: bool = True,
                       perturbed: bool = False):
    """Replay ``plans.testdata_queries._fit_derived_model`` (or, with
    ``perturbed=True``, ``_fit_perturbed_model`` — the anomaly query's KG)
    without a JVM: DuckDB computes the derived KG (same SQL the correctness
    oracles use), the rows are ordered exactly as the Spark path's
    ``deterministic_dense_ids`` orders them, and the pure-Python engine fits
    the model.  Returns ``(LocalKG, SummaryModel)``."""
    import duckdb

    from kgist_spark.oracle.engine import GreedySearcher
    from kgist_spark.oracle.kg import LocalKG
    from kgist_spark.plans.testdata_queries import (
        DERIVED_LABELS_SQL, DERIVED_TRIPLES_SQL, PERTURBED_TRIPLES_SQL)

    con = duckdb.connect()
    for t in ("customer", "supplier", "orders", "lineitem", "part", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    triples = con.execute(
        PERTURBED_TRIPLES_SQL if perturbed else DERIVED_TRIPLES_SQL
    ).fetchall()
    label_pairs = con.execute(DERIVED_LABELS_SQL).fetchall()
    con.close()

    # labels: per-node sorted distinct label tuple, node rows in line_no order
    by_node: dict = {}
    for node, label in label_pairs:
        by_node.setdefault(node, set()).add(label)
    label_rows = [
        (node, tuple(sorted(labels))) for node, labels in by_node.items()
    ]
    label_rows = dense_id_order(label_rows, lambda r: (r[0],))

    # edges in eid order
    edge_rows = dense_id_order(triples, lambda r: r)

    kg = LocalKG.from_rows(label_rows, edge_rows, idify=True)
    model = GreedySearcher(kg).build_model(
        passes=passes, label_qualify=label_qualify
    )
    return kg, model
