"""X6 — explicit salting for skewed aggregations.

AQE's skew handling splits skewed *join* partitions; it does not help a
single hot *group key* in aggregations whose state can't be partially
combined map-side (``countDistinct``, ``collect_set``).  These helpers run
the classic two-phase scheme: phase 1 aggregates by (key, salt) — spreading
one hot key over ``n_salts`` reducers — phase 2 merges the partials by key.

The salt is derived deterministically from the *value* column (same value →
same salt), which keeps distinct-counting exact: phase 1 dedupes within a
salt bucket, phase 2 sums disjoint bucket counts.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(df: DataFrame, group_cols: List[str], value_col: str,
                          n_salts: int = 32, out_col: str = "n_distinct") -> DataFrame:
    """Exact countDistinct(value) per group, skew-safe.

    Deterministic value-derived salt ⇒ each distinct value lands in exactly
    one (key, salt) bucket ⇒ bucket distinct-counts are disjoint and sum to
    the true distinct count.
    """
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.select(*group_cols, F.col(value_col), salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.countDistinct(value_col).alias("_partial"))
    )
    return (
        phase1.groupBy(*group_cols)
        .agg(F.sum("_partial").alias(out_col))
    )


def salted_sum(df: DataFrame, group_cols: List[str], value: Column,
               n_salts: int = 32, out_col: str = "total",
               spread_col: str | None = None) -> DataFrame:
    """Two-phase sum per group. Partial aggregation already combines sums
    map-side, so this matters when upstream operators (e.g. a preceding
    explode) defeat map-side combining; the salt spreads reducers."""
    spread = F.col(spread_col) if spread_col else F.spark_partition_id()
    salt = F.pmod(F.hash(spread), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.select(*group_cols, value.alias("_v"), salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return phase1.groupBy(*group_cols).agg(F.sum("_partial").alias(out_col))
