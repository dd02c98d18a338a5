"""MinHash-LSH blocking (X3) — generic near-duplicate candidate generation.

Used by stage-2 entity canonicalization (character shingles over surface
forms) and by document-level near-dedup (word shingles over document text).

Everything is JVM-side column expressions: shingling via
``transform(sequence(...), substring)``, the minhash signature as ``num_perm``
independent ``min(hash(shingle, seed))`` aggregates (Murmur3 via ``F.hash``
with a per-permutation salt column), banding via ``hash`` over signature
slices.  No Python in the hot path, deterministic across runs/partitionings.

Scale shape: one shuffle to aggregate signatures per key, one shuffle to
group band buckets; candidate pairs explode only within buckets (quadratic
only in bucket size, bounded by ``max_bucket`` to cap blowup from degenerate
buckets — the documented coverage loss is logged by callers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct character k-grams per id (JVM-side)."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substring({text_col}, i, {k}))"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .where(F.length("shingle") > 0)
        .distinct()
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct lowercase word k-gram shingles per id."""
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(lower({text_col}), '\\\\s+')) - {k - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split(lower({text_col}), '\\\\s+'), i, {k})))"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .where(F.length("shingle") > 0)
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, num_perm: int = 32) -> DataFrame:
    """``(id, sig array<int>)`` — num_perm min-hash aggregates in one pass."""
    aggs = [
        F.min(F.hash(F.col("shingle"), F.lit(p))).alias(f"h{p}") for p in range(num_perm)
    ]
    wide = shingles.groupBy("id").agg(*aggs)
    return wide.select("id", F.array(*[f"h{p}" for p in range(num_perm)]).alias("sig"))


def lsh_buckets(signatures: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """``(id, band, bucket)`` — one row per band; bucket = hash of the band's
    signature slice.

    All band hashes are computed in ONE projection and exploded — a union of
    per-band projections would make Catalyst re-execute the upstream
    signature aggregation once per band (union children are independent
    subtrees; same pitfall as the pre-explode candidate generation)."""
    assert bands * rows_per_band <= 256
    entries = []
    for b in range(bands):
        lo = b * rows_per_band
        band_slice = F.slice(F.col("sig"), lo + 1, rows_per_band)
        entries.append(
            F.struct(
                F.lit(b).alias("band"),
                F.hash(band_slice.cast("array<int>")).alias("bucket"),
            )
        )
    return (
        signatures.select("id", F.explode(F.array(*entries)).alias("bb"))
        .select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )


def candidate_pairs(buckets: DataFrame, max_bucket: int = 64,
                    drop_stats=None) -> DataFrame:
    """Distinct unordered id pairs sharing any band bucket.  Buckets larger
    than ``max_bucket`` are dropped (degenerate hot buckets).

    Hot buckets are sized and dropped BEFORE any per-bucket collection: a
    spill-safe window count over (band, bucket) tags every row with its
    bucket size (``WindowExec`` buffers partitions in a spillable row array),
    and only rows of surviving buckets reach ``collect_set`` — a
    ``collect_set``-then-filter would materialize a degenerate bucket's
    entire id set in one aggregation buffer first, which is exactly the
    executor-OOM this cap exists to prevent.  The window and the follow-up
    group-by share one hash partitioning on (band, bucket), so this is still
    a single shuffle.

    No silent caps: the drops are ALWAYS counted — pass a
    ``pyspark.sql.Observation`` as ``drop_stats`` (or read the one this
    function creates and attaches to the result as ``._drop_stats``) to get
    ``{"dropped_buckets": n, "dropped_ids": m}`` after the first action on
    the result.  The metrics ride the rows already flowing through the plan
    (``observe`` adds NO extra job or shuffle, unlike a second count, which
    would re-run the whole upstream pipeline at 100 TB).
    :func:`log_drop_stats` turns the observation (or the carrying
    DataFrame) into a log line once the query has run."""
    from pyspark.sql import Observation
    from pyspark.sql.window import Window

    if drop_stats is None:
        drop_stats = Observation()
    wp = Window.partitionBy("band", "bucket").orderBy("id")
    sized = buckets.select(
        "id", "band", "bucket",
        F.count("*").over(
            wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
        F.row_number().over(wp).alias("rn"),
    )
    hot = F.col("n") > max_bucket
    sized = sized.observe(
        drop_stats,
        F.coalesce(
            F.sum((hot & (F.col("rn") == 1)).cast("long")), F.lit(0)
        ).alias("dropped_buckets"),
        F.coalesce(F.sum(hot.cast("long")), F.lit(0)).alias("dropped_ids"),
    )
    ok = (
        sized.where((F.col("n") >= 2) & (F.col("n") <= max_bucket))
        .groupBy("band", "bucket")
        .agg(F.collect_set("id").alias("ids"))
    )
    pairs = ok.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) ->"
                " transform(slice(ids, i + 2, size(ids)), y ->"
                " struct(least(x, y) as a, greatest(x, y) as b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pairs = pairs.distinct()
    pairs._drop_stats = drop_stats
    return pairs


def log_drop_stats(observation, context: str) -> dict:
    """Log (and return) the drop metrics captured by an ``Observation``
    passed to a capped candidate-generation path — or by the DataFrame a
    capped path returned (every one carries its observation as
    ``._drop_stats``).  Call AFTER an action has run on the returned
    DataFrame (``Observation.get`` blocks until then)."""
    import logging

    observation = getattr(observation, "_drop_stats", observation)
    try:
        got = dict(observation.get)
    except Exception as exc:
        # a degenerate input can let AQE's empty-relation propagation prune
        # the CollectMetrics node — the observation row then never
        # materializes and PySpark's JVM-side fetch raises EXACTLY
        # "toPyRow ... java.lang.AssertionError: assertion failed"
        # (signature reproduced under spark 4.1.2 with the engine-wide
        # AQEPropagateEmptyRelation exclusion lifted).  Nothing flowed, so
        # nothing was dropped.  ONLY that signature stays at debug — a
        # looser match (any "assert"/"IllegalState" substring) would
        # swallow real failures like a stopped-SparkContext
        # IllegalStateException; anything else (py4j connection loss, get
        # before any action, ...) is a REAL failure of the drop-accounting
        # contract and must stay visible, so it logs at warning with the
        # exception text.
        msg = str(exc)
        collapsed = "toPyRow" in msg and "AssertionError" in msg
        log = logging.getLogger(__name__)
        if collapsed:
            log.debug(
                "%s: drop observation unavailable (plan collapsed on a "
                "degenerate input); treating as zero drops", context)
        else:
            log.warning(
                "%s: drop observation FAILED (%s: %s) — drop accounting "
                "for this run is unknown, not zero",
                context, type(exc).__name__, msg.splitlines()[0] if msg else "")
        return {}
    if got.get("dropped_buckets"):
        logging.getLogger(__name__).warning(
            "%s: dropped %d hot buckets (%d id occurrences) over max_bucket — "
            "pairs confined to those buckets are not reported",
            context, got["dropped_buckets"], got["dropped_ids"],
        )
    return got


def jaccard_verified_pairs(pairs: DataFrame, shingles: DataFrame,
                           threshold: float) -> DataFrame:
    """Exact-Jaccard filter over candidate pairs: |∩|/|∪| >= threshold.
    Shuffles only candidate-pair shingles (semi-joined), not the full corpus."""
    sizes = shingles.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        pairs.join(shingles.select(F.col("id").alias("a"), "shingle"), "a")
        .join(shingles.select(F.col("id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col("id").alias("a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
