"""Deterministic hash-gated sampling and stratified data mixing.

Training-data pipelines re-weight a corpus by sampling each stratum
(language, source, quality band) at its own rate.  At 100 TB the naive
``df.sample(rate)`` / ``rand() < rate`` is the wrong tool twice over:

* **Not retry-safe.**  ``rand()`` is re-evaluated per task *attempt*, so a
  speculative re-execution or a lost-shuffle recompute samples a DIFFERENT
  subset — downstream stages see rows appear and disappear between stages
  of the same job.  A hash gate is a pure function of the row key: every
  attempt, every rerun, every engine picks the same rows.
* **Not reproducible across runs/engines.**  Re-running the mix job (or
  auditing it from another engine) must select byte-identical subsets; a
  seeded RNG only reproduces under the same partitioning, which a 100 TB
  AQE-replanned job does not guarantee.

The gate: ``md5(salt || key)``'s first 8 hex chars, compared as a string
against the 8-hex-digit threshold ``floor(rate * 16^8)``.  md5 is uniform
on that 32-bit prefix, so P(keep) = rate to within 2^-32, exactly equal in
any engine that computes md5 of the same UTF-8 bytes (Spark and DuckDB
both do).  Everything is a scalar JVM expression — no shuffle, no UDF, no
state; the filter fuses into the scan's WholeStageCodegen and the sampled
fraction never leaves the executor.

Per-stratum rates compile to one CASE chain over threshold literals
(strata counts are small — languages, sources), so stratified mixing costs
the same single pass.  Changing ``salt`` draws an independent sample
(e.g. per epoch) without touching the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 16 ** 8  # 32-bit hex prefix


def rate_threshold(rate: float) -> str:
    """8-hex-digit string threshold with P(md5_prefix < threshold) = rate
    (exact to 2^-32).  Clamped to [0, 1]."""
    n = int(max(0.0, min(1.0, rate)) * _SPACE)
    if n >= _SPACE:  # rate == 1.0: 'ffffffff' must pass -> threshold past it
        return "g"  # > any hex char; compares after 'f' in ASCII
    return format(n, "08x")


def hash_gate(key: Column, rate: float, salt: str = "") -> Column:
    """Boolean keep-gate: deterministic in (salt, key), true with
    probability ``rate``.  Pure scalar expression (codegen-friendly)."""
    prefix = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)
    return prefix < F.lit(rate_threshold(rate))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Keep each row with its stratum's rate, deterministically in
    (salt, key).  One scan, no shuffle; unknown strata use
    ``default_rate``.  Rows keep their full schema."""
    prefix = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
    )
    threshold = F.lit(rate_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(rate_threshold(rate))
        ).otherwise(threshold)
    return df.where(prefix < threshold)


def mixture_report(df: DataFrame, strata_col: str,
                   weight_col: str | None = None) -> DataFrame:
    """Per-stratum mix report (rows + optional weight sum, e.g. chars or
    tokens) — the before/after audit of a sampling pass.  Partial
    aggregation map-side; output is |strata| rows."""
    aggs = [F.count("*").alias("n_rows")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("total_weight"))
    return df.groupBy(strata_col).agg(*aggs)


def domain_cap(df: DataFrame, key_col: str, domain_col: str, cap: int,
               salt: str = "") -> DataFrame:
    """Keep at most ``cap`` rows per domain, chosen DETERMINISTICALLY: rows
    rank by ``md5(salt || key)`` within their domain (ties — md5 collisions
    — broken by the key itself, so the order is total), and ranks > cap
    drop.  The per-domain cap is the RefinedWeb/CCNet guard against a
    single crawled site dominating the training mix; the hash ranking makes
    the kept subset independent of partitioning, retry, and engine, like
    every sampling gate in this module.  Output adds the 1-based ``rk``.

    Scale shape: ONE shuffle (the window partition on the domain).  A
    mega-domain (10^8 docs of one host) serializes its rank pass on one
    task — WindowExec buffers spill, so it completes, but for known-hot
    domains the cheap escape is a ``hash_gate`` pre-thin at a rate that
    leaves ~10x the cap before the exact window (two-phase: approximate
    thin, exact cap), which this function leaves to the caller because the
    rate needs a domain-size estimate."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= cap)
    )


def distribution_report(df: DataFrame, strata_col: str, value_col: str,
                        percentiles=(0.25, 0.50, 0.75, 0.95)) -> DataFrame:
    """EXACT interpolated percentiles of an integer-valued column per
    stratum — ``(stratum, n_rows, p25, p50, p75, p95)`` — computed the
    scale-safe way: a value HISTOGRAM plus a cumulative window, never a
    per-group buffer of raw values.

    Spark's built-in exact ``percentile`` aggregate buffers every value of
    a group in one task's memory — the usual OOM on a 10^10-row stratum.
    Here the only per-group state is one row per DISTINCT value: groupBy
    (stratum, value) with map-side partials, a running count over the
    value-ordered histogram, and each requested percentile resolved by
    locating the two bracketing positions ``floor/ceil(p * (n-1))`` in the
    cumulative ranges (a broadcast non-equi join of 4 target rows per
    stratum against the histogram).  Interpolation is the standard
    ``lo + frac * (hi - lo)`` — exactly DuckDB's ``quantile_cont``, which
    the oracle uses, so the report is hash-checkable.  For a stratum whose
    DISTINCT-value count itself explodes (true continuous data), the
    escape is pre-bucketing values to fixed precision — the same plan with
    a documented quantization error instead of a memory bound."""
    from pyspark.sql.window import Window

    s, v = F.col(strata_col), F.col(value_col)
    # NULL values are excluded from BOTH the histogram and the totals:
    # DuckDB's quantile_cont ignores NULLs, while Spark's window would
    # order them FIRST and shift every percentile position — leaving them
    # in silently de-syncs the oracle on nullable columns
    df = df.where(v.isNotNull())
    hist = df.groupBy(strata_col, value_col).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy(strata_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranges = hist.select(
        s.alias("stratum"), v.cast("double").alias("val"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("lo_pos"),
        (F.sum("cnt").over(w) - 1).alias("hi_pos"),
    )
    totals = df.groupBy(strata_col).agg(F.count("*").alias("n_rows"))
    targets = totals.select(
        s.alias("stratum"), "n_rows",
        F.explode(F.array(*[F.lit(float(p)) for p in percentiles])).alias("p"),
    ).select(
        "stratum", "n_rows", "p",
        (F.col("p") * (F.col("n_rows") - 1)).alias("r"),
    ).select(
        "stratum", "n_rows", "p",
        F.floor("r").alias("k_lo"), F.ceil("r").alias("k_hi"),
        (F.col("r") - F.floor("r")).alias("frac"),
    )
    lo = ranges.select(
        F.col("stratum").alias("s_lo"), F.col("val").alias("v_lo"),
        F.col("lo_pos").alias("lo_from"), F.col("hi_pos").alias("lo_to"),
    )
    hi = ranges.select(
        F.col("stratum").alias("s_hi"), F.col("val").alias("v_hi"),
        F.col("lo_pos").alias("hi_from"), F.col("hi_pos").alias("hi_to"),
    )
    vals = (
        F.broadcast(targets)
        .join(lo, (F.col("stratum") == F.col("s_lo"))
              & (F.col("lo_from") <= F.col("k_lo"))
              & (F.col("k_lo") <= F.col("lo_to")))
        .join(hi, (F.col("stratum") == F.col("s_hi"))
              & (F.col("hi_from") <= F.col("k_hi"))
              & (F.col("k_hi") <= F.col("hi_to")))
        .select(
            "stratum", "n_rows", "p",
            F.round(
                F.col("v_lo") + F.col("frac") * (F.col("v_hi") - F.col("v_lo")),
                5,
            ).alias("val"),
        )
    )
    aggs = [
        F.max(F.when(F.col("p") == float(p), F.col("val")))
        .alias(f"p{int(round(p * 100))}")
        for p in percentiles
    ]
    return vals.groupBy("stratum").agg(F.max("n_rows").alias("n_rows"), *aggs)


#: priority randomizer resolution: u is a 40-bit integer in [1, 2^40], so
#: priority = weight * 2^40 DIV u sits in WEIGHT units (>= weight, <= 2^40 *
#: weight) and stays inside int64 for weights up to 2^23 (~8.4M — char/token
#: counts, not byte totals)
_PRI_SCALE = 1 << 40


def priority_sample(df: DataFrame, k: int, weight_col: str,
                    key_col: str, salt: str = "") -> DataFrame:
    """Deterministic PRIORITY SAMPLING (Duffield, Lund & Thorup, JACM 2007)
    — the weighted fixed-k sample behind "pick k documents proportional to
    length, but keep subset-sum estimates unbiased": each row draws
    ``u in [1, 2^40]`` deterministically (md5 of ``(salt, key)``), gets
    priority ``q = weight * 2^40 DIV u`` (q >= weight, in weight units),
    and the sample is the k LARGEST q with threshold ``tau`` = the
    (k+1)-th.  Each sampled row carries the Horvitz–Thompson contribution
    ``est_weight = greatest(weight, tau)``: summing it over any subset of
    the sample estimates that subset's true total weight, unbiased up to
    the one-unit truncation of the integer division (the float scheme's
    exact property; the truncation error is < 1 weight unit per row).
    With ``<= k`` input rows there is no threshold and ``est_weight =
    weight`` exactly (the scheme's exhaustive case).

    Output: ``(key_col, weight, priority, est_weight)`` — every column a
    BIGINT, ties in ``q`` broken by ``key_col``, so the sampled SET,
    ``tau``, and every estimate replay bit-for-bit in any engine with md5.

    Scale shape: priorities are one codegen projection; the global
    top-(k+1) is a TakeOrderedAndProject (per-partition partial top-k,
    O(k) rows to the final reduce — no full sort, no corpus-wide window);
    ``tau`` re-attaches through a broadcast of a 1-row table.  Weights
    must be positive and < 2^23; rows violating that are the caller's
    contract (the int64 bound above).
    """
    from pyspark.sql.window import Window

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
                1, 10,
            ),
            16, 10,
        ).cast("long")
        + 1
    )
    pri = df.select(
        F.col(key_col),
        F.col(weight_col).cast("long").alias("weight"),
        u.alias("u"),
    ).select(
        key_col,
        "weight",
        F.expr(f"weight * {_PRI_SCALE} DIV u").alias("priority"),
    )
    # pin the k+1 survivors: both consumers below (the sample rows AND the
    # tau threshold) read this result, and without the checkpoint each
    # branch would re-run the WHOLE corpus top-k scan — two passes over
    # 100 TB for one sample
    top = pri.orderBy(F.desc("priority"), F.col(key_col)) \
        .limit(k + 1).localCheckpoint()
    # rank within the k+1 survivors (tiny: bounded by k+1 rows, so the
    # unpartitioned window is a k-row sort, not a corpus collapse)
    w = Window.orderBy(F.desc("priority"), F.col(key_col))
    ranked = top.withColumn("rn", F.row_number().over(w))
    # 0 rows (input <= k) -> max() yields one NULL row; coalesce -> weight
    tau = ranked.where(F.col("rn") == k + 1).groupBy().agg(
        F.max("priority").alias("tau")
    )
    return (
        ranked.where(F.col("rn") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            key_col,
            "weight",
            "priority",
            F.greatest("weight", F.coalesce("tau", F.lit(0)))
            .cast("long")
            .alias("est_weight"),
        )
    )


def hash_split(df: DataFrame, key_col: str,
               fractions: "list[tuple[str, float]]" = (
                   ("train", 0.98), ("val", 0.01), ("test", 0.01)),
               salt: str = "") -> DataFrame:
    """Deterministic disjoint-and-complete train/val/test assignment —
    the split every training pipeline needs, with the properties random
    splits lose at scale: a row's split is a pure function of
    ``(salt, key)`` (stable under repartitioning, retries, engine swaps,
    and INCREMENTAL growth — new crawl batches land in the same splits
    without touching old rows), splits are exactly disjoint and cover
    every row (interval partition of one hash space, unlike independent
    per-split `hash_gate` draws which can double-assign or drop), and
    leakage checks reduce to key equality.

    ``fractions`` is an ordered ``(name, fraction)`` list; each split
    owns the half-open md5-prefix interval of cumulative width, the LAST
    split absorbing the remainder (so fractions need not sum to 1.0
    exactly).  Output: every input row as ``(key, split)``.

    100 TB shape: one zero-shuffle codegen projection — no sampling
    state, no count pass, nothing to coordinate."""
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    prefix = F.substring(F.md5(key), 1, 8)
    cum = 0.0
    expr = None
    cases = []
    for name, frac in list(fractions)[:-1]:
        cum += frac
        cases.append((rate_threshold(cum), name))
    expr = F.lit(list(fractions)[-1][0])
    for thr, name in reversed(cases):
        expr = F.when(prefix < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.select(F.col(key_col), expr.alias("split"))


def hash_split_oracle_sql(table: str, key_col: str,
                          fractions: "list[tuple[str, float]]" = (
                              ("train", 0.98), ("val", 0.01), ("test", 0.01)),
                          salt: str = "") -> str:
    """DuckDB replay of :func:`hash_split`: identical md5 prefix,
    identical cumulative string thresholds, identical last-split
    remainder."""
    cum, whens = 0.0, []
    for name, frac in list(fractions)[:-1]:
        cum += frac
        whens.append(
            f"WHEN substr(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 8)"
            f" < '{rate_threshold(cum)}' THEN '{name}'"
        )
    last = list(fractions)[-1][0]
    return (
        f"SELECT {key_col}, CASE {' '.join(whens)} ELSE '{last}' END AS split"
        f" FROM {table}"
    )


def mixture_plan(docs: DataFrame, weights: "list[tuple[str, int]]",
                 token_budget: int, source_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """The training-mixture planning table — the arithmetic between a
    corpus report and the samplers: given per-source mixture weights
    (parts-per-million, the literal mixture spec) and a total token
    budget, emit per source the available tokens, the target share, and
    the DETERMINISTIC sampling rate to hand
    :func:`stratified_sample` — ``(src, n_tokens, weight_x1e6,
    target_tokens, rate_x1e6, planned_tokens, deficit_tokens)``.

    ``rate_x1e6 = min(1e6, target*1e6 div available)`` — truncating
    integer arithmetic throughout; an under-provisioned source (deficit
    > 0) caps at rate 1.0 and reports its shortfall instead of silently
    upsampling (epoch-repeat decisions are a POLICY, left to the
    caller — the no-silent-caps contract applied to mixtures).  Sources
    absent from ``weights`` get weight 0 (rate 0, fully dropped, still
    listed).

    Scale shape: one map-side token rollup per source + a broadcast of
    the |weights|-row spec."""
    spark = docs.sparkSession
    toks = docs.groupBy(F.col(source_col).alias("src")).agg(
        F.expr(
            f"CAST(sum(size(split(trim({text_col}), '\\\\s+'))) AS BIGINT)"
        ).alias("n_tokens")
    )
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in weights], "src string, weight_x1e6 long"
    )
    j = toks.join(F.broadcast(wdf), "src", "left").select(
        "src", "n_tokens",
        F.coalesce("weight_x1e6", F.lit(0)).cast("long").alias("weight_x1e6"),
    )
    return j.select(
        "src", "n_tokens", "weight_x1e6",
        F.expr(f"CAST({token_budget} * weight_x1e6 div 1000000 AS BIGINT)")
        .alias("target_tokens"),
    ).select(
        "*",
        F.expr(
            "CAST(CASE WHEN n_tokens = 0 THEN 0"
            " ELSE least(CAST(1000000 AS BIGINT),"
            " target_tokens * 1000000 div n_tokens) END AS BIGINT)"
        ).alias("rate_x1e6"),
    ).select(
        "*",
        F.expr(
            "CAST(n_tokens * rate_x1e6 div 1000000 AS BIGINT)"
        ).alias("planned_tokens"),
        F.expr(
            "CAST(greatest(CAST(0 AS BIGINT), target_tokens -"
            " n_tokens * rate_x1e6 div 1000000) AS BIGINT)"
        ).alias("deficit_tokens"),
    )


def mixture_plan_oracle_sql(weights: "list[tuple[str, int]]",
                            token_budget: int,
                            table: str = "documents") -> str:
    """DuckDB replay of :func:`mixture_plan`: identical token rollup,
    identical truncating rate/deficit arithmetic, identical weight
    spec literals."""
    vals = ", ".join(f"('{s}', {int(w)})" for s, w in weights)
    return rf"""
    WITH toks AS (
        SELECT source AS src,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                    AS BIGINT) AS n_tokens
        FROM {table} GROUP BY source
    ),
    w(src, weight_x1e6) AS (VALUES {vals}),
    j AS (
        SELECT t.src, t.n_tokens,
               CAST(COALESCE(w.weight_x1e6, 0) AS BIGINT) AS weight_x1e6
        FROM toks t LEFT JOIN w ON t.src = w.src
    ),
    tgt AS (
        SELECT *, CAST({token_budget} * weight_x1e6 // 1000000 AS BIGINT)
                   AS target_tokens
        FROM j
    ),
    rate AS (
        SELECT *, CAST(CASE WHEN n_tokens = 0 THEN 0
                       ELSE least(CAST(1000000 AS BIGINT),
                                  target_tokens * 1000000 // n_tokens)
                       END AS BIGINT) AS rate_x1e6
        FROM tgt
    )
    SELECT src, n_tokens, weight_x1e6, target_tokens, rate_x1e6,
           CAST(n_tokens * rate_x1e6 // 1000000 AS BIGINT)
               AS planned_tokens,
           CAST(greatest(CAST(0 AS BIGINT), target_tokens -
                n_tokens * rate_x1e6 // 1000000) AS BIGINT)
               AS deficit_tokens
    FROM rate
    """
