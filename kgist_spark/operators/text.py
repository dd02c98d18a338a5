"""Text-analysis operators over document tables (training-data pipeline ops).

All JVM-side column expressions (no Python in the hot path): token counting,
quality scoring, n-gram language scoring, exact-dedup grouping, and a
rolling-hash document fingerprint.  Float outputs are rounded to 5 decimals
so results are engine-comparable (the driver's DuckDB oracle hashes values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "of", "and", "a", "to", "in")


def tokens(col: str) -> Column:
    return F.split(F.trim(F.col(col)), r"\s+")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: counts + average token length."""
    t = tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_text"),
        F.round(
            F.aggregate(t, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x))
            / F.size(t),
            5,
        ).alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: stopword ratio, unique-token ratio,
    punctuation ratio; plus a combined score."""
    t = tokens(text_col)
    stop_array = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_array, x)))
    n_unique = F.size(F.array_distinct(t))
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[.,;:!?]", "")
    )
    return docs.select(
        F.col(id_col),
        F.round(n_stop / F.size(t), 5).alias("stopword_ratio"),
        F.round(n_unique / F.size(t), 5).alias("unique_ratio"),
        F.round(n_punct / F.length(F.col(text_col)), 5).alias("punct_ratio"),
        F.round(
            (n_stop / F.size(t)) * 0.5 + (n_unique / F.size(t)) * 0.5, 5
        ).alias("quality"),
    )


def english_char_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """n-gram-free language-ID heuristic: share of characters drawn from the
    high-frequency English set."""
    kept = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "[etaoinshr ]", "")
    )
    return docs.select(
        F.col(id_col),
        F.round(kept / F.length(F.col(text_col)), 5).alias("eng_score"),
    )


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by content hash; only groups with >1 member."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                    modulus: int = 1_000_003) -> DataFrame:
    """Deterministic rolling-hash fingerprint: polynomial hash of token hash
    codes (order-sensitive, content-defined)."""
    t = tokens(text_col)
    fp = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(31) + F.pmod(F.hash(x), F.lit(modulus)), F.lit(modulus)),
    )
    return docs.select(F.col(id_col), fp.alias("fingerprint"))


#: portable "BPE-ish" pre-tokenization: alpha runs, digit runs, single
#: punctuation marks.  The same RE2/Java-compatible pattern runs verbatim in
#: the DuckDB oracle.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Regex pre-tokenizer statistics: total/unique token counts and the
    share of purely-alphabetic tokens."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
    words = F.filter(toks, lambda x: x.rlike("^[A-Za-z]+$"))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_bpe"),
        F.round(F.size(words) / F.size(toks), 5).alias("word_ratio"),
    )


#: language -> characteristic function-word set (deterministic spec; the
#: point is a fixed, engine-portable scoring rule, not linguistic accuracy)
LANG_PROFILES = (
    ("en", ("the", "a", "of", "and", "to", "in")),
    ("de", ("der", "die", "das", "und", "ist", "nicht")),
    ("fr", ("le", "la", "et", "les", "des", "est")),
)


def lang_id_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Function-word language ID: per-language stopword-hit ratio over the
    whitespace tokens plus the argmax prediction (ties broken by profile
    order: en, de, fr)."""
    t = tokens(text_col)
    cols = [F.col(id_col)]
    scores = []
    for lang, words in LANG_PROFILES:
        arr = F.array(*[F.lit(w) for w in words])
        score = F.round(
            F.size(F.filter(t, lambda x: F.array_contains(arr, x))) / F.size(t), 5
        )
        scores.append((lang, score))
        cols.append(score.alias(f"score_{lang}"))
    best = scores[0][1]
    pred = F.lit(scores[0][0])
    for lang, score in scores[1:]:
        pred = F.when(score > best, F.lit(lang)).otherwise(pred)
        best = F.when(score > best, score).otherwise(best)
    cols.append(pred.alias("pred_lang"))
    return docs.select(*cols)


def doc_fingerprint_md5(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        modulus: int = 1_000_003) -> DataFrame:
    """Engine-portable rolling-hash fingerprint: left fold of
    ``acc*31 + md5_prefix(token)`` mod ``modulus`` over the whitespace
    tokens.  Unlike :func:`doc_fingerprint` (which uses Spark's xxhash-based
    ``hash()``), every term here is reproducible in any engine with md5."""
    t = tokens(text_col)
    code = lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
    fp = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(31) + F.pmod(code(x), F.lit(modulus)), F.lit(modulus)),
    )
    return docs.select(F.col(id_col), fp.alias("fingerprint"))


def word_ngrams(text_col: str, n: int) -> Column:
    """Array of space-joined word ``n``-grams of the whitespace tokens
    (empty when the document has fewer than ``n`` tokens — NOT truncated
    shorter grams; ``sequence(1, k)`` with k < 1 would count DOWN, so the
    short case is gated explicitly)."""
    t = f"split(trim({text_col}), '\\\\s+')"
    return F.expr(
        f"CASE WHEN size({t}) >= {n} THEN"
        f" transform(sequence(1, size({t}) - {n - 1}),"
        f" i -> array_join(slice({t}, i, {n}), ' '))"
        f" ELSE CAST(array() AS array<string>) END"
    )


def ngram_decontaminate(corpus: DataFrame, benchmark: DataFrame, n: int = 5,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: per corpus document, how many of its
    distinct word ``n``-grams also appear in the benchmark set (the
    GPT-3/PaLM-style train/test-overlap check — distinct from DEDUP, which
    is within-corpus; this is cross-corpus against a small eval set).

    Output: ``(id, n_doc_grams, n_hits, contaminated)``.

    100 TB shape: the benchmark side is small by nature (eval sets are
    thousands of documents), so its distinct-gram table BROADCASTS and the
    corpus side never shuffles its exploded grams — ``array_distinct``
    dedupes grams inside the row (no distinct-shuffle over the exploded
    stream), the broadcast left join tags hits in-map, and the final
    ``groupBy(id)`` partially aggregates each document's rows back to one
    before the only shuffle, which therefore moves O(|documents|) rows,
    not O(|grams|).

    ``n_doc_grams`` is COUNTED from the exploded rows already flowing
    through the aggregation, never projected as ``size(grams)`` next to the
    explode: CollapseProject pushes such a projection BELOW the Generate,
    re-evaluating the whole gram construction (split + n-gram transform +
    array_distinct) once per exploded row instead of once per document —
    measured 169 s -> 1.4 s warm at sf0.1 when removed.  The corpus scan fans
    out first (one small parquet file = one scan partition serializing the
    per-document gram work; no-op on an already-wide scan)."""
    from kgist_spark.operators.dedup import fan_out_scan

    grams = F.array_distinct(word_ngrams(text_col, n))
    bench_grams = (
        benchmark.select(F.explode(grams).alias("gram")).distinct()
        .withColumn("hit", F.lit(1))
    )
    cg = fan_out_scan(corpus.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode_outer(grams).alias("gram"),
    )
    return (
        cg.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_doc_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .select(
            id_col, "n_doc_grams", "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Within-document repetition filters (the Gopher/MassiveText quality
    gates): duplicate-bigram fraction, most-frequent-bigram share, and
    duplicate-trigram fraction.  Heavily repetitive machine-generated text
    scores high and gets dropped before training.

    All in-row array expressions (grams never explode, the only exchange is
    the conditional narrow-scan fan-out); documents shorter than the gram
    size yield NULL fractions rather than divide-by-zero.

    The gram arrays are LET-BOUND via ``transform(array(struct(bg, tg)),
    r -> ...)[0]`` so each is constructed exactly once per document: naming
    them in a separate projection instead lets CollapseProject inline the
    construction into every consumer — inside the O(distinct-grams) lambda
    of the top-bigram count that re-evaluates the whole split+n-gram
    pipeline per distinct gram (measured 7.3 s -> 0.9 s at sf0.1)."""
    from kgist_spark.operators.dedup import fan_out_scan

    def dup_frac(g):
        return F.when(
            F.size(g) > 0,
            F.round(1 - F.size(F.array_distinct(g)) / F.size(g), 5),
        )

    def stats(r):
        bg, tg = r["bg"], r["tg"]
        top = F.array_max(
            F.transform(
                F.array_distinct(bg),
                lambda x: F.size(F.filter(bg, lambda y: y == x)),
            )
        )
        return F.struct(
            dup_frac(bg).alias("dup_bigram_frac"),
            F.when(F.size(bg) > 0, F.round(top / F.size(bg), 5))
            .alias("top_bigram_frac"),
            dup_frac(tg).alias("dup_trigram_frac"),
        )

    bound = F.transform(
        F.array(
            F.struct(
                word_ngrams(text_col, 2).alias("bg"),
                word_ngrams(text_col, 3).alias("tg"),
            )
        ),
        stats,
    )[0]
    return fan_out_scan(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        bound["dup_bigram_frac"].alias("dup_bigram_frac"),
        bound["top_bigram_frac"].alias("top_bigram_frac"),
        bound["dup_trigram_frac"].alias("dup_trigram_frac"),
    )


def pmi_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              window: int = 5, min_count: int = 10, k: int = 50,
              pmi_scale: int = 1_000_000) -> DataFrame:
    """Top-k within-window token pairs by pointwise mutual information —
    the classic relation-discovery signal (Church & Hanks 1990) a KG
    pipeline mines to PROPOSE predicates before pattern extraction runs.

    A pair is counted once per ordered position pair ``(i, j)`` with
    ``i < j <= i + window``, normalized to ``(least, greatest)`` so the
    co-occurrence is undirected.  PMI uses corpus totals::

        pmi = log2( (c_ab / P) / ((c_a / N) * (c_b / N)) )

    with N = total token occurrences, P = total in-window pairs.  The float
    enters exactly one per-row expression with a FIXED evaluation order
    (same literal structure in the SQL oracle) and is immediately rounded
    to an int (× ``pmi_scale``) — the ``dsir`` discipline, so rows hash
    identically across engines.  Output: ``(a, b, n_pair, pmi_x1e6)``,
    ordered by (pmi desc, a, b), limited to ``k`` (deterministic: the
    tiebreak is total on distinct pairs).

    100 TB shape: pair generation is IN-ROW (nested ``transform`` over the
    token array — O(tokens × window) values, no self-join, no Python);
    both count tables collapse map-side before their single shuffles; the
    unigram count table (vocabulary-sized) joins the pair table twice under
    AQE sizing — vocabularies are Zipf-bounded, so AQE broadcasts them in
    practice without a forced hint.  Totals ride a 1-row cross join.
    """
    t = tokens(text_col)
    pair_structs = F.flatten(
        F.transform(
            t,
            lambda x, i: F.transform(
                F.slice(t, i + 2, window),
                lambda y: F.struct(
                    F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                ),
            ),
        )
    )
    src = docs.where(F.length(F.trim(F.col(text_col))) > 0)
    pairs = src.select(F.explode(pair_structs).alias("p")).select("p.a", "p.b")
    uni = src.select(F.explode(t).alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    n_tot = uni.agg(F.sum("c").alias("n_tok"))
    pc = pairs.groupBy("a", "b").agg(F.count("*").alias("n_pair"))
    p_tot = pc.agg(F.sum("n_pair").alias("n_pairs"))
    ca = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    cb = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    return (
        pc.where(F.col("n_pair") >= min_count)
        .join(ca, "a")
        .join(cb, "b")
        .crossJoin(n_tot)
        .crossJoin(p_tot)
        .select(
            "a",
            "b",
            "n_pair",
            F.round(
                (
                    F.log2("n_pair")
                    - F.log2("n_pairs")
                    - F.log2("c_a")
                    - F.log2("c_b")
                    + F.lit(2.0) * F.log2("n_tok")
                )
                * pmi_scale
            )
            .cast("long")
            .alias("pmi_x1e6"),
        )
        .orderBy(F.col("pmi_x1e6").desc(), "a", "b")
        .limit(k)
    )


def lang_confusion(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   lang_col: str = "lang") -> DataFrame:
    """Language-ID confusion matrix — the model-eval QA table for the
    :func:`lang_id_scores` classifier against the corpus's ground-truth
    language column: ``(lang, pred_lang, n, share_of_true_x1e6)`` where
    the share is the row-normalized fraction of each TRUE language's
    documents landing on each prediction (the diagonal is per-class
    recall).  Languages outside the classifier's profile set (e.g. ``es``
    here) show exactly where their mass false-positives to — the table a
    pipeline reads before trusting a lang filter.

    Scale shape: the classifier is an in-row projection; the matrix
    collapses map-side to ≤ |langs|² rows and the normalizing window runs
    on that vocabulary-sized table."""
    from pyspark.sql.window import Window  # noqa: F401 (doc parity)

    pred = lang_id_scores(docs, id_col, text_col).select(
        F.col(id_col), "pred_lang"
    )
    j = docs.select(F.col(id_col), F.col(lang_col).alias("lang")).join(
        pred, id_col
    )
    ct = j.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    return ct.select(
        "lang",
        "pred_lang",
        "n",
        F.expr(
            "CAST(n * 1000000 div sum(n) over (partition by lang) AS BIGINT)"
        ).alias("share_of_true_x1e6"),
    )


def source_overlap(docs: DataFrame, source_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Cross-source vocabulary overlap — the corpus-comparison table that
    catches a mirror (one crawl source re-serving another's content) or
    a contaminated slice before it skews a training mixture: for every
    source pair, the distinct-token Jaccard as integer fixed point —
    ``(src_a, src_b, n_a, n_b, n_common, jaccard_x1e6)`` with
    ``src_a < src_b``.

    Scale shape: tokens distinct-collapse per (source, token) map-side
    (the df discipline); the pair intersection is a token-key self-join
    whose volume is bounded by shared-vocabulary size, aggregated
    map-side to ≤ |sources|² rows; vocabulary sizes join in from a
    |sources|-row table.  |sources| is a mixture's handful of slices,
    never corpus-scale — the heavy side is the token join, which AQE
    sizes."""
    st = (
        docs.select(F.col(source_col).alias("src"),
                    F.explode(tokens(text_col)).alias("token"))
        .distinct()
    )
    sizes = st.groupBy("src").agg(F.count("*").alias("n"))
    inter = (
        st.alias("x")
        .join(st.alias("y"),
              (F.col("x.token") == F.col("y.token"))
              & (F.col("x.src") < F.col("y.src")))
        .groupBy(F.col("x.src").alias("src_a"), F.col("y.src").alias("src_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("src", "src_a")
                   .withColumnRenamed("n", "n_a"), "src_a")
        .join(sizes.withColumnRenamed("src", "src_b")
              .withColumnRenamed("n", "n_b"), "src_b")
        .select(
            "src_a", "src_b", "n_a", "n_b", "n_common",
            F.expr(
                "CAST(n_common * 1000000 div (n_a + n_b - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_x1e6"),
        )
    )


#: fixed-point scale for per-row ln() terms in the Zipf fit: 1e3 keeps
#: the x*y products (≤ ~(15e3)² = 2.25e8 each) summable over ~4e11
#: vocabulary rows inside int64 — a 1e6 scale would overflow at 2e20
ZIPF_LOG_SCALE = 1_000


def zipf_slope(docs: DataFrame, source_col: str = "source",
               text_col: str = "text") -> DataFrame:
    """Zipf rank-frequency slope per source — the one-number "is this
    slice natural language" detector (natural text fits ln f ≈ a + s·ln r
    with s ≈ −1; template/spam/synthetic slices bend it): least-squares
    slope of ln(frequency) on ln(rank) over the source's token
    vocabulary, ``(src, n_types, n_tokens, slope_x1e6)``.

    Determinism (the assortativity/lm discipline, one step further):
    the per-row logs are fixed-pointed FIRST (``round(ln · 1e3)`` on
    exact-integer rank/frequency arguments — one log+round per
    VOCABULARY row), the four regression sums then run on int64 (order
    -free at any parallelism; the 1e3 scale cancels in the slope
    ratio), and exactly ONE float division+round produces the output.
    Rank ties break (frequency DESC, token) — replayed by the oracle.
    Sources with < 2 distinct ranks or zero x-variance (all ranks equal
    — impossible past n_types 1, kept for completeness) emit NULL and
    are filtered like event_drift, so the BIGINT column survives
    pandas.

    Scale shape: the frequency table collapses map-side; the rank
    window partitions per source over VOCABULARY rows (not corpus
    rows); the regression sums aggregate to |sources| rows."""
    from pyspark.sql.window import Window

    freq = (
        docs.select(F.col(source_col).alias("src"),
                    F.explode(tokens(text_col)).alias("token"))
        .groupBy("src", "token")
        .agg(F.count("*").alias("f"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("f"), F.asc("token"))
    ranked = freq.withColumn("r", F.row_number().over(w)).select(
        "src", "f",
        F.expr(f"CAST(round(ln(r) * {ZIPF_LOG_SCALE}) AS BIGINT)").alias("x"),
        F.expr(f"CAST(round(ln(f) * {ZIPF_LOG_SCALE}) AS BIGINT)").alias("y"),
    )
    sums = ranked.groupBy("src").agg(
        F.count("*").alias("n_types"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = F.expr(
        "CASE WHEN n_types >= 2 AND n_types * sxx - sx * sx <> 0 THEN"
        " CAST(round(1000000 * (CAST(n_types * sxy - sx * sy AS DOUBLE)"
        " / (n_types * sxx - sx * sx))) AS BIGINT) ELSE NULL END"
    )
    return sums.select(
        "src", "n_types", "n_tokens", slope.alias("slope_x1e6")
    ).where(F.col("slope_x1e6").isNotNull())


def zipf_slope_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay of :func:`zipf_slope`: identical rank tie-break,
    identical fixed-point log terms, identical single-float slope."""
    s = ZIPF_LOG_SCALE
    return rf"""
    WITH freq AS (
        SELECT src, token, COUNT(*) AS f FROM (
            SELECT source AS src,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM {table}
        ) GROUP BY src, token
    ),
    ranked AS (
        SELECT src, f,
               CAST(round(ln(ROW_NUMBER() OVER (PARTITION BY src
                        ORDER BY f DESC, token)) * {s}) AS BIGINT) AS x,
               CAST(round(ln(f) * {s}) AS BIGINT) AS y
        FROM freq
    ),
    sums AS (
        SELECT src, COUNT(*) AS n_types, CAST(SUM(f) AS BIGINT) AS n_tokens,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM ranked GROUP BY src
    )
    SELECT src, n_types, n_tokens,
           CAST(round(1000000 * (CAST(n_types * sxy - sx * sy AS DOUBLE)
                / (n_types * sxx - sx * sx))) AS BIGINT) AS slope_x1e6
    FROM sums
    WHERE n_types >= 2 AND n_types * sxx - sx * sx <> 0
    """


def corpus_report(docs: DataFrame, source_col: str = "source",
                  id_col: str = "doc_id", text_col: str = "text",
                  lang_col: str = "lang",
                  chars_col: str = "n_chars") -> DataFrame:
    """The per-source corpus QA dashboard — one row per source joining
    the rollups an operator reads before admitting a slice into a
    training mixture: volume (docs, whitespace tokens, mean chars),
    exact-duplicate mass (docs minus distinct texts — the md5 dedup
    semantics), ground-truth language concentration (dominant lang +
    share), and the Zipf slope (:func:`zipf_slope` — the natural
    -language shape check).  Every column integer or string.

    Scale shape: four independent per-source rollups (each map-side
    -combining to |sources| rows) joined on the |sources|-row key — the
    corpus is scanned by each rollup's own optimal plan rather than one
    forced mega-aggregation; at 100 TB the scans share the parquet cache
    and each prunes to exactly the columns it needs."""
    from pyspark.sql.window import Window

    base = docs.groupBy(F.col(source_col).alias("src")).agg(
        F.count("*").alias("n_docs"),
        F.expr(f"CAST(sum(size(split(trim({text_col}), '\\\\s+')))"
               " AS BIGINT)").alias("n_tokens"),
        F.expr(f"CAST(sum({chars_col}) div count(*) AS BIGINT)").alias(
            "avg_chars"),
        (F.count("*") - F.countDistinct(F.md5(F.col(text_col))))
        .cast("long").alias("n_dup_docs"),
    )
    lc = docs.groupBy(F.col(source_col).alias("src"),
                      F.col(lang_col).alias("lang")).agg(
        F.count("*").alias("c")
    )
    wl = Window.partitionBy("src").orderBy(F.desc("c"), F.asc("lang"))
    top = (
        lc.withColumn("rn", F.row_number().over(wl))
        .withColumn("n", F.sum("c").over(Window.partitionBy("src")))
        .where(F.col("rn") == 1)
        .select(
            "src", F.col("lang").alias("top_lang"),
            F.expr("CAST(c * 1000000 div n AS BIGINT)").alias(
                "top_lang_share_x1e6"),
        )
    )
    zf = zipf_slope(docs, source_col=source_col, text_col=text_col).select(
        "src", "slope_x1e6"
    )
    return base.join(top, "src").join(zf, "src", "left").select(
        "src", "n_docs", "n_tokens", "avg_chars", "n_dup_docs",
        "top_lang", "top_lang_share_x1e6",
        F.coalesce("slope_x1e6", F.lit(0)).cast("long").alias(
            "zipf_slope_x1e6"),
    )
