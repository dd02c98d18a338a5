"""DSIR hashed n-gram importance weighting (operators/dsir.py)."""

from pyspark.sql import functions as F

from kgist_spark.operators.dsir import dsir_weights, hashed_grams


def _docs(spark):
    target = spark.createDataFrame(
        [(100 + i, "the theory of distributed consensus and replicated logs")
         for i in range(5)],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (0, "notes on distributed consensus and replicated logs"),
            (1, "cheap pills casino bonus click here winner prize"),
            (2, "the theory of consensus"),
        ],
        "doc_id long, text string",
    )
    return corpus, target


def test_target_like_documents_score_higher(spark):
    """The whole point of DSIR: documents whose gram bag matches the target
    distribution must out-weigh off-distribution documents."""
    corpus, target = _docs(spark)
    w = {r["doc_id"]: r["importance_x1e6"]
         for r in dsir_weights(corpus, target).collect()}
    per_gram = {k: v for k, v in w.items()}
    # normalize by gram count: doc 1 is longer junk, doc 2 short on-topic
    n = {r["doc_id"]: r["n_grams"] for r in dsir_weights(corpus, target).collect()}
    assert per_gram[0] / n[0] > per_gram[1] / n[1]
    assert per_gram[2] / n[2] > per_gram[1] / n[1]


def test_weights_are_partition_invariant(spark):
    """Integer fixed-point sums commute: any repartitioning produces the
    identical weight table (the engine's bit-reproducibility contract)."""
    corpus, target = _docs(spark)
    a = sorted(map(tuple, dsir_weights(corpus, target).collect()))
    b = sorted(map(tuple,
                   dsir_weights(corpus.repartition(7), target.repartition(3))
                   .collect()))
    assert a == b


def test_gram_counts_unigrams_plus_bigrams(spark):
    """n_grams = tokens + bigrams = 2*tokens - 1 for multi-token docs; a
    one-token doc contributes exactly its unigram (no empty bigram)."""
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "solo")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "alpha")], "doc_id long, text string")
    got = {r["doc_id"]: r["n_grams"]
           for r in dsir_weights(corpus, target).collect()}
    assert got == {0: 5, 1: 1}
    # the in-row gram expression agrees
    sizes = corpus.select(F.size(hashed_grams("text")).alias("n")).collect()
    assert sorted(r["n"] for r in sizes) == [1, 5]


def test_bucket_ids_stay_in_range(spark):
    corpus, target = _docs(spark)
    mx = corpus.select(
        F.array_max(hashed_grams("text", 64)).alias("mx"),
        F.array_min(hashed_grams("text", 64)).alias("mn"),
    ).agg(F.max("mx").alias("mx"), F.min("mn").alias("mn")).first()
    assert 0 <= mx["mn"] and mx["mx"] < 64
