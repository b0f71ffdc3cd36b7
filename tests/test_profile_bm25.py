"""Unit checks: profile_columns vs hand stats, bm25 vs hand formula,
mixture weights normalization."""

import math

import pytest

from pyspark.sql import functions as F


def test_profile_columns(spark):
    from alphalens_spark.scale.profile import profile_columns

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, None), (2.0, 30), (4.0, 40)], ["x", "y"]
    )
    out = {r["column"]: r for r in profile_columns(df, ["x", "y"]).collect()}
    x = out["x"]
    assert (x["n_rows"], x["n_nonnull"], x["n_nulls"], x["n_distinct"]) == (4, 4, 0, 3)
    assert (x["min_value"], x["max_value"], x["mean"]) == (1.0, 4.0, 2.25)
    # interpolated quartiles of [1,2,2,4]
    assert (x["p25"], x["p50"], x["p75"]) == (1.75, 2.0, 2.5)
    y = out["y"]
    assert (y["n_nonnull"], y["n_nulls"], y["n_distinct"]) == (3, 1, 3)
    assert (y["p25"], y["p50"], y["p75"]) == (20.0, 30.0, 35.0)


def test_bm25_hand_formula(spark):
    from alphalens_spark.scale.text import bm25_scores

    docs = spark.createDataFrame(
        [("a", "join join scan other"), ("b", "nothing here at all"),
         ("c", "scan words words words words words")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bm25_scores(docs, ["join", "scan"]).collect()}
    n, avgdl = 3, (4 + 4 + 6) / 3
    def bm25(tf, df, dl, k1=1.2, b=0.75):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    want_a = bm25(2, 1, 4) + bm25(1, 2, 4)
    assert abs(out["a"]["bm25"] - round(want_a, 6)) < 1e-9
    assert out["a"]["n_terms_matched"] == 2
    assert out["b"]["bm25"] == 0.0 and out["b"]["n_terms_matched"] == 0
    want_a_tfidf = 2 * math.log(3 / 1) + 1 * math.log(3 / 2)
    assert abs(out["a"]["tfidf"] - round(want_a_tfidf, 6)) < 1e-9


def test_mixture_weights_normalized(spark):
    from alphalens_spark.scale.curation import mixture_weights

    docs = spark.createDataFrame(
        [("1", "w " * 100, "big"), ("2", "w " * 100, "big"), ("3", "w " * 25, "small")],
        ["doc_id", "text", "source"],
    )
    out = {r["source"]: r for r in mixture_weights(docs, alpha=0.5).collect()}
    assert abs(out["big"]["weight"] + out["small"]["weight"] - 1.0) < 1e-5
    # alpha < 1 up-samples the small source relative to natural frequency
    assert out["small"]["oversample"] > 1.0 > out["big"]["oversample"]
    assert out["big"]["n_tokens"] > out["small"]["n_tokens"]


def test_unigram_cross_entropy_orders_quality(spark):
    """Rare-token soup must score higher (worse) than templated text made
    of the corpus's most common tokens; hand-check one value."""
    import math

    from alphalens_spark.scale.text import unigram_cross_entropy

    docs = spark.createDataFrame(
        [("common", "a a a a b b"), ("rare", "x y z q w v")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in unigram_cross_entropy(docs).collect()}
    assert out["rare"]["cross_entropy"] > out["common"]["cross_entropy"]
    # hand: total=12, vocab=8, P(a)=(4+.5)/(12+4)=4.5/16
    pa, pb = 4.5 / 16, 2.5 / 16
    want = -(4 * math.log(pa) + 2 * math.log(pb)) / 6
    assert abs(out["common"]["cross_entropy"] - round(want, 6)) < 1e-9


def test_column_entropy(spark):
    import math

    from alphalens_spark.scale.profile import column_entropy

    rows = [("a", 1), ("a", 1), ("a", 1), ("b", 1), (None, 1)]
    df = spark.createDataFrame(rows, "cat string, const int")
    out = {r["column"]: r for r in column_entropy(df, ["cat", "const"]).collect()}
    # cat: counts 3/1/1 over 5 -> H = ln5 - (3ln3)/5
    want = math.log(5) - (3 * math.log(3)) / 5
    assert out["cat"]["n_distinct"] == 3  # NULL is its own category
    assert out["cat"]["entropy"] == pytest.approx(want, abs=1e-6)
    assert out["cat"]["h_norm"] == pytest.approx(want / math.log(3), abs=1e-6)
    # constant column: zero entropy, zero normalized entropy
    assert out["const"]["entropy"] == 0.0
    assert out["const"]["h_norm"] == 0.0
