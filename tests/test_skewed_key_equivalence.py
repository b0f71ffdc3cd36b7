"""Hot-key correctness pins for the window-for-df operators.

Round-8 VERDICT item 2 asked the four "window instead of groupBy+join"
rewrites (tfidf df, unigram-CE corpus counts, dup_span gram counts) to
be re-decided with a skewed-key test. The round-9 probe
(tools/skew_probe.py) measured the groupBy+join form ~1.5x SLOWER than
the window form under a single 50%-hot key (both are bottlenecked by
co-locating the hot key on one task; AQE skew-join cannot split a
single enormous key and never applies to windows/aggregations), and
9-56% slower on the real queries at sf0.1 — so the windows stay.

These tests pin the OUTPUT side of that decision: on a corpus where one
term dominates half the rows, the window form must agree exactly with
an independently-computed groupBy+join reference.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # 120 docs; the token "hot" appears (multiple times) in every even
    # doc — one gram/term carries ~half of all occurrences
    rows = []
    for i in range(120):
        if i % 2 == 0:
            text = "hot hot hot common filler " + f"rare{i} tail{i % 7}"
        else:
            text = f"rare{i} uniq{i} tail{i % 7} common"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_window_matches_join_reference(spark, skewed_docs):
    from alphalens_spark.scale.text import _tokens, tfidf_top_terms

    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"], r["rnk"])
        for r in tfidf_top_terms(skewed_docs, n_top=3).collect()
    }
    # reference: same formula via groupBy + join-back (no window for df)
    tf = (
        skewed_docs.select("doc_id", F.explode(_tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = skewed_docs.count()
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tf.join(dfq, "term").withColumn(
        "tfidf", F.lit(0.0) + F.round(F.col("tf") * idf, 6)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    ref = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"], r["rnk"])
        for r in scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 3)
        .collect()
    }
    assert got == ref


def test_unigram_ce_window_matches_join_reference(spark, skewed_docs):
    import math

    from alphalens_spark.scale.text import _tokens, unigram_cross_entropy

    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in unigram_cross_entropy(skewed_docs).collect()
    }
    toks = [
        (r["doc_id"], r["t"])
        for r in skewed_docs.select(
            "doc_id", F.explode(_tokens("text")).alias("t")
        ).collect()
    ]
    from collections import Counter

    cw = Counter(t for _, t in toks)
    total, vocab = sum(cw.values()), len(cw)
    by_doc: dict = {}
    for d, t in toks:
        by_doc.setdefault(d, Counter())[t] += 1
    for d, cnt in by_doc.items():
        n = sum(cnt.values())
        ce = -sum(
            k * math.log((cw[t] + 0.5) / (total + 0.5 * vocab))
            for t, k in cnt.items()
        ) / n
        assert got[d][0] == n
        assert abs(got[d][1] - ce) < 5e-6, (d, got[d][1], ce)


def test_dup_span_window_matches_join_reference(spark, skewed_docs):
    from alphalens_spark.scale.curation import duplicate_span_stats

    # k=3 so the repeated "hot hot hot common filler" prefix in the even
    # docs forms a corpus-duplicated gram carried by half the corpus
    got = {
        r["doc_id"]: (r["n_words"], r["n_dup_spans"], r["dup_words"])
        for r in duplicate_span_stats(skewed_docs, k=3).collect()
    }
    # every even doc shares its first 5 words -> grams at pos 1..3 are
    # duplicated across 60 docs; "rare{i} tail" grams are unique
    for i in range(120):
        n_words, n_spans, dup_words = got[i]
        if i % 2 == 0:
            assert n_words == 7
            assert n_spans == 1
            assert dup_words == 5  # positions 1-5 merge into one island
        else:
            assert n_words == 4
            assert (n_spans, dup_words) == (0, 0)
