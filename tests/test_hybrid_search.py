"""Hybrid retrieval: the idf-overlap lexical leg's df cap and integer
scoring, and RRF fusion math/tie-breaks."""

import math

import pytest
from pyspark.sql import functions as F

from alphalens_spark.scale.similarity import rrf_fuse
from alphalens_spark.scale.text import rare_term_overlap_topk

DOCS = [
    # 'common' appears in 5/6 docs -> over any reasonable cap; rare
    # terms tie docs together
    (0, "common alpha beta"),
    (1, "common alpha gamma"),
    (2, "common beta delta"),
    (3, "common gamma delta"),
    (4, "common epsilon zeta"),
    (5, "epsilon zeta theta"),
]


def _lex(spark, max_df_per_mille=500, k=10):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame([(0,), (5,)], "query_id long")
    return rare_term_overlap_topk(
        docs, queries, max_df_per_mille=max_df_per_mille, k=k
    )


def test_lexical_leg_scores_and_cap(spark):
    rows = _lex(spark).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r
    n = len(DOCS)
    idf = lambda df_: round(math.log(n / df_) * 1e6)
    # 'common' has df=5 > 6*500//1000=3 -> capped out of scoring;
    # query 0 shares alpha(df=2) with doc1, beta(df=2) with doc2
    assert set(by_q[0]) == {1, 2}
    assert by_q[0][1]["score_e6"] == idf(2)
    assert by_q[0][1]["n_shared_terms"] == 1
    # query 5 shares epsilon+zeta (df=2 each) with doc 4
    assert set(by_q[5]) == {4}
    assert by_q[5][4]["score_e6"] == 2 * idf(2)
    # ranks are 1-based, doc_id tiebreak: doc1 before doc2 on equal score
    assert by_q[0][1]["rnk"] == 1 and by_q[0][2]["rnk"] == 2


def test_lexical_leg_excludes_self_and_honors_k(spark):
    rows = _lex(spark, k=1).collect()
    assert all(r["doc_id"] != r["query_id"] for r in rows)
    per_q = {}
    for r in rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert all(v == 1 for v in per_q.values())


def test_rrf_fuse_math_and_ties(spark):
    lega = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rnk int",
    )
    legb = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, doc_id long, rnk int"
    )
    out = {
        r["doc_id"]: r for r in rrf_fuse([lega, legb], 60, 10).collect()
    }
    c = lambda r: round(1e9 / (60 + r))
    assert out[11]["rrf_e9"] == c(2) + c(1)  # both legs
    assert out[11]["n_legs"] == 2
    assert out[10]["rrf_e9"] == c(1)
    assert out[13]["rrf_e9"] == c(2)
    # doc11 fuses to the top; 10 (rank1 one leg) beats 13 (rank2 one leg)
    assert out[11]["fused_rank"] == 1
    assert out[10]["fused_rank"] == 2
    assert out[13]["fused_rank"] == 3
    assert out[12]["fused_rank"] == 4


def test_rrf_topk_truncates(spark):
    leg = spark.createDataFrame(
        [(1, d, d) for d in range(1, 30)], "query_id long, doc_id long, rnk int"
    )
    assert rrf_fuse([leg], 60, 5).count() == 5


def test_embedding_drift_identity_and_rotation(spark):
    from alphalens_spark.scale.similarity import embedding_drift

    base = [(i, "l0", [1.0, 0.0, 0.0, float(i % 3)]) for i in range(12)]
    df = spark.createDataFrame(
        base, "vec_id long, label string, embedding array<double>"
    )
    same = {r["label"]: r for r in embedding_drift(df, df).collect()}
    assert same["l0"]["cos_sim"] == 1.0 and same["l0"]["drift"] == 0.0
    assert same["l0"]["n_ref"] == 12 and same["l0"]["n_cur"] == 12
    rotated = spark.createDataFrame(
        [(i, "l0", [0.0, 1.0, 0.0, float(i % 3)]) for i in range(12)],
        "vec_id long, label string, embedding array<double>",
    )
    rot = {r["label"]: r for r in embedding_drift(df, rotated).collect()}
    assert 0.0 < rot["l0"]["cos_sim"] < 1.0
    assert rot["l0"]["drift"] == pytest.approx(1.0 - rot["l0"]["cos_sim"], abs=2e-6)


def test_rrf_fuse_rejects_empty_legs(spark):
    with pytest.raises(ValueError, match="at least one ranking leg"):
        rrf_fuse([])
