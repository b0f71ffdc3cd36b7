"""RAKE keyword extraction and Flesch readability: hand-checked goldens
on controlled corpora."""

import pytest

from alphalens_spark.scale.text import rake_keywords, readability_scores


def test_rake_classic_scoring(spark):
    # one doc, phrases: [deep learning], [deep learning systems], [criteria]
    docs = spark.createDataFrame(
        [(0, "s", "deep learning and deep learning systems of criteria")],
        "doc_id long, source string, text string",
    )
    out = {r["phrase"]: r for r in rake_keywords(docs, k=10).collect()}
    # freq: deep 2, learning 2, systems 1, criteria 1
    # deg (sum plen-1 per occurrence): deep 1+2=3, learning 3, systems 2,
    # criteria 0 -> scores: deep 1.5, learning 1.5, systems 2, criteria 0
    assert out["deep learning"]["score_e6"] == 3_000_000
    assert out["deep learning"]["n_occurrences"] == 1
    assert out["deep learning systems"]["score_e6"] == 5_000_000
    assert out["criteria"]["score_e6"] == 0
    # ranking: highest phrase score first
    assert out["deep learning systems"]["rnk"] == 1
    assert out["deep learning"]["rnk"] == 2


def test_rake_groups_are_independent(spark):
    docs = spark.createDataFrame(
        [(0, "s1", "alpha beta the alpha beta"),
         (1, "s2", "alpha the gamma")],
        "doc_id long, source string, text string",
    )
    out = {(r["source"], r["phrase"]): r for r in rake_keywords(docs, k=5).collect()}
    # s1: 'alpha beta' twice -> each word freq 2 deg 2 -> score 1+1 = 2e6
    assert out[("s1", "alpha beta")]["score_e6"] == 2_000_000
    assert out[("s1", "alpha beta")]["n_occurrences"] == 2
    # s2: singleton words score 0 (deg 0)
    assert out[("s2", "alpha")]["score_e6"] == 0


def test_readability_golden(spark):
    # "the cat sat. it ran away!" -> 6 words, 2 sentences, syllables:
    # the(1) cat(1) sat(1) it(1) ran(1) away(2: a, ay) = 7
    docs = spark.createDataFrame(
        [(0, "the cat sat. it ran away!")], "doc_id long, text string"
    )
    r = readability_scores(docs).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 7)
    wps, spw = 6 / 2, 7 / 6
    assert r["flesch_ease"] == pytest.approx(
        round(206.835 - 1.015 * wps - 84.6 * spw, 6), abs=1e-6
    )
    assert r["fk_grade"] == pytest.approx(
        round(0.39 * wps + 11.8 * spw - 15.59, 6), abs=1e-6
    )


def test_readability_vowel_free_words_count_one_syllable(spark):
    docs = spark.createDataFrame(
        [(0, "tsk tsk hmm")], "doc_id long, text string"
    )
    r = readability_scores(docs).collect()[0]
    assert r["n_syllables"] == 3  # zero vowel runs, 3 vowel-free words
    assert r["n_sentences"] == 1  # no punctuation floors at 1
