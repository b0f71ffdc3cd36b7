"""Unit tests for scale.curation + scale.dedup.semantic_dedup.

Hand-constructed documents with known repetition structure, so every
Gopher signal / rebuild / packing slot is checked against a value
computed by hand (the driver's DuckDB oracle checks the same operators
end-to-end on the synthetic corpus).
"""

import pytest
from pyspark.sql import functions as F

from alphalens_spark.scale import curation


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: heavy 1-line repetition; "a b" 2-gram repeats
        (0, "a b a b a b", "en", "t"),
        # 1: multi-line with a duplicated line and a bullet + ellipsis line
        (1, "hello world\nhello world\n- bullet item\nwait for it...", "en", "t"),
        # 2: clean prose with the stopwords
        (2, "the cat sat with the dog and that was to be of note have fun", "en", "t"),
        # 3: empty-ish
        (3, "solo", "en", "t"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def _row(df, doc_id):
    return {r["doc_id"]: r for r in df.collect()}[doc_id]


class TestGopherQuality:
    def test_scalar_signals(self, docs):
        out = curation.gopher_quality(docs)
        r0 = _row(out, 0)
        assert r0["n_words"] == 6
        # "ababab" -> 6 chars / 6 words
        assert r0["mean_word_len"] == 1.0
        assert r0["frac_alpha_words"] == 1.0
        assert r0["n_stopwords"] == 0
        r2 = _row(out, 2)
        # the, with, and, that, to, be, of, have -> all 8 present
        assert r2["n_stopwords"] == 8

    def test_line_signals(self, docs):
        r1 = _row(curation.gopher_quality(docs), 1)
        assert r1["n_lines"] == 4
        # one of 4 lines is a duplicate occurrence
        assert r1["dup_line_frac"] == 0.25
        # "hello world" 11 chars x 2 occurrences / total line chars 11+11+13+14
        assert r1["dup_line_char_frac"] == round(22 / 49, 6)
        assert r1["frac_bullet_lines"] == 0.25
        assert r1["frac_ellipsis_lines"] == 0.25

    def test_top_ngram_char_frac(self, docs):
        r0 = _row(curation.gopher_quality(docs), 0)
        # text "a b a b a b" (11 chars): 2-grams = [a b, b a, a b, b a, a b]
        # top = "a b" (3 occurrences, len 3) -> 9/11
        assert r0["top_2gram_char_frac"] == round(9 / 11, 6)
        # 3-grams: [a b a, b a b, a b a, b a b] -> top "a b a" 2x len 5 -> 10/11
        assert r0["top_3gram_char_frac"] == round(10 / 11, 6)

    def test_dup_ngram_char_frac(self, docs):
        r0 = _row(curation.gopher_quality(docs), 0)
        # 5-grams: [a b a b a, b a b a b] -> no dups
        assert r0["dup_5gram_char_frac"] == 0.0

    def test_pass_flag_requires_50_words(self, spark):
        good = " ".join(
            "the be to of and that have with cat dog run sun fly sky red hat".split()
            * 5
        )  # 80 words, all signals clean... except repetition from x5
        df = spark.createDataFrame([(1, good, "en", "t")], ["doc_id", "text", "lang", "source"])
        r = _row(curation.gopher_quality(df), 1)
        assert r["n_words"] == 80
        # 5x repeated 16-word block -> massive dup n-gram fractions -> fail
        assert bool(r["gopher_pass"]) is False
        assert r["dup_10gram_char_frac"] > 0.5


class TestDedupeWithinDoc:
    def test_word_unit(self, docs):
        out = curation.dedupe_units_within_doc(docs, unit="word")
        r0 = _row(out, 0)
        assert r0["clean_text"] == "a b"
        assert (r0["n_units"], r0["n_kept"]) == (6, 2)

    def test_line_unit(self, docs):
        out = curation.dedupe_units_within_doc(docs, unit="line")
        r1 = _row(out, 1)
        assert r1["clean_text"] == "hello world\n- bullet item\nwait for it..."
        assert (r1["n_units"], r1["n_kept"]) == (4, 3)

    def test_chunk_unit_preserves_short_doc(self, docs):
        out = curation.dedupe_units_within_doc(docs, unit=4)
        assert _row(out, 3)["clean_text"] == "solo"

    def test_first_occurrence_kept(self, spark):
        df = spark.createDataFrame(
            [(1, "z\na\nz\nb", "en", "t")], ["doc_id", "text", "lang", "source"]
        )
        r = _row(curation.dedupe_units_within_doc(df, unit="line"), 1)
        assert r["clean_text"] == "z\na\nb"


class TestRemoveBoilerplate:
    def test_corpus_frequency_threshold(self, spark):
        rows = [
            (1, "keep me\ncookie banner\nunique one"),
            (2, "cookie banner\nother text"),
            (3, "cookie banner\nmore words"),
            (4, "nothing shared here"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = curation.remove_boilerplate(df, min_docs=3, unit="line")
        d = {r["doc_id"]: r for r in out.collect()}
        assert d[1]["clean_text"] == "keep me\nunique one"
        assert d[2]["clean_text"] == "other text"
        assert d[4]["clean_text"] == "nothing shared here"
        assert d[1]["n_kept"] == 2 and d[1]["n_units"] == 3

    def test_doc_fully_removed_yields_empty(self, spark):
        rows = [(i, "same line") for i in range(3)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = curation.remove_boilerplate(df, min_docs=3, unit="line")
        assert all(r["clean_text"] == "" and r["n_kept"] == 0 for r in out.collect())

    def test_within_doc_repeats_count_once(self, spark):
        # a line repeated inside ONE doc is not boilerplate (distinct docs)
        df = spark.createDataFrame([(1, "x\nx\nx"), (2, "y")], ["doc_id", "text"])
        out = curation.remove_boilerplate(df, min_docs=2, unit="line")
        assert _row(out, 1)["clean_text"] == "x\nx\nx"


class TestPackSequences:
    def test_offsets_are_cumulative_per_shard(self, docs):
        out = curation.pack_sequences(docs, budget_tokens=5, n_shards=1)
        rows = sorted(out.collect(), key=lambda r: r["doc_id"])
        # one shard: docs in id order; token counts 6, 10, 14, 1
        starts = [0]
        for r in rows[:-1]:
            starts.append(starts[-1] + r["n_tokens"])
        for r, s in zip(rows, starts):
            assert r["seq_id"] == s // 5
            assert r["begin_offset"] == s % 5

    def test_deterministic_across_partitionings(self, docs):
        a = curation.pack_sequences(docs, 7, 4).collect()
        b = curation.pack_sequences(docs.repartition(7), 7, 4).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestSampling:
    def test_stratified_fractions(self, spark):
        rows = [(i, "t", "a" if i < 500 else "b") for i in range(1000)]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = curation.stratified_sample(df, {"a": 1.0, "b": 0.2})
        counts = {
            r["source"]: r["c"]
            for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()
        }
        assert counts["a"] == 500
        assert 60 <= counts.get("b", 0) <= 140  # ~100 expected, hash-exact

    def test_default_fraction_zero_drops_unlisted(self, spark):
        df = spark.createDataFrame([(1, "t", "zzz")], ["doc_id", "text", "source"])
        assert curation.stratified_sample(df, {"a": 1.0}).count() == 0

    def test_per_group_cap(self, spark):
        rows = [(i, "t", f"s{i % 3}") for i in range(30)]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = curation.per_group_cap(df, cap=4)
        counts = [r["c"] for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()]
        assert counts == [4, 4, 4]
        # deterministic: same set on re-run over different partitioning
        again = curation.per_group_cap(df.repartition(5), cap=4)
        assert sorted(r["doc_id"] for r in out.collect()) == sorted(
            r["doc_id"] for r in again.collect()
        )


class TestSemanticDedup:
    def test_keep_lowest_id_within_cell(self, spark):
        from alphalens_spark.scale.dedup import semantic_dedup

        # two tight groups + one outlier; ids 0..2 (the Lloyd init seeds)
        # span the three groups so each gets its own cell
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 0.0, 1.0]),
            (10, [0.99, 0.01, 0.0, 0.0]),
            (11, [0.98, 0.02, 0.0, 0.0]),
            (20, [0.0, 0.99, 0.01, 0.0]),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.95, n_cells=3).collect()}
        assert out[0]["keep"] and out[0]["dup_of"] is None
        assert not out[10]["keep"] and out[10]["dup_of"] == 0
        assert not out[11]["keep"] and out[11]["dup_of"] == 0
        assert out[1]["keep"]
        assert not out[20]["keep"] and out[20]["dup_of"] == 1
        assert out[2]["keep"]

    def test_subset_of_exact_pairs(self, spark):
        """Every (dup, dup_of) edge is a true exact-cosine near-dup pair."""
        from alphalens_spark.scale.dedup import embedding_cosine_duplicates, semantic_dedup

        from alphalens_spark import datasets

        emb = datasets.load_table(spark, "/root/testdata/sf0.001", "embeddings")
        sd = semantic_dedup(emb, threshold=0.4, n_cells=16)
        edges = {
            (r["dup_of"], r["vec_id"])
            for r in sd.where("NOT keep").collect()
        }
        exact = {
            (r["id_a"], r["id_b"])
            for r in embedding_cosine_duplicates(emb, threshold=0.4).collect()
        }
        assert edges <= exact
        assert len(edges) > 0


class TestDuplicateSpans:
    def test_span_merge_and_stats(self, spark):
        """Crafted corpus: a shared 12-word sentence marks a merged span in
        both docs; a within-doc repeated 10-gram marks both occurrences;
        unique text marks nothing."""
        from alphalens_spark.scale.curation import (
            duplicate_ngram_spans,
            duplicate_span_stats,
        )

        shared = "the quick brown fox jumps over the lazy dog near my house"  # 12 words
        uniq_a = "alpha beta gamma delta epsilon zeta eta theta iota"
        uniq_b = "one two three four five six seven eight nine"
        rep = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"  # 10 words, repeated twice in doc c
        rows = [
            ("a", f"{shared} {uniq_a}"),
            ("b", f"{uniq_b} {shared}"),
            ("c", f"{rep} x1 x2 x3 {rep}"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        spans = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicate_ngram_spans(docs, k=10).collect()
        }
        # doc a: shared sentence = words 1..12; doc b: words 10..21
        # doc c: first rep = 1..10, second rep = 14..23 (gap x1 x2 x3)
        assert spans == {("a", 1, 12), ("b", 10, 21), ("c", 1, 10), ("c", 14, 23)}
        stats = {r["doc_id"]: r for r in duplicate_span_stats(docs, k=10).collect()}
        assert stats["a"]["n_words"] == 21 and stats["a"]["dup_words"] == 12
        assert stats["c"]["n_dup_spans"] == 2 and stats["c"]["dup_words"] == 20
        assert abs(stats["c"]["dup_word_frac"] - round(20 / 23, 6)) < 1e-9

    def test_short_docs_emit_nothing(self, spark):
        from alphalens_spark.scale.curation import duplicate_span_stats

        docs = spark.createDataFrame(
            [("a", "too short"), ("b", "too short")], ["doc_id", "text"]
        )
        stats = {r["doc_id"]: r for r in duplicate_span_stats(docs, k=10).collect()}
        assert all(s["n_dup_spans"] == 0 and s["dup_words"] == 0 for s in stats.values())


class TestDSIR:
    ROWS = [
        (0, "the cat sat on the mat"),
        (1, "a dog barked at the cat"),
        (2, "stocks rallied as markets closed higher today"),
        (3, "bonds fell while equities gained in trading"),
        (4, "the cat and the dog"),
    ]

    def test_weights_match_python_reference(self, spark):
        """dsir_importance_weights == the Xie et al. 2023 formula computed
        in pure Python over the same md5-hashed unigram+bigram buckets."""
        import hashlib
        import math
        from collections import Counter

        from alphalens_spark.scale.curation import dsir_importance_weights

        raw = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        target = spark.createDataFrame(self.ROWS[2:4], "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_features"], r["log_weight"])
            for r in dsir_importance_weights(raw, target, n_buckets=64).collect()
        }

        def feats(text):
            toks = text.lower().strip().split()
            fs = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            return [
                int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 64
                for t in fs
            ]

        cr, ct, per_doc = Counter(), Counter(), {}
        for i, t in self.ROWS:
            c = Counter(feats(t))
            per_doc[i] = c
            cr.update(c)
        for i, t in self.ROWS[2:4]:
            ct.update(Counter(feats(t)))
        tr, tt = sum(cr.values()), sum(ct.values())
        a, B = 0.5, 64
        for i, _t in self.ROWS:
            lw = sum(
                c
                * (
                    math.log((ct[b] + a) / (tt + a * B))
                    - math.log((cr[b] + a) / (tr + a * B))
                )
                for b, c in per_doc[i].items()
            )
            assert got[i][0] == sum(per_doc[i].values())
            assert abs(got[i][1] - lw) < 2e-6

    def test_select_prefers_target_domain(self, spark):
        """Gumbel top-k resampling pulls the target-domain documents to
        the front: with a wide weight gap the selection is exactly the
        in-domain set (noise is O(1), the gap is >10 nats)."""
        from alphalens_spark.scale.curation import dsir_select

        raw = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        target = spark.createDataFrame(self.ROWS[2:4], "doc_id long, text string")
        sel = dsir_select(raw, target, k=2, n_buckets=64).collect()
        assert sorted(r["doc_id"] for r in sel) == [2, 3]
        # deterministic across invocations (md5 uniforms, no RNG state)
        sel2 = dsir_select(raw, target, k=2, n_buckets=64).collect()
        assert sorted(r["doc_id"] for r in sel2) == [2, 3]

    def test_store_incremental_equals_one_shot(self, spark, tmp_path):
        """dsir_store_update over 3 micro-batches == dsir_bucket_counts
        of the full corpus (merge = addition), and scoring off the store
        reproduces the one-shot dsir_importance_weights exactly."""
        from alphalens_spark.scale.curation import (
            dsir_bucket_counts,
            dsir_importance_weights,
        )
        from alphalens_spark.streaming.ops import (
            dsir_store_update,
            dsir_store_weights,
        )

        full = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        target = spark.createDataFrame(self.ROWS[2:4], "doc_id long, text string")
        store = str(tmp_path / "dsir_store")
        for lo, hi in ((0, 2), (2, 4), (4, 5)):
            batch = spark.createDataFrame(
                self.ROWS[lo:hi], "doc_id long, text string"
            )
            dsir_store_update(batch, store, n_buckets=64)
        got_counts = {
            r["_b"]: r["n"] for r in spark.read.parquet(store).collect()
        }
        want_counts = {
            r["_b"]: r["_ct"]
            for r in dsir_bucket_counts(full, n_buckets=64).collect()
        }
        assert got_counts == want_counts
        got_w = {
            r["doc_id"]: (r["n_features"], r["log_weight"])
            for r in dsir_store_weights(
                full, store, target, n_buckets=64
            ).collect()
        }
        want_w = {
            r["doc_id"]: (r["n_features"], r["log_weight"])
            for r in dsir_importance_weights(full, target, n_buckets=64).collect()
        }
        assert got_w == want_w


def test_epoch_shuffle_is_seeded_permutation(spark):
    """epoch_shuffle emits a contiguous 0-based permutation, identical
    under repartitioning, different across seeds."""
    from alphalens_spark.scale.curation import epoch_shuffle

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(97)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["shuffle_pos"] for r in epoch_shuffle(docs, seed=1).collect()}
    assert sorted(out.values()) == list(range(97))          # permutation
    out_r = {
        r["doc_id"]: r["shuffle_pos"]
        for r in epoch_shuffle(docs.repartition(13), seed=1).collect()
    }
    assert out == out_r                                      # partition-stable
    out2 = {r["doc_id"]: r["shuffle_pos"] for r in epoch_shuffle(docs, seed=2).collect()}
    assert sorted(out2.values()) == list(range(97))
    assert out != out2                                       # seed changes order
