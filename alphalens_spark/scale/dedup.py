"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale notes: exact dedup is one hash-groupBy (map-side partial agg, one
shuffle on the 128-bit digest — uniformly distributed, no skew). Near-dup
pipelines avoid the quadratic all-pairs join by bucketing (LSH bands /
simhash prefixes) and only comparing within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic MinHash parameters: h_i(x) = (a_i * x + b_i) mod P, the
# classic universal-hash family; P is a Mersenne prime > 2^32.
_MINHASH_PRIME = (1 << 61) - 1


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate groups keyed by md5 of the text.

    Output: (text_hash, keep_id = min id, n_dups). One shuffle; at 100 TB
    group by the digest (not the text) so shuffle rows carry 32 bytes, and
    the skew profile is uniform by construction.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _shingles(text_col: str, k: int = 3) -> F.Column:
    """Token k-gram shingle array (JVM-side transform, no Python UDF).

    Word shingles keep the shingle set ~|tokens| instead of ~|chars|
    (30× fewer hash evaluations than char shingles on prose) while
    preserving near-dup sensitivity for document-level dedup.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Per-document MinHash signature (array of num_hashes longs).

    Shingle → xxhash64 → for each of the ``num_hashes`` universal hashes
    take the min over shingles. All computed with built-in higher-order
    array functions (transform / aggregate) — JVM-side, one pass, no
    shuffle until a downstream groupBy.
    """
    import random

    rng = random.Random(seed)
    coeffs = [
        (rng.randrange(1, _MINHASH_PRIME), rng.randrange(0, _MINHASH_PRIME))
        for _ in range(num_hashes)
    ]
    sh = _shingles(text_col, shingle_k)
    base = docs.select(
        F.col(id_col),
        F.transform(sh, lambda s: F.abs(F.xxhash64(s))).alias("_shash"),
    )
    sig_cols = []
    for i, (a, b) in enumerate(coeffs):
        sig_cols.append(
            F.array_min(
                F.transform(
                    "_shash",
                    lambda x: (x % F.lit(_MINHASH_PRIME) * F.lit(a) + F.lit(b))
                    % F.lit(_MINHASH_PRIME),
                )
            ).alias(f"_h{i}")
        )
    return base.select(id_col, F.array(*sig_cols).alias("minhash"))


def minhash_lsh_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH.

    Signature → split into ``bands`` bands of ``num_hashes/bands`` rows →
    hash each band → explode (doc, band_id, band_hash) → self equi-join on
    (band_id, band_hash) to get candidates → estimate Jaccard as the
    fraction of agreeing signature positions → filter by threshold.

    The band join is an equi-join on a uniform hash: linear shuffle, never
    the O(n²) all-pairs comparison. Output: (id_a, id_b, est_jaccard),
    id_a < id_b, distinct.
    """
    rows_per_band = num_hashes // bands
    # persist: the signature projection feeds the band join (twice) and the
    # verification joins — without the cache Spark re-derives the whole
    # shingle→hash pipeline once per reference (measured 3× slower)
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k).persist()
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_id"),
        F.col("minhash"),
    ).select(
        "id",
        "band_id",
        F.xxhash64(
            F.slice("minhash", F.col("band_id") * rows_per_band + 1, rows_per_band),
            "band_id",
        ).alias("band_hash"),
    )
    a = banded.select(F.col("id").alias("id_a"), "band_id", "band_hash")
    b = banded.select(F.col("id").alias("id_b"), "band_id", "band_hash")
    cand = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("sig_b"))
    # candidate pairs ≈ actual near-dups ≪ corpus — broadcast them into the
    # signature lookups so the big side never shuffles. Disable for corpora
    # where the candidate set itself is huge (then AQE picks SMJ/SHJ).
    cand_side = F.broadcast(cand) if broadcast_candidates else cand
    pairs = sa.join(cand_side, "id_a").join(sb, "id_b")
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    est = agree.cast("double") / F.lit(float(num_hashes))
    return (
        pairs.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """63-bit SimHash over whitespace tokens.

    For each bit position, sum ±1 votes from each token's xxhash64 bit;
    expressed as aggregate-of-array expressions fused in one projection
    (63 bits keeps every mask/accumulation inside a signed long).
    Output: (id, simhash long).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    hashed = docs.select(
        F.col(id_col), F.transform(toks, lambda t: F.xxhash64(t)).alias("_th")
    )
    def _vote(i: int) -> F.Column:
        mask = F.shiftleft(F.lit(1).cast("long"), i)
        return F.aggregate(
            "_th",
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    sim = F.lit(0).cast("long")
    for i in range(63):
        sim = sim + F.when(_vote(i) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return hashed.select(id_col, sim.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    hash_grams: bool = True,
) -> DataFrame:
    """Exact token n-gram Jaccard for candidate pairs sharing ≥1 n-gram.

    Explode n-grams → self-join on the n-gram hash → count shared per pair
    → |A∩B| / (|A| + |B| − |A∩B|). The join is linear in total n-gram
    postings (inverted-index style), not all-pairs. Suitable as the
    verify stage after LSH at scale; standalone it assumes n-gram postings
    lists are not pathologically hot (stopword-only grams can be dropped
    by a document-frequency cap at scale).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    gram = (
        (lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))))
        if hash_grams  # 8-byte postings at scale; plain strings for oracles
        else (lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))), gram
        )
    )
    g = docs.select(F.col(id_col).alias("id"), grams.alias("_g"), F.size(grams).alias("_n"))
    ex = g.select("id", "_n", F.explode("_g").alias("gram"))
    a = ex.select(F.col("id").alias("id_a"), F.col("_n").alias("n_a"), "gram")
    b = ex.select(F.col("id").alias("id_b"), F.col("_n").alias("n_b"), "gram")
    shared = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        shared.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
