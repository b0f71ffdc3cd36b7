"""Record linkage / entity resolution: fuzzy-match structured records.

The entity-resolution counterpart to the document near-dup family in
:mod:`alphalens_spark.scale.dedup`: documents dedupe on content
similarity, records link on NAME similarity under a blocking scheme.
The classic pipeline (Fellegi–Sunter framing, token blocking per
Papadakis et al.'s blocking surveys) is: normalize → generate candidate
pairs that share a blocking key → score candidates with an edit
distance → keep pairs under the threshold. All-pairs comparison is
never materialized; candidates exist only inside shared-key buckets.

Scale posture: blocking is an inverted-index self-join (the exact shape
of ``ngram_jaccard_pairs``), so the only quadratic risk is a hot
blocking key — capped by ``max_df`` exactly like the gram-posting caps
(drop keys shared by more than ``max_df`` records; the drop is
observable via :func:`blocking_stats`). Scoring is JVM-native
``levenshtein`` — no Python stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_record(col: str | Column) -> Column:
    """Canonical record-linkage normalization: lowercase, trim, collapse
    internal whitespace runs. Mirrors ``scale.curation.normalize_text``'s
    whitespace rule so both families agree on token boundaries."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def token_blocks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int | None = None,
) -> DataFrame:
    """Token blocking index: one (block_key, id, norm) row per distinct
    token of the normalized text. Two records become candidates iff they
    share at least one surviving token. ``max_df`` drops tokens shared
    by more than that many records (hot-posting guard — a corpus-wide
    token like a legal suffix would otherwise make one block quadratic).
    """
    norm = normalize_record(text_col)
    ex = df.select(
        F.col(id_col).alias("_id"), norm.alias("_norm")
    ).select(
        "_id", "_norm",
        F.explode(F.array_distinct(F.split("_norm", " "))).alias("block_key"),
    ).where(F.col("block_key") != "")
    if max_df is not None:
        hot = (
            ex.groupBy("block_key")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_df)
            .select("block_key")
        )
        ex = ex.join(hot, "block_key", "left_anti")
    return ex.select("block_key", F.col("_id").alias("id"), F.col("_norm").alias("norm"))


def blocking_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int | None = None,
) -> DataFrame:
    """Per-block candidate-volume diagnostic: (block_key, n_records,
    n_pairs) sorted by pair volume. The skew-report analogue for the
    linkage join — read it before raising ``max_df``."""
    blocks = token_blocks(df, id_col, text_col, max_df=max_df)
    return (
        blocks.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .select(
            "block_key",
            "n_records",
            (F.col("n_records") * (F.col("n_records") - 1) / 2)
            .cast("long")
            .alias("n_pairs"),
        )
    )


def record_linkage_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    max_df: int | None = None,
    block_expr: Column | None = None,
) -> DataFrame:
    """Blocked fuzzy record matching: candidate pairs share a blocking
    key (default: any normalized token; or a caller-supplied
    ``block_expr`` such as a sort-key prefix), scored by Levenshtein
    distance over the FULL normalized text, kept iff distance ≤
    ``max_distance``.

    Output: (id_a, id_b, distance) with id_a < id_b, one row per
    matched pair regardless of how many blocks it co-occurred in.

    Scale shape: inverted-index equi-join on the blocking key (linear in
    posting-list mass, ``max_df``-capped), distinct pair reduction
    BEFORE the Levenshtein score so each pair is scored once, and the
    scoring itself is the JVM built-in — no Python, no all-pairs.
    """
    if block_expr is not None:
        norm = normalize_record(text_col)
        blocks = df.select(
            block_expr.alias("block_key"),
            F.col(id_col).alias("id"),
            norm.alias("norm"),
        )
        if max_df is not None:
            hot = (
                blocks.groupBy("block_key")
                .agg(F.count(F.lit(1)).alias("_df"))
                .where(F.col("_df") > max_df)
                .select("block_key")
            )
            blocks = blocks.join(hot, "block_key", "left_anti")
    else:
        blocks = token_blocks(df, id_col, text_col, max_df=max_df)
    a = blocks.select(
        "block_key", F.col("id").alias("id_a"), F.col("norm").alias("_na")
    )
    b = blocks.select(
        "block_key", F.col("id").alias("id_b"), F.col("norm").alias("_nb")
    )
    # Length filter BEFORE the distinct pair reduction: edit distance is
    # bounded below by the length difference, so |len a − len b| >
    # max_distance can never match — pruned inside the block join,
    # result-identical, and it shrinks both the shuffle into distinct()
    # and the Levenshtein workload.
    cands = (
        a.join(b, "block_key")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(F.length("_na") - F.length("_nb"))
                <= F.lit(max_distance)
            )
        )
        .select("id_a", "id_b", "_na", "_nb")
        .distinct()
    )
    # Thresholded levenshtein (Spark ≥3.5): banded O(threshold·n) per
    # pair instead of the full O(n²) DP table; returns −1 above the
    # threshold and the exact distance at or below it.
    return (
        cands.select(
            "id_a",
            "id_b",
            F.levenshtein(
                F.col("_na"), F.col("_nb"), max_distance
            ).alias("distance"),
        )
        .where(F.col("distance") >= 0)
    )
