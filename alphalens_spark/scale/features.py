"""Tabular feature engineering for training-data pipelines.

Encodings that turn raw categorical/behavioral columns into model
features at corpus scale — each a linear-shuffle aggregation with the
tiny statistics broadcast back onto the rows, never a per-row Python
stage. Leakage safety is the design axis: the encodings a model trains
on must not let a row see its own label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    key_cols: list[str],
    label_col: str,
    smoothing: float = 10.0,
    loo: bool = True,
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical key, leakage-safe.

    enc = (category label sum − own label if ``loo`` + m·prior) /
    (category count − 1 if ``loo`` + m): the classic empirical-Bayes
    shrinkage toward the global prior (m = ``smoothing`` pseudo-counts),
    with the leave-one-out correction so a row NEVER contributes to its
    own feature — the leakage that makes naive target encoding
    overfit-by-construction. Categories with a single row fall back to
    the prior under LOO (denominator m alone).

    One groupBy on the key (map-side partials), the per-key stats joined
    back on their own key, the 1-row global prior broadcast — all
    linear. Output: input columns + ``target_enc``.
    """
    keys = list(key_cols)
    lab = F.col(label_col).cast("double")
    stats = df.groupBy(*keys).agg(
        F.sum(lab).alias("_ksum"), F.count(lab).alias("_kn")
    )
    prior = df.agg(
        (F.sum(lab) / F.count(lab)).alias("_prior")
    )
    j = df.join(stats, keys).crossJoin(F.broadcast(prior))
    if loo:
        num = F.col("_ksum") - lab + F.lit(smoothing) * F.col("_prior")
        den = F.col("_kn") - 1 + F.lit(smoothing)
    else:
        num = F.col("_ksum") + F.lit(smoothing) * F.col("_prior")
        den = F.col("_kn") + F.lit(smoothing)
    return j.withColumn(
        "target_enc", F.lit(0.0) + F.round(num / den, 6)
    ).drop("_ksum", "_kn", "_prior")
