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


def purged_time_splits(
    df: DataFrame,
    date_col: str = "date",
    n_folds: int = 5,
    purge: int = 0,
    embargo: int = 0,
) -> DataFrame:
    """Purged K-fold time splits with embargo — the leakage-safe
    cross-validation scheme for overlapping-label panels (López de
    Prado, *Advances in Financial Machine Learning* 2018, ch. 7,
    simplified to contiguous folds): a factor whose forward return spans
    h days leaks into any test block whose start lies within h days
    after a training date, so those trailing training dates are PURGED;
    ``embargo`` additionally drops the dates right after the test block
    (serial-correlation bleed-back).

    Folds are contiguous date blocks: fold(d) = floor(idx·K/N) over the
    ranked distinct-date axis — explicit integer-exact arithmetic, not
    ntile, so any engine reproduces the assignment. Output is the
    date-dimension-sized fold map (fold, date, role) with role ∈
    {'test', 'purged', 'embargo', 'train'}; broadcast-join it back to
    the panel to materialize per-fold training sets.

    Scale shape: one collect_set over dates (dimension-sized, the same
    calendar pattern every date-axis op here uses), an explode by K, and
    a broadcast of the K-row bounds table. Nothing row-count-sized.
    """
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    dd = (
        df.agg(F.array_sort(F.collect_set(date_col)).alias("_ds"))
        .select(F.posexplode("_ds").alias("idx", "date"))
    )
    n = dd.agg(F.count(F.lit(1)).alias("_n"))
    folded = dd.crossJoin(F.broadcast(n)).select(
        "idx",
        "date",
        F.least(
            F.floor(F.col("idx") * n_folds / F.col("_n")), F.lit(n_folds - 1)
        ).cast("int").alias("_fold_of"),
    )
    bounds = folded.groupBy("_fold_of").agg(
        F.min("idx").alias("_lo"), F.max("idx").alias("_hi")
    ).withColumnRenamed("_fold_of", "fold")
    exploded = folded.withColumn(
        "fold", F.explode(F.sequence(F.lit(0), F.lit(n_folds - 1)))
    ).withColumn("fold", F.col("fold").cast("int"))
    j = exploded.join(F.broadcast(bounds), "fold")
    role = (
        F.when(F.col("idx").between(F.col("_lo"), F.col("_hi")), "test")
        .when(
            (F.col("idx") >= F.col("_lo") - purge) & (F.col("idx") < F.col("_lo")),
            "purged",
        )
        .when(
            (F.col("idx") > F.col("_hi")) & (F.col("idx") <= F.col("_hi") + embargo),
            "embargo",
        )
        .otherwise("train")
    )
    return j.select("fold", "date", role.alias("role"))
