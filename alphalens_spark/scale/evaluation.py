"""Classifier-evaluation operators: calibration and ranking quality.

The measured-eval companions to the retrieval/dedup recall gates
(ann_recall_eval, dedup_recall_eval): before a score column (a quality
classifier, a language-ID heuristic, a relevance model) gates a 100 TB
pipeline, these report whether its probabilities mean anything
(reliability/Brier) and whether its ordering separates the classes
(AUC) — both as exact integer arithmetic on the 1e-6 score grid, so
every number replays in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["reliability_report", "auc_score", "average_precision"]


def reliability_report(
    scored: DataFrame,
    score_e6_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability (calibration) table + Brier decomposition input: bin
    predictions by score, compare each bin's mean predicted probability
    with its empirical positive rate (Murphy 1973; the reliability
    diagram's data). A calibrated scorer has avg_score ≈ pos_rate per
    bin; the squared-error sums aggregate to the Brier score.

    Contract: ``score_e6_col`` is an INTEGER score on the 1e-6
    probability grid (callers produce it with exact integer division,
    e.g. ``n_matches·1e6 DIV n_total``) and ``label_col`` is 0/1 —
    so bin assignment, means, rates, and squared errors are all exact
    BIGINT arithmetic, summation-order-proof on both engines.

    One groupBy on the bin dimension. Output: (bin, n, n_pos,
    avg_score_e6, pos_rate_e6, brier_e12_sum) — global Brier =
    Σ brier_e12_sum / Σ n / 1e12.
    """
    s = F.col(score_e6_col).cast("long")
    y = F.col(label_col).cast("long")
    b = F.least(
        F.lit(n_bins - 1), F.expr(f"CAST({score_e6_col} AS BIGINT) * {n_bins} DIV 1000000")
    ).cast("int")
    err = s - y * F.lit(1000000).cast("long")
    return (
        scored.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(y).cast("long").alias("n_pos"),
            F.sum(s).alias("_ssum"),
            F.sum(err * err).cast("long").alias("brier_e12_sum"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("CAST(_ssum DIV n AS BIGINT)").alias("avg_score_e6"),
            F.expr("CAST(n_pos * 1000000 DIV n AS BIGINT)").alias(
                "pos_rate_e6"
            ),
            "brier_e12_sum",
        )
    )


def auc_score(
    scored: DataFrame,
    score_e6_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney rank identity:
    AUC = (Σ ranks(positives) − n₊(n₊+1)/2) / (n₊·n₋) with AVERAGE
    ranks on ties — computed without ever ranking individual rows.

    Scale shape: one groupBy collapses rows to the DISTINCT-score
    dimension (bounded by the 1e-6 grid — ≤ 1e6+1 rows at any data
    size), an ordered cumulative window over that bounded grid yields
    each tie group's rank block, and doubled integer rank sums
    (2·rank = 2·cum_before + n + 1, always integral) keep everything
    BIGINT-exact until the single final division. The per-row
    sort-and-rank a naive AUC needs — a full data shuffle — never
    happens. Output: one row (n_pos, n_neg, auc).
    """
    s = F.col(score_e6_col).cast("long")
    y = F.col(label_col).cast("long")
    per_s = scored.groupBy(s.alias("_s")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(y).cast("long").alias("_np"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    # window over the DISTINCT-SCORE dimension only (≤ 1e6+1 rows by the
    # integer-grid contract) — never row-count-sized
    cum = per_s.withColumn(
        "_before", F.coalesce(F.sum("_n").over(w), F.lit(0))
    )
    # 2·(average tie rank) = 2·cum_before + n + 1  (exact integer)
    rank2 = 2 * F.col("_before") + F.col("_n") + 1
    agg = cum.agg(
        F.sum(F.col("_np") * rank2).alias("_s2"),
        F.sum("_np").alias("_npos"),
        F.sum(F.col("_n") - F.col("_np")).alias("_nneg"),
    )
    auc = (
        F.col("_s2").cast("double") / 2.0
        - F.col("_npos").cast("double")
        * (F.col("_npos").cast("double") + 1.0)
        / 2.0
    ) / (F.col("_npos").cast("double") * F.col("_nneg").cast("double"))
    return agg.select(
        F.col("_npos").cast("long").alias("n_pos"),
        F.col("_nneg").cast("long").alias("n_neg"),
        (F.round(auc, 6) + F.lit(0.0)).alias("auc"),
    )


def average_precision(
    scored: DataFrame,
    score_e6_col: str,
    label_col: str,
) -> DataFrame:
    """Exact average precision (the step-wise PR-curve area, sklearn's
    ``average_precision_score`` definition): AP = Σ_k (R_k − R_{k−1})·P_k
    over descending score thresholds, ties collapsed per threshold —
    the ranking metric that, unlike AUC, weights the head of the
    ranking where retrieval/filter decisions actually happen.

    Same scale shape as :func:`auc_score`: rows collapse to the
    DISTINCT-score dimension (bounded by the 1e-6 grid), cumulative
    TP/total counts come from an ordered window over that bounded grid,
    and the AP sum itself is ANOTHER ordered-window running sum (its
    terms are genuine fractions, so sequential frame-order accumulation
    — deterministic on both engines — replaces the order-unstable
    groupBy float sum); the last running-total row is the answer.
    Output: one row (n_pos, n_neg, average_precision).
    """
    s = F.col(score_e6_col).cast("long")
    y = F.col(label_col).cast("long")
    per_s = scored.groupBy(s.alias("_s")).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(y).cast("long").alias("_np"),
    )
    w_desc = Window.orderBy(F.col("_s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    cum = per_s.select(
        "_s",
        "_n",
        "_np",
        F.sum("_n").over(w_desc).alias("_all"),
        F.sum("_np").over(w_desc).alias("_tp"),
        F.sum("_np").over(w_all).alias("_npos"),
        F.sum(F.col("_n") - F.col("_np")).over(w_all).alias("_nneg"),
    )
    term = (
        F.col("_np").cast("double") / F.col("_npos").cast("double")
    ) * (F.col("_tp").cast("double") / F.col("_all").cast("double"))
    run = cum.select(
        "_all",
        "_npos",
        "_nneg",
        F.sum(term).over(w_desc).alias("_ap"),
    )
    last = run.orderBy(F.col("_all").desc()).limit(1)
    return last.select(
        F.col("_npos").cast("long").alias("n_pos"),
        F.col("_nneg").cast("long").alias("n_neg"),
        (F.round(F.col("_ap"), 6) + F.lit(0.0)).alias("average_precision"),
    )
