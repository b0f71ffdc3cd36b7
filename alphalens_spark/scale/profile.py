"""Single-pass column profiling — the data-quality screen a pipeline runs
before training on a new source.

One ``agg`` computes every statistic for every requested column
simultaneously (Catalyst evaluates them in a single scan with map-side
partial aggregation; the only full-shuffle component is the exact
distinct count, which Spark plans via Expand — swap to
``approx_count_distinct`` with ``exact_distinct=False`` when profiling
petabyte tables, where a 2% HLL estimate is the standard trade). The
1-row result is reshaped driver-free into one row per column with an
inline explode — no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "kmv_distinct"]


def profile_columns(
    df: DataFrame,
    cols: list[str],
    exact_distinct: bool = True,
) -> DataFrame:
    """Numeric profile of ``cols``: row/null/distinct counts, min/max,
    mean, and exact interpolated quartiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont`` semantics — never the approximate sketch,
    so results are engine-reproducible).

    Output: (column, n_rows, n_nonnull, n_nulls, n_distinct, min_value,
    max_value, mean, p25, p50, p75), one row per profiled column.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        d = F.col(c).cast("double")
        distinct = (
            F.countDistinct(F.col(c)) if exact_distinct else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            distinct.alias(f"{c}__nd"),
            F.min(d).alias(f"{c}__min"),
            F.max(d).alias(f"{c}__max"),
            F.avg(d).alias(f"{c}__mean"),
            F.percentile(d, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias(
                f"{c}__q"
            ),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_nonnull"),
                (F.col("_n") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.round(f"{c}__min", 6).alias("min_value"),
                F.round(f"{c}__max", 6).alias("max_value"),
                F.round(f"{c}__mean", 6).alias("mean"),
                F.round(F.col(f"{c}__q")[0], 6).alias("p25"),
                F.round(F.col(f"{c}__q")[1], 6).alias("p50"),
                F.round(F.col(f"{c}__q")[2], 6).alias("p75"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002) —
    the mergeable cardinality estimator for when even Spark's exact
    distinct (an Expand + full shuffle of every distinct value) is too
    much state per group, and unlike HLL the sketch is plain integers:
    deterministic, engine-reproducible, and therefore fully
    oracle-checkable against another SQL engine.

    Estimator: hash every value to u ~ Uniform via a 60-bit md5 prefix;
    with h_(k) the k-th smallest DISTINCT hash, E[d] ≈ (k−1)/(h_(k)/2^60).
    Groups with fewer than k distinct hashes report their exact count.

    Scale shape: project→hash, distinct on (group, hash) — map-side
    partial dedupe, ONE shuffle on a uniform key — then a per-group
    bottom-k window over at most d rows and a final tiny aggregate.
    No value ever travels whole: only 8-byte hashes shuffle.
    Output: (group…, n_mins, est_distinct).
    """
    from pyspark.sql import Window

    from alphalens_spark.scale.dedup import md5_long

    h = md5_long(F.col(value_col).cast("string"), 15)
    dh = df.select(*group_cols, h.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    topk = dh.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    h_max = float(1 << 60)
    est = F.when(
        F.col("n_mins") < k, F.col("n_mins").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("_kth").cast("double") / F.lit(h_max)))
    return (
        topk.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast("int").alias("n_mins"), F.max("_h").alias("_kth"))
        .select(*group_cols, "n_mins", F.round(est, 6).alias("est_distinct"))
    )
