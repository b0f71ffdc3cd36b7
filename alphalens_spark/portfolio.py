"""Portfolio simulation / pyfolio hand-off (ref performance.py:866-1165).

The reference's only imperative, stateful operator (``positions``,
performance.py:418-448 — a sequential queue of open trades) is an interval
join in disguise; :func:`alphalens_spark.performance.positions` does the
declarative rewrite and everything here composes on top of it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alphalens_spark import performance as perf


def factor_cumulative_returns(
    factor_data: DataFrame,
    period_col: str = "1D",
    period: int = 1,
    long_short: bool = True,
    group_neutral: bool = False,
    equal_weight: bool = False,
    quantiles: Sequence[int] | None = None,
    groups: Sequence[str] | None = None,
) -> DataFrame:
    """Cumulative performance of the factor portfolio
    (ref performance.py:866-933: subset filters → factor_returns →
    cumulative compounding). Output: (date, ret, cum_ret)."""
    df = factor_data
    if quantiles is not None:
        df = df.where(F.col("factor_quantile").isin(list(quantiles)))
    if groups is not None:
        df = df.where(F.col("group").isin(list(groups)))
    rets = perf.factor_returns(
        df, [period_col], demeaned=long_short, group_adjust=group_neutral,
        equal_weight=equal_weight,
    ).withColumnRenamed(f"ret_{period_col}", "ret")
    return perf.cumulative_returns(rets, "ret")  # (date, ret, cum_ret)


def factor_positions(
    factor_data: DataFrame,
    calendar: DataFrame,
    period: int = 1,
    long_short: bool = True,
    group_neutral: bool = False,
    equal_weight: bool = False,
    quantiles: Sequence[int] | None = None,
    groups: Sequence[str] | None = None,
) -> DataFrame:
    """Simulated holdings of the factor portfolio
    (ref performance.py:936-1005). Output: (date, asset, position)."""
    df = factor_data
    if quantiles is not None:
        df = df.where(F.col("factor_quantile").isin(list(quantiles)))
    if groups is not None:
        df = df.where(F.col("group").isin(list(groups)))
    weights = perf.factor_weights(df, long_short, group_neutral, equal_weight)
    return perf.positions(
        weights.select("date", "asset", "weights"), period, calendar
    )


def create_pyfolio_input(
    factor_data: DataFrame,
    calendar: DataFrame,
    period_col: str = "1D",
    period: int = 1,
    capital: float | None = None,
    long_short: bool = True,
    group_neutral: bool = False,
    equal_weight: bool = False,
    quantiles: Sequence[int] | None = None,
    groups: Sequence[str] | None = None,
    benchmark_period_col: str = "1D",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns / positions / benchmark triple (ref performance.py:1008-1165).

    - returns: per-date portfolio return series
    - positions: per-(date, asset) exposures plus a ``cash`` row per date
      (cash = 1 − Σ|position|, ref performance.py:1133-1135); scaled by
      ``capital`` when given (performance.py:1138-1140)
    - benchmark: equal-weight long-only universe mean return
      (performance.py:1148-1163)

    All three are lazy DataFrames; the pyfolio boundary is a tiny
    ``toPandas()`` per frame.
    """
    rets = factor_cumulative_returns(
        factor_data, period_col, period, long_short, group_neutral,
        equal_weight, quantiles, groups,
    ).select("date", "ret")

    pos = factor_positions(
        factor_data, calendar, period, long_short, group_neutral,
        equal_weight, quantiles, groups,
    )
    wd = Window.partitionBy("date")
    pos = pos.withColumn("_gross", F.sum(F.abs("position")).over(wd))
    # try_divide: an all-zero-exposure date yields NULL (not an ANSI
    # DIVIDE_BY_ZERO), matching the NaN the pandas reference emits
    pos = pos.withColumn("position", F.try_divide(F.col("position"), F.col("_gross")))
    cash = (
        pos.groupBy("date")
        .agg((F.lit(1.0) - F.sum(F.abs("position"))).alias("position"))
        .withColumn("asset", F.lit("cash"))
        .select("date", "asset", "position")
    )
    positions = pos.select("date", F.col("asset").cast("string"), "position").unionByName(cash)
    if capital is not None:
        positions = positions.withColumn("position", F.col("position") * F.lit(capital))

    benchmark = factor_data.groupBy("date").agg(
        F.avg(benchmark_period_col).alias("benchmark_ret")
    )
    return rets, positions, benchmark
