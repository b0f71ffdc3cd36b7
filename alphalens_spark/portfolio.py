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


def resample_daily_ffill(
    df: DataFrame,
    value_cols: Sequence[str],
    keys: Sequence[str] = (),
    date_col: str = "date",
    how: str = "last",
) -> DataFrame:
    """``resample('1D').last()/sum() + ffill`` (ref performance.py:1118,
    1133): densify to a calendar-day grid and forward-fill gaps.

    Grid = ``sequence(min(date), max(date), interval 1 day)`` from a
    1-row bounds aggregate, exploded (cross-joined with the key dim for
    per-key frames — pandas ffills each wide column, i.e. per asset).
    Per-day aggregation first (``how``: 'last' for level series, 'sum'
    for flows, matching the two reference call sites), then
    ``last(value, ignorenulls=True)`` over an expanding window per key.
    With keys the window partitions by them (scales); without, the input
    is a per-date series — one row per calendar day at any data scale —
    so the single ordered partition is deliberate.
    """
    bounds = df.agg(F.min(date_col).alias("_mn"), F.max(date_col).alias("_mx"))
    grid = bounds.select(
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.expr("interval 1 day"))
        ).alias(date_col)
    )
    if keys:
        grid = grid.crossJoin(df.select(*keys).distinct())
    agg_fn = (lambda c: F.last(c, ignorenulls=True)) if how == "last" else F.sum
    per_day = df.groupBy(*keys, date_col).agg(
        *[agg_fn(c).alias(c) for c in value_cols]
    )
    joined = grid.join(per_day, [*keys, date_col], "left")
    w = (
        Window.partitionBy(*keys).orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        *keys,
        date_col,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )


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
    daily: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns / positions / benchmark triple (ref performance.py:1008-1165).

    - returns: portfolio return series. ``daily=True`` reproduces the
      reference exactly (performance.py:1112-1119): cumulative level →
      resample to the 1-day calendar grid, ffill, pct_change, first-row
      0 — weekends carry the level so their daily return is 0 and each
      trading gap's return lands on its close date.
    - positions: per-(date, asset) exposures normalized by per-date
      gross, plus a ``cash`` row = 1 − NET sum (performance.py:1133-1135
      normalizes by ``abs().sum`` then ``cash = 1 - positions.sum`` —
      the plain sum: a balanced long-short book holds ~full cash);
      ``daily=True`` resamples per-day sums to the day grid and ffills
      per asset before normalizing. Scaled by ``capital`` when given.
    - benchmark: per-date universe mean of ``benchmark_period_col`` (the
      equal-weight long-only portfolio the reference builds at
      performance.py:1148-1163).

    All lazy; the pyfolio boundary is a tiny ``toPandas()`` per frame.
    """
    cum = factor_cumulative_returns(
        factor_data, period_col, period, long_short, group_neutral,
        equal_weight, quantiles, groups,
    )
    if daily:
        dcum = resample_daily_ffill(cum.select("date", "cum_ret"), ["cum_ret"])
        # deliberate global window: per-day series, one row per calendar day
        wday = Window.orderBy("date")
        rets = dcum.select(
            "date",
            F.coalesce(
                F.try_divide(F.col("cum_ret"), F.lag("cum_ret").over(wday))
                - F.lit(1.0),
                F.lit(0.0),
            ).alias("ret"),
        )
    else:
        rets = cum.select("date", "ret")

    pos = factor_positions(
        factor_data, calendar, period, long_short, group_neutral,
        equal_weight, quantiles, groups,
    )
    if daily:
        pos = resample_daily_ffill(
            pos, ["position"], keys=["asset"], how="sum"
        ).na.drop(subset=["position"])  # days before an asset's first trade
    wd = Window.partitionBy("date")
    pos = pos.withColumn("_gross", F.sum(F.abs("position")).over(wd))
    # try_divide + coalesce: an all-zero-exposure date gets 0 positions,
    # the reference's ``.fillna(0)`` after the div (performance.py:1134)
    pos = pos.withColumn(
        "position",
        F.coalesce(F.try_divide(F.col("position"), F.col("_gross")), F.lit(0.0)),
    )
    cash = (
        pos.groupBy("date")
        .agg((F.lit(1.0) - F.sum("position")).alias("position"))
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
