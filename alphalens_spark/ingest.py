"""Interop ingestion: reference-shaped pandas inputs → canonical long
DataFrames.

A user of the reference holds a wide prices frame (rows = timestamps,
columns = assets, ref utils.py:707-739) and a MultiIndex factor Series
(ref utils.py:473-489). These helpers melt them into the engine's long
format so the existing two-call workflow ports directly:

    prices_df = ingest.wide_prices_to_long(spark, prices)   # wide pandas
    factor_df = ingest.factor_series_to_long(spark, factor) # MultiIndex
    fd = utils.get_clean_factor_and_forward_returns(factor_df, prices_df)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def wide_prices_to_long(
    spark: SparkSession,
    prices_wide,
    date_col: str = "date",
    asset_col: str = "asset",
    price_col: str = "price",
) -> DataFrame:
    """Wide pandas prices (index=timestamps, columns=assets) → long df.

    Small frames arrive via Arrow `createDataFrame`; the melt happens
    Spark-side with the built-in ``melt`` (Spark 3.4+) so a wide frame
    loaded from parquet/CSV takes the same path at any width.
    """
    pdf = prices_wide.reset_index()
    pdf.columns = [str(c) for c in pdf.columns]
    idx_name = pdf.columns[0]
    sdf = spark.createDataFrame(pdf)
    assets = [c for c in sdf.columns if c != idx_name]
    return (
        sdf.melt(
            ids=[idx_name], values=assets,
            variableColumnName=asset_col, valueColumnName=price_col,
        )
        .withColumnRenamed(idx_name, date_col)
        .where(F.col(price_col).isNotNull())
    )


def read_wide_prices_csv(
    spark: SparkSession,
    path: str,
    date_col: str = "date",
    asset_col: str = "asset",
    price_col: str = "price",
) -> DataFrame:
    """Wide prices CSV (first column timestamps, one column per asset) →
    long DataFrame. Header-driven schema; the melt is the built-in
    ``melt`` so the plan scales to arbitrarily wide files."""
    sdf = spark.read.option("header", True).option("inferSchema", True).csv(path)
    idx_name = sdf.columns[0]
    assets = [c for c in sdf.columns if c != idx_name]
    return (
        sdf.melt(
            ids=[idx_name], values=assets,
            variableColumnName=asset_col, valueColumnName=price_col,
        )
        .select(
            F.col(idx_name).cast("timestamp").alias(date_col),
            F.col(asset_col),
            F.col(price_col).cast("double"),
        )
        .where(F.col(price_col).isNotNull())
    )


def factor_series_to_long(
    spark: SparkSession,
    factor_series,
    date_col: str = "date",
    asset_col: str = "asset",
    factor_col: str = "factor",
) -> DataFrame:
    """MultiIndex (date, asset) pandas Series → long (date, asset, factor)."""
    pdf = factor_series.rename(factor_col).reset_index()
    pdf.columns = [date_col, asset_col, factor_col]
    return spark.createDataFrame(pdf)


def groupby_mapping_to_df(
    spark: SparkSession,
    groupby,
    labels: dict | None = None,
    asset_col: str = "asset",
    group_col: str = "group",
) -> DataFrame:
    """Reference groupby input (dict {asset: group} or MultiIndex Series)
    → join-ready DataFrame, with optional label remap
    (ref utils.py:600-623)."""
    import pandas as pd

    if isinstance(groupby, dict):
        pdf = pd.DataFrame(
            {asset_col: list(groupby), group_col: list(groupby.values())}
        )
    else:
        pdf = groupby.rename(group_col).reset_index()
        pdf.columns = (
            ["date", asset_col, group_col] if pdf.shape[1] == 3 else [asset_col, group_col]
        )
    if labels is not None:
        pdf[group_col] = pdf[group_col].map(labels)
    pdf[group_col] = pdf[group_col].astype(str)
    return spark.createDataFrame(pdf)
