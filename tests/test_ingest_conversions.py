"""Tests for pandas interop ingestion and rate/std conversions."""

import datetime as dt
import math

import pandas as pd

from alphalens_spark import ingest
from alphalens_spark.calendar_ import trading_calendar
from alphalens_spark.utils import backshift_returns_series, rate_of_return, std_conversion

D = lambda i: dt.datetime(2020, 1, 1) + dt.timedelta(days=i)


def test_wide_prices_to_long(spark):
    wide = pd.DataFrame(
        {"A": [1.0, 2.0], "B": [10.0, None]},
        index=pd.DatetimeIndex([D(0), D(1)], name="date"),
    )
    out = {(r["date"], r["asset"]): r["price"]
           for r in ingest.wide_prices_to_long(spark, wide).collect()}
    assert out == {(D(0), "A"): 1.0, (D(1), "A"): 2.0, (D(0), "B"): 10.0}


def test_factor_series_to_long(spark):
    idx = pd.MultiIndex.from_product([[D(0), D(1)], ["A", "B"]], names=["date", "asset"])
    s = pd.Series([1.0, 2.0, 3.0, 4.0], index=idx)
    out = ingest.factor_series_to_long(spark, s).collect()
    assert len(out) == 4
    assert {r["factor"] for r in out} == {1.0, 2.0, 3.0, 4.0}


def test_groupby_mapping_dict_and_labels(spark):
    out = {r["asset"]: r["group"] for r in
           ingest.groupby_mapping_to_df(
               spark, {"A": 1, "B": 2}, labels={1: "tech", 2: "energy"}
           ).collect()}
    assert out == {"A": "tech", "B": "energy"}


def test_rate_of_return(spark):
    df = spark.createDataFrame([(0.21,)], "`5D` double")
    out = rate_of_return(df, ["5D"]).collect()[0]
    assert math.isclose(out["5D"], 1.21 ** 0.2 - 1, rel_tol=1e-12)


def test_std_conversion(spark):
    df = spark.createDataFrame([(2.0,)], "`4D` double")
    out = std_conversion(df, ["4D"]).collect()[0]
    assert math.isclose(out["4D"], 1.0, rel_tol=1e-12)


def test_backshift_returns_series(spark):
    rets = spark.createDataFrame(
        [(D(i), "A", float(i)) for i in range(3)],
        "date timestamp, asset string, r double",
    )
    cal = trading_calendar(rets)
    out = {r["date"]: r["r_shifted"]
           for r in backshift_returns_series(rets, 1, cal, ["r"]).collect()}
    assert out == {D(1): 0.0, D(2): 1.0}  # each date sees the prior value


def test_read_wide_prices_csv(spark, tmp_path):
    csv = tmp_path / "prices.csv"
    csv.write_text("date,A,B\n2020-01-01,1.0,10.0\n2020-01-02,2.0,\n")
    out = {(r["date"], r["asset"]): r["price"]
           for r in ingest.read_wide_prices_csv(spark, str(csv)).collect()}
    assert out == {(D(0), "A"): 1.0, (D(1), "A"): 2.0, (D(0), "B"): 10.0}


def test_write_factor_data_partitioned_prunes(spark, tmp_path):
    from alphalens_spark import datasets

    fd = datasets.factor_data(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "fd")
    datasets.write_factor_data_partitioned(fd, out)
    back = spark.read.parquet(out)
    assert back.count() == fd.count()
    pruned = back.where(F.col("date_month") == "1995-03")
    # partition filter must reach the scan, not a post-scan filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or pruned.count() < back.count()
    assert pruned.count() > 0


from pyspark.sql import functions as F  # noqa: E402


def test_datasets_ingest_matches_separate_builders(spark):
    """datasets.ingest derives factor_data AND prices from one shared
    panel: outputs must equal the standalone factor_data()/prices()
    builders row for row."""
    from alphalens_spark import datasets

    sf_dir = "/root/testdata/sf0.001"
    fd_i, px_i, panel = datasets.ingest(spark, sf_dir)
    fd_s = datasets.factor_data(spark, sf_dir)
    px_s = datasets.prices(spark, sf_dir)

    def key(df):
        return sorted(tuple(r) for r in df.collect())

    assert fd_i.columns == fd_s.columns
    assert key(fd_i) == key(fd_s)
    assert key(px_i) == key(px_s)
    panel.unpersist()
