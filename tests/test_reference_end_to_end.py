"""Literal port of the reference's six end-to-end ingestion golden tests.

Reference tests/test_utils.py:188-546: `get_clean_factor_and_forward_returns`
over (1) a daily calendar, (2) a business-day calendar, (3) an intraday
calendar with '1h'/'3h'/'1D' inferred labels, (4) a sparse event factor,
(5) intraday + holidays, (6) business days + holidays. The geometric price
seed (price(asset, t) = ratio**t) makes every forward return closed-form,
so the expected frames are hand-checkable literals.

The six fixtures share one seed: tickers A-F with ratios
[1.10, 0.50, 3.00, 0.90, 0.50, 1.00], groups {A,C,E}→1 / {B,D,F}→2, and a
3-day factor cycle [[3,4,2,1,-,-],[3,-,-,1,4,2],[3,4,2,1,-,-]].
"""

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F

from alphalens_spark.calendar_ import infer_holidays
from alphalens_spark.utils import get_clean_factor_and_forward_returns

TICKERS = ["A", "B", "C", "D", "E", "F"]
RATIOS = [1.10, 0.50, 3.00, 0.90, 0.50, 1.00]
GROUPS = {"A": "1", "B": "2", "C": "1", "D": "2", "E": "1", "F": "2"}

# 3-day factor cycle (None = missing observation, dropped by stack())
FACTOR_CYCLE = [
    [3, 4, 2, 1, None, None],
    [3, None, None, 1, 4, 2],
    [3, 4, 2, 1, None, None],
]

# expected (asset → (1p, 2p, 3p, factor, group, quantile)) per cycle day,
# copied from reference tests/test_utils.py:222-234 (scenarios 1/2/6; the
# intraday scenarios 3/5 swap the return columns for (0.001, -0.002, 1D))
EXPECTED_CYCLE = [
    {
        "A": (0.1, 0.21, 0.331, 3.0, "1", 3),
        "B": (-0.5, -0.75, -0.875, 4.0, "2", 4),
        "C": (2.0, 8.00, 26.000, 2.0, "1", 2),
        "D": (-0.1, -0.19, -0.271, 1.0, "2", 1),
    },
    {
        "A": (0.1, 0.21, 0.331, 3.0, "1", 3),
        "D": (-0.1, -0.19, -0.271, 1.0, "2", 1),
        "E": (-0.5, -0.75, -0.875, 4.0, "1", 4),
        "F": (0.0, 0.00, 0.000, 2.0, "2", 2),
    },
    {
        "A": (0.1, 0.21, 0.331, 3.0, "1", 3),
        "B": (-0.5, -0.75, -0.875, 4.0, "2", 4),
        "C": (2.0, 8.00, 26.000, 2.0, "1", 2),
        "D": (-0.1, -0.19, -0.271, 1.0, "2", 1),
    },
]

HOLIDAYS = [dt.date(2017, 1, 13), dt.date(2017, 1, 18),
            dt.date(2017, 1, 30), dt.date(2017, 2, 7)]


def _bdays(start: dt.date, end: dt.date, holidays=()) -> list[dt.date]:
    days, d = [], start
    while d <= end:
        if d.weekday() < 5 and d not in holidays:
            days.append(d)
        d += dt.timedelta(days=1)
    return days


def _ts(d: dt.date, offset_h: float = 0.0) -> dt.datetime:
    return dt.datetime(d.year, d.month, d.day) + dt.timedelta(hours=offset_h)


def _prices_long(spark, dates, intraday=False):
    """price(asset, t) = ratio ** (t+1) over the date axis; intraday mode
    adds 10:30 (+0.1%) and 12:30 (-0.2%) rows per 9:30 base row
    (reference tests/test_utils.py:316-327)."""
    rows = []
    for i, d in enumerate(dates):
        for a, r in zip(TICKERS, RATIOS):
            base = float(r ** (i + 1))
            if intraday:
                rows.append((_ts(d, 9.5), a, base))
                rows.append((_ts(d, 10.5), a, base * 1.001))
                rows.append((_ts(d, 12.5), a, base * 0.998))
            else:
                rows.append((_ts(d), a, base))
    return spark.createDataFrame(rows, "date timestamp, asset string, price double")


def _factor_long(spark, dates, cycle=None, intraday=False):
    cycle = cycle or FACTOR_CYCLE
    rows = []
    for i, d in enumerate(dates):
        for a, v in zip(TICKERS, cycle[i % len(cycle)]):
            if v is not None:
                rows.append((_ts(d, 9.5 if intraday else 0.0), a, float(v)))
    return spark.createDataFrame(rows, "date timestamp, asset string, factor double")


def _groups_df(spark):
    return spark.createDataFrame(list(GROUPS.items()), "asset string, group string")


def _run(spark, factor_dates, price_dates, intraday=False, cycle=None):
    fd = get_clean_factor_and_forward_returns(
        _factor_long(spark, factor_dates, cycle, intraday),
        _prices_long(spark, price_dates, intraday),
        groupby=_groups_df(spark),
        quantiles=4,
        periods=(1, 2, 3),
        filter_zscore=None,
        max_loss=None,
        label_freq="infer" if intraday else "D",
    )
    return fd


def _check_cycle(fd_rows, factor_dates, period_cols, intraday=False):
    got = {(r["date"], r["asset"]): r for r in fd_rows}
    n_expected = 0
    for i, d in enumerate(factor_dates):
        for a, exp in EXPECTED_CYCLE[i % 3].items():
            n_expected += 1
            r = got[(_ts(d, 9.5 if intraday else 0.0), a)]
            r1, r2, r3, fac, grp, q = exp
            if intraday:
                rets = (0.001, -0.002, r1)  # 1h, 3h, 1D
            else:
                rets = (r1, r2, r3)
            for col, want in zip(period_cols, rets):
                assert math.isclose(r[col], want, rel_tol=1e-9, abs_tol=1e-12), (
                    d, a, col, r[col], want)
            assert r["factor"] == fac and r["group"] == grp
            assert r["factor_quantile"] == q, (d, a, r["factor_quantile"], q)
    assert len(got) == n_expected


def test_end_to_end_1_daily_calendar(spark):
    # reference test_get_clean_factor_and_forward_returns_1 (utils test:188-241)
    days = [dt.date(2015, 1, 11) + dt.timedelta(days=i) for i in range(6)]
    fd = _run(spark, days[:3], days)
    _check_cycle(fd.collect(), days[:3], ["1D", "2D", "3D"])


def test_end_to_end_2_business_calendar(spark):
    # reference ..._2 (243-297): same goldens on a Mon-Fri calendar —
    # row-positional day_idx semantics make the numbers calendar-invariant
    pdays = _bdays(dt.date(2017, 1, 12), dt.date(2017, 1, 19))
    fdays = _bdays(dt.date(2017, 1, 12), dt.date(2017, 1, 16))
    fd = _run(spark, fdays, pdays)
    _check_cycle(fd.collect(), fdays, ["1D", "2D", "3D"])


def test_end_to_end_3_intraday_labels(spark):
    # reference ..._3 (299-361): three timestamps per day; +1/+2/+3 steps
    # land at +1h / +3h / next-day-open and the labels must say so
    pdays = _bdays(dt.date(2017, 1, 12), dt.date(2017, 1, 17))
    fdays = _bdays(dt.date(2017, 1, 12), dt.date(2017, 1, 16))
    fd = _run(spark, fdays, pdays, intraday=True)
    assert set(fd.columns) >= {"1h", "3h", "1D"}
    _check_cycle(fd.collect(), fdays, ["1h", "3h", "1D"], intraday=True)


def test_end_to_end_4_sparse_events(spark):
    # reference ..._4 (363-410): sparse event factor — quantiles computed
    # only across the assets observed that date
    pdays = _bdays(dt.date(2017, 1, 12), dt.date(2017, 1, 23))
    fdays = _bdays(dt.date(2017, 1, 12), dt.date(2017, 1, 18))
    event_cycle = [
        [1, None, None, None, None, 6],
        [4, None, None, 7, None, None],
        [None, None, None, None, None, None],
        [None, 3, None, 2, None, None],
        [None, None, 1, None, 3, None],
    ]
    expected = {
        (fdays[0], "A"): (0.1, 0.21, 0.331, 1.0, "1", 1),
        (fdays[0], "F"): (0.0, 0.00, 0.000, 6.0, "2", 4),
        (fdays[1], "A"): (0.1, 0.21, 0.331, 4.0, "1", 1),
        (fdays[1], "D"): (-0.1, -0.19, -0.271, 7.0, "2", 4),
        (fdays[3], "B"): (-0.5, -0.75, -0.875, 3.0, "2", 4),
        (fdays[3], "D"): (-0.1, -0.19, -0.271, 2.0, "2", 1),
        (fdays[4], "C"): (2.0, 8.00, 26.000, 1.0, "1", 1),
        (fdays[4], "E"): (-0.5, -0.75, -0.875, 3.0, "1", 4),
    }
    fd = _run(spark, fdays, pdays, cycle=event_cycle)
    got = {(r["date"].date(), r["asset"]): r for r in fd.collect()}
    assert set(got) == set(expected)
    for key, (r1, r2, r3, fac, grp, q) in expected.items():
        r = got[key]
        for col, want in zip(["1D", "2D", "3D"], (r1, r2, r3)):
            assert math.isclose(r[col], want, rel_tol=1e-9, abs_tol=1e-12), (
                key, col, r[col], want)
        assert r["factor"] == fac and r["group"] == grp
        assert r["factor_quantile"] == q


def test_end_to_end_5_intraday_holidays(spark):
    # reference ..._5 (412-483): 18 factor days on a holiday-punched
    # business calendar, intraday timestamps; plus the holiday-inference
    # assertion (the reference reads them off the index freq)
    pdays = _bdays(dt.date(2017, 1, 12), dt.date(2017, 2, 13), HOLIDAYS)
    fdays = _bdays(dt.date(2017, 1, 12), dt.date(2017, 2, 10), HOLIDAYS)
    fd = _run(spark, fdays, pdays, intraday=True)
    _check_cycle(fd.collect(), fdays, ["1h", "3h", "1D"], intraday=True)
    dates = _prices_long(spark, pdays, intraday=True).select(
        F.date_trunc("day", "date").alias("date")
    ).distinct()
    inferred = sorted(r["holiday"] for r in infer_holidays(dates).collect())
    assert inferred == sorted(HOLIDAYS)


def test_end_to_end_6_daily_holidays(spark):
    # reference ..._6 (485-546)
    pdays = _bdays(dt.date(2017, 1, 12), dt.date(2017, 2, 15), HOLIDAYS)
    fdays = _bdays(dt.date(2017, 1, 12), dt.date(2017, 2, 10), HOLIDAYS)
    fd = _run(spark, fdays, pdays)
    _check_cycle(fd.collect(), fdays, ["1D", "2D", "3D"])
    inferred = sorted(
        r["holiday"]
        for r in infer_holidays(_prices_long(spark, pdays)).collect()
    )
    assert inferred == sorted(HOLIDAYS)


def test_end_to_end_7_tz_aware_parity(spark):
    """Tz-aware inputs through the FULL pipeline (ref tests/test_tears.py
    143-150 smoke-tests US/Eastern-localized prices+factor; we assert
    numeric equality, not just absence of exceptions).

    Three runs over identical wall clocks: TIMESTAMP_NTZ (naive),
    TimestampType at session UTC, and TimestampType localized to
    America/New_York (different underlying instants). Every derived
    number — forward returns, factor, quantile label, then
    mean_return_by_quantile — must agree, because dates are opaque
    equi-join keys throughout; only the date VALUES differ by the
    localization offset. Dates are aligned across runs by rank order.
    """
    from zoneinfo import ZoneInfo

    from alphalens_spark import performance as perf

    dates = _bdays(dt.date(2017, 1, 3), dt.date(2017, 1, 31))
    tz = ZoneInfo("America/New_York")

    def build(kind):
        pr = _prices_long(spark, dates)
        fa = _factor_long(spark, dates)
        if kind == "ntz":
            pr = pr.withColumn("date", F.col("date").cast("timestamp_ntz"))
            fa = fa.withColumn("date", F.col("date").cast("timestamp_ntz"))
        elif kind == "eastern":
            rows_p = [(d.replace(tzinfo=tz), a, p) for d, a, p in pr.collect()]
            rows_f = [(d.replace(tzinfo=tz), a, v) for d, a, v in fa.collect()]
            pr = spark.createDataFrame(rows_p, "date timestamp, asset string, price double")
            fa = spark.createDataFrame(rows_f, "date timestamp, asset string, factor double")
        return fa, pr

    results = {}
    for kind in ("ntz", "utc", "eastern"):
        fa, pr = build(kind)
        fd = get_clean_factor_and_forward_returns(
            fa, pr, groupby=_groups_df(spark), quantiles=4,
            periods=(1, 2, 3), filter_zscore=None, max_loss=None,
        )
        rows = fd.collect()
        didx = {d: i for i, d in enumerate(sorted({r["date"] for r in rows}))}
        results[kind] = (
            {
                (didx[r["date"]], r["asset"]): (
                    round(r["1D"], 9), round(r["2D"], 9), round(r["3D"], 9),
                    r["factor"], r["group"], r["factor_quantile"],
                )
                for r in rows
            },
            {
                (r["factor_quantile"],): round(r["mean_1D"], 9)
                for r in perf.mean_return_by_quantile(fd, ["1D", "2D", "3D"]).collect()
            },
        )
    assert results["ntz"] == results["utc"] == results["eastern"]
    assert len(results["ntz"][0]) > 0
