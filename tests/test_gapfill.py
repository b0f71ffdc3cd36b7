"""gap_fill_daily: dense-calendar LOCF + exact-integer linear interpolation.

Covers the semantics the driver query cannot reach (its grid derives from
observed min/max, so edge rows never occur there): common-calendar
leading/trailing edges, multi-day interior gaps, single-observation keys,
and the integer-grid determinism contract.
"""

import datetime as dt

from pyspark.sql import functions as F

from alphalens_spark.events import gap_fill_daily


def _mk(spark, rows):
    df = spark.createDataFrame(rows, "key string, day string, value_e4 long")
    return df.withColumn("day", F.to_date("day"))


def _by_day(out, key):
    return {
        r["day"]: r
        for r in out.where(F.col("key") == key).collect()
    }


def test_interior_gap_linear_and_locf(spark):
    # observations at day 1 (100) and day 5 (500): days 2-4 interpolate
    # on the exact-integer grid, LOCF carries 100 across the gap.
    daily = _mk(
        spark,
        [("a", "2024-01-01", 100), ("a", "2024-01-05", 500)],
    )
    out = gap_fill_daily(daily, ["key"]).collect()
    assert len(out) == 5
    got = {r["day"].day: r for r in out}
    for d, want in [(1, 100), (2, 200), (3, 300), (4, 400), (5, 500)]:
        assert got[d]["interp_e4"] == want, d
    for d in (2, 3, 4):
        assert got[d]["locf_e4"] == 100
        assert got[d]["value_e4"] is None
        assert got[d]["is_observed"] is False
    assert got[1]["is_observed"] and got[5]["is_observed"]


def test_rounding_is_half_away_on_both_signs(spark):
    # 3-day gap over a span of 2 with values 0 and 1: midpoint 0.5 -> 1
    # (HALF_UP away from zero); negative twin -0.5 -> -1.
    daily = _mk(
        spark,
        [
            ("p", "2024-01-01", 0),
            ("p", "2024-01-03", 1),
            ("n", "2024-01-01", 0),
            ("n", "2024-01-03", -1),
        ],
    )
    out = gap_fill_daily(daily, ["key"])
    pos = _by_day(out, "p")[dt.date(2024, 1, 2)]
    neg = _by_day(out, "n")[dt.date(2024, 1, 2)]
    assert pos["interp_e4"] == 1
    assert neg["interp_e4"] == -1


def test_common_calendar_edges(spark):
    # start/end extend beyond the observed span: leading rows NULL in
    # both fill columns, trailing rows LOCF but interp stays NULL.
    daily = _mk(spark, [("a", "2024-01-03", 30), ("a", "2024-01-04", 40)])
    out = gap_fill_daily(
        daily, ["key"], start="2024-01-01", end="2024-01-06"
    )
    got = {r["day"].day: r for r in out.collect()}
    assert sorted(got) == [1, 2, 3, 4, 5, 6]
    for d in (1, 2):  # leading edge
        assert got[d]["locf_e4"] is None
        assert got[d]["interp_e4"] is None
    for d in (5, 6):  # trailing edge: carry, don't extrapolate
        assert got[d]["locf_e4"] == 40
        assert got[d]["interp_e4"] is None


def test_single_observation_key_and_key_isolation(spark):
    # a one-row key yields exactly its own row by default; other keys'
    # observations never leak across the partition boundary.
    daily = _mk(
        spark,
        [
            ("solo", "2024-01-02", 7),
            ("b", "2024-01-01", 1),
            ("b", "2024-01-03", 3),
        ],
    )
    out = gap_fill_daily(daily, ["key"])
    solo = out.where(F.col("key") == "solo").collect()
    assert len(solo) == 1
    assert solo[0]["interp_e4"] == 7 and solo[0]["locf_e4"] == 7
    b = _by_day(out, "b")
    assert b[dt.date(2024, 1, 2)]["interp_e4"] == 2


def test_observed_rows_pass_through_unchanged(spark):
    daily = _mk(
        spark,
        [("a", "2024-01-0%d" % d, v) for d, v in [(1, 5), (2, -9), (3, 11)]],
    )
    out = gap_fill_daily(daily, ["key"]).collect()
    for r in out:
        assert r["is_observed"] is True
        assert r["interp_e4"] == r["value_e4"]
        assert r["locf_e4"] == r["value_e4"]
