"""cusum_changepoints: exact-integer two-sided CUSUM with alarm restart."""

import random

from pyspark.sql import functions as F

from alphalens_spark.events import cusum_changepoints


def _py_cusum(vals, baseline, drift_frac, threshold_frac):
    import decimal

    nb = min(len(vals), baseline)
    mu = int(
        decimal.Decimal(repr(sum(vals[:nb]) / nb)).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )
    k = int(
        decimal.Decimal(repr(abs(mu) * drift_frac)).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )
    h = int(
        decimal.Decimal(repr(abs(mu) * threshold_frac)).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )
    out, gp, gn = [], 0, 0
    for v in vals:
        gp = max(0, gp + (v - mu - k))
        gn = max(0, gn + (mu - v - k))
        alarm = 1 if gp > h else (-1 if gn > h else 0)
        out.append((v, gp, gn, alarm))
        if alarm:
            gp, gn = 0, 0
    return out


def _run(spark, vals, **kw):
    rows = [("k", d, v) for d, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "key string, offset int, value_e4 long"
    ).select(
        "key",
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("offset")).alias(
            "day"
        ),
        "value_e4",
    )
    out = cusum_changepoints(df, ["key"], "day", "value_e4", **kw)
    return [
        (r["value_e4"], r["gpos"], r["gneg"], r["alarm_side"])
        for r in out.orderBy("day").collect()
    ]


def test_upward_shift_alarms_and_restarts(spark):
    # baseline 100; shift to 180 -> g+ grows by ~75/day past k; alarm at
    # >50 then restart accumulates again
    vals = [100, 101, 99, 100, 180, 180, 180, 180]
    got = _run(
        spark, vals, baseline=4, drift_frac=0.05, threshold_frac=0.5
    )
    assert got == _py_cusum(vals, 4, 0.05, 0.5)
    alarms = [g[3] for g in got]
    assert 1 in alarms  # upward side fired
    # after each alarm the accumulator restarted (next gpos starts fresh)
    first = alarms.index(1)
    if first + 1 < len(got):
        v, gp, _, _ = got[first + 1]
        assert gp == max(0, v - 100 - 5)


def test_downward_shift_fires_negative_side(spark):
    vals = [1000, 1000, 1000, 100, 100]
    got = _run(spark, vals, baseline=3, drift_frac=0.0, threshold_frac=0.5)
    assert got == _py_cusum(vals, 3, 0.0, 0.5)
    assert -1 in [g[3] for g in got]
    assert 1 not in [g[3] for g in got]


def test_stable_series_never_alarms(spark):
    vals = [100, 102, 98, 101, 99, 100, 103, 97, 100]
    got = _run(spark, vals, baseline=7, drift_frac=0.05, threshold_frac=0.5)
    assert got == _py_cusum(vals, 7, 0.05, 0.5)
    assert all(g[3] == 0 for g in got)


def test_short_series_baseline_truncates(spark):
    vals = [10, 30]  # fewer rows than the baseline window
    got = _run(spark, vals, baseline=7, drift_frac=0.05, threshold_frac=0.5)
    assert got == _py_cusum(vals, 7, 0.05, 0.5)


def test_random_series_match_python_reference(spark):
    rng = random.Random(99)
    vals = [rng.randint(-500, 1500) for _ in range(60)]
    got = _run(spark, vals, baseline=7, drift_frac=0.02, threshold_frac=0.3)
    assert got == _py_cusum(vals, 7, 0.02, 0.3)
