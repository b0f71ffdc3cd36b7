"""mann_kendall_trend: tie-corrected S/Var(S) and micro-unit z."""

import collections
import itertools
import math
import random

from pyspark.sql import functions as F

from alphalens_spark.events import mann_kendall_trend


def _py_mk(vals):
    import decimal

    n = len(vals)
    s = sum(
        (b > a) - (b < a) for a, b in itertools.combinations(vals, 2)
    )
    tie = sum(
        c * (c - 1) * (2 * c + 5)
        for c in collections.Counter(vals).values()
    )
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18
    if var <= 0:
        return n, s, tie, None
    z = (s - 1) / math.sqrt(var) if s > 0 else ((s + 1) / math.sqrt(var) if s < 0 else 0.0)
    z_e6 = int(
        decimal.Decimal(repr(z * 1e6)).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )
    return n, s, tie, z_e6


def _run(spark, series):
    rows = [
        (k, d, v) for k, vals in series.items() for d, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "key string, offset int, value_e4 long"
    ).select(
        "key",
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("offset")).alias(
            "day"
        ),
        "value_e4",
    )
    out = mann_kendall_trend(df, ["key"], "day", "value_e4")
    return {
        r["key"]: (r["n"], r["s"], r["tie_term"], r["z_e6"])
        for r in out.collect()
    }


def test_known_shapes(spark):
    series = {
        "up": [1, 2, 3, 4, 5, 6, 7, 8],          # S = C(8,2) = 28
        "down": [8, 7, 6, 5, 4, 3, 2, 1],        # S = -28
        "flat": [5, 5, 5, 5, 5],                 # all tied -> Var = 0
        "single": [42],                           # no pairs
        "zigzag": [1, 3, 2, 4, 3, 5, 4, 6],
    }
    got = _run(spark, series)
    for k, vals in series.items():
        assert got[k] == _py_mk(vals), k
    assert got["up"][1] == 28 and got["down"][1] == -28
    assert got["flat"][3] is None and got["single"][3] is None
    assert got["up"][3] > 0 and got["down"][3] < 0


def test_random_with_ties_matches_reference(spark):
    rng = random.Random(11)
    series = {
        f"k{i}": [rng.randint(-5, 5) for _ in range(rng.randint(2, 50))]
        for i in range(8)
    }
    got = _run(spark, series)
    for k, vals in series.items():
        assert got[k] == _py_mk(vals), k


def test_theil_sen_matches_python_reference(spark):
    import statistics

    from alphalens_spark.events import theil_sen_slope

    rng = random.Random(31)
    series = {
        "trend": [(d, 100 + 37 * d) for d in range(25)],          # exact slope
        "outlier": [(d, 10 * d if d != 12 else 100000) for d in range(20)],
        "noisy": [(d, rng.randint(-100, 100)) for d in range(30)],
        "single": [(0, 5)],
        "pair": [(0, 10), (3, 40)],  # slope (30*1e6)/3 = 1e7
    }
    rows = [
        (k, d, v) for k, vals in series.items() for d, v in vals
    ]
    df = spark.createDataFrame(
        rows, "key string, offset int, value_e4 long"
    ).select(
        "key",
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("offset")).alias(
            "day"
        ),
        "value_e4",
    )
    got = {
        r["key"]: (r["n"], r["n_pairs"], r["slope_e6_per_day"])
        for r in theil_sen_slope(df, ["key"], "day", "value_e4").collect()
    }
    for k, vals in series.items():
        n = len(vals)
        slopes = [
            (v2 - v1) * 1e6 / (d2 - d1)
            for i, (d1, v1) in enumerate(vals)
            for (d2, v2) in vals[i + 1 :]
        ]
        want = (
            n,
            len(slopes),
            int(round(statistics.median(sorted(slopes)))) if slopes else None,
        )
        # statistics.median's even-case mean matches (lo+hi)/2 on these
        # values; the exact-integer slopes make round() unambiguous
        assert got[k] == want, k
    assert got["trend"][2] == 37_000_000
    assert got["pair"][2] == 10_000_000
    # the outlier day perturbs the OLS slope wildly but not the median
    assert abs(got["outlier"][2] - 10_000_000) < 1_500_000
