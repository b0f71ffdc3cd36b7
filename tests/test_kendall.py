"""kendall_tau_ic: tau-b counts and micro-unit tau, both impls.

The 'pairs' impl is the O(a²) expression definition (the oracle twin);
'sorted' is the production Arrow merge-sort path. They must agree
exactly — every output column is an integer, so equality is exact, not
approximate.
"""

import collections
import itertools
import math
import random

from pyspark.sql import functions as F

from alphalens_spark.performance import kendall_tau_ic


def _brute(rows):
    """O(n²) python reference for one date: (s, xtie, ytie, tau_e6)."""
    import decimal

    n = len(rows)
    n0 = n * (n - 1) // 2
    s = 0
    for (x1, y1), (x2, y2) in itertools.combinations(rows, 2):
        dx = (x1 > x2) - (x1 < x2)
        dy = (y1 > y2) - (y1 < y2)
        s += dx * dy
    xtie = sum(
        c * (c - 1) // 2
        for c in collections.Counter(x for x, _ in rows).values()
    )
    ytie = sum(
        c * (c - 1) // 2
        for c in collections.Counter(y for _, y in rows).values()
    )
    dxp, dyp = n0 - xtie, n0 - ytie
    tau = None
    if dxp > 0 and dyp > 0:
        v = s / (math.sqrt(dxp) * math.sqrt(dyp)) * 1e6
        tau = int(
            decimal.Decimal(repr(v)).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
            )
        )
    return s, xtie, ytie, tau


def _df(spark, data):
    # data: list of (date, asset, factor, ret)
    df = spark.createDataFrame(
        data, "date string, asset long, factor double, fwd_1p double"
    )
    return df.withColumn("date", F.to_timestamp("date"))


def test_both_impls_match_brute_force_with_ties(spark):
    rng = random.Random(7)
    data = []
    per_date = {}
    for d in ("2024-01-01", "2024-01-02", "2024-01-03"):
        rows = []
        for a in range(40):
            # coarse grids force plenty of ties in x, y, and jointly
            x = rng.randint(0, 9) / 10.0
            y = rng.randint(-4, 4) / 8.0
            rows.append((x, y))
            data.append((d, a, x, y))
        per_date[d] = rows

    for impl in ("pairs", "sorted"):
        out = {
            str(r["date"].date()): r
            for r in kendall_tau_ic(_df(spark, data), ["fwd_1p"], impl=impl)
            .collect()
        }
        assert len(out) == 3
        for d, rows in per_date.items():
            s, xtie, ytie, tau = _brute(rows)
            r = out[d]
            assert r["n"] == len(rows)
            assert r["s_fwd_1p"] == s, (impl, d)
            assert r["xtie"] == xtie and r["ytie_fwd_1p"] == ytie
            assert r["tau_fwd_1p_e6"] == tau, (impl, d)


def test_impls_exactly_equal_on_larger_random(spark):
    rng = random.Random(123)
    data = [
        (f"2024-02-{d:02d}", a, rng.gauss(0, 1), rng.gauss(0, 1))
        for d in range(1, 11)
        for a in range(137)
    ]
    df = _df(spark, data)
    cols = ["date", "n", "xtie", "s_fwd_1p", "ytie_fwd_1p", "tau_fwd_1p_e6"]
    p = kendall_tau_ic(df, ["fwd_1p"], impl="pairs").select(*cols)
    s = kendall_tau_ic(df, ["fwd_1p"], impl="sorted").select(*cols)
    assert p.exceptAll(s).count() == 0 and s.exceptAll(p).count() == 0


def test_degenerate_cross_sections(spark):
    data = [
        # all x tied -> denominator 0 -> tau NULL, s = 0
        ("2024-03-01", 0, 1.0, 0.1),
        ("2024-03-01", 1, 1.0, 0.2),
        ("2024-03-01", 2, 1.0, 0.3),
        # single row -> n0 = 0 -> tau NULL
        ("2024-03-02", 0, 2.0, 0.5),
        # perfect concordance -> tau = 1e6 exactly
        ("2024-03-03", 0, 1.0, 10.0),
        ("2024-03-03", 1, 2.0, 20.0),
        ("2024-03-03", 2, 3.0, 30.0),
        # perfect discordance -> tau = -1e6
        ("2024-03-04", 0, 1.0, 30.0),
        ("2024-03-04", 1, 2.0, 20.0),
        ("2024-03-04", 2, 3.0, 10.0),
    ]
    for impl in ("pairs", "sorted"):
        out = {
            str(r["date"].date()): r
            for r in kendall_tau_ic(_df(spark, data), ["fwd_1p"], impl=impl)
            .collect()
        }
        assert out["2024-03-01"]["tau_fwd_1p_e6"] is None
        assert out["2024-03-01"]["s_fwd_1p"] == 0
        assert out["2024-03-01"]["xtie"] == 3
        assert out["2024-03-02"]["tau_fwd_1p_e6"] is None
        assert out["2024-03-03"]["tau_fwd_1p_e6"] == 1_000_000
        assert out["2024-03-03"]["s_fwd_1p"] == 3
        assert out["2024-03-04"]["tau_fwd_1p_e6"] == -1_000_000


def test_six_dp_snap_merges_sub_grid_differences(spark):
    # values differing below 1e-6 tie after the snap on both impls
    data = [
        ("2024-04-01", 0, 0.1000000001, 1.0),
        ("2024-04-01", 1, 0.1000000002, 2.0),
        ("2024-04-01", 2, 0.2, 3.0),
    ]
    for impl in ("pairs", "sorted"):
        r = kendall_tau_ic(_df(spark, data), ["fwd_1p"], impl=impl).collect()[0]
        assert r["xtie"] == 1, impl
