"""conformal_interval_eval: exact order-statistic q-hat + coverage."""

import math
import random

from pyspark.sql import functions as F

from alphalens_spark.events import conformal_interval_eval


def _py_ref(vals, season, alpha_pct, cal_pct, days=None):
    """vals: list of (day_offset, value); returns the expected row."""
    byday = dict(vals)
    scored = []
    for d, v in sorted(vals):
        p = byday.get(d - season)
        if p is not None:
            scored.append((d, abs(v - p)))
    n = len(scored)
    n_cal = (n * cal_pct + 99) // 100
    n_test = n - n_cal
    cal = sorted(r for _, r in scored[:n_cal])
    k = ((n_cal + 1) * (100 - alpha_pct) + 99) // 100
    qhat = cal[k - 1] if k <= n_cal else None
    covered = sum(
        1 for _, r in scored[n_cal:] if qhat is None or r <= qhat
    )
    return n, n_cal, n_test, qhat, covered


def _run(spark, vals, **kw):
    rows = [("k", d, v) for d, v in vals]
    df = spark.createDataFrame(
        rows, "key string, offset int, value_e4 long"
    ).select(
        "key",
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("offset")).alias(
            "day"
        ),
        "value_e4",
    )
    r = conformal_interval_eval(df, ["key"], "day", "value_e4", **kw)
    return [
        (x["n_scored"], x["n_cal"], x["n_test"], x["qhat_e4"], x["n_covered"])
        for x in r.collect()
    ][0]


def test_matches_python_reference(spark):
    rng = random.Random(21)
    vals = [(d, 1000 + rng.randint(-50, 50)) for d in range(40)]
    got = _run(spark, vals, season_days=7, alpha_pct=10, cal_pct=70)
    assert got == _py_ref(vals, 7, 10, 70)
    # sanity: a stable series should cover most of the test tail
    n, nc, nt, qhat, cov = got
    assert n == 33 and nc == 24 and nt == 9
    assert qhat is not None and cov >= nt - 2


def test_calendar_gap_does_not_shift_season(spark):
    # day 10 missing: day 17's row-lag-7 would otherwise grab day 9's
    # value; the calendar check must reject that pair
    vals = [(d, 100 * d) for d in range(20) if d != 10]
    got = _run(spark, vals, season_days=7, alpha_pct=10, cal_pct=70)
    py = _py_ref(vals, 7, 10, 70)
    assert got == py
    # exactly the days with BOTH d and d-7 present score
    assert got[0] == len(
        [d for d, _ in vals if (d - 7) in dict(vals)]
    )


def test_infinite_interval_when_calibration_too_small(spark):
    # n_cal = 3 -> k = ceil(4 * 0.9) = 4 > 3 -> qhat NULL, all covered
    vals = [(d, 10 * d) for d in range(11)]  # 4 scored days (7..10)
    got = _run(spark, vals, season_days=7, alpha_pct=10, cal_pct=70)
    n, nc, nt, qhat, cov = got
    assert (n, nc, nt) == (4, 3, 1)
    assert qhat is None and cov == nt
    assert got == _py_ref(vals, 7, 10, 70)


def test_integer_k_never_off_by_one(spark):
    # the float form ceil((n_cal+1)*0.9) misselects when (n_cal+1)*0.9
    # is exactly integral (e.g. n_cal=19 -> 18.000000000000004): check a
    # span that produces n_cal = 19
    vals = [(d, d * 37 % 500) for d in range(34)]  # 27 scored, n_cal 19
    got = _run(spark, vals, season_days=7, alpha_pct=10, cal_pct=70)
    py = _py_ref(vals, 7, 10, 70)
    assert got == py
    assert got[1] == 19
    k = ((19 + 1) * 90 + 99) // 100
    assert k == 18  # exact rational ceil(20*0.9) == 18, not 19


def test_enforce_k_anonymity_suppresses_small_groups(spark):
    from alphalens_spark.scale.curation import (
        enforce_k_anonymity,
        k_anonymity_report,
    )

    rows = (
        [("US", "A", i) for i in range(5)]
        + [("US", "B", i) for i in range(2)]   # below k=3 -> suppressed
        + [("DE", "A", i) for i in range(3)]
        + [("FR", "C", 0)]                     # singleton -> suppressed
    )
    df = spark.createDataFrame(rows, "nat string, seg string, id int")
    rep = k_anonymity_report(df, ["nat", "seg"], k=3).collect()[0]
    assert rep["n_rows"] == 11 and rep["n_groups"] == 4
    assert rep["n_singleton_groups"] == 1
    assert rep["n_groups_below_k"] == 2 and rep["n_rows_at_risk"] == 3

    kept = enforce_k_anonymity(df, ["nat", "seg"], k=3)
    assert kept.count() == 8
    # the surviving frame is k-anonymous by construction
    rep2 = k_anonymity_report(kept, ["nat", "seg"], k=3).collect()[0]
    assert rep2["n_groups_below_k"] == 0 and rep2["min_group_size"] >= 3


def test_benford_screen_counts_and_expected(spark):
    from alphalens_spark.scale.profile import _BENFORD_P_E6, benford_screen

    # synthetic: 100 rows starting with 1, 50 with 2, 10 with 9; plus a
    # zero and a negative (|-3xx| counts under digit 3)
    rows = (
        [(100 + i,) for i in range(100)]
        + [(2000 + i,) for i in range(50)]
        + [(9,)] * 10
        + [(0,), (-314,)]
    )
    df = spark.createDataFrame(rows, "amt long")
    out = {
        r["digit"]: r for r in benford_screen(df, "amt").collect()
    }
    assert out[1]["n_obs"] == 100 and out[2]["n_obs"] == 50
    assert out[9]["n_obs"] == 10 and out[3]["n_obs"] == 1
    n = 161  # zero excluded, negative included via abs
    for d, r in out.items():
        assert r["n_total"] == n
        assert r["expected_e6"] == n * _BENFORD_P_E6[d]
        assert r["deviation_e6"] == r["n_obs"] * 1_000_000 - r["expected_e6"]
        # chi2 contribution reproduces dev^2/exp in micro-units
        want = round(
            (r["deviation_e6"] ** 2) / r["expected_e6"] / 1e6
        )
        assert abs(r["chi2_contrib_e6"] - want) <= 1
    # probabilities are a partition of 1
    assert sum(_BENFORD_P_E6.values()) == 1_000_000


def test_concentration_gini_known_values(spark):
    from alphalens_spark.scale.profile import concentration_report

    rows = (
        # "equal": everyone identical -> Gini 0; top decile (1 of 8)
        # holds exactly 1/8
        [("equal", i, 100) for i in range(8)]
        # "mono": one customer holds everything -> Gini (n-1)/n, top
        # decile share 100%
        + [("mono", i, 0) for i in range(9)]
        + [("mono", 9, 5000)]
        # "zero": no revenue at all -> ratios NULL
        + [("zero", i, 0) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "grp string, cid int, w long")
    out = {
        r["grp"]: r
        for r in concentration_report(df, ["grp"], "w", "cid").collect()
    }
    assert out["equal"]["gini_e6"] == 0
    assert out["equal"]["top_decile_share_e6"] == 125_000
    assert out["mono"]["gini_e6"] == 900_000  # (10-1)/10
    assert out["mono"]["top_decile_share_e6"] == 1_000_000
    assert out["zero"]["gini_e6"] is None
    assert out["zero"]["top_decile_share_e6"] is None


def test_benford_emits_zero_count_digits(spark):
    from alphalens_spark.scale.profile import benford_screen

    # fabricated amounts that NEVER start with 1 — the missing digit is
    # the dominant chi-square term and must appear with n_obs = 0
    rows = [(200 + i,) for i in range(30)] + [(900 + i,) for i in range(10)]
    df = spark.createDataFrame(rows, "amt long")
    out = {r["digit"]: r for r in benford_screen(df, "amt").collect()}
    assert sorted(out) == list(range(1, 10))  # all nine digits present
    assert out[1]["n_obs"] == 0
    assert out[1]["expected_e6"] == 40 * 301030
    assert out[1]["deviation_e6"] == -40 * 301030
    assert out[1]["chi2_contrib_e6"] > 0
    assert out[4]["n_obs"] == 0 and out[4]["chi2_contrib_e6"] > 0


def test_benford_null_group_column(spark):
    from alphalens_spark.scale.profile import benford_screen

    # a NULL-valued group column is one groupBy group on both sides of
    # the dim⋈counts join; a null-unsafe join would yield n_obs = 0 for
    # all nine digits while n_total still counted the rows — a fabricated
    # maximal Benford violation (advice-confirmed hazard)
    rows = (
        [(None, 100 + i) for i in range(20)]
        + [(None, 900 + i) for i in range(5)]
        + [("eu", 200 + i) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "region string, amt long")
    out = {
        (r["region"], r["digit"]): r
        for r in benford_screen(df, "amt", ["region"]).collect()
    }
    assert len(out) == 18  # 2 groups x 9 digits
    assert out[(None, 1)]["n_obs"] == 20
    assert out[(None, 9)]["n_obs"] == 5
    assert out[(None, 2)]["n_obs"] == 0
    assert out[(None, 1)]["n_total"] == 25
    assert out[("eu", 2)]["n_obs"] == 10
    assert out[("eu", 1)]["n_obs"] == 0


def test_enforce_k_anonymity_keeps_null_keyed_groups(spark):
    from alphalens_spark.scale.curation import enforce_k_anonymity

    rows = [(None, i) for i in range(6)] + [("x", 0)]
    df = spark.createDataFrame(rows, "seg string, id int")
    kept = enforce_k_anonymity(df, ["seg"], k=3)
    # the NULL segment group has 6 >= 3 members and must survive;
    # the singleton "x" is suppressed
    assert kept.count() == 6
    assert kept.where(F.col("seg").isNull()).count() == 6


def test_gapfill_null_value_is_a_gap(spark):
    from alphalens_spark.events import gap_fill_daily

    df = spark.createDataFrame(
        [("a", "2024-01-01", 100), ("a", "2024-01-03", None),
         ("a", "2024-01-05", 500)],
        "key string, day string, value_e4 long",
    ).withColumn("day", F.to_date("day"))
    out = {r["day"].day: r for r in gap_fill_daily(df, ["key"]).collect()}
    # the NULL row is NOT an observation: day 3 interpolates 100->500
    assert out[3]["is_observed"] is False
    assert out[3]["interp_e4"] == 300 and out[3]["locf_e4"] == 100


def test_kendall_null_returns_excluded_identically(spark):
    from alphalens_spark.performance import kendall_tau_ic

    df = spark.createDataFrame(
        [("2024-01-01", 0, 1.0, 1.0), ("2024-01-01", 1, 2.0, None),
         ("2024-01-01", 2, 3.0, None), ("2024-01-01", 3, 4.0, 4.0)],
        "date string, asset long, factor double, fwd_1p double",
    ).withColumn("date", F.to_timestamp("date"))
    cols = ["n", "xtie", "s_fwd_1p", "ytie_fwd_1p", "tau_fwd_1p_e6"]
    rows = {}
    for impl in ("pairs", "sorted"):
        r = kendall_tau_ic(df, ["fwd_1p"], impl=impl).select(*cols).collect()
        rows[impl] = [tuple(x) for x in r]
    # null-return rows are excluded on BOTH impls -> n = 2, identical
    assert rows["pairs"] == rows["sorted"]
    assert rows["pairs"][0][0] == 2


def test_kendall_nan_excluded_identically(spark):
    # isNotNull PASSES NaN: without the isnan guard the pairs impl
    # groups NaN as a tie (groupBy NaN-normalization) while numpy in
    # the sorted impl treats NaN as self-unequal and largest-sorting —
    # divergent counts (advice-confirmed). NaN rows must drop like NULLs.
    from alphalens_spark.performance import kendall_tau_ic

    df = spark.createDataFrame(
        [("2024-01-01", 0, 1.0, 1.0), ("2024-01-01", 1, float("nan"), 2.0),
         ("2024-01-01", 2, 3.0, float("nan")), ("2024-01-01", 3, 4.0, 4.0),
         ("2024-01-01", 4, 2.0, 3.0)],
        "date string, asset long, factor double, fwd_1p double",
    ).withColumn("date", F.to_timestamp("date"))
    cols = ["n", "xtie", "s_fwd_1p", "ytie_fwd_1p", "tau_fwd_1p_e6"]
    rows = {}
    for impl in ("pairs", "sorted"):
        r = kendall_tau_ic(df, ["fwd_1p"], impl=impl).select(*cols).collect()
        rows[impl] = [tuple(x) for x in r]
    # both NaN rows excluded on BOTH impls -> n = 3, identical, and the
    # remaining (1,1),(4,4),(2,3) triple is perfectly concordant
    assert rows["pairs"] == rows["sorted"]
    assert rows["pairs"][0][0] == 3
    assert rows["pairs"][0][4] == 1_000_000


def test_psi_identical_and_shifted(spark):
    from alphalens_spark.scale.profile import psi_report

    a = spark.createDataFrame([(i % 100,) for i in range(1000)], "v long")
    # identical distributions -> every contribution 0 (p == q exactly:
    # same counts, same totals)
    out = psi_report(a, a, "v", lo=0, hi=100, bins=10).collect()
    assert len(out) == 10
    assert all(r["psi_contrib"] == 0.0 for r in out)
    assert all(r["ref_share_e6"] == r["cur_share_e6"] for r in out)
    # fully shifted: ref in [0,50), cur in [50,100) -> large positive PSI
    lo_half = spark.createDataFrame([(i % 50,) for i in range(500)], "v long")
    hi_half = spark.createDataFrame(
        [(50 + i % 50,) for i in range(500)], "v long"
    )
    out2 = psi_report(lo_half, hi_half, "v", lo=0, hi=100, bins=10).collect()
    total = sum(r["psi_contrib"] for r in out2)
    assert total > 0.25  # the standard "population shifted" threshold
    # contributions are symmetric in this construction
    by_bucket = {r["bucket"]: r for r in out2}
    assert by_bucket[0]["n_ref"] == 100 and by_bucket[0]["n_cur"] == 0
    assert by_bucket[9]["n_ref"] == 0 and by_bucket[9]["n_cur"] == 100


def test_psi_bucket_boundaries_and_clamp(spark):
    from alphalens_spark.scale.profile import psi_report

    # values exactly on bucket edges land in the upper bucket (integer
    # DIV), out-of-range values clamp to the edge buckets
    rows = [(-5,), (0,), (9,), (10,), (99,), (100,), (150,)]
    df = spark.createDataFrame(rows, "v long")
    out = {r["bucket"]: r for r in psi_report(df, df, "v", 0, 100, 10).collect()}
    assert out[0]["n_ref"] == 3   # -5 (clamped), 0, 9
    assert out[1]["n_ref"] == 1   # 10
    assert out[9]["n_ref"] == 3   # 99, 100 (clamped), 150 (clamped)


def test_ks_known_values(spark):
    from alphalens_spark.scale.profile import ks_two_sample

    # identical samples -> D = 0
    a = spark.createDataFrame([(i,) for i in range(100)], "v long")
    r = ks_two_sample(a, a, "v").collect()[0]
    assert (r["n1"], r["n2"], r["d_num"], r["d_e6"]) == (100, 100, 0, 0)
    # disjoint supports -> D = 1
    b = spark.createDataFrame([(1000 + i,) for i in range(50)], "v long")
    r = ks_two_sample(a, b, "v").collect()[0]
    assert r["d_e6"] == 1_000_000
    # textbook small case: x={1,2}, y={2,3}: D = 1/2 at v=1
    x = spark.createDataFrame([(1,), (2,)], "v long")
    y = spark.createDataFrame([(2,), (3,)], "v long")
    r = ks_two_sample(x, y, "v").collect()[0]
    assert r["d_num"] == 2 and r["d_e6"] == 500_000
    # scipy cross-check when available
    try:
        from scipy.stats import ks_2samp
    except ImportError:
        return
    import random

    rng = random.Random(7)
    s1 = [rng.randint(0, 40) for _ in range(137)]
    s2 = [rng.randint(10, 60) for _ in range(211)]
    d = ks_2samp(s1, s2).statistic
    r = ks_two_sample(
        spark.createDataFrame([(v,) for v in s1], "v long"),
        spark.createDataFrame([(v,) for v in s2], "v long"),
        "v",
    ).collect()[0]
    assert abs(r["d_num"] / (r["n1"] * r["n2"]) - d) < 1e-12
