"""Calibration + AUC evaluation ops against sklearn-style hand
references."""

import pytest
from pyspark.sql import functions as F

from alphalens_spark.scale.evaluation import auc_score, reliability_report


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score_e6 long, y int")


def test_reliability_bins_and_brier(spark):
    rows = [
        (50_000, 0), (150_000, 0), (150_000, 1),   # bins 0, 1, 1
        (950_000, 1), (1_000_000, 1),              # bins 9 (1e6 clamps)
    ]
    out = {r["bin"]: r for r in reliability_report(_scored(spark, rows), "score_e6", "y").collect()}
    assert out[0]["n"] == 1 and out[0]["n_pos"] == 0
    assert out[1]["n"] == 2 and out[1]["n_pos"] == 1
    assert out[1]["avg_score_e6"] == 150_000
    assert out[1]["pos_rate_e6"] == 500_000
    assert out[9]["n"] == 2 and out[9]["n_pos"] == 2
    # brier contribution: (0.05-0)^2 -> 50000^2
    assert out[0]["brier_e12_sum"] == 50_000**2
    assert out[9]["brier_e12_sum"] == 50_000**2 + 0  # (0.95-1)^2 + (1-1)^2


def test_auc_perfect_random_and_ties(spark):
    perfect = [(100_000, 0)] * 5 + [(900_000, 1)] * 5
    r = auc_score(_scored(spark, perfect), "score_e6", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (5, 5, 1.0)

    inverted = [(900_000, 0)] * 5 + [(100_000, 1)] * 5
    assert auc_score(_scored(spark, inverted), "score_e6", "y").collect()[0]["auc"] == 0.0

    # all tied -> 0.5 exactly (average ranks)
    tied = [(500_000, 0)] * 4 + [(500_000, 1)] * 6
    assert auc_score(_scored(spark, tied), "score_e6", "y").collect()[0]["auc"] == 0.5


def test_auc_matches_pairwise_definition(spark):
    # AUC = P(score_pos > score_neg) + 0.5 P(tie), brute-forced
    rows = [(10, 0), (20, 1), (20, 0), (30, 1), (40, 0), (50, 1)]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    want = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    ) / (len(pos) * len(neg))
    r = auc_score(_scored(spark, rows), "score_e6", "y").collect()[0]
    assert r["auc"] == pytest.approx(round(want, 6), abs=1e-9)


def test_average_precision_matches_sklearn_definition(spark):
    # hand example with ties; reference AP computed step-wise over
    # descending distinct thresholds (sklearn average_precision_score)
    rows = [(90, 1), (80, 0), (80, 1), (70, 0), (60, 1), (50, 0)]
    from alphalens_spark.scale.evaluation import average_precision

    # thresholds desc: 90 -> P=1/1 R=1/3; 80 -> P=2/3 R=2/3; 70 -> P=2/4;
    # 60 -> P=3/5 R=3/3; 50 -> P=3/6
    want = (1 / 3) * (1 / 1) + (1 / 3) * (2 / 3) + 0 + (1 / 3) * (3 / 5) + 0
    r = average_precision(_scored(spark, rows), "score_e6", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (3, 3)
    assert r["average_precision"] == pytest.approx(round(want, 6), abs=1e-9)

    perfect = [(900_000, 1)] * 4 + [(100_000, 0)] * 4
    r2 = average_precision(_scored(spark, perfect), "score_e6", "y").collect()[0]
    assert r2["average_precision"] == 1.0


def test_welch_ttest_matches_scipy_closed_form(spark):
    import numpy as np

    from alphalens_spark.events import welch_ttest

    rng = np.random.default_rng(5)
    xa = rng.integers(80, 140, size=40)
    xb = rng.integers(100, 180, size=25)
    a = spark.createDataFrame([(int(v),) for v in xa], "v long")
    b = spark.createDataFrame([(int(v),) for v in xb], "v long")
    r = welch_ttest(a, b, "v").collect()[0]
    ma, mb = xa.mean(), xb.mean()
    va, vb = xa.var(ddof=1), xb.var(ddof=1)
    se2 = va / len(xa) + vb / len(xb)
    t = (ma - mb) / np.sqrt(se2)
    dof = se2**2 / (
        (va / len(xa)) ** 2 / (len(xa) - 1) + (vb / len(xb)) ** 2 / (len(xb) - 1)
    )
    assert (r["n_a"], r["n_b"]) == (40, 25)
    assert r["mean_a"] == pytest.approx(round(ma, 6), abs=1e-6)
    assert r["t_stat"] == pytest.approx(round(float(t), 6), abs=1e-6)
    assert r["df"] == pytest.approx(round(float(dof), 6), abs=1e-6)
    try:
        from scipy import stats as sps

        ref = sps.ttest_ind(xa, xb, equal_var=False)
        assert r["t_stat"] == pytest.approx(float(ref.statistic), abs=1e-6)
    except ImportError:
        pass


def test_welch_ttest_flagged_matches_two_frame_front(spark):
    """The one-scan conditional head must equal the two-frame front
    exactly — same Σv/Σv²/n per side, same t/df — including rows that
    belong to NEITHER cohort (they must not contaminate either side)."""
    from alphalens_spark.events import welch_ttest, welch_ttest_flagged
    from pyspark.sql import functions as F

    rows = [("a", 10), ("a", 14), ("a", 11), ("b", 30), ("b", 25),
            ("b", 27), ("b", 31), ("c", 999), ("c", -5)]
    df = spark.createDataFrame(rows, "g string, v long")
    two = welch_ttest(
        df.where(F.col("g") == "a"), df.where(F.col("g") == "b"), "v",
        scale=2.0,
    ).collect()[0]
    one = welch_ttest_flagged(
        df, F.col("g") == "a", F.col("g") == "b", "v", scale=2.0
    ).collect()[0]
    assert one.asDict() == two.asDict()
