"""Governance operators: k-anonymity arithmetic, DP noise properties,
FD violation majority picks."""

import math

import pytest
from pyspark.sql import functions as F

from alphalens_spark.scale.governance import (
    dp_noisy_counts,
    fd_violations,
    k_anonymity_sweep,
)


def test_k_anonymity_sweep_counts(spark):
    # classes: (a,x)=3 rows, (a,y)=1, (b,x)=2
    rows = [("a", "x")] * 3 + [("a", "y")] + [("b", "x")] * 2
    df = spark.createDataFrame(rows, "q1 string, q2 string")
    out = {r["k"]: r for r in k_anonymity_sweep(df, ["q1", "q2"], [2, 3]).collect()}
    assert out[2]["n_rows"] == 6 and out[2]["n_classes"] == 3
    assert out[2]["min_class_size"] == 1
    assert out[2]["n_classes_below"] == 1  # only the singleton
    assert out[2]["n_rows_below"] == 1
    assert out[2]["pct_rows_below_e6"] == round(1 * 1e8 / 6)
    assert out[3]["n_classes_below"] == 2  # singleton + pair
    assert out[3]["n_rows_below"] == 3


def test_dp_counts_deterministic_and_calibrated(spark):
    df = spark.createDataFrame(
        [(f"g{i % 10}",) for i in range(1000)], "g string"
    )
    a = {r["g"]: r["n_noisy"] for r in dp_noisy_counts(df, ["g"], 1.0, 7).collect()}
    b = {r["g"]: r["n_noisy"] for r in dp_noisy_counts(df, ["g"], 1.0, 7).collect()}
    assert a == b  # same seed -> identical release
    c = {r["g"]: r["n_noisy"] for r in dp_noisy_counts(df, ["g"], 1.0, 8).collect()}
    assert a != c  # fresh seed -> fresh draw
    # noise matches the closed form for one group
    import hashlib

    key = "g0\x1f7"
    u = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) / float(1 << 60)
    noise = -1.0 * math.copysign(1.0, u - 0.5) * math.log(1.0 - 2.0 * abs(u - 0.5))
    assert a["g0"] == pytest.approx(round(100 + noise, 6), abs=1e-9)
    # tighter epsilon -> larger expected magnitude (scale 1/eps)
    wide = {
        r["g"]: abs(r["n_noisy"] - r["n_true"])
        for r in dp_noisy_counts(df, ["g"], 0.1, 7).collect()
    }
    narrow = {
        r["g"]: abs(r["n_noisy"] - r["n_true"])
        for r in dp_noisy_counts(df, ["g"], 1.0, 7).collect()
    }
    assert sum(wide.values()) == pytest.approx(10 * sum(narrow.values()), rel=1e-6)


def test_fd_violations_majority_and_filter(spark):
    df = spark.createDataFrame(
        [("s1", "en")] * 3 + [("s1", "fr")] * 2 + [("s2", "de")] * 4,
        "src string, lang string",
    )
    out = {r["src"]: r for r in fd_violations(df, ["src"], "lang").collect()}
    assert set(out) == {"s1"}  # s2 satisfies the FD
    r = out["s1"]
    assert r["n_rows"] == 5 and r["n_distinct_rhs"] == 2
    assert r["majority_rhs"] == "en" and r["majority_count"] == 3
    assert r["violation_rows"] == 2


def test_fd_violations_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [("s", "aa"), ("s", "bb")], "src string, lang string"
    )
    r = fd_violations(df, ["src"], "lang").collect()[0]
    assert r["majority_rhs"] == "bb"  # (count, value) max-struct: ties -> larger value


def test_dp_counts_null_group_gets_own_noise(spark):
    import hashlib

    df = spark.createDataFrame(
        [("g1",)] * 3 + [(None,)] * 2, "g string"
    )
    out = {r["g"]: r for r in dp_noisy_counts(df, ["g"], 1.0, 7).collect()}
    # NULL group draws real, deterministic noise under the sentinel key
    key = "\x00NULL\x1f7"
    u = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) / float(1 << 60)
    noise = -math.copysign(1.0, u - 0.5) * math.log(1.0 - 2.0 * abs(u - 0.5))
    assert out[None]["n_noisy"] == pytest.approx(round(2 + noise, 6), abs=1e-9)
    # and does NOT collide with g1's draw
    assert out[None]["n_noisy"] - out[None]["n_true"] != pytest.approx(
        out["g1"]["n_noisy"] - out["g1"]["n_true"], abs=1e-9
    )
