"""Kaplan-Meier estimator: the classic 6-MP leukemia goldens, the
no-censoring = empirical-survival reduction, and extinction pinning."""

import pytest
from pyspark.sql import functions as F

from alphalens_spark.events import kaplan_meier

# Freireich et al. 1963 6-MP arm — THE textbook KM dataset: 21 subjects,
# events at 6,6,6,7,10,13,16,22,23; censored at 6,9,10,11,17,19,20,25,
# 32,32,34,35. Published curve: S(6)=.857, S(7)=.807, S(10)=.753, ...
SIX_MP = (
    [(6, 1)] * 3 + [(7, 1), (10, 1), (13, 1), (16, 1), (22, 1), (23, 1)]
    + [(6, 0), (9, 0), (10, 0), (11, 0), (17, 0), (19, 0), (20, 0),
       (25, 0), (32, 0), (32, 0), (34, 0), (35, 0)]
)


def _km(spark, rows):
    df = spark.createDataFrame(
        [("g", d, e) for d, e in rows], "g string, duration int, event int"
    )
    return {
        r["t"]: (r["n_risk"], r["n_events"], r["n_censored"], r["survival"])
        for r in kaplan_meier(df, ["g"]).collect()
    }


def test_km_six_mp_goldens(spark):
    out = _km(spark, SIX_MP)
    assert out[6] == (21, 3, 1, pytest.approx(0.857143, abs=1e-6))
    assert out[7] == (17, 1, 0, pytest.approx(0.806723, abs=1e-6))
    assert out[9] == (16, 0, 1, pytest.approx(0.806723, abs=1e-6))
    assert out[10] == (15, 1, 1, pytest.approx(0.752941, abs=1e-6))
    assert out[13] == (12, 1, 0, pytest.approx(0.690196, abs=1e-6))
    assert out[16] == (11, 1, 0, pytest.approx(0.627451, abs=1e-6))
    assert out[22] == (7, 1, 0, pytest.approx(0.537815, abs=1e-6))
    assert out[23] == (6, 1, 0, pytest.approx(0.448179, abs=1e-6))
    # censoring-only tail never drops survival
    assert out[35][3] == out[23][3]


def test_km_without_censoring_is_empirical_survival(spark):
    rows = [(d, 1) for d in [1, 1, 2, 3, 3, 3, 5, 8]]
    out = _km(spark, rows)
    n = len(rows)
    seen = 0
    for t in sorted(out):
        seen += out[t][1]
        assert out[t][3] == pytest.approx((n - seen) / n, abs=1e-6), t


def test_km_extinction_pins_zero(spark):
    out = _km(spark, [(2, 1), (2, 1), (5, 1)])
    assert out[5][3] == 0.0
    assert out[5][0] == 1  # last subject at risk


def test_km_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", 3, 1), ("a", 4, 0), ("b", 1, 1)],
        "g string, duration int, event int",
    )
    rows = {
        (r["g"], r["t"]): r["survival"]
        for r in kaplan_meier(df, ["g"]).collect()
    }
    assert rows[("a", 3)] == pytest.approx(0.5)
    assert rows[("a", 4)] == pytest.approx(0.5)  # censor leaves S flat
    assert rows[("b", 1)] == 0.0


def test_km_store_incremental_equals_oneshot_and_compacts(spark, tmp_path):
    from pyspark.sql import functions as F

    from alphalens_spark.events import kaplan_meier
    from alphalens_spark.streaming.ops import (
        km_store_survival,
        km_store_update,
        merge_counter_stores,
    )

    df = spark.createDataFrame(
        [("g", d, e) for d, e in SIX_MP], "g string, duration int, event int"
    )
    want = {
        (r["g"], r["t"]): tuple(r)
        for r in kaplan_meier(df, ["g"]).collect()
    }
    # two disjoint subject batches -> one store
    store = str(tmp_path / "km")
    km_store_update(df.where(F.col("duration") % 2 == 0), store, ["g"])
    km_store_update(df.where(F.col("duration") % 2 == 1), store, ["g"])
    got = {
        (r["g"], r["t"]): tuple(r)
        for r in km_store_survival(spark, store, ["g"]).collect()
    }
    assert got == want
    # two independent generations -> merge_counter_stores compaction
    gens = []
    for i in (0, 1):
        p = str(tmp_path / f"gen{i}")
        km_store_update(df.where(F.col("duration") % 2 == i), p, ["g"])
        gens.append(p)
    merged = str(tmp_path / "merged")
    merge_counter_stores(
        spark, gens, merged, ["g", "t"], ["n_events", "n_censored"]
    )
    got2 = {
        (r["g"], r["t"]): tuple(r)
        for r in km_store_survival(spark, merged, ["g"]).collect()
    }
    assert got2 == want
