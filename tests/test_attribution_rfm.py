"""Multi-touch attribution and RFM segmentation."""

import datetime as dt

import numpy as np
import pytest

from alphalens_spark.events import attribute_conversions_multitouch
from alphalens_spark.scale.features import rfm_scores


def _ev(eid, ts, user, etype):
    return (eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=ts), user, etype)


EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def test_multitouch_three_touches(spark):
    rows = [
        _ev(1, 0.0, 1, "click"),
        _ev(2, 10.0, 1, "view"),
        _ev(3, 20.0, 1, "click"),
        _ev(4, 24.0, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    out = attribute_conversions_multitouch(
        df, lookback_hours=72, half_life_hours=12.0
    ).collect()
    assert len(out) == 3
    by_touch = {r["touch_event_id"]: r for r in out}
    for r in out:
        assert r["credit_linear"] == pytest.approx(1 / 3, abs=1e-6)
    assert by_touch[1]["credit_position"] == pytest.approx(0.4)
    assert by_touch[2]["credit_position"] == pytest.approx(0.2)
    assert by_touch[3]["credit_position"] == pytest.approx(0.4)
    ages = {1: 24.0, 2: 14.0, 3: 4.0}
    w = {k: 0.5 ** (v / 12.0) for k, v in ages.items()}
    tot = sum(w.values())
    for k in w:
        assert by_touch[k]["credit_decay"] == pytest.approx(
            w[k] / tot, abs=1e-6
        )


def test_multitouch_single_and_pair(spark):
    rows = [
        _ev(1, 0.0, 1, "click"),
        _ev(2, 1.0, 1, "purchase"),
        _ev(3, 0.0, 2, "view"),
        _ev(4, 5.0, 2, "click"),
        _ev(5, 6.0, 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    out = attribute_conversions_multitouch(df).collect()
    u1 = [r for r in out if r["user_id"] == 1]
    assert len(u1) == 1
    assert u1[0]["credit_position"] == 1.0
    assert u1[0]["credit_linear"] == 1.0
    assert u1[0]["credit_decay"] == 1.0
    u2 = sorted(
        (r for r in out if r["user_id"] == 2), key=lambda r: r["touch_event_id"]
    )
    assert [r["credit_position"] for r in u2] == [0.5, 0.5]


def test_multitouch_lookback_and_order(spark):
    rows = [
        _ev(1, 0.0, 1, "click"),      # outside 24h lookback
        _ev(2, 30.0, 1, "view"),      # inside
        _ev(3, 50.0, 1, "purchase"),
        _ev(4, 60.0, 1, "click"),     # after conversion: excluded
        _ev(5, 0.0, 9, "purchase"),   # no touches at all
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    out = attribute_conversions_multitouch(df, lookback_hours=24).collect()
    assert len(out) == 1
    assert out[0]["touch_event_id"] == 2
    assert {r["conversion_id"] for r in out} == {3}


def test_multitouch_credit_sums(spark):
    import random

    rng = random.Random(3)
    rows = []
    eid = 0
    for u in range(10):
        for _ in range(rng.randint(1, 8)):
            eid += 1
            rows.append(_ev(eid, rng.uniform(0, 48), u, "click"))
        eid += 1
        rows.append(_ev(eid, rng.uniform(49, 60), u, "purchase"))
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    out = attribute_conversions_multitouch(
        df, lookback_hours=100
    ).toPandas()
    sums = out.groupby("conversion_id")[
        ["credit_linear", "credit_position", "credit_decay"]
    ].sum()
    assert np.allclose(sums.values, 1.0, atol=1e-4)


# ------------------------------------------------------------------- RFM


def test_rfm_scores(spark):
    base = dt.date(2024, 1, 1)
    rows = []
    # customer c gets c orders (frequency 1..10), amounts 100*c each,
    # last order c days before the corpus max date
    for c in range(1, 11):
        for i in range(c):
            rows.append((c, base + dt.timedelta(days=30 - c - i), 100.0 * c))
    orders = spark.createDataFrame(rows, "cust long, d date, amt double")
    out = {
        r["customer"]: r
        for r in rfm_scores(orders, "cust", "d", "amt").collect()
    }
    assert len(out) == 10
    rec = {c: out[c]["recency_days"] for c in out}
    freq = np.array([out[c]["frequency"] for c in range(1, 11)])
    mon = np.array([out[c]["monetary"] for c in range(1, 11)])
    assert list(freq) == list(range(1, 11))
    assert np.allclose(mon, [100.0 * c * c for c in range(1, 11)])
    # recency: customer 1's last order is most recent (anchor = its date)
    assert rec[1] == 0 and rec[10] == 9
    # scores replicate numpy linear-interpolation quantiles
    for metric, col, reverse in (
        (np.array([rec[c] for c in range(1, 11)]), "r_score", True),
        (freq, "f_score", False),
        (mon, "m_score", False),
    ):
        qs = np.percentile(metric, [20, 40, 60, 80], method="linear")
        for idx, c in enumerate(range(1, 11)):
            raw = 1 + int(np.sum(metric[idx] >= qs))
            expect = 6 - raw if reverse else raw
            assert out[c][col] == expect, (col, c)
    for c in out:
        r = out[c]
        assert r["rfm_segment"] == (
            r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]
        )


def test_rfm_bins_param(spark):
    base = dt.date(2024, 1, 1)
    rows = [(c, base, float(c)) for c in range(1, 9)]
    orders = spark.createDataFrame(rows, "cust long, d date, amt double")
    out = rfm_scores(orders, "cust", "d", "amt", n_bins=4).collect()
    assert {r["m_score"] for r in out} <= {1, 2, 3, 4}
    # same date everywhere: all-tied recency collapses every customer to
    # one (identical) score — ties land in the top raw bin, reversed to 1
    assert {r["r_score"] for r in out} == {1}


# ----------------------------------------------------------- ohlc / drawdown


def test_ohlc_bars(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 5, "a", 10.0),
        (2, dt.datetime(2024, 1, 1, 12), 5, "a", 30.0),
        (3, dt.datetime(2024, 1, 1, 15), 5, "a", 20.0),
        (4, dt.datetime(2024, 1, 2, 9), 5, "a", 7.0),
        (5, dt.datetime(2024, 1, 1, 9), 5, "b", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    from alphalens_spark.events import ohlc_bars

    out = {
        (r["bar_ts"].day, r["event_type"]): r
        for r in ohlc_bars(df, by=["event_type"]).collect()
    }
    r = out[(1, "a")]
    assert (r["open"], r["high"], r["low"], r["close"]) == (10.0, 30.0, 10.0, 20.0)
    assert r["n"] == 3 and r["volume"] == 60.0
    assert out[(2, "a")]["open"] == out[(2, "a")]["close"] == 7.0
    assert out[(1, "b")]["n"] == 1


def test_ohlc_tiebreak_on_id(spark):
    # two events at the identical timestamp: id breaks the tie
    t = dt.datetime(2024, 1, 1, 9)
    rows = [(2, t, 1, "a", 99.0), (1, t, 1, "a", 5.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    from alphalens_spark.events import ohlc_bars

    r = ohlc_bars(df, by=["event_type"]).collect()[0]
    assert r["open"] == 5.0 and r["close"] == 99.0


def test_max_drawdown_known_series(spark):
    from alphalens_spark.performance import max_drawdown

    # levels: 1.1 -> 0.88 -> 0.792 -> 0.9504 at d1..d4; peak 1.1 at d1,
    # trough 0.792 at d3 -> dd = 0.792/1.1 - 1 = -0.28
    rets = [0.10, -0.20, -0.10, 0.20]
    rows = [
        ("g", dt.date(2024, 1, d + 1), r) for d, r in enumerate(rets)
    ]
    df = spark.createDataFrame(rows, "grp string, date date, ret double")
    out = max_drawdown(df, "ret", by=["grp"]).collect()
    assert len(out) == 1
    assert out[0]["max_drawdown"] == pytest.approx(-0.28, abs=1e-6)
    assert out[0]["trough_date"] == dt.date(2024, 1, 3)


def test_max_drawdown_monotone_up(spark):
    from alphalens_spark.performance import max_drawdown

    rows = [("g", dt.date(2024, 1, d + 1), 0.01) for d in range(5)]
    df = spark.createDataFrame(rows, "grp string, date date, ret double")
    out = max_drawdown(df, "ret", by=["grp"]).collect()
    # never below the running peak: drawdown 0 at every date; trough =
    # earliest date by the (dd, date) tiebreak
    assert out[0]["max_drawdown"] == 0.0
    assert out[0]["trough_date"] == dt.date(2024, 1, 1)


def test_max_drawdown_multi_group(spark):
    from alphalens_spark.performance import max_drawdown

    rows = [("a", dt.date(2024, 1, 1), 0.5), ("a", dt.date(2024, 1, 2), -0.5),
            ("b", dt.date(2024, 1, 1), -0.4), ("b", dt.date(2024, 1, 2), 1.0)]
    df = spark.createDataFrame(rows, "grp string, date date, ret double")
    out = {r["grp"]: r for r in max_drawdown(df, "ret", by=["grp"]).collect()}
    assert out["a"]["max_drawdown"] == pytest.approx(-0.5)
    assert out["b"]["max_drawdown"] == pytest.approx(-0.4)


def test_stream_ohlc_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from alphalens_spark.events import ohlc_bars
    from alphalens_spark.streaming.ops import stream_ohlc

    rows = [
        (1, "2024-01-01 09:00:00", "a", 10.0),
        (2, "2024-01-01 12:00:00", "a", 30.0),
        (3, "2024-01-01 15:00:00", "a", 20.0),
        (4, "2024-01-02 09:00:00", "a", 7.0),
        (5, "2024-01-01 10:00:00", "b", 1.0),
        (6, "2024-01-01 11:00:00", "b", 2.0),
    ]
    src = str(tmp_path / "ohlc_src")
    batch = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    q = (
        stream_ohlc(stream, by=["event_type"])
        .writeStream.format("memory")
        .queryName("ohlc_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ohlc_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM ohlc_stream").collect()
    )
    want = sorted(tuple(r) for r in ohlc_bars(batch, by=["event_type"]).collect())
    assert got == want


def test_rank_normalize(spark):
    from alphalens_spark.scale.features import rank_normalize

    rows = [("g", 10.0), ("g", 20.0), ("g", 20.0), ("g", 40.0),
            ("h", 1.0), ("h", None)]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = rank_normalize(df, "x", by=["grp"]).collect()
    got = sorted(
        ((r["grp"], r["x"], r["pct_rank"]) for r in out),
        key=lambda t: (t[0], t[1] is None, t[1] or 0),
    )
    # g: ranks 1, 2.5, 2.5, 4 over n=4 -> (r-0.5)/4
    assert got[0] == ("g", 10.0, pytest.approx(0.125))
    assert got[1][2] == pytest.approx(0.5)
    assert got[2][2] == pytest.approx(0.5)
    assert got[3][2] == pytest.approx(0.875)
    # h: single non-null value -> 0.5; NULL stays NULL
    assert got[4] == ("h", 1.0, pytest.approx(0.5))
    assert got[5][2] is None


def test_sample_store_incremental_equals_oneshot(spark, tmp_path):
    from alphalens_spark.scale.curation import weighted_priority_sample
    from alphalens_spark.streaming.ops import sample_store_update

    rows = [(f"d{i}", "s1" if i % 3 else "s2", float(1 + i % 7)) for i in range(200)]
    schema = "doc_id string, source string, w double"
    df = spark.createDataFrame(rows, schema)
    store = str(tmp_path / "aes")
    # three uneven batches
    for lo, hi in [(0, 50), (50, 60), (60, 200)]:
        sample_store_update(
            spark.createDataFrame(rows[lo:hi], schema),
            store,
            "w",
            k=8,
            group_cols=["source"],
        )
    got = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    want = sorted(
        tuple(r)
        for r in weighted_priority_sample(
            df, "w", k=8, group_cols=["source"]
        ).collect()
    )
    assert got == want


def test_reservoir_store_generation_merge_equals_oneshot(spark, tmp_path):
    """Cross-generation compaction for the A-ES reservoir: two stores
    built over disjoint halves merged via merge_reservoir_stores must
    equal the one-shot weighted sample of everything (deterministic
    md5 priorities make the top-k of the union exact)."""
    from alphalens_spark.scale.curation import weighted_priority_sample
    from alphalens_spark.streaming.ops import (
        merge_reservoir_stores,
        sample_store_update,
    )

    rows = [(f"d{i}", "s1" if i % 3 else "s2", float(1 + i % 7)) for i in range(200)]
    schema = "doc_id string, source string, w double"
    df = spark.createDataFrame(rows, schema)
    g1, g2 = str(tmp_path / "gen1"), str(tmp_path / "gen2")
    sample_store_update(
        spark.createDataFrame(rows[:70], schema), g1, "w", k=8,
        group_cols=["source"],
    )
    sample_store_update(
        spark.createDataFrame(rows[70:110], schema), g1, "w", k=8,
        group_cols=["source"],
    )
    sample_store_update(
        spark.createDataFrame(rows[110:], schema), g2, "w", k=8,
        group_cols=["source"],
    )
    merged = str(tmp_path / "merged")
    merge_reservoir_stores(
        spark, [g1, g2], merged, k=8, group_cols=["source"]
    )
    got = sorted(tuple(r) for r in spark.read.parquet(merged).collect())
    want = sorted(
        tuple(r)
        for r in weighted_priority_sample(
            df, "w", k=8, group_cols=["source"]
        ).collect()
    )
    assert got == want


def test_groupwise_ols(spark):
    from alphalens_spark.scale.features import groupwise_ols

    rng = np.random.RandomState(5)
    rows = []
    # group a: y = 2 + 3x exactly; group b: noisy y = 1 - 0.5x;
    # group c: zero x-variance
    for i in range(20):
        x = float(i)
        rows.append(("a", x, 2 + 3 * x))
        rows.append(("b", x, 1 - 0.5 * x + float(rng.randn()) * 0.1))
        rows.append(("c", 4.0, float(i)))
    rows.append(("a", None, 99.0))  # null x ignored
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = {r["grp"]: r for r in groupwise_ols(df, "x", "y", by=["grp"]).collect()}
    assert out["a"]["n"] == 20
    assert out["a"]["slope"] == pytest.approx(3.0, abs=1e-6)
    assert out["a"]["intercept"] == pytest.approx(2.0, abs=1e-6)
    assert out["a"]["r2"] == pytest.approx(1.0, abs=1e-6)
    xs = np.arange(20.0)
    ys = np.array([r[2] for r in rows if r[0] == "b"])
    want_slope, want_int = np.polyfit(xs, ys, 1)
    assert out["b"]["slope"] == pytest.approx(want_slope, abs=1e-5)
    assert out["b"]["intercept"] == pytest.approx(want_int, abs=1e-5)
    assert 0.9 < out["b"]["r2"] <= 1.0
    assert out["c"]["slope"] is None and out["c"]["r2"] is None


def test_ab_test_ztest_known_values(spark):
    import math

    from pyspark.sql import functions as F

    from alphalens_spark.events import ab_test_ztest

    rows = []
    eid = 0
    # variant 0: users 0..9 exposed, 4 convert; variant 1: users 10..19
    # exposed, 8 convert
    for u in range(20):
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 1), u, "view"))
        converts = (u < 4) if u < 10 else (u < 18)
        if converts:
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 2), u, "purchase"))
    # a purchase by an unexposed user is excluded from rates
    rows.append((999, dt.datetime(2024, 1, 2), 99, "purchase"))
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    out = ab_test_ztest(df, (F.col("user_id") >= 10).cast("int")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (10, 4, 10, 8)
    p, q = 0.4, 0.8
    pool = 0.6
    want_z = (p - q) / math.sqrt(pool * (1 - pool) * (1 / 10 + 1 / 10))
    assert r["z"] == pytest.approx(want_z, abs=1e-6)


def test_seasonal_naive_eval(spark):
    from alphalens_spark.events import seasonal_naive_eval

    rows = []
    eid = 0
    # perfectly weekly series: counts 1,2,3,... repeating with period 7
    for d in range(21):
        for _ in range(1 + d % 7):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1 + d), 1, "click"))
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    out = seasonal_naive_eval(df, season_days=7).collect()
    assert len(out) == 1
    r = out[0]
    # 14 scored days (days 8..21), all predictions exact
    assert r["n_days"] == 14
    assert r["mae"] == 0.0 and r["rmse"] == 0.0 and r["smape"] == 0.0


def test_funnel_within_hours(spark):
    from alphalens_spark.events import funnel

    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 1, "signup"),
        (2, dt.datetime(2024, 1, 1, 10), 1, "view"),      # within 48h
        (3, dt.datetime(2024, 1, 5, 0), 1, "purchase"),   # > 48h after view
        (4, dt.datetime(2024, 1, 1, 0), 2, "signup"),
        (5, dt.datetime(2024, 1, 4, 0), 2, "view"),       # > 48h after signup
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    unbounded = {r["user_id"]: r["stage"] for r in funnel(
        df, ["signup", "view", "purchase"]).collect()}
    bounded = {r["user_id"]: r["stage"] for r in funnel(
        df, ["signup", "view", "purchase"], within_hours=48).collect()}
    assert unbounded == {1: 3, 2: 2}
    assert bounded == {1: 2, 2: 1}


def test_weight_turnover_properties(spark):
    from alphalens_spark.performance import weight_turnover

    rows = []
    # two dates, same 4 assets, factors flip sign between dates -> the
    # long/short book fully reverses: turnover = gross (1.0)
    for a, f1 in zip("abcd", [2.0, 1.0, -1.0, -2.0]):
        rows.append((dt.datetime(2024, 1, 1), a, f1, 0.0))
        rows.append((dt.datetime(2024, 1, 2), a, -f1, 0.0))
        rows.append((dt.datetime(2024, 1, 3), a, -f1, 0.0))
    fd = spark.createDataFrame(rows, "date timestamp, asset string, factor double, `1D` double")
    out = {r["date"].day: r["turnover"] for r in weight_turnover(fd).collect()}
    # day 1: establishing a gross-1 book costs 0.5
    assert out[1] == pytest.approx(0.5)
    # day 2: full reversal trades 2x gross -> one-way turnover 1.0
    assert out[2] == pytest.approx(1.0)
    # day 3: unchanged book -> zero turnover
    assert out[3] == pytest.approx(0.0)


def test_ab_store_incremental_equals_oneshot(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    from alphalens_spark.events import ab_test_ztest
    from alphalens_spark.streaming.ops import ab_store_update, ab_store_ztest

    rng = random.Random(9)
    rows = []
    eid = 0
    for u in range(40):
        for _ in range(rng.randint(1, 5)):
            eid += 1
            etype = rng.choice(["view", "purchase", "click", "error"])
            rows.append(_ev(eid, rng.uniform(0, 100), u, etype))
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    assign = F.pmod(F.col("user_id"), F.lit(3)).cast("int")
    store = str(tmp_path / "ab")
    # uneven batches, plus a full replay of the middle batch
    chunks = [rows[:30], rows[30:45], rows[30:45], rows[45:]]
    for chunk in chunks:
        ab_store_update(
            spark.createDataFrame(chunk, EVENTS_SCHEMA), store, assign
        )
    got = sorted(tuple(r) for r in ab_store_ztest(spark, store).collect())
    want = sorted(tuple(r) for r in ab_test_ztest(df, assign).collect())
    assert got == want
