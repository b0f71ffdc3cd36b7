"""asof_join vs pandas.merge_asof (the semantics oracle) + plan shape."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from alphalens_spark.joins import asof_join


def _mk(spark, seed=7, n_left=200, n_right=150, n_keys=5):
    import random

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    left = pd.DataFrame(
        {
            "k": [rng.randrange(n_keys) for _ in range(n_left)],
            "ts": [base + dt.timedelta(seconds=rng.randrange(10_000)) for _ in range(n_left)],
            "lval": range(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": [rng.randrange(n_keys) for _ in range(n_right)],
            "ts": [base + dt.timedelta(seconds=rng.randrange(10_000)) for _ in range(n_right)],
            "rval": [i * 10 for i in range(n_right)],
        }
    )
    # merge_asof tie order among equal (k, ts) right rows is positional;
    # make (k, ts) unique so both engines agree deterministically
    right = right.drop_duplicates(subset=["k", "ts"]).reset_index(drop=True)
    return left, right


def _spark_result(spark, left, right, **kw):
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="ts", by=["k"], **kw
    )
    return {
        (r["k"], r["ts"], r["lval"]): (r["ts_right"], r["rval"])
        for r in out.collect()
    }


def _pandas_result(left, right, direction="backward", allow_exact_matches=True, tolerance=None):
    out = pd.merge_asof(
        left.sort_values(["ts", "lval"]).reset_index(drop=True),
        right.sort_values("ts").reset_index(drop=True),
        on="ts",
        by="k",
        direction=direction,
        allow_exact_matches=allow_exact_matches,
        tolerance=tolerance,
        suffixes=("", "_right"),
    )
    # pandas keeps only the right value cols; recover the matched right ts
    # by joining rval back (rval is unique)
    rts = dict(zip(right["rval"], right["ts"]))
    res = {}
    for r in out.itertuples(index=False):
        rv = None if pd.isna(r.rval) else int(r.rval)
        res[(r.k, r.ts.to_pydatetime(), r.lval)] = (
            None if rv is None else rts[rv].to_pydatetime(),
            rv,
        )
    return res


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_matches_pandas(spark, direction, exact):
    left, right = _mk(spark)
    got = _spark_result(spark, left, right, direction=direction, allow_exact_matches=exact)
    want = _pandas_result(left, right, direction=direction, allow_exact_matches=exact)
    assert got == want


def test_asof_tolerance(spark):
    left, right = _mk(spark, seed=11)
    got = _spark_result(spark, left, right, tolerance="INTERVAL 15 MINUTES")
    want = _pandas_result(left, right, tolerance=pd.Timedelta(minutes=15))
    assert got == want


def test_asof_numeric_on_and_no_by(spark):
    left = pd.DataFrame({"t": [1.0, 2.5, 7.0, 7.0, 100.0], "lv": list(range(5))})
    right = pd.DataFrame({"t": [0.5, 2.5, 6.0, 50.0], "rv": [1, 2, 3, 4]})
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="t", suffix="_r"
    )
    got = {r["lv"]: r["rv"] for r in out.collect()}
    assert got == {0: 1, 1: 2, 2: 3, 3: 3, 4: 4}


def test_asof_single_shuffle_plan(spark):
    left, right = _mk(spark)
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="ts", by=["k"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange for the union'd window partitioning, none after
    assert plan.count("Exchange") <= 2  # union sides shuffle to the same keying
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------ interval join
def test_interval_join_inner_and_left(spark):
    from alphalens_spark.joins import interval_join

    pts = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:30:00"),
            (2, 1, "2024-01-03 09:00:00"),  # matches nothing
            (3, 2, "2024-01-01 10:30:00"),  # right user's interval only
        ],
        "pid long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ivl = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00", "a"),
            (2, "2024-01-01 10:00:00", "2024-01-01 11:00:00", "b"),
            (1, "2024-01-05 00:00:00", "2024-01-06 00:00:00", "c"),
        ],
        "user_id long, s string, e string, tag string",
    ).select(
        "user_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "tag",
    )
    inner = {
        r.pid: r.tag
        for r in interval_join(pts, ivl, "ts", "s", "e", by=["user_id"]).collect()
    }
    assert inner == {1: "a", 3: "b"}
    left = interval_join(pts, ivl, "ts", "s", "e", by=["user_id"], how="left")
    rows = {r.pid: r.tag for r in left.collect()}
    assert rows == {1: "a", 3: "b", 2: None}


def test_interval_join_multiday_interval_no_duplicates(spark):
    from alphalens_spark.joins import interval_join

    pts = spark.createDataFrame(
        [(1, "2024-01-03 12:00:00")], "pid long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ivl = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-07 00:00:00", "week")],
        "s string, e string, tag string",
    ).select(
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
        "tag",
    )
    out = interval_join(pts, ivl, "ts", "s", "e").collect()
    assert len(out) == 1  # the 7-day explode cannot duplicate a point match


def test_interval_join_plan_is_equi_not_nested_loop(spark):
    from alphalens_spark import plans
    from alphalens_spark.joins import interval_join

    pts = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:30:00")], "pid long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ivl = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
        "user_id long, s string, e string",
    ).select(
        "user_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    s = plans.plan_summary(interval_join(pts, ivl, "ts", "s", "e", by=["user_id"]))
    assert s.quadratic_joins == 0
