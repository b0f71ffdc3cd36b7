"""alphalens_spark.functions — public expression namespace."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from alphalens_spark import functions as AF


def test_md5_long_matches_duckdb_idiom(spark):
    import duckdb

    got = spark.range(1).select(AF.md5_long(F.lit("hello"))).collect()[0][0]
    want = duckdb.sql(
        "SELECT ('0x' || substr(md5('hello'), 1, 15))::BIGINT"
    ).fetchall()[0][0]
    assert got == want


def test_dot_and_cosine(spark):
    df = spark.createDataFrame(
        [Row(a=[1.0, 0.0, 2.0], b=[3.0, 4.0, 0.5])]
    )
    r = df.select(
        AF.dot(F.col("a"), F.col("b")).alias("d"),
        AF.cosine(F.col("a"), F.col("a")).alias("self"),
        AF.cosine(F.col("a"), F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0))).alias("z"),
    ).collect()[0]
    assert r.d == pytest.approx(4.0)
    assert r.self == pytest.approx(1.0)
    assert r.z is None  # zero-norm -> NULL, not an error


def test_decay_weight_half_life(spark):
    df = spark.createDataFrame(
        [Row(t="2024-01-01 00:00:00", ref="2024-01-02 00:00:00")]
    ).select(
        F.col("t").cast("timestamp").alias("t"),
        F.col("ref").cast("timestamp").alias("ref"),
    )
    w = df.select(AF.decay_weight("t", "ref", 24.0).alias("w")).collect()[0].w
    assert w == pytest.approx(0.5)


def test_bps_and_zscore_bounds(spark):
    df = spark.createDataFrame([Row(r=0.0123, m=10.0, s=2.0)])
    lo, hi = AF.zscore_bounds(F.col("m"), F.col("s"), 3)
    row = df.select(
        AF.bps(F.col("r")).alias("bps"), lo.alias("lo"), hi.alias("hi")
    ).collect()[0]
    assert row.bps == pytest.approx(123.0)
    assert (row.lo, row.hi) == (4.0, 16.0)


def test_tokens_words_lines(spark):
    df = spark.createDataFrame([Row(text="  Hello World\nsecond LINE  ")])
    r = df.select(
        AF.tokens("text").alias("t"),
        AF.words("text").alias("w"),
        AF.nonempty_lines("text").alias("l"),
    ).collect()[0]
    assert r.t == ["hello", "world", "second", "line"]
    assert r.w == ["hello", "world", "second", "line"]
    assert r.l == ["Hello World", "second LINE"]


def test_hash_bucket_and_normalize(spark):
    from pyspark.sql import functions as F

    from alphalens_spark import functions as AF

    df = spark.createDataFrame(
        [(1, "  Acme   Widgets "), (2, "acme widgets")], "id long, name string"
    )
    out = df.select(
        AF.normalize_record_text("name").alias("norm"),
        AF.hash_bucket(F.col("id"), 4).alias("b"),
        AF.shingles("name", 2).alias("sh"),
    ).collect()
    assert out[0]["norm"] == out[1]["norm"] == "acme widgets"
    assert all(0 <= r["b"] < 4 for r in out)
    assert out[1]["sh"] == ["acme widgets"]
