"""HyperLogLog sketch: estimator parity with a pure-Python reference,
the element-wise-max merge algebra, and the streaming store's
incremental == one-shot + replay-idempotence guarantees."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from alphalens_spark.scale.profile import (
    _hll_alpha,
    hll_distinct,
    hll_estimate,
    hll_registers,
)


def _py_hll(values, p):
    """Independent pure-Python HLL over the same md5-prefix hash."""
    m = 1 << p
    w = 60 - p
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        rem = h & ((1 << w) - 1)
        rho = w + 1 - rem.bit_length()
        b = h >> w
        regs[b] = max(regs.get(b, 0), rho)
    nb = len(regs)
    s = sum(1 << (w + 1 - r) for r in regs.values()) + (m - nb) * (1 << (w + 1))
    raw = _hll_alpha(m) * m * m * float(1 << (w + 1)) / float(s)
    if raw <= 2.5 * m and nb < m:
        est = m * math.log(m / (m - nb))
    else:
        est = raw
    return nb, round(est, 6)


def _collect(df):
    return {
        r["source"]: (r["n_buckets"], r["est_distinct"]) for r in df.collect()
    }


def test_hll_matches_python_reference_both_branches(spark):
    # 'a' exercises the raw branch (all 64 buckets hit), 'b' the
    # small-range linear-counting correction
    rows = [("a", f"val{i}") for i in range(2000)] + [
        ("b", f"x{i}") for i in range(37)
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = _collect(hll_distinct(df, ["source"], "text", p=6))
    assert got["a"] == _py_hll([f"val{i}" for i in range(2000)], 6)
    assert got["b"] == _py_hll([f"x{i}" for i in range(37)], 6)
    # sanity: estimates land near truth (±3σ ≈ 3·1.04/√64 ≈ 39%)
    assert abs(got["a"][1] - 2000) / 2000 < 0.39
    assert abs(got["b"][1] - 37) / 37 < 0.39


def test_hll_accuracy_tracks_precision(spark):
    vals = [(f"v{i}",) for i in range(20000)]
    df = spark.createDataFrame(vals, "text string").withColumn(
        "source", F.lit("s")
    )
    err = {}
    for p in (4, 8, 11):
        est = _collect(hll_distinct(df, ["source"], "text", p=p))["s"][1]
        err[p] = abs(est - 20000) / 20000
        # within ±3σ of the standard HLL error for m = 2^p registers
        assert err[p] < 3 * 1.04 / math.sqrt(1 << p), (p, est)


def test_hll_register_merge_is_union_sketch(spark):
    # max-merge of two halves' registers == registers of the whole —
    # the algebra every store/compaction step relies on
    rows = [("s", f"item{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "source string, text string")
    halves = [
        df.where(F.crc32(F.col("text")) % 2 == i) for i in (0, 1)
    ]
    merged_regs = (
        hll_registers(halves[0], ["source"], "text", 6)
        .unionByName(hll_registers(halves[1], ["source"], "text", 6))
        .groupBy("source", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    got = _collect(hll_estimate(merged_regs, ["source"], 6))
    want = _collect(hll_distinct(df, ["source"], "text", 6))
    assert got == want


def test_hll_store_incremental_equals_oneshot_and_replays(spark, tmp_path):
    from alphalens_spark.streaming.ops import (
        hll_store_estimate,
        hll_store_update,
    )

    rows = [("s1", f"a{i}") for i in range(300)] + [
        ("s2", f"b{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    b1 = df.where(F.crc32("text") % 3 < 2)
    b2 = df.where(F.crc32("text") % 3 == 2)
    store = str(tmp_path / "hll")
    hll_store_update(b1, store, ["source"], "text", 6)
    hll_store_update(b2, store, ["source"], "text", 6)
    got = _collect(hll_store_estimate(spark, store, ["source"], 6))
    want = _collect(hll_distinct(df, ["source"], "text", 6))
    assert got == want
    # replay-idempotence: re-delivering a batch cannot change the store
    hll_store_update(b2, store, ["source"], "text", 6)
    assert _collect(hll_store_estimate(spark, store, ["source"], 6)) == want


def test_merge_hll_stores_compacts_generations(spark, tmp_path):
    from alphalens_spark.streaming.ops import (
        hll_store_estimate,
        hll_store_update,
        merge_hll_stores,
    )

    rows = [("s", f"doc{i}") for i in range(800)]
    df = spark.createDataFrame(rows, "source string, text string")
    gens = []
    for i in (0, 1):
        path = str(tmp_path / f"gen{i}")
        hll_store_update(
            df.where(F.crc32("text") % 2 == i), path, ["source"], "text", 6
        )
        gens.append(path)
    out = str(tmp_path / "compacted")
    merge_hll_stores(spark, gens, out, ["source"])
    got = _collect(hll_store_estimate(spark, out, ["source"], 6))
    assert got == _collect(hll_distinct(df, ["source"], "text", 6))
