"""ic_bootstrap_ci: md5-seeded circular block bootstrap, exact integers."""

import hashlib

from pyspark.sql import functions as F

from alphalens_spark.performance import ic_bootstrap_ci


def _py_boot(vals_e6, n_boot, block, seed, lo_k, hi_k):
    n = len(vals_e6)
    sums = []
    for b in range(n_boot):
        picked = []
        for k in range((n + block - 1) // block):
            h = hashlib.md5(f"{seed}_{b}_{k}".encode()).hexdigest()
            o = int(h[:15], 16) % n
            for j in range(block):
                if k * block + j < n:
                    picked.append(vals_e6[(o + j) % n])
        sums.append((sum(picked), b))
    sums.sort()
    return sums[lo_k - 1][0], sums[hi_k - 1][0]


def test_matches_python_md5_replay(spark):
    import random

    rng = random.Random(17)
    rows = []
    vals = []
    for d in range(37):
        v = rng.uniform(-0.5, 0.5)
        vals.append(v)
        rows.append((d, v))
    ic = spark.createDataFrame(rows, "offset int, ic double").select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("offset")).alias(
            "date"
        ),
        "ic",
    )
    out = ic_bootstrap_ci(
        ic, "ic", n_boot=50, block=5, seed=3, alpha=0.1
    ).collect()[0]
    vals_e6 = [int(round(round(v, 6) * 1e6)) for v in vals]
    lo, hi = _py_boot(vals_e6, 50, 5, 3, lo_k=3, hi_k=48)
    assert out["n_dates"] == 37
    assert out["obs_sum_e6"] == sum(vals_e6)
    assert out["lo_sum_e6"] == lo
    assert out["hi_sum_e6"] == hi
    assert out["lo_sum_e6"] <= out["hi_sum_e6"]


def test_null_ics_excluded_and_partition_invariant(spark):
    rows = [(d, 0.01 * d if d % 5 else None) for d in range(40)]
    ic = spark.createDataFrame(rows, "offset int, ic double").select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("offset")).alias(
            "date"
        ),
        "ic",
    )
    a = ic_bootstrap_ci(ic, "ic", n_boot=40, block=7, seed=1).collect()[0]
    b = ic_bootstrap_ci(
        ic.repartition(13), "ic", n_boot=40, block=7, seed=1
    ).collect()[0]
    assert a == b
    assert a["n_dates"] == 32  # the 8 NULL dates dropped
