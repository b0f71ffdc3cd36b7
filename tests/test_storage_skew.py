"""Bucketed-layout shuffle elimination + skew-salting equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alphalens_spark import storage
from alphalens_spark.scale import skew


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("asset"), (F.col("id") * 2.0).alias("price")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("asset"), (F.col("id") % 7).alias("grp")
    )
    storage.write_bucketed(left, "t_px", ["asset"], n_buckets=8, sort_cols=["asset"])
    storage.write_bucketed(right, "t_grp", ["asset"], n_buckets=8, sort_cols=["asset"])

    a = storage.read_table(spark, "t_px")
    b = storage.read_table(spark, "t_grp")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "asset")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan  # bucketing co-locates both sides
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_px")
        spark.sql("DROP TABLE IF EXISTS t_grp")


def test_salted_join_matches_plain_join(spark):
    # hot key: 90% of big side lands on key 0
    big = spark.range(0, 5_000).select(
        (F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50)).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = skew.salted_join(big, small, ["k"], n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.select("k", "payload", "dim").collect())
    )


def test_salted_join_spreads_hot_key(spark):
    big = spark.range(0, 1_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    salted = skew.with_salt(big, 8, cols=["v"])
    n_salts_used = salted.select("_salt").distinct().count()
    assert n_salts_used == 8  # the single hot key fans out across tasks


def test_salted_collect_set_matches_plain(spark):
    df = spark.range(0, 2_000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 101).alias("v")
    )
    plain = {
        r["k"]: set(r["s"])
        for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    salted = {
        r["k"]: set(r["v_set"])
        for r in skew.salted_collect_set(df, ["k"], "v", n_salts=8).collect()
    }
    assert plain == salted


def test_compact_partitions_shrinks_files_preserves_rows(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from alphalens_spark.storage import compact_partitions

    path = str(tmp_path / "store")
    df = spark.range(0, 2000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("date_month"),
        (F.col("id") * 2.0).alias("v"),
    )
    # simulate micro-batch appends: many tiny files per partition
    for _ in range(4):
        df.repartition(5).write.mode("append").partitionBy("date_month").parquet(path)
    n_files = lambda: {
        d.split("=")[1]: len([
            f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
        ])
        for d in os.listdir(path) if d.startswith("date_month=")
    }
    before = n_files()
    assert all(v >= 20 for v in before.values())
    rows_before = sorted(
        (r["id"], r["date_month"], r["v"])
        for r in spark.read.parquet(path).collect()
    )
    report = compact_partitions(spark, path, target_file_bytes=1 << 30)
    after = n_files()
    assert set(report) == set(before)
    assert all(after[k] == 1 for k in report)
    rows_after = sorted(
        (r["id"], r["date_month"], r["v"])
        for r in spark.read.parquet(path).collect()
    )
    assert rows_after == rows_before
    # idempotent: nothing left to compact
    assert compact_partitions(spark, path, target_file_bytes=1 << 30) == {}


def test_zorder_values_bit_interleave_exact(spark):
    # 2-bit toy: scaled keys are the values themselves (range 0..3), so
    # the Morton codes are checkable by hand
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = {
        (r["x"], r["y"]): r["zvalue"]
        for r in storage.zorder_values(df, ["x", "y"], bits=2).collect()
    }

    def morton(x, y):
        return sum(((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1) for i in range(2))

    assert out == {(x, y): morton(x, y) for x, y in rows}


def test_write_zordered_tightens_per_file_spans(spark, tmp_path):
    import glob

    n = 20_000
    # two independent uniform keys — the adversarial case for a
    # single-column sort (sorting by x leaves y spans at 100%)
    df = spark.range(n).select(
        (F.col("id") * 48271 % 65537 % 1000).alias("x"),
        (F.col("id") * 16807 % 65521 % 1000).alias("y"),
    )
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(8).write.parquet(plain)
    storage.write_zordered(df, zord, ["x", "y"], bits=10, n_files=8)

    def mean_span_frac(path):
        fracs = []
        for f in glob.glob(f"{path}/*.parquet"):
            row = spark.read.parquet(f).agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y")
            ).collect()[0]
            fracs.append(((row[1] - row[0]) + (row[3] - row[2])) / 2 / 1000.0)
        return sum(fracs) / len(fracs)

    # random layout: every file spans ~the full domain on both keys;
    # z-order: each of 8 files covers a small hyper-rectangle
    assert mean_span_frac(plain) > 0.9
    assert mean_span_frac(zord) < 0.55
    # layout-only: contents unchanged
    back = spark.read.parquet(zord)
    assert back.count() == n
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


# ------------------------------------------------------- file-stat skipping
def test_collect_file_stats_and_read_skipping(spark, tmp_path):
    from alphalens_spark import plans
    from alphalens_spark.storage import collect_file_stats, read_skipping, write_zordered

    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    path = str(tmp_path / "zt")
    write_zordered(df, path, ["k"], bits=12, n_files=16)

    stats = collect_file_stats(path, ["k"])
    assert len(stats) == 16
    assert all("min_k" in s and "max_k" in s for s in stats)
    assert sum(s["n_rows"] for s in stats) == 10_000

    # selective range: only the files covering [100, 250] are read
    out = read_skipping(spark, path, "k", lo=100, hi=250, stats=stats)
    got = sorted(r.k for r in out.collect())
    assert got == list(range(100, 251))  # skipping never loses rows
    n_kept = sum(1 for s in stats if s["max_k"] >= 100 and s["min_k"] <= 250)
    assert n_kept < 16  # the layout made most files skippable
    scan = plans.plan_summary(out).scans[0]
    assert scan.n_paths == n_kept  # pruned files never entered the index


def test_read_skipping_empty_range(spark, tmp_path):
    from alphalens_spark.storage import read_skipping, write_zordered

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    path = str(tmp_path / "zt2")
    write_zordered(df, path, ["k"], bits=8, n_files=4)
    out = read_skipping(spark, path, "k", lo=1000, hi=2000)
    assert out.count() == 0
    assert out.schema == spark.read.parquet(path).schema


def test_bloom_manifest_point_lookup_skipping(spark, tmp_path):
    from alphalens_spark.storage import (
        collect_file_blooms,
        read_bloom_skipping,
        write_zordered,
    )

    # user ids clustered by file via the z-layout on k
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 500).alias("user_id")
    )
    path = str(tmp_path / "bl")
    write_zordered(df, path, ["k"], bits=12, n_files=8)
    blooms = collect_file_blooms(spark, path, "user_id", m_bits=2048, k_hashes=4)
    assert len(blooms) == 8
    # every actual occurrence is found (no false negatives)
    out = read_bloom_skipping(
        spark, path, "user_id", 123, blooms, m_bits=2048, k_hashes=4
    )
    assert sorted(r.k for r in out.collect()) == sorted(
        r.k for r in spark.read.parquet(path).where(F.col("user_id") == 123).collect()
    )
    # a value absent from the table prunes every file (modulo FP rate)
    gone = read_bloom_skipping(
        spark, path, "user_id", 999_999, blooms, m_bits=2048, k_hashes=4
    )
    assert gone.count() == 0


def test_hilbert_values_matches_reference_recurrence(spark):
    from alphalens_spark.storage import hilbert_values

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits = 4
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    # min=0 max=15: the integer scaling is the identity, so keys are
    # directly comparable to the classic xy2d recurrence
    out = {
        (r.x, r.y): r.hvalue
        for r in hilbert_values(df, ["x", "y"], bits=bits).collect()
    }
    assert out == {(x, y): xy2d(n, x, y) for x, y in rows}
    # Hilbert property: consecutive keys are Manhattan-distance-1 cells
    inv = {d: k for k, d in out.items()}
    assert len(inv) == n * n
    assert all(
        abs(inv[i][0] - inv[i + 1][0]) + abs(inv[i][1] - inv[i + 1][1]) == 1
        for i in range(n * n - 1)
    )


def test_bucketed_inverted_index_prunes_buckets(spark, tmp_path):
    """The search-index deployment path: postings written bucketed by
    term let a query's term filter prune to its terms' buckets —
    SelectedBucketsCount in the scan proves the layout pays off."""
    from alphalens_spark import storage
    from alphalens_spark.scale.text import build_inverted_index, search_terms

    docs = spark.createDataFrame(
        [(i, f"term{i % 40} shared word{i}") for i in range(200)],
        "doc_id long, text string",
    )
    postings, stats = build_inverted_index(docs)
    storage.write_bucketed(
        postings, "idx_postings_test", ["term"], n_buckets=16
    )
    # autoBucketedScan drops the bucketed read when no exchange is
    # saved, which also forfeits filter bucket-pruning — disable it for
    # the pruning path (the production search session would too)
    old_conf = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        stored = storage.read_table(spark, "idx_postings_test")
        q = stored.where(F.col("term").isin(["term1", "term2"]))
        plan = q._jdf.queryExecution().executedPlan().toString()
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, "bucket pruning not visible in plan"
        assert int(m.group(1)) < int(m.group(2))
        assert int(m.group(1)) <= 2
        # and the search still answers correctly off the stored index
        top = search_terms(stored, stats, ["term1", "shared"], k=3).collect()
        assert len(top) == 3
        assert all(r["n_terms_matched"] >= 1 for r in top)
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old_conf
        )
        spark.sql("DROP TABLE IF EXISTS idx_postings_test")


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The adaptive complement to manual salting: with AQE skew-join
    enabled and thresholds scaled to test data, a join against one hot
    key gets its skewed partition SPLIT at runtime (the executed plan's
    sort-merge join reports isSkew), with results identical to the
    non-adaptive run — the knob the 100 TB posture leans on before
    reaching for with_salt."""
    from pyspark.sql import functions as F

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        # force SMJ (a broadcast join has no skew to split)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # 50k rows on ONE hot key + a uniform tail. The collected frame
        # is the JOIN itself: AQE only splits a skewed partition when no
        # downstream operator requires the join's hash partitioning (a
        # groupBy on the key right above would suppress the split unless
        # forceOptimizeSkewedJoin is on).
        left = spark.range(0, 60_000).select(
            F.when(F.col("id") < 50_000, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 100).select(
            (F.col("id") % 100).alias("k"), F.lit(1).alias("w")
        )
        joined = left.join(right, "k")
        rows = joined.collect()
        got7 = sum(r["v"] for r in rows if r["k"] == 7)
        want7 = sum(
            v for v in range(60_000) if v < 50_000 or v % 100 == 7
        )
        assert got7 == want7 and len(rows) == 60_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the definitive markers: AQE annotates the skewed SMJ and the
        # shuffle read that replicated the hot partition
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "skewed" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivfpq_index_deploys_bucketed_and_prunes(spark, tmp_path):
    """The ANN deployment path, mirroring the inverted-index one: the
    encode_pq artifact written cell-bucketed lets an online query
    batch's probe filter prune the scan to the probed cells' buckets
    (SelectedBucketsCount), and the pruned search answers row-identical
    to ivfpq_topk over the full in-memory index."""
    import numpy as np

    from alphalens_spark.scale import similarity

    rng = np.random.RandomState(13)
    # 4 well-separated clusters so cells are meaningful
    centers = rng.normal(0, 5, (4, 16))
    vecs = [
        (i, (centers[i % 4] + rng.normal(0, 0.1, 16)).tolist())
        for i in range(160)
    ]
    corpus = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    cents, books, index = similarity.build_ivfpq(
        corpus, n_cells=4, m_sub=4, ksub=8, iters=2
    )
    similarity.deploy_ivfpq_index(index, "ivfpq_idx_test", n_buckets=8)
    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    old_conf = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        out = similarity.search_ivfpq_index(
            spark, "ivfpq_idx_test", queries, cents, books, k=5, nprobe=2
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, "bucket pruning not visible in plan"
        assert int(m.group(1)) < int(m.group(2))
        got = {(r.query_id, r.rnk): r.neighbor_id for r in out.collect()}
        full = similarity.ivfpq_topk(
            corpus, queries, k=5, nprobe=2,
            centroids=cents, codebooks=books, index=index,
        )
        exp = {(r.query_id, r.rnk): r.neighbor_id for r in full.collect()}
        assert got == exp and len(got) == 15
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old_conf
        )
        spark.sql("DROP TABLE IF EXISTS ivfpq_idx_test")
