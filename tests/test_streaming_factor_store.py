"""Streaming factor_data maintenance: panel rows arriving as file batches
must leave the partitioned store equal to the full batch recompute."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def _collect_sorted(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r) for r in rows
    )


def test_stream_maintenance_matches_batch(spark, tmp_path):
    from alphalens_spark import datasets
    from alphalens_spark.incremental import read_store
    from alphalens_spark.streaming.ops import stream_factor_data_maintenance

    panel = datasets.price_factor_panel(spark, SF_DIR).persist()
    dates = [r["date"] for r in panel.select("date").distinct().orderBy("date").collect()]
    cutoff = dates[len(dates) // 2]

    src = str(tmp_path / "arrivals")
    # two arrival waves, one file each (arrivals must be date-monotonic
    # across micro-batches — see stream_factor_data_maintenance docstring)
    panel.where(F.col("date") <= cutoff).coalesce(1).write.mode("append").parquet(src)
    panel.where(F.col("date") > cutoff).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(panel.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = stream_factor_data_maintenance(
        stream,
        store_path=str(tmp_path / "store"),
        raw_path=str(tmp_path / "raw"),
        checkpoint_path=str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(180)

    got = _collect_sorted(read_store(spark, str(tmp_path / "store")))
    want = _collect_sorted(datasets.factor_data(spark, SF_DIR))
    assert got == want
    panel.unpersist()
