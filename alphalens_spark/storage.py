"""Bucketed / partitioned storage layouts for the 100 TB posture.

The reference has no storage engine (SURVEY §2.1: in-memory pandas in,
figures out). At cluster scale the dominant cost of this workload's two
join families — (date, asset) equi-joins and per-asset window shuffles —
is the Exchange. Two layout tools remove it at the source:

- month-partitioned parquet (datasets.write_factor_data_partitioned):
  partition pruning for every date-range query;
- asset-bucketed tables (here): both sides of an (asset, …) join or a
  per-asset window read pre-hashed into the same bucket files, so Spark
  plans the join/window with NO shuffle (verified by plan assertion in
  tests/test_storage.py).

Bucketing requires the session catalog (`saveAsTable`) — bucketed
layout is metadata the path-based reader cannot carry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    ``n_buckets`` sizes the parallelism of every downstream shuffle-free
    join/window over ``bucket_cols``: pick ≈ cluster cores at the target
    scale (buckets are the unit of task granularity once the Exchange is
    gone). Sorting within buckets additionally lets sort-merge joins skip
    their sort, and per-asset windows read presorted runs.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact."""
    return spark.table(table)
