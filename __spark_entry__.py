"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in :mod:`alphalens_spark.entry_queries`; the library
is :mod:`alphalens_spark` (see SURVEY.md §2 for the operator inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: mean forward return per
    factor quantile — the core question the reference exists to answer
    (reference utils.py:666-841 + performance.py:453-517).
    """
    from alphalens_spark.entry_queries import q_mean_return_by_quantile

    return q_mean_return_by_quantile(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from alphalens_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from alphalens_spark.entry_queries import ORACLES

    return dict(ORACLES)
