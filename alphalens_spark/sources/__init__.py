"""Custom Spark data sources (Python DataSource V2 API, Spark 4.x).

The package-level sources the engine ships beyond the built-in parquet /
CSV / pandas interop paths (:mod:`alphalens_spark.datasets`,
:mod:`alphalens_spark.ingest`):

- :mod:`alphalens_spark.sources.jsonl` — JSONL document corpus source +
  sink with executor-side filter pushdown and per-file partition
  planning (the wire format most crawled-text corpora arrive in).
- :mod:`alphalens_spark.sources.synthetic` — deterministic seeded
  generator of the ``events`` schema, as a partitioned batch source and
  a replayable micro-batch stream source (offset-exact re-reads), for
  scale testing without storage.

Register with ``spark.dataSource.register(JsonlDataSource)`` /
``spark.dataSource.register(SyntheticEventsDataSource)`` and read via
``spark.read.format("jsonl_docs")`` etc.
"""

from alphalens_spark.sources.jsonl import JsonlDataSource
from alphalens_spark.sources.synthetic import SyntheticEventsDataSource

__all__ = ["JsonlDataSource", "SyntheticEventsDataSource"]
