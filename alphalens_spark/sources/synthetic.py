"""Deterministic synthetic ``events`` generator — batch + stream source.

Scale testing needs data bigger than what is stored; this source
manufactures the events schema (event_id, ts, user_id, event_type,
value, props) from a seed + row index alone, so

- batch: N rows split over P driver-planned index-range partitions, each
  executor generating its slice independently (zero storage, zero
  shuffle — the 100 TB test harness pattern);
- stream: a replayable micro-batch source whose offset is just the row
  index. ``readBetweenOffsets(start, end)`` regenerates EXACTLY the rows
  of any earlier batch (the rows are a pure function of the index), which
  is the Structured Streaming recovery contract most quick-and-dirty
  rate sources break.

Every value derives from ``md5(seed:i)`` — the same determinism recipe
as the engine's sampling/sketch operators, so tests can assert exact
rows, not just counts.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

_TYPES = ["view", "click", "add_to_cart", "purchase", "refund"]
_EPOCH = datetime(2024, 1, 1)


def _h(seed: int, i: int, salt: str) -> int:
    d = hashlib.md5(f"{seed}:{salt}:{i}".encode()).hexdigest()
    return int(d[:15], 16)


def gen_event(seed: int, i: int) -> tuple:
    """Row i of the seeded stream — a pure function (replayable)."""
    ts = _EPOCH + timedelta(seconds=_h(seed, i, "t") % 864_000)
    user = _h(seed, i, "u") % 1000
    etype = _TYPES[_h(seed, i, "e") % len(_TYPES)]
    value = round((_h(seed, i, "v") % 100_000) / 100.0, 2)
    props = f'{{"idx": {i}}}'
    return (i, ts, user, etype, value, props)


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 7))

    def partitions(self):
        step = max(1, (self.n + self.parts - 1) // self.parts)
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield gen_event(self.seed, i)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.seed = int(options.get("seed", 7))
        self.batch = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("max_rows", 1000))

    def initialOffset(self):  # noqa: N802 (API name)
        return {"idx": 0}

    def read(self, start: dict):
        lo = start["idx"]
        hi = min(lo + self.batch, self.max_rows)
        return (
            iter([gen_event(self.seed, i) for i in range(lo, hi)]),
            {"idx": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter(
            [gen_event(self.seed, i) for i in range(start["idx"], end["idx"])]
        )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)`` or
    ``spark.readStream.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema: StructType) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)
