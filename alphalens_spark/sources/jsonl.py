"""JSONL corpus source/sink via the Python DataSource V2 API.

Crawled-text corpora (C4, RefinedWeb, pile-style dumps) ship as
newline-delimited JSON; this source reads a directory (or single file) of
``*.jsonl`` into the engine's ``documents`` shape with

- one input partition per file — at 100 TB the unit of parallelism is
  the file (shard) list, planned on the driver without touching data;
- executor-side filter pushdown for top-level equality / IsNotNull
  predicates (``lang = 'en'`` is evaluated as each line is parsed, so
  non-matching rows never cross into Spark rows at all — the same
  contract as a parquet row-group filter, minus the statistics);
- a writer that emits one shard per task and reports row counts through
  the commit-message channel.

This is deliberately a *Python* source: the point is the partition
planning / pushdown / commit protocol plumbing, which is identical for
any bespoke format. For formats Spark already reads natively, the JVM
reader wins and should be used instead.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    IsNotNull,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

DEFAULT_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars int"
)


@dataclass
class _FilePartition(InputPartition):
    path: str


@dataclass
class _CountCommit(WriterCommitMessage):
    path: str | None  # None: the task's partition was empty (no shard)
    n_rows: int


class JsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_docs requires a path")
        self.pushed: list = []  # applied per-line in read()

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept top-level EqualTo / IsNotNull; reject the rest back to
        Spark. Accepted filters are ANDed during line parsing."""
        names = {f.name for f in self.schema.fields}
        for f in filters:
            simple_col = (
                isinstance(f, (EqualTo, IsNotNull))
                and len(f.attribute) == 1
                and f.attribute[0] in names
            )
            if simple_col:
                self.pushed.append(f)
            else:
                yield f  # unsupported: Spark keeps evaluating it

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".jsonl")
            )
        else:
            files = [self.path]
        return [_FilePartition(p) for p in files]

    def _keep(self, rec: dict) -> bool:
        for f in self.pushed:
            v = rec.get(f.attribute[0])
            if isinstance(f, EqualTo) and v != f.value:
                return False
            if isinstance(f, IsNotNull) and v is None:
                return False
        return True

    def read(self, partition: _FilePartition):
        fields = [f.name for f in self.schema.fields]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if self._keep(rec):
                    yield tuple(rec.get(name) for name in fields)


class JsonlWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool) -> None:
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_docs requires a path")
        self.overwrite = overwrite
        # run id fixed on the DRIVER and pickled to every task: new shards
        # are stage-named part-<run>-*.jsonl, so commit() can swap —
        # delete every shard of a previous run — atomically per-run
        self.run_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        names = [f.name for f in self.schema.fields]
        # open the shard lazily on the first row: at 32+ tasks per write,
        # eager opens turn every small DataFrame into a small-file
        # explosion of empty shards (observed 64 files for 1 row)
        shard, fh, n = None, None, 0
        try:
            for row in iterator:
                if fh is None:
                    os.makedirs(self.path, exist_ok=True)
                    shard = os.path.join(
                        self.path, f"part-{self.run_id}-{uuid.uuid4().hex}.jsonl"
                    )
                    fh = open(shard, "w", encoding="utf-8")
                fh.write(json.dumps(dict(zip(names, row)), ensure_ascii=False))
                fh.write("\n")
                n += 1
        finally:
            if fh is not None:
                fh.close()
        return _CountCommit(path=shard, n_rows=n)

    def commit(self, messages):
        # all tasks succeeded; this run's shards are in place. Under
        # overwrite, the swap happens HERE: previous runs' shards (any
        # part-*.jsonl without this run id) are removed only after every
        # new shard is durably written — a reader before commit sees the
        # old data, after commit the new, never a mix of neither.
        if self.overwrite and os.path.isdir(self.path):
            mine = f"part-{self.run_id}-"
            for f in os.listdir(self.path):
                if (
                    f.endswith(".jsonl")
                    and f.startswith("part-")
                    and not f.startswith(mine)
                ):
                    os.remove(os.path.join(self.path, f))
        manifest = {
            "shards": sorted(m.path for m in messages if m and m.path),
            "n_rows": sum(m.n_rows for m in messages if m),
        }
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages):
        for m in messages:
            if m and m.path and os.path.exists(m.path):
                os.remove(m.path)


class JsonlDataSource(DataSource):
    """``spark.read.format("jsonl_docs").option("path", dir)`` after
    ``spark.dataSource.register(JsonlDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self):
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> JsonlReader:
        return JsonlReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(schema, self.options, overwrite)
