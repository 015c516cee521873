"""Custom Python data source (Spark 4 `pyspark.sql.datasource` API) —
the extension point for sources Spark has no built-in reader for
(proprietary formats, service APIs, bespoke document stores).  Reference
parity: the reference's ONLY ingest path is application code feeding
JSON objects one at a time (DatabaseManager.java:118); this is the
Spark-native counterpart — a pluggable reader that surfaces external
JSON documents as a first-class DataFrame source with real partitioned
parallelism.

100-TB design: `partitions()` returns one InputPartition per file, so a
1000-executor cluster reads 1000 chunks concurrently — scan parallelism
is the file count, exactly like the built-in file sources; each
partition streams line-by-line (no per-partition materialization).  The
honest caveat: rows cross the Python boundary (this is the slow path by
construction — the built-in JSON reader stays JVM-side), so the fast
path for FORMATS SPARK KNOWS is spark.read.json; this API is for the
sources it doesn't.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

_FIELDS = ("doc_id", "lang", "n_chars")


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        return [_FilePartition(e.path)
                for e in sorted(os.scandir(self.path),
                                key=lambda e: e.name)
                if e.name.endswith(".json") and not e.name.startswith(".")]

    def read(self, partition: _FilePartition):
        with open(partition.path) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                yield tuple(d.get(k) for k in _FIELDS)


class JsonDocsDataSource(DataSource):
    """`spark.read.format("jsondocs").option("path", dir).load()`"""

    @classmethod
    def name(cls) -> str:
        return "jsondocs"

    def schema(self) -> str:
        return "doc_id BIGINT, lang STRING, n_chars BIGINT"

    def reader(self, schema) -> JsonDocsReader:
        return JsonDocsReader(self.options)


def register_jsondocs(spark) -> None:
    """Idempotent registration (re-registering the same name is fine —
    latest wins in the session's data-source registry)."""
    spark.dataSource.register(JsonDocsDataSource)
