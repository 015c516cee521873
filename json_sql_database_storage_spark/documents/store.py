"""Document persistence — insert / upsert / point lookup over Parquet.

Reference parity:
- A4 insert (DatabaseManager.java:391-423): append-mode Parquet write.
- A5 update-by-key (:425-447, chosen by rowNum > 0 at :211-229): plain
  Parquet has no MERGE, so upsert is the deterministic join rewrite
  ``new ∪ (old ⟕anti new)`` — new rows win, untouched rows survive.
- A6 auto-DDL (:130, :152, :200): schema evolution via mergeSchema — new
  columns appear, old rows read them as NULL (the reference back-fills
  nothing either).
- A3 point lookup (:253-269): key filter; Parquet min/max row-group stats
  prune the scan the way SQLite's rowid index seeks.

Scale: upsert rewrites only the table being touched; at 100 TB a real
deployment would partition each collection by a key range and rewrite only
affected partitions (or sit on a Delta/Iceberg MERGE) — the logical
semantics here are exactly that MERGE.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import KEY, ShredResult, assemble, shred


class DocumentStore:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self._path(table))

    def read(self, table: str) -> DataFrame:
        return (self.spark.read.option("mergeSchema", "true")
                .parquet(self._path(table)))

    # A4 — plain append
    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").option("mergeSchema", "true") \
            .parquet(self._path(table))

    # A5 — upsert by rowNum: new ∪ (old anti-join new)
    def upsert(self, df: DataFrame, table: str) -> None:
        path = self._path(table)
        if not self.exists(table):
            df.write.mode("overwrite").parquet(path)
            return
        old = self.read(table)
        merged = df.unionByName(
            old.join(df.select(KEY), on=KEY, how="left_anti"),
            allowMissingColumns=True)
        tmp = path + ".__tmp__"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path)
        os.rename(tmp, path)

    # A1 end-to-end: shred documents and upsert every produced table
    def save_docs(self, docs: DataFrame, root: str) -> ShredResult:
        result = shred(docs, root)
        for name, tdf in result.tables.items():
            self.upsert(tdf, name)
        return result

    # A3 — point lookup by primary key
    def lookup(self, table: str, row_num: int) -> DataFrame:
        return self.read(table).filter(F.col(KEY) == F.lit(row_num))

    def assemble_from_disk(self, result: ShredResult,
                           table: str | None = None) -> DataFrame:
        """Re-assemble using the persisted tables (the rels manifest carries
        the structure; the data comes from Parquet)."""
        on_disk = ShredResult(
            root=result.root,
            tables={name: self.read(name) for name in result.tables},
            rels=result.rels)
        return assemble(on_disk, table)
