"""SparkSession factory.

The reference serializes all work through one JDBC connection drained by a
single worker thread (DatabaseManager.java:46,51,87-106).  Spark replaces that
wholesale: the session is the "connection", the scheduler parallelizes, and
lazy evaluation replaces the work queue.  Config here is chosen for both the
local[32] test harness and to be sane defaults on a real cluster:

- AQE on (runtime partition coalescing, skew-join handling, dynamic join
  strategy) — the main lever that keeps hand-tuned partition counts from
  becoming wrong at 100x data.
- shuffle.partitions sized to cores locally; on a cluster AQE coalescing
  makes a high initial number safe.
- session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-invariant.
- Arrow enabled for any pandas-interop path (vectorized UDFs, toPandas).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_session(app_name: str = "json_sql_database_storage_spark",
                  cores: int | None = None) -> SparkSession:
    cores = cores or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir",
                os.path.join(tempfile.gettempdir(), "json_sql_dbs_warehouse"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_or_create(spark: SparkSession | None = None) -> SparkSession:
    return spark if spark is not None else build_session()
