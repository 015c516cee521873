"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``json_sql_database_storage_spark.registry``: every operator
module registers its (query, oracle) pair there; this file just exposes the
collected dicts.  ``entry`` runs the flagship TPC-H-Q1-shaped aggregation on
sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from json_sql_database_storage_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from json_sql_database_storage_spark.operators.aggregates import q1_pricing_summary
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for each hash-checkable query."""
    return registry.oracle_sql()
