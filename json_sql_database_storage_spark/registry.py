"""Query/oracle registry.

Every implemented operator from SURVEY.md §2 registers here as a named
(spark_fn, oracle_sql) pair; ``__spark_entry__.py`` exposes the collected
dicts to the driver, and the pytest oracle harness parametrizes over the same
registry.  Oracle SQL is DuckDB dialect over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings).  ``oracle=None`` marks genuinely non-SQL-expressible operators
(streaming, UDF plumbing, nested output) — the driver then runs a weaker
rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}

# Modules whose import registers queries.  Order matters only for readability.
_OPERATOR_MODULES = (
    "json_sql_database_storage_spark.operators.scans",
    "json_sql_database_storage_spark.operators.filters",
    "json_sql_database_storage_spark.operators.joins",
    "json_sql_database_storage_spark.operators.aggregates",
    "json_sql_database_storage_spark.operators.windows",
    "json_sql_database_storage_spark.operators.sort_limit",
    "json_sql_database_storage_spark.operators.setops",
    "json_sql_database_storage_spark.functions.scalar",
    "json_sql_database_storage_spark.documents.queries",
    "json_sql_database_storage_spark.llm.dedup",
    "json_sql_database_storage_spark.llm.similarity",
    "json_sql_database_storage_spark.llm.text_analysis",
    "json_sql_database_storage_spark.llm.multimodal",
    "json_sql_database_storage_spark.streaming.queries",
    "json_sql_database_storage_spark.operators.udfs",
    "json_sql_database_storage_spark.operators.scale",
)

_loaded = False


def register(name: str, oracle: str | None = None,
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags))
        return fn
    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Modules land incrementally across build phases; only swallow
            # the module itself being absent, never a real import error.
            if e.name != mod:
                raise
    _loaded = True


def specs() -> dict[str, QuerySpec]:
    load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in specs().items()
            if spec.oracle is not None}
