"""Sort / limit / top-k operators (SURVEY.md §2 B6).

Scale notes: a global ORDER BY is a range-partitioned shuffle (sampled
boundaries) — fine for bounded outputs; ORDER BY + LIMIT k is planned by
Spark as TakeOrderedAndProject (per-partition top-k heaps, then a k-row
merge on the driver) which never materializes a global sort at 100 TB.

Determinism: every LIMIT sits under a total ordering (FIXTURES.md §3) —
tie-broken by a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


# b6.1 multi-key sort, asc/desc, nulls first/last (nulls introduced
# deterministically; base tables are null-free)
@register(
    "sort_multi_key",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, ship_or_null
FROM (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         CASE WHEN l_linenumber >= 5 THEN NULL ELSE l_shipdate END AS ship_or_null
  FROM lineitem
  WHERE l_orderkey <= 200
)
ORDER BY l_returnflag DESC, ship_or_null ASC NULLS LAST,
         l_orderkey, l_linenumber
LIMIT 100
""",
    tags=("b6.1",),
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey", "l_linenumber", "l_returnflag",
            F.when(F.col("l_linenumber") >= 5, F.lit(None))
             .otherwise(F.col("l_shipdate")).alias("ship_or_null"),
        )
        .orderBy(F.col("l_returnflag").desc(),
                 F.col("ship_or_null").asc_nulls_last(),
                 "l_orderkey", "l_linenumber")
        .limit(100)
    )


# b6.2 limit under total order
@register(
    "sort_limit",
    oracle="""
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_orderdate, o_orderkey
LIMIT 25
""",
    tags=("b6.2",),
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(25)
    )


# b6.3 global top-k (TakeOrderedAndProject — per-partition heaps, no global
# sort materialized)
@register(
    "sort_global_top_k",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    tags=("b6.3",),
)
def sort_global_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )
