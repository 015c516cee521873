"""Set operations (SURVEY.md §2 B7).

UNION ALL is a zero-shuffle concatenation of partitions; DISTINCT /
INTERSECT / EXCEPT shuffle on the full row hash — at scale, prefer keyed
semi/anti joins (operators/joins.py) when a key exists, these when whole-row
set semantics are wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def _customer_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))


def _supplier_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))


# b7.1 union all — halves of lineitem split on linenumber parity,
# re-concatenated (verifies column alignment + no dedup)
@register(
    "setop_union_all",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity FROM (
  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber % 2 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_linenumber % 2 = 1
)
ORDER BY l_orderkey, l_linenumber
""",
    tags=("b7.1",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity")
    even = li.filter(F.col("l_linenumber") % 2 == 0)
    odd = li.filter(F.col("l_linenumber") % 2 == 1)
    return even.unionByName(odd).orderBy("l_orderkey", "l_linenumber")


# b7.2 union distinct — nations having customers ∪ nations having suppliers
@register(
    "setop_union_distinct",
    oracle="""
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey AS nationkey FROM supplier
)
ORDER BY nationkey
""",
    tags=("b7.2",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _customer_nations(spark, sf_dir)
        .union(_supplier_nations(spark, sf_dir))
        .distinct()
        .orderBy("nationkey")
    )


# b7.3 intersect — nations with both customers and suppliers
@register(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
    tags=("b7.3",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _customer_nations(spark, sf_dir)
        .intersect(_supplier_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


# b7.4 except — nations with customers but no suppliers
@register(
    "setop_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
    tags=("b7.4",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _customer_nations(spark, sf_dir)
        .subtract(_supplier_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


# b7.4b except all — multiset difference on order priorities per status
@register(
    "setop_except_all",
    oracle="""
SELECT o_orderpriority FROM (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
)
ORDER BY o_orderpriority
""",
    tags=("b7.4",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_orderpriority")
    return f.exceptAll(p).orderBy("o_orderpriority")
