"""Projection / filter / predicate operators (SURVEY.md §2 B2).

Reference parity: the reference's only read predicate is the primary-key
point lookup ``SELECT * FROM <table> WHERE rowNum=?``
(DatabaseManager.java:257-259) — b2.9 here.  Everything else is the predicate
surface its SQL backend provides.

Scale notes: every filter below is a simple comparison/IN/BETWEEN/LIKE on
scanned columns, so Catalyst pushes it into the Parquet scan (PushedFilters)
and row-group min/max statistics skip data before decode — the 100 TB path is
"read only matching row groups", no shuffle anywhere in this module.
Projections prune the scan schema (ReadSchema) so unused columns are never
decoded from the columnar files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec, dec_factor
from ..registry import register
from ..sources import load_table


# b2.1 column projection / pruning
@register(
    "filter_projection",
    oracle="""
SELECT l_orderkey, l_partkey, l_quantity
FROM lineitem
ORDER BY l_orderkey, l_partkey, l_linenumber
""",
    tags=("b2.1",),
)
def filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.orderBy("l_orderkey", "l_partkey", "l_linenumber")
            .select("l_orderkey", "l_partkey", "l_quantity"))


# b2.2 computed projection — arithmetic in exact decimals (functions/exact.py)
# so row-level rounding is engine-independent.
@register(
    "filter_computed_projection",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CAST(round(CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(1 - l_discount AS DECIMAL(6,4)), 2) AS DOUBLE) AS net_price,
  CAST(round(CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(1 - l_discount AS DECIMAL(6,4))
           * CAST(1 + l_tax AS DECIMAL(6,4)), 2) AS DOUBLE)      AS charged,
  CAST(l_quantity AS BIGINT)                                     AS qty_int
FROM lineitem
WHERE l_orderkey <= 500
ORDER BY l_orderkey, l_linenumber
""",
    tags=("b2.2",),
)
def filter_computed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    net = dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_orderkey") <= 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(net, 2).cast("double").alias("net_price"),
            F.round(net * dec_factor(1 + F.col("l_tax")), 2)
             .cast("double").alias("charged"),
            F.col("l_quantity").cast("bigint").alias("qty_int"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# b2.3 comparison predicates < <= = != > >=
@register(
    "filter_comparisons",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity >= 30 AND l_quantity < 40
  AND l_discount > 0.02 AND l_discount <= 0.08
  AND l_linenumber != 7
  AND l_returnflag = 'N'
ORDER BY l_orderkey, l_linenumber
""",
    tags=("b2.3",),
)
def filter_comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 30) & (F.col("l_quantity") < 40)
            & (F.col("l_discount") > 0.02) & (F.col("l_discount") <= 0.08)
            & (F.col("l_linenumber") != 7)
            & (F.col("l_returnflag") == "N")
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    )


# b2.4 boolean AND / OR / NOT
@register(
    "filter_boolean_logic",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE (o_orderstatus = 'F' AND o_totalprice > 200000)
   OR (o_orderpriority = '1-URGENT' AND NOT o_orderstatus = 'F')
ORDER BY o_orderkey
""",
    tags=("b2.4",),
)
def filter_boolean_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000))
            | ((F.col("o_orderpriority") == "1-URGENT") & ~(F.col("o_orderstatus") == "F"))
        )
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    )


# b2.5 IN / NOT IN
@register(
    "filter_in_not_in",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey
FROM nation
WHERE n_name IN ('CANADA', 'BRAZIL', 'INDIA', 'FRANCE')
   OR n_regionkey NOT IN (0, 1, 2)
ORDER BY n_nationkey
""",
    tags=("b2.5",),
)
def filter_in_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return (
        n.filter(
            F.col("n_name").isin("CANADA", "BRAZIL", "INDIA", "FRANCE")
            | ~F.col("n_regionkey").isin(0, 1, 2)
        )
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )


# b2.6 BETWEEN on a timestamp column
@register(
    "filter_between",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1995-03-31 23:59:59'
ORDER BY l_orderkey, l_linenumber
""",
    tags=("b2.6",),
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1995-03-31 23:59:59").cast("timestamp")))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    )


# b2.7 LIKE / prefix / contains
@register(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE '%BRASS%' OR p_name LIKE 'a%' OR p_type LIKE '_CONOMY%'
ORDER BY p_partkey
""",
    tags=("b2.7",),
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_type").like("%BRASS%")
            | F.col("p_name").like("a%")
            | F.col("p_type").like("_CONOMY%")
        )
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


# b2.8 NULL predicates.  Base tables have no nulls, so nulls are introduced
# deterministically with nullif — the reference *loses* nulls (writes skip
# them, reads coerce SQL NULL to "", DatabaseManager.java:203,309-311); this
# engine keeps real null semantics (SURVEY.md §2-A14 divergence).
@register(
    "filter_null_predicates",
    oracle="""
WITH w AS (
  SELECT o_orderkey,
         nullif(o_orderstatus, 'P')  AS status_or_null,
         CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END AS big_price
  FROM orders
)
SELECT o_orderkey, status_or_null, big_price
FROM w
WHERE status_or_null IS NULL OR big_price IS NOT NULL
ORDER BY o_orderkey
""",
    tags=("b2.8",),
)
def filter_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        F.when(F.col("o_totalprice") < 50000, F.lit(None))
         .otherwise(F.col("o_totalprice")).alias("big_price"),
    )
    return (
        w.filter(F.col("status_or_null").isNull() | F.col("big_price").isNotNull())
        .orderBy("o_orderkey")
    )


# b2.9 point lookup by primary key (reference A3 parity:
# DatabaseManager.java:253-269 `SELECT * WHERE rowNum=?`).  On Parquet the
# rowid index seek becomes row-group min/max skipping + (when laid out
# sorted/partitioned by key) file pruning.
@register(
    "filter_point_lookup",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate, o_orderpriority
FROM orders
WHERE o_orderkey = 515
""",
    tags=("b2.9", "A3"),
)
def filter_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") == 515).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    )


# b2.10 conditional expression CASE WHEN
@register(
    "filter_case_when",
    oracle="""
SELECT
  o_orderkey,
  CASE WHEN o_totalprice >= 300000 THEN 'large'
       WHEN o_totalprice >= 100000 THEN 'medium'
       ELSE 'small' END AS size_band,
  CASE o_orderstatus WHEN 'F' THEN 'finished'
                     WHEN 'O' THEN 'open'
                     ELSE 'other' END AS status_name
FROM orders
ORDER BY o_orderkey
""",
    tags=("b2.10",),
)
def filter_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") >= 300000, "large")
             .when(F.col("o_totalprice") >= 100000, "medium")
             .otherwise("small").alias("size_band"),
            F.when(F.col("o_orderstatus") == "F", "finished")
             .when(F.col("o_orderstatus") == "O", "open")
             .otherwise("other").alias("status_name"),
        )
        .orderBy("o_orderkey")
    )
