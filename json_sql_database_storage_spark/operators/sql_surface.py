"""SQL-entry-path exhibits: queries submitted as ANSI SQL text via
spark.sql() rather than the DataFrame API, over temp views of the same
parquet tables.

The reference's query surface IS SQL strings handed to its embedded engine
(DatabaseManager.java:87-106 queueing raw SQL tasks); these rows prove the
Spark build accepts the same entry path.  Each query here uses ONE SQL text
verbatim as both the Spark query and the DuckDB oracle — dialect-shared
ANSI (recursive CTEs, correlated EXISTS, window functions), so any parse or
semantics divergence fails the hash check directly.

Scale notes: a recursive CTE executes as iterative joins (one per step,
same shape as dedup_cc_survivors' label propagation); Spark 4 bounds it
with spark.sql.cteRecursionLevelLimit.  The chain depth here is bounded by
max orders per customer, not data volume, and each step is a co-partitioned
equi-join on the previous frontier — frontier size only shrinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.tables import register_views as _register_views


# One SQL text, two engines: per-customer order-succession depth via a
# RECURSIVE walk over lag()-derived edges (depth == position in the
# customer's order chain, computed by reachability instead of row_number —
# the point is exercising the recursion machinery on both sides).
_RECURSIVE_SQL = """
WITH RECURSIVE edges AS (
  SELECT o_custkey, o_orderkey,
         lag(o_orderkey) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS prev_key
  FROM orders WHERE o_custkey < 200
), chain AS (
  SELECT o_custkey, o_orderkey, CAST(1 AS BIGINT) AS depth
  FROM edges WHERE prev_key IS NULL
  UNION ALL
  SELECT e.o_custkey, e.o_orderkey, c.depth + CAST(1 AS BIGINT)
  FROM edges e JOIN chain c ON e.prev_key = c.o_orderkey
)
SELECT o_custkey, o_orderkey, depth
FROM chain
ORDER BY o_custkey, depth
"""


@register("sql_recursive_cte", oracle=_RECURSIVE_SQL, tags=("b2", "b3.9"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


# Correlated EXISTS / NOT EXISTS — decorrelated by Catalyst into semi/anti
# joins (the DataFrame twins are join_left_semi/join_left_anti; this row
# proves the SQL path plans them too).
_EXISTS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'F'
                    AND o2.o_totalprice < 50000)
ORDER BY c_custkey
"""


@register("sql_exists_subquery", oracle=_EXISTS_SQL, tags=("b2", "b3.5", "b3.6"))
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


# GROUPING SETS — the generalized form of rollup/cube (b4.5 covers those
# via the DataFrame API; this row exercises the arbitrary-set SQL form both
# engines implement as ANSI).  The set list mixes a two-column set, two
# single-column sets, and the grand total; grouping() disambiguates
# "NULL because aggregated away" from data NULLs.  Physically Spark plans
# one Expand + one hash aggregate — the expansion factor is the number of
# grouping sets (4 here), the map-side-combinable shape that scales the
# same way the plain groupBy does.
_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
       count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), (l_linestatus), ())
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


@register("sql_grouping_sets", oracle=_GROUPING_SETS_SQL, tags=("b4.5", "b4.13"))
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


# Catalog DDL surface — the reference's first-touch idiom is auto-DDL then
# query: it CREATEs a table for each incoming JSON shape and INSERTs rows
# before any SELECT can see them (DatabaseManager.java:130,152,200;
# README.md:2 "putting JSON where SQL can reach it").  This exhibit drives
# the same contract through Spark's session catalog: CREATE DATABASE /
# CREATE TABLE ... USING parquet, INSERT INTO ... SELECT (bulk) plus
# INSERT INTO ... VALUES (row-wise, the reference's per-doc shape), then a
# catalog-QUALIFIED aggregate over the result.  Everything lives under the
# session-lifetime _sink dir (explicit LOCATIONs), so reruns are
# idempotent and nothing leaks into the warehouse default.  The oracle
# restates only the final query over an inline UNION — the DDL/DML path is
# the Spark-side surface under test.  At scale CREATE TABLE is a metadata
# operation and INSERT INTO...SELECT is the same distributed parquet write
# as a sink, so nothing here has a driver bottleneck.
@register(
    "sql_catalog_ddl",
    oracle="""
SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
FROM (SELECT n_nationkey, n_name, n_regionkey FROM nation
      UNION ALL SELECT 900, 'ATLANTIS', 99
      UNION ALL SELECT 901, 'ELBONIA', 99) t
GROUP BY n_regionkey ORDER BY n_regionkey
""",
    tags=("A6", "b1.4"),
)
def sql_catalog_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from .scans import _sink

    _register_views(spark, sf_dir)
    db_loc = _sink("catalog_db", spark)
    tbl_loc = _sink("catalog_nation_ddl", spark)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS jsdb LOCATION '{db_loc}'")
    spark.sql("DROP TABLE IF EXISTS jsdb.nation_ddl")
    shutil.rmtree(tbl_loc, ignore_errors=True)  # external table: files survive DROP
    spark.sql(f"""
        CREATE TABLE jsdb.nation_ddl
          (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
        USING parquet LOCATION '{tbl_loc}'""")
    spark.sql("""
        INSERT INTO jsdb.nation_ddl
        SELECT n_nationkey, n_name, n_regionkey FROM nation""")
    spark.sql("""
        INSERT INTO jsdb.nation_ddl VALUES
          (900, 'ATLANTIS', 99), (901, 'ELBONIA', 99)""")
    return spark.sql("""
        SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
        FROM jsdb.nation_ddl
        GROUP BY n_regionkey ORDER BY n_regionkey""")
