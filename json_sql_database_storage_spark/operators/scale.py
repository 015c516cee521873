"""Scale techniques made explicit (SURVEY.md §4.3): skew salting, bucketed
co-located joins.

AQE's skew-join handling (on in session.py) covers sort-merge joins whose
partitions exceed the skew thresholds; the SALTED forms here are the
application-level tool for the cases AQE can't fix — skewed AGGREGATION
state and skewed broadcast-ineligible joins — and they're pure DataFrame
rewrites, so the oracle can verify the salted plan produces byte-identical
results to the naive one.

Bucketing (sources side): writing both join sides bucketed by the join key
makes later joins shuffle-free (verified by plan assertion in
tests/test_scale.py) — on a 100 TB fact table that's the difference between
re-shuffling 100 TB per query and zero.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..registry import register
from ..sources import load_table

_N_SALTS = 16


# Skewed aggregation via two-phase salting: groupBy(key, salt) partial →
# groupBy(key) final.  The skewed key's rows split across _N_SALTS reducers
# instead of one hot partition.  Decimal sums make the two-phase result
# exactly equal to the one-phase oracle.
@register(
    "scale_salted_agg",
    oracle="""
SELECT l_returnflag AS flag,
       count(*) AS n,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total
FROM lineitem
GROUP BY l_returnflag
ORDER BY flag
""",
    tags=("scale", "b4.1"),
)
def scale_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # deterministic salt from a high-cardinality column (no rand(): reruns
    # and speculative task retries must agree)
    salted = li.withColumn(
        "__salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                         F.lit(_N_SALTS)))
    partial = (
        salted.groupBy("l_returnflag", "__salt")
        .agg(F.count(F.lit(1)).alias("pn"),
             F.sum(dec("l_extendedprice")).alias("psum")))
    return (
        partial.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(F.sum("pn").alias("n"),
             F.round(F.sum("psum"), 2).cast("double").alias("total"))
        .orderBy("flag")
    )


# Skewed join via salt replication: every right-side row is replicated
# _N_SALTS times (one per salt); left rows pick one deterministic salt.
# Join key becomes (key, salt) → the hot key spreads over _N_SALTS tasks.
@register(
    "scale_salted_join",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n_lines,
       CAST(round(sum(CAST(l.l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    tags=("scale", "b3.2"),
)
def scale_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"),
                         F.lit(_N_SALTS)))
    salts = spark.range(_N_SALTS).select(F.col("id").cast("long").alias("__salt"))
    o = (load_table(spark, sf_dir, "orders")
         .select("o_orderkey", "o_orderpriority")
         .crossJoin(F.broadcast(salts)))
    joined = li.join(
        o, (li.l_orderkey == o.o_orderkey) & (li["__salt"] == o["__salt"]))
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"),
             F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("qty"))
        .orderBy("o_orderpriority")
    )


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8,
                   sort_by: str | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key —
    later equi-joins/aggs on that key read co-located buckets with no
    exchange (plan asserted in tests/test_scale.py)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables across sessions but leaves their
    # warehouse directories behind — clear the location too
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    if warehouse:
        shutil.rmtree(os.path.join(warehouse, table), ignore_errors=True)
    writer = (df.write.mode("overwrite").format("parquet")
              .bucketBy(n_buckets, key))
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)
