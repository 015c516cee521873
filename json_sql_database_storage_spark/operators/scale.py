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


# ---------------------------------------------------------------------------
# Two-pass GLOBAL window computations (VERDICT r1 "scale-killer flags"):
# window_running_total / window_percent_rank use a globally-ordered,
# unpartitioned window — semantically what SURVEY b5.3/b5.5 ask for, but
# Spark moves ALL rows to a single task (`WARN WindowExec: No Partition
# Defined`), which serializes at 100×.  These twins compute the identical
# result with the classic distributed prefix-sum shape:
#
#   1. bucket rows by a range of the leading sort key (a monotone bucket id
#      derived from collected min/max — no sampling, so the bucketing is
#      deterministic across jobs);
#   2. per-bucket window, partitioned by bucket id → parallel, local;
#   3. per-bucket partial aggregates, collected (≤ _N_RANGE_BUCKETS rows —
#      this is the broadcast of cumulative offsets, not a data collect) and
#      folded back in as a literal bucket→offset map;
#   4. local value + bucket offset = exact global value (decimal arithmetic,
#      so two-phase summation is bit-equal to the one-pass form).
#
# The oracles are the SAME SQL as the global-window forms — the pair
# (window_*, scale_*) hash-matching one oracle is the proof the rewrite is
# semantics-preserving.  tests/test_plans.py asserts no SinglePartition
# exchange appears in these plans.
# ---------------------------------------------------------------------------

_N_RANGE_BUCKETS = 32


def value_range_buckets(df, value_col: str, n_buckets: int):
    """THE two-pass global-rank bucketing (shared by scale_percent_rank,
    scale_running_total's sibling and q_customer_pareto,
    operators/staged_r10.py): tag every row with a value-range bucket
    `__b` (a function of the VALUE alone, so ties never straddle a
    boundary), collect the bounded per-bucket counts, and return
    (tagged_df, per-bucket count dict, n_total).  Two bounded collects
    (2 × n_buckets rows — index-metadata class), no global sort."""
    lo_hi = df.agg(F.min(value_col).alias("lo"),
                   F.max(value_col).alias("hi")).collect()[0]
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    if lo is None or lo == hi:
        base = df.withColumn("__b", F.lit(0))
    else:
        width = (hi - lo) / n_buckets
        base = df.withColumn(
            "__b",
            F.least(F.lit(n_buckets - 1),
                    F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
                    .cast("int")))
    partials = (base.groupBy("__b").agg(F.count(F.lit(1)).alias("pn"))
                .collect())
    pcnt = {int(r["__b"]): int(r["pn"]) for r in partials}
    return base, pcnt, sum(pcnt.values())


def prefix_count_offsets(pcnt: dict, n_buckets: int, *,
                         descending: bool = False) -> dict:
    """Exclusive prefix count per bucket — the rank offset each bucket's
    window adds.  descending=True ranks high-value buckets first."""
    order = (range(n_buckets - 1, -1, -1) if descending
             else range(n_buckets))
    off, acc = {}, 0
    for b in order:
        off[b] = acc
        acc += pcnt.get(b, 0)
    return off


def _bucket_offsets(rows: list, n_buckets: int) -> tuple[dict, dict]:
    """Exclusive prefix (sum, count) per bucket from per-bucket partials."""
    psum = {int(r["__b"]): r["psum"] for r in rows}
    pcnt = {int(r["__b"]): int(r["pn"]) for r in rows}
    import decimal
    off_sum, off_cnt = {}, {}
    acc_s, acc_c = decimal.Decimal(0), 0
    for b in range(n_buckets):
        off_sum[b], off_cnt[b] = acc_s, acc_c
        acc_s += psum.get(b, decimal.Decimal(0)) or decimal.Decimal(0)
        acc_c += pcnt.get(b, 0)
    return off_sum, off_cnt


@register(
    "scale_running_total",
    oracle="""
SELECT
  o_orderkey, o_orderdate,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,4))) OVER (
    ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
  row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS seq
FROM orders
WHERE o_custkey < 50
ORDER BY seq
""",
    tags=("scale", "b5.3"),
)
def scale_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") < 50)
         .select("o_orderkey", "o_orderdate",
                 dec("o_totalprice").alias("__p")))
    lo_hi = o.agg(F.min(F.col("o_orderdate").cast("date")).alias("lo"),
                  F.max(F.col("o_orderdate").cast("date")).alias("hi")
                  ).collect()[0]
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    if lo is None:                       # empty input: single trivial bucket
        base = o.withColumn("__b", F.lit(0))
    else:
        span = max((hi - lo).days, 0) + 1
        width = -(-span // _N_RANGE_BUCKETS) or 1          # ceil
        base = o.withColumn(
            "__b",
            (F.datediff(F.col("o_orderdate").cast("date"), F.lit(lo))
             / F.lit(width)).cast("int"))

    partials = (base.groupBy("__b")
                .agg(F.sum("__p").alias("psum"),
                     F.count(F.lit(1)).alias("pn"))
                .collect())
    off_sum, off_cnt = _bucket_offsets(partials, _N_RANGE_BUCKETS)
    # literal bucket→offset maps; decimal offsets travel as exact strings
    sum_map = F.create_map(*[x for b in range(_N_RANGE_BUCKETS)
                             for x in (F.lit(b), F.lit(str(off_sum[b])))])
    cnt_map = F.create_map(*[x for b in range(_N_RANGE_BUCKETS)
                             for x in (F.lit(b), F.lit(off_cnt[b]))])

    wloc = (W.partitionBy("__b").orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    wseq = W.partitionBy("__b").orderBy("o_orderdate", "o_orderkey")
    return (
        base.select(
            "o_orderkey", "o_orderdate",
            F.round(F.sum("__p").over(wloc)
                    + sum_map[F.col("__b")].cast("decimal(22,4)"), 2)
             .cast("double").alias("running_total"),
            (F.row_number().over(wseq) + cnt_map[F.col("__b")])
            .cast("long").alias("seq"),
        )
        .orderBy("seq")
    )


@register(
    "scale_percent_rank",
    oracle="""
SELECT
  c_custkey, c_acctbal,
  percent_rank() OVER (ORDER BY c_acctbal) AS pr,
  cume_dist() OVER (ORDER BY c_acctbal)    AS cd
FROM customer
ORDER BY c_custkey
""",
    tags=("scale", "b5.5"),
)
def scale_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    base, pcnt, n_total = value_range_buckets(c, "c_acctbal",
                                              _N_RANGE_BUCKETS)
    off = prefix_count_offsets(pcnt, _N_RANGE_BUCKETS)
    cnt_map = F.create_map(*[x for b in range(_N_RANGE_BUCKETS)
                             for x in (F.lit(b), F.lit(off[b]))])

    wrank = W.partitionBy("__b").orderBy("c_acctbal")
    grank = (F.rank().over(wrank) + cnt_map[F.col("__b")] - 1).cast("double")
    # default frame of an ordered window is RANGE UNBOUNDED→CURRENT, which
    # includes ties — exactly cume_dist's numerator
    gcume = (F.count(F.lit(1)).over(wrank) + cnt_map[F.col("__b")]).cast("double")
    return (
        base.select(
            "c_custkey", "c_acctbal",
            (F.when(F.lit(n_total) > 1,
                    grank / F.lit(float(n_total - 1)))
              .otherwise(F.lit(0.0))).alias("pr"),
            (gcume / F.lit(float(n_total))).alias("cd"),
        )
        .orderBy("c_custkey")
    )


# Bucketed co-located join as a registry exhibit: both sides are persisted
# bucketed+sorted by the join key, so the merge-hinted SMJ reads co-located
# buckets with ZERO exchange — on a 100 TB fact table this is the difference
# between re-shuffling the table per query and never shuffling it at all
# (plan asserted in tests/test_scale.py::test_bucketed_join_has_no_exchange
# over the same write_bucketed helper).  The oracle recomputes the join from
# the parquet originals, proving bucketed write→read loses nothing.
@register(
    "scale_bucketed_join",
    oracle="""
SELECT o.o_orderstatus, count(*) AS n_lines,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE)
         AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
""",
    tags=("scale", "b3.2", "b1.7"),
)
def scale_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    write_bucketed(load_table(spark, sf_dir, "orders")
                   .select("o_orderkey", "o_orderstatus"),
                   "bq_orders", "o_orderkey", n_buckets=8,
                   sort_by="o_orderkey")
    write_bucketed(load_table(spark, sf_dir, "lineitem")
                   .select("l_orderkey", "l_extendedprice"),
                   "bq_lineitem", "l_orderkey", n_buckets=8,
                   sort_by="l_orderkey")
    bo = spark.table("bq_orders")
    bl = spark.table("bq_lineitem")
    joined = bl.join(bo.hint("merge"), bl.l_orderkey == bo.o_orderkey)
    return (
        joined.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_lines"),
             F.round(F.sum(dec("l_extendedprice")), 2).cast("double")
              .alias("revenue"))
        .orderBy("o_orderstatus")
    )
