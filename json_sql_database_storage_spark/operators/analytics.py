"""Decision-support and behavioral-analytics exhibits (SURVEY.md §2 r5
addenda): two more classic TPC-H-shaped plans beyond Q1/star-revenue, and a
cohort-retention matrix over the event stream.

Scale notes:
- q3/q18 are the canonical selective-probe star shapes: dimension filters
  reduce before the fact join, aggregation is partial (map-side combine),
  and the final top-N is TakeOrderedAndProject — constant driver memory at
  any input size.
- q18's having-filter runs on the ALREADY AGGREGATED per-order quantity
  (14k orders/60k lines at sf0.01; ~1.5B orders at 100 TB) — the semi-join
  back to lineitem ships only qualifying keys.
- retention cohorts need two aggregations over events keyed by user then by
  (cohort, offset): the first groupBy shuffles on user_id once; the second
  operates on one row per (user, week) — already ~30× smaller.

Money arithmetic follows functions/exact.py (decimal-domain sums, final
cast to double) so results are bit-stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec, dec_factor, dsum_expr
from ..registry import register
from ..sources import load_table

# ---------------------------------------------------------------------------
# r5.1 — TPC-H Q3 shape (shipping priority): segment-filtered customers ⨝
# date-filtered orders ⨝ lineitem, revenue per undelivered order, top 10.
# Reference parity: the reference can only express this as application-side
# loops over per-table SELECTs (DatabaseManager.java:280-381 exposes only
# single-table reads); the engine runs it as one declarative plan.
# ---------------------------------------------------------------------------

_Q3_CUT = "1998-03-15 00:00:00"


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT
  l_orderkey,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
              * CAST(1 - l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_Q3_CUT}'
  AND l_shipdate  > TIMESTAMP '{_Q3_CUT}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    tags=("r5.1",),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = F.lit(_Q3_CUT).cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    revenue = dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer qualifies ~1/5 of rows — small enough to broadcast at any
        # SF where customer ≪ lineitem (the standard star layout)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# r5.2 — TPC-H Q18 shape (large-volume customers): orders whose total
# lineitem quantity exceeds a threshold, with customer attribution.  The
# aggregate-then-semi-join shape is the scale point: the having filter runs
# on per-order sums (|orders| rows), not raw lineitems.
# ---------------------------------------------------------------------------

_Q18_QTY = 300


@register(
    "q18_large_volume_customer",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(12,4))) > {_Q18_QTY}
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    tags=("r5.2",),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > _Q18_QTY)
        .select("l_orderkey", F.col("q").cast("double").alias("sum_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# r5.3 — cohort retention matrix: users cohorted by first-activity day,
# activity bucketed into week offsets from that day.  Two shuffles total
# (user_id, then cohort/offset on ~30× fewer rows).  Cohort day is cast to
# timestamp on both sides — the driver's value hasher is proven on
# timestamps, not DATE.
# ---------------------------------------------------------------------------

@register(
    "events_retention_cohort",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         CAST(floor(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) / 7)
              AS BIGINT) AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day, week_offset,
       count(*) AS n_users
FROM act
GROUP BY cohort_day, week_offset
ORDER BY cohort_day, week_offset
""",
    tags=("r5.3",),
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day"))
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        e.join(firsts, "user_id")
        .select("user_id", "cohort_day",
                F.floor(F.datediff(F.col("day"), F.col("cohort_day")) / 7)
                 .cast("bigint").alias("week_offset"))
        .distinct()
    )
    return (
        act.groupBy("cohort_day", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.col("cohort_day").cast("timestamp").alias("cohort_day"),
                "week_offset", "n_users")
        .orderBy("cohort_day", "week_offset")
    )


# ---------------------------------------------------------------------------
# r5.9 — order-independent table fingerprint (migration / replication
# validation): per shard-key group, a commutative checksum = Σ of each
# row's 48-bit md5 prefix (exact DECIMAL(38,0) arithmetic — no overflow at
# any row count, no modular wraparound to reason about; surfaced as a
# string because a 38-digit decimal does not survive a pandas float64
# round-trip).  Because addition
# commutes, the fingerprint is invariant to partitioning, task order, and
# engine — two systems holding the same logical rows produce the same
# per-group checksum, which is how a 100-TB copy is validated shard by
# shard without moving data (the map-side Σ ships 1 row per group per
# partition).
#
# The canonical row string pins column order and formatting explicitly;
# money is integer cents (functions/exact.py) so the string is identical
# in both engines.  md5 is bit-identical everywhere (the
# sample_domain_balance precedent); 48 bits per row keeps collisions
# astronomically unlikely to mask a corruption (2^-48 per row pair) while
# staying exactly summable.
# ---------------------------------------------------------------------------

@register(
    "table_fingerprint",
    oracle="""
WITH canon AS (
  SELECT o_orderpriority,
         concat_ws('|', CAST(o_orderkey AS VARCHAR),
                   CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                   o_orderpriority) AS s
  FROM orders)
SELECT o_orderpriority,
       count(*) AS n_rows,
       CAST(CAST(sum(('0x' || substr(md5(s), 1, 12))::BIGINT)
                 AS DECIMAL(38,0)) AS VARCHAR) AS checksum
FROM canon
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("r5.9",),
)
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint_orders(load_table(spark, sf_dir, "orders"))


def fingerprint_orders(o: DataFrame) -> DataFrame:
    """The fingerprint aggregation on an orders-shaped DataFrame — shared
    with the partitioning-invariance property test, whose whole point is
    that THIS exact computation is layout-independent."""
    s = F.concat_ws(
        "|", F.col("o_orderkey").cast("string"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.col("o_orderpriority"))
    row_hash = (F.conv(F.substring(F.md5(s.cast("binary")), 1, 12), 16, 10)
                .cast("decimal(38,0)"))
    return (
        o.select("o_orderpriority", row_hash.alias("h"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("h").cast("decimal(38,0)").cast("string")
              .alias("checksum"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# r5.10 — z-score anomaly counts per event_type (pipeline monitoring): how
# many events sit more than 3 sample standard deviations from their type's
# mean.  The textbook formulation divides by a float stddev whose
# Welford-vs-naive implementation differs between engines, so the 3σ test
# is restated as EXACT integer arithmetic in the cents domain:
#     (n·x − S)² · (n−1)  >  9 · n · (n·Q − S²)
# (derived from (x−S/n)² > 9·(nQ−S²)/(n(n−1)) by clearing denominators;
# S=Σx, Q=Σx² are BIGINT sums, and every OPERAND is cast to DECIMAL(38,0)
# BEFORE any multiplication — n·x, S·S, n·Q never touch int64, so the
# products are overflow-free into the ~10²⁸ range (the r5 version multiplied
# in BIGINT first and would have wrapped S² silently once Σx passed ~3·10⁹
# cents — ADVICE r5 item 1).  Both engines evaluate identical integer
# products, so the flag can never flap on a boundary value.
#
# Scale: one event_type groupBy (map-side combinable S/Q/n), one broadcast
# join of the tiny stats table back to the stream, one conditional count.
# The BIGINT Q=Σx² stays exact through ~10⁹ rows/type at |x|≤10⁵ cents;
# past that, widen the two sums to DECIMAL(38,0) at the aggregation (same
# plan shape, Spark supports decimal sums natively).
# ---------------------------------------------------------------------------

@register(
    "events_zscore_outliers",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x FROM events
), stats AS (
  SELECT event_type,
         count(*) AS n,
         sum(x) AS s,
         sum(x * x) AS q
  FROM c GROUP BY event_type
)
SELECT c.event_type,
       CAST(any_value(stats.n) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN
           (CAST(stats.n AS DECIMAL(38,0)) * CAST(c.x AS DECIMAL(38,0))
              - CAST(stats.s AS DECIMAL(38,0)))
         * (CAST(stats.n AS DECIMAL(38,0)) * CAST(c.x AS DECIMAL(38,0))
              - CAST(stats.s AS DECIMAL(38,0)))
         * (CAST(stats.n AS DECIMAL(38,0)) - 1)
         > CAST(9 AS DECIMAL(38,0)) * CAST(stats.n AS DECIMAL(38,0))
           * (CAST(stats.n AS DECIMAL(38,0)) * CAST(stats.q AS DECIMAL(38,0))
                - CAST(stats.s AS DECIMAL(38,0)) * CAST(stats.s AS DECIMAL(38,0)))
         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM c JOIN stats USING (event_type)
GROUP BY c.event_type
ORDER BY c.event_type
""",
    tags=("r5.10",),
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("x"))
    # the census sums run in the 38-digit decimal domain: Σx² in int64
    # fails around 1e9 rows of ~1e5-cent values (ANSI throws, non-ANSI
    # wraps — broken either way; DuckDB's sum(BIGINT) is HUGEINT —
    # already exact, and its oracle widens to DECIMAL(38,0))
    stats = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("q"))
    d38 = lambda col: col.cast("decimal(38,0)")
    # operands widen to DECIMAL(38,0) BEFORE multiplying: n·x, S·S, n·Q in
    # int64 would wrap silently (Spark) / raise (DuckDB) once Σx ≈ 3e9 cents
    dev = d38(F.col("n")) * d38(F.col("x")) - d38(F.col("s"))
    lhs = dev * dev * (d38(F.col("n")) - F.lit(1))
    rhs = (d38(F.lit(9)) * d38(F.col("n"))
           * (d38(F.col("n")) * d38(F.col("q"))
              - d38(F.col("s")) * d38(F.col("s"))))
    return (
        c.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(F.any_value(F.col("n")).cast("bigint").alias("n_rows"),
             F.sum(F.when(lhs > rhs, 1).otherwise(0)).cast("bigint")
              .alias("n_outliers"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# r6.6 — TPC-H Q5 shape (local-supplier volume): the 6-table join chain
# customer ⨝ orders ⨝ lineitem ⨝ supplier ⨝ nation ⨝ region with the
# "local supplier" constraint (c_nationkey = s_nationkey) that makes the
# supplier join a TWO-key equi-join.  The classic join-ordering exhibit:
# region (5 rows) filters nation (25) which filters supplier — all three
# broadcast, so the only shuffles are the order⋈lineitem fact join and the
# final per-nation aggregate (map-side combinable, 25 groups).  Catalyst
# reorders the dimension chain; AQE re-plans the fact join from runtime
# stats.  Revenue in the decimal domain (functions/exact.py).
# ---------------------------------------------------------------------------

_Q5_REGION = "ASIA"
_Q5_LO = "1996-01-01 00:00:00"
_Q5_HI = "1997-01-01 00:00:00"


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                   * CAST(1 - l_discount AS DECIMAL(6,4))), 2) AS DOUBLE)
         AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{_Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{_Q5_LO}'
  AND o_orderdate <  TIMESTAMP '{_Q5_HI}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    tags=("r6.6",),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (load_table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit(_Q5_LO).cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit(_Q5_HI).cast("timestamp")))
         .select("o_orderkey", "o_custkey"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q5_REGION)
    # region→nation→supplier dimension chain: all broadcastable at any SF
    sn = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
          .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .select("s_suppkey", "s_nationkey", "n_name"))
    revenue = dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), (li.l_suppkey == sn.s_suppkey)
              & (c.c_nationkey == sn.s_nationkey))
        .groupBy("n_name")
        .agg(dsum_expr(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# r7.8 — TPC-H Q10 shape (returned-item reporting): which customers
# returned goods in a quarter, ranked by lost revenue.  The classic
# aggregate-then-rank over a 4-table star: date-filtered orders ⨝
# returnflag-filtered lineitem ⨝ customer ⨝ broadcast nation, per-customer
# decimal revenue, TakeOrderedAndProject top-20.  The two selective filters
# (one quarter of orders, 'R' lines) land in PushedFilters on their scans,
# so the fact join ships a fraction of both tables at any SF.
# ---------------------------------------------------------------------------

_Q10_LO = "1995-04-01 00:00:00"
_Q10_HI = "1995-07-01 00:00:00"


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                  * CAST(1 - l_discount AS DECIMAL(6,4))), 2) AS DOUBLE)
         AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{_Q10_LO}'
  AND o_orderdate <  TIMESTAMP '{_Q10_HI}'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("r7.8",),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    o = (load_table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp")))
         .select("o_orderkey", "o_custkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_expr(revenue).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# r7.9 — TPC-H Q12 shape (shipping-delay priority mix), adapted to the
# driver schema (no l_shipmode/commitdate/receiptdate columns exist): lines
# bucketed by ship delay (l_shipdate − o_orderdate in days), per bucket the
# count of critical-priority (1-URGENT / 2-HIGH) vs other orders — Q12's
# exact conditional-aggregation shape (CASE WHEN inside sum) on the
# columns the corpus has.  One fact join, one short-key groupBy with
# map-side combine; the delay arithmetic is exact integer datediff.
# ---------------------------------------------------------------------------


@register(
    "q12_shipping_delay_priority",
    oracle="""
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30'
            WHEN datediff('day', o_orderdate, l_shipdate) <= 60 THEN '31-60'
            ELSE '61+' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY delay_bucket
ORDER BY delay_bucket
""",
    tags=("r7.9",),
)
def q12_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (F.when(delay <= 30, "0-30")
              .when(delay <= 60, "31-60")
              .otherwise("61+"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
             .alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).cast("bigint")
             .alias("low_line_count"))
        .orderBy("delay_bucket")
    )


# ---------------------------------------------------------------------------
# r7.10 — TPC-H Q19 shape (disjunctive predicate revenue), adapted to the
# driver schema (no p_container/l_shipmode): revenue over lineitem ⨝ part
# under an OR of three (brand, size-range, quantity-range) conjuncts.
# What the shape exercises: Catalyst pushes the part-only disjuncts
# (brand/size) INTO the broadcast side's scan and keeps the mixed
# residual on the join — the disjunctive-pushdown behavior Q19 was
# designed to test; a naive engine evaluates the whole OR post-join.
# ---------------------------------------------------------------------------

_Q19_ARMS = (("Brand#12", 1, 5, 1, 11),
             ("Brand#23", 1, 10, 10, 20),
             ("Brand#34", 1, 15, 20, 30))


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
               * CAST(1 - l_discount AS DECIMAL(6,4))), 2) AS DOUBLE)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {" OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
    f" AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in _Q19_ARMS)}
""",
    tags=("r7.10",),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    pred = None
    for b, slo, shi, qlo, qhi in _Q19_ARMS:
        arm = ((F.col("p_brand") == b)
               & F.col("p_size").between(slo, shi)
               & F.col("l_quantity").between(qlo, qhi))
        pred = arm if pred is None else (pred | arm)
    revenue = dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))
    # no broadcast hint on part: unlike nation/region it GROWS with SF
    # (200k rows × SF), so AQE should pick broadcast only while the
    # brand/size-pruned side actually fits — at 100 TB this is a shuffle
    # join and forcing broadcast would OOM the executors
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(pred)
        .agg(dsum_expr(revenue).alias("revenue"),
             F.count(F.lit(1)).cast("bigint").alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# r8.4 — TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
# the driver schema: classic Q21's lateness test is l_receiptdate >
# l_commitdate, columns this corpus lacks, so lateness here is shipping
# more than 90 days after the order date (the same datediff the q12
# adaptation buckets).  The multi-witness structure — the whole point of
# Q21 — is intact: for finished orders, count a supplier's late lines
# where ANOTHER supplier shipped in the same order (EXISTS) but NO other
# supplier was ALSO late (NOT EXISTS).  Both witnesses plan as semi/anti
# joins (plan-asserted in tests/test_plans.py) — no row multiplication:
# at 100 TB the self-joins shuffle lineitem on l_orderkey once each and
# stream, never materializing the quadratic per-order pairs.
#
# Schema notes (documented next to the q12/q19 adaptations per the r7
# verdict): Q2/Q9/Q11/Q20 remain blocked on the absent `partsupp` table —
# their defining correlation (supplier×part availability/cost) has no
# stand-in here; adapting them without it would change what the query
# measures, not just its literals.
# ---------------------------------------------------------------------------

_Q21_LATE_DAYS = 90


@register(
    "q21_suppliers_who_kept_waiting",
    oracle=f"""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         datediff('day', o_orderdate, l_shipdate) > {_Q21_LATE_DAYS} AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F')
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("r8.4",),
)
def q21_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    # one orders join computes lateness for every line of a finished
    # order; the self-joins then reuse this relation under three roles
    l = (li.join(o, li.l_orderkey == o.o_orderkey)
         .select("l_orderkey", "l_suppkey",
                 (F.datediff("l_shipdate", "o_orderdate") > _Q21_LATE_DAYS)
                 .alias("late")))
    l1 = l.filter(F.col("late")).select(
        F.col("l_orderkey").alias("o1"), F.col("l_suppkey").alias("s1"))
    l2 = l.select(F.col("l_orderkey").alias("o2"),
                  F.col("l_suppkey").alias("s2"))
    l3 = (l.filter(F.col("late"))
          .select(F.col("l_orderkey").alias("o3"),
                  F.col("l_suppkey").alias("s3")))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    waited = (
        l1.join(l2, (F.col("o1") == F.col("o2"))
                & (F.col("s1") != F.col("s2")), "left_semi")
        .join(l3, (F.col("o1") == F.col("o3"))
              & (F.col("s1") != F.col("s3")), "left_anti"))
    return (waited.join(sup, waited.s1 == sup.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(20))
