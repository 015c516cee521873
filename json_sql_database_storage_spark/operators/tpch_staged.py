"""Decision-support shapes registered round 8 (TPC-H
Q4/Q6/Q7/Q8/Q13/Q14/Q15/Q16/Q17/Q22, adapted where the driver corpus lacks
classic columns — see each docstring).  They complete the TPC-H family
beyond Q1/Q3/Q5/Q10/Q12/Q18/Q19/Q21 (Q21 lives in operators/analytics.py).

History: these were built and driver-identically verified in round 7 as
STAGED payloads (window budgeting — see COVERAGE.md round-7 note), then
promoted to live registry rows in round 8 per the r7 verdict's next-round
item 1.  Each had a full (callable, oracle SQL) payload verified against
DuckDB at sf0.001/sf0.01 every round by tests/test_tpch_staged.py through
the identical compare machinery the driver uses, so promotion was a
decorator move, not new verification.

Reference parity note (docstring convention per SURVEY.md §2): the
reference engine (DatabaseManager.java:280-381) exposes only per-table
fetches; every query below exists there only as application-side loops.

Scale notes mirror the registered TPC-H family (operators/analytics.py):
selective filters sit ON the scans (PushedFilters), dimension joins
broadcast only provably bounded sides (see tests/test_registry_lint.py::
_BROADCAST_AUDIT), aggregations are map-side combinable, money arithmetic
follows functions/exact.py so sums are bit-stable across engines and
partitionings, and engine-ratio outputs divide IDENTICAL doubles (exact
decimal sums cast to double) so the quotient is IEEE-identical with no
rounding step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec, dec_factor, dsum_expr
from ..registry import register
from ..sources import load_table

_REV = "CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(6,4))"


def _rev() -> F.Column:
    return dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q6 — forecast-revenue change: the canonical full-scan single-table
# aggregate.  Everything (date range, discount band, quantity cap) lands in
# PushedFilters; the agg is one map-side-combinable partial — at 100 TB this
# is the pure scan-throughput probe of the family.
# ---------------------------------------------------------------------------

_Q6_LO, _Q6_HI = "1996-01-01 00:00:00", "1997-01-01 00:00:00"


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit(_Q6_LO).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(_Q6_HI).cast("timestamp"))
                  & F.col("l_discount").between(0.05, 0.07)
                  & (F.col("l_quantity") < 24)))
    return li.agg(
        dsum_expr(dec("l_extendedprice") * dec_factor(F.col("l_discount")))
        .alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"))


_Q6_SQL = f"""
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                      * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE)
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}' AND l_shipdate < TIMESTAMP '{_Q6_HI}'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations: the two-role dimension join
# (nation joined TWICE under different roles).  Nation broadcasts (25 rows);
# supplier/customer/orders join by key with AQE free to pick the strategy —
# at 100 TB those sides grow with SF and must not be hinted.
# ---------------------------------------------------------------------------

# pair chosen to trade in the window at EVERY test SF (sf0.001 included)
_Q7_A, _Q7_B = "NATION_10", "NATION_12"
_Q7_LO, _Q7_HI = "1996-01-01 00:00:00", "1998-01-01 00:00:00"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit(_Q7_LO).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(_Q7_HI).cast("timestamp")))
          .select("l_orderkey", "l_suppkey", "l_shipdate",
                  "l_extendedprice", "l_discount"))
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"),
                              F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"),
                              F.col("n_name").alias("cust_nation")))
    pair = ((F.col("supp_nation") == _Q7_A) & (F.col("cust_nation") == _Q7_B)) | \
           ((F.col("supp_nation") == _Q7_B) & (F.col("cust_nation") == _Q7_A))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(dsum_expr(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum({_REV}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{_Q7_A}' AND n2.n_name = '{_Q7_B}')
    OR (n1.n_name = '{_Q7_B}' AND n2.n_name = '{_Q7_A}'))
  AND l_shipdate >= TIMESTAMP '{_Q7_LO}' AND l_shipdate < TIMESTAMP '{_Q7_HI}'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8 — national market share: conditional-numerator / total-denominator
# ratio per year.  Both sums are exact decimals; the share divides the two
# IDENTICAL doubles both engines derive from them, so the quotient is
# IEEE-identical with no rounding step (compare.py's 9-sig-digit canon
# absorbs nothing here — the bits match).
# ---------------------------------------------------------------------------

_Q8_REGION = "ASIA"
_Q8_TYPE = "ECONOMY"
_Q8_NATION = "NATION_12"   # an ASIA (r_regionkey=2) nation: 10..14
_Q8_LO, _Q8_HI = "1995-01-01 00:00:00", "1997-01-01 00:00:00"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = (load_table(spark, sf_dir, "region")
         .filter(F.col("r_name") == _Q8_REGION).select("r_regionkey"))
    n = load_table(spark, sf_dir, "nation")
    cn = F.broadcast(
        n.join(r, n.n_regionkey == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_nk")))
    sn = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"),
                              F.col("n_name").alias("supp_nation")))
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_type") == _Q8_TYPE).select("p_partkey"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (load_table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit(_Q8_LO).cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit(_Q8_HI).cast("timestamp")))
         .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    joined = (li.join(p, li.l_partkey == p.p_partkey)
              .join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(cn, F.col("c_nationkey") == F.col("c_nk"))
              .join(s, li.l_suppkey == s.s_suppkey)
              .join(sn, F.col("s_nationkey") == F.col("s_nk")))
    num = F.sum(F.when(F.col("supp_nation") == _Q8_NATION, _rev()))
    den = F.sum(_rev())
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg((F.coalesce(num.cast("double"), F.lit(0.0))
              / den.cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


_Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       coalesce(CAST(sum(CASE WHEN n1.n_name = '{_Q8_NATION}'
                              THEN {_REV} END) AS DOUBLE), 0.0)
         / CAST(sum({_REV}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}'
  AND o_orderdate >= TIMESTAMP '{_Q8_LO}'
  AND o_orderdate <  TIMESTAMP '{_Q8_HI}'
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution, adapted (the corpus has no
# o_comment; the classic NOT-LIKE comment filter becomes a priority
# exclusion, preserving the defining feature: a FILTERED LEFT join whose
# unmatched customers must still produce a 0 row).  Two aggregations: the
# first shuffles on c_custkey once, the second on the tiny count domain.
# ---------------------------------------------------------------------------

_Q13_EXCL = "1-URGENT"


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") != _Q13_EXCL)
         .select("o_custkey", "o_orderkey"))
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


_Q13_SQL = f"""
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{_Q13_EXCL}'
  GROUP BY c_custkey)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14 — promotion effect, adapted (p_type here is a single word, so the
# classic LIKE 'PROMO%' is equality): conditional revenue share in a ship
# month.  The percentage divides identical doubles (see Q8 note).
# ---------------------------------------------------------------------------

_Q14_LO, _Q14_HI = "1996-03-01 00:00:00", "1996-04-01 00:00:00"


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit(_Q14_LO).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(_Q14_HI).cast("timestamp")))
          .select("l_partkey", "l_extendedprice", "l_discount"))
    num = F.sum(F.when(F.col("p_type") == "PROMO", _rev()))
    den = F.sum(_rev())
    return (li.join(p, li.l_partkey == p.p_partkey)
            .agg((F.coalesce(num.cast("double"), F.lit(0.0)) * F.lit(100.0)
                  / den.cast("double")).alias("promo_revenue_pct"),
                 F.count(F.lit(1)).cast("bigint").alias("n_lines")))


_Q14_SQL = f"""
SELECT coalesce(CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV} END)
                 AS DOUBLE), 0.0) * 100.0
         / CAST(sum({_REV}) AS DOUBLE) AS promo_revenue_pct,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '{_Q14_LO}'
  AND l_shipdate <  TIMESTAMP '{_Q14_HI}'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier: aggregate-then-argmax-with-ties.  The max is a 1-row
# aggregate broadcast back (no driver collect); equality on the rounded
# decimal-derived doubles is exact, so ties survive as TPC-H requires.
# ---------------------------------------------------------------------------

_Q15_LO, _Q15_HI = "1996-01-01 00:00:00", "1996-04-01 00:00:00"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp")))
          .select("l_suppkey", "l_extendedprice", "l_discount"))
    rev = (li.groupBy("l_suppkey")
           .agg(dsum_expr(_rev()).alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("mx"))
            .join(s, F.col("l_suppkey") == s.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(round(sum({_REV}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
    AND l_shipdate <  TIMESTAMP '{_Q15_HI}'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship, adapted (no partsupp table exists;
# lineitem is the part↔supplier link, which preserves the defining
# count(DISTINCT supplier) over excluded brand/type/size groups).  The
# distinct agg shuffles once on the (brand, type, size) group key.
# ---------------------------------------------------------------------------

_Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)


def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (load_table(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(*_Q16_SIZES))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (li.join(p, li.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").cast("bigint")
                 .alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(),
                     "p_brand", "p_type", "p_size"))


_Q16_SQL = f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN ({", ".join(str(x) for x in _Q16_SIZES)})
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue, adapted (no p_container; the brand
# filter alone selects the part subset): lines under 20% of their part's
# average quantity.  The per-part average is a groupBy JOINED BACK (the
# decorrelated form of the classic correlated subquery); the threshold
# divides identical doubles (see Q8 note), so the cut is engine-exact.
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#23"


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li_all = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    avgq = (li_all.groupBy(F.col("l_partkey").alias("ap"))
            .agg((F.sum(dec("l_quantity")).cast("double")
                  / F.count(F.lit(1))).alias("aq")))
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_brand") == _Q17_BRAND).select("p_partkey"))
    return (li_all.join(p, li_all.l_partkey == p.p_partkey)
            .join(avgq, li_all.l_partkey == F.col("ap"))
            .filter(F.col("l_quantity") < F.lit(0.2) * F.col("aq"))
            .agg(F.round(F.sum(dec("l_extendedprice")), 2).cast("double")
                 .alias("small_qty_revenue"),
                 F.count(F.lit(1)).cast("bigint").alias("n_lines")))


_Q17_SQL = f"""
WITH avgq AS (
  SELECT l_partkey AS ap,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / count(*)
           AS aq
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE)
         AS small_qty_revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avgq ON ap = l_partkey
WHERE p_brand = '{_Q17_BRAND}'
  AND l_quantity < CAST(0.2 AS DOUBLE) * aq
"""


# ---------------------------------------------------------------------------
# Q4 — order-priority checking, adapted (no l_commitdate/l_receiptdate; the
# "late line" witness becomes shipped >60 days after order date, which
# preserves the defining feature: an EXISTS whose predicate references BOTH
# sides).  Plans as a left-semi join — the fact table ships only matching
# keys, never a row multiplication.
# ---------------------------------------------------------------------------

_Q4_LO, _Q4_HI = "1996-07-01 00:00:00", "1996-10-01 00:00:00"
_Q4_LATE_DAYS = 60


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp")))
         .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    late = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.col("o_orderdate")
        + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAYS"))
    return (o.join(li, late, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
            .orderBy("o_orderpriority"))


_Q4_SQL = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_Q4_LO}'
  AND o_orderdate <  TIMESTAMP '{_Q4_HI}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity, adapted twice (no c_phone; the country
# code becomes c_nationkey % 5 — and every customer in this corpus has SOME
# order, so "never ordered" becomes "no order since _Q22_CUT", preserving
# the defining features: a scalar global-average threshold AND a NOT EXISTS
# anti-join with a predicate).  The threshold is a 1-row aggregate
# broadcast back; above-threshold comparison is on identical doubles
# (exact decimal sum / count — see Q8 note).
# ---------------------------------------------------------------------------

_Q22_CODES = (0, 1, 2)
_Q22_CUT = "1999-01-01 00:00:00"


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pool = (load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_acctbal",
                    (F.col("c_nationkey") % 5).cast("bigint")
                    .alias("cntrycode"))
            .filter(F.col("cntrycode").isin(*_Q22_CODES)))
    thr = (pool.filter(F.col("c_acctbal") > 0.0)
           .agg((F.sum(dec("c_acctbal")).cast("double")
                 / F.count(F.lit(1))).alias("avg_bal")))
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") >= F.lit(_Q22_CUT).cast("timestamp"))
         .select("o_custkey"))
    return (pool.crossJoin(F.broadcast(thr))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(o, pool.c_custkey == o.o_custkey, "left_anti")
            .groupBy("cntrycode")
            .agg(F.count(F.lit(1)).cast("bigint").alias("numcust"),
                 F.round(F.sum(dec("c_acctbal")), 2).cast("double")
                 .alias("totacctbal"))
            .orderBy("cntrycode"))


_Q22_SQL = f"""
WITH pool AS (
  SELECT c_custkey, c_acctbal,
         CAST(c_nationkey % 5 AS BIGINT) AS cntrycode
  FROM customer
  WHERE c_nationkey % 5 IN ({", ".join(str(x) for x in _Q22_CODES)})),
thr AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) / count(*)
           AS avg_bal
  FROM pool WHERE c_acctbal > 0.0)
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,4))), 2) AS DOUBLE)
         AS totacctbal
FROM pool, thr
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{_Q22_CUT}')
GROUP BY cntrycode
ORDER BY cntrycode
"""


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess stock of selected parts, adapted (r10, r9
# verdict next-round #6; no partsupp, so ps_availqty has no source — the
# availqty > 0.5·year_shipped test becomes a SUPPLY-SHARE test derived
# from lineitem: a supplier has "excess supply" of a part when its shipped
# quantity of that part in the target year exceeds 20% of the part's total
# shipped quantity that year).  The defining plan shape is preserved: a
# SEMI-JOIN of the supplier dimension against a set derived from nested
# aggregates (per-(part,supplier) vs per-part totals joined back — the
# decorrelated form of Q20's correlated subquery), with the part-name
# prefix and the nation cut as pushed scan filters.  Quantities ride as
# integer centi-units and the 20% test is the integer cross product
# qs·5 > qt, so membership is engine-exact.  100-TB: the year+part filters
# prune the lineitem scan; both aggregates are map-side combinable on
# (partkey[, suppkey]); the qualifying-supplier set is dimension-bounded
# and drives a LEFT SEMI join (plan-pinned) — the fact table is read once.
# ---------------------------------------------------------------------------

_Q20_PREFIX = "small"
_Q20_Y0, _Q20_Y1 = "1996-01-01", "1997-01-01"
_Q20_NATIONS = 5            # s_nationkey < 5 — the single-nation-cut analog


def q20_excess_supply_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    pf = (load_table(spark, sf_dir, "part")
          .filter(F.col("p_name").startswith(_Q20_PREFIX))
          .select(F.col("p_partkey").alias("l_partkey")))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit(_Q20_Y0).cast("date"))
                  & (F.col("l_shipdate") < F.lit(_Q20_Y1).cast("date")))
          .join(F.broadcast(pf), "l_partkey")
          .select("l_partkey", "l_suppkey",
                  F.round(F.col("l_quantity") * 100).cast("bigint")
                  .alias("q")))
    per_sp = (li.groupBy("l_partkey", "l_suppkey")
              .agg(F.sum("q").cast("bigint").alias("qs")))
    per_p = li.groupBy("l_partkey").agg(F.sum("q").cast("bigint")
                                        .alias("qt"))
    excess = (per_sp.join(per_p, "l_partkey")
              .filter(F.col("qs") * 5 > F.col("qt"))
              .select(F.col("l_suppkey").alias("s_suppkey")).distinct())
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name")
    return (load_table(spark, sf_dir, "supplier")
            .filter(F.col("s_nationkey") < _Q20_NATIONS)
            .join(excess, "s_suppkey", "left_semi")
            .join(F.broadcast(nat), "s_nationkey")
            .select("s_name", "n_name")
            .orderBy("s_name"))


_Q20_SQL = f"""
WITH pf AS (SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_PREFIX}%'),
li AS (
  SELECT l_partkey, l_suppkey, CAST(round(l_quantity * 100) AS BIGINT) AS q
  FROM lineitem JOIN pf ON p_partkey = l_partkey
  WHERE l_shipdate >= DATE '{_Q20_Y0}' AND l_shipdate < DATE '{_Q20_Y1}'
), per_sp AS (
  SELECT l_partkey, l_suppkey, CAST(sum(q) AS BIGINT) AS qs
  FROM li GROUP BY 1, 2
), per_p AS (
  SELECT l_partkey, CAST(sum(q) AS BIGINT) AS qt FROM li GROUP BY 1
), excess AS (
  SELECT DISTINCT l_suppkey
  FROM per_sp JOIN per_p USING (l_partkey) WHERE qs * 5 > qt
)
SELECT s_name, n_name
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE s_nationkey < {_Q20_NATIONS}
  AND s_suppkey IN (SELECT l_suppkey FROM excess)
ORDER BY s_name
"""


# Promoted round 8 (r7 verdict next-round #1): every former STAGED entry is
# now a live registry row; the empty dict remains so the staged-protocol
# tests can pin that promotion happened (no entry both staged AND
# registered).
for _name, _fn, _sql in (
    ("q20_excess_supply_share", q20_excess_supply_share, _Q20_SQL),
    ("q4_order_priority", q4_order_priority, _Q4_SQL),
    ("q6_forecast_revenue", q6_forecast_revenue, _Q6_SQL),
    ("q7_volume_shipping", q7_volume_shipping, _Q7_SQL),
    ("q8_market_share", q8_market_share, _Q8_SQL),
    ("q13_customer_distribution", q13_customer_distribution, _Q13_SQL),
    ("q14_promo_revenue", q14_promo_revenue, _Q14_SQL),
    ("q15_top_supplier", q15_top_supplier, _Q15_SQL),
    ("q16_parts_supplier", q16_parts_supplier, _Q16_SQL),
    ("q17_small_quantity_revenue", q17_small_quantity_revenue, _Q17_SQL),
    ("q22_global_sales_opportunity", q22_global_sales_opportunity, _Q22_SQL),
):
    register(_name, _sql)(_fn)

STAGED: dict = {}
