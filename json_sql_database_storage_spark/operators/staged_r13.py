"""Relational / window / events shapes STAGED for round 13 (the
window-budgeting protocol of operators/staged_r9.py — round 12's driver
window is filled by the 22 r12 promotions plus the reverify pins and the
r6-stale refresh cohort, so these ship as verified (callable, oracle)
payloads and are promoted by moving the STAGED entry into a @register
decorator next round).  Every entry runs driver-identically against
DuckDB at sf0.001 AND sf0.01 via tests/test_staged_r13.py.

Reference parity note (SURVEY.md §2 docstring convention): the reference
(DatabaseManager.java:280-381) has no analytical surface; these rows are
Part-B derived operators over the driver corpus.

Per-operator 100-TB notes live in each section comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table

# ---------------------------------------------------------------------------
# q_priority_escalation_matrix — the order-priority Markov census: for
# each customer's CONSECUTIVE order pairs (by orderdate, orderkey), count
# transitions prev_priority → priority and sum the later order's value
# (events_transition_matrix's recipe moved onto the order book: does a
# customer who just placed 1-URGENT come back 1-URGENT?).  Output is the
# ≤25-row priority×priority matrix.
#
# 100-TB design: one customer-key exchange for the lag window (orders
# per customer are small), then a map-side-combinable census over the
# bounded transition domain.  No global step.
# ---------------------------------------------------------------------------


def q_priority_escalation_matrix(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .select("o_custkey", "o_orderdate", "o_orderkey",
                 "o_orderpriority",
                 F.round(F.col("o_totalprice") * 100).cast("bigint")
                 .alias("cents")))
    wc = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.select(F.lag("o_orderpriority").over(wc).alias("prev_prio"),
                     "o_orderpriority", "cents")
            .filter(F.col("prev_prio").isNotNull())
            .groupBy("prev_prio", F.col("o_orderpriority").alias("prio"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
                 F.sum("cents").cast("bigint").alias("next_cents"))
            .orderBy("prev_prio", "prio"))


_ESCMAT_SQL = """
WITH seq AS (
  SELECT lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
           AS prev_prio,
         o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT prev_prio, prio, CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(sum(cents) AS BIGINT) AS next_cents
FROM seq WHERE prev_prio IS NOT NULL
GROUP BY prev_prio, prio
ORDER BY prev_prio, prio
"""

# ---------------------------------------------------------------------------
# q_quarter_revenue_share — seasonal revenue mix: per (year, quarter)
# order revenue plus its exact ppm share of that YEAR's total (the
# seasonality report planners de-trend with).  Share rides as BIGINT
# floor division over integer cents — no double division to flap.
#
# 100-TB design: the census collapses orders to ≤|years|×4 rows
# map-side; the share window runs over that bounded relation partitioned
# by year (≤4 rows per partition).  No single-partition step.
# ---------------------------------------------------------------------------


def q_quarter_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (load_table(spark, sf_dir, "orders")
           .groupBy(F.year("o_orderdate").alias("yr"),
                    F.quarter("o_orderdate").alias("qtr"))
           .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint").alias("cents")))
    return (per.select("yr", "qtr", "cents",
                       F.expr("CAST(cents * 1000000 DIV "
                              "sum(cents) OVER (PARTITION BY yr) "
                              "AS BIGINT)").alias("year_share_ppm"))
            .orderBy("yr", "qtr"))


_QTRSHARE_SQL = """
WITH per AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
)
SELECT yr, qtr, cents,
       CAST(cents * 1000000 // sum(cents) OVER (PARTITION BY yr)
            AS BIGINT) AS year_share_ppm
FROM per
ORDER BY yr, qtr
"""

# ---------------------------------------------------------------------------
# q_part_type_size_profile — catalog profile: per (p_type, power-of-two
# size band) part count and exact average retail price in cents (BIGINT
# floor division — the integer-average convention).  The catalog-shape
# report assortment planning reads.
#
# 100-TB design: part-only, map-side-combinable census over the bounded
# type×band domain.  No joins, no windows.
# ---------------------------------------------------------------------------


def q_part_type_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (load_table(spark, sf_dir, "part")
         .select("p_type",
                 F.length(F.bin("p_size")).cast("int").alias("size_band"),
                 F.round(F.col("p_retailprice") * 100).cast("bigint")
                 .alias("cents")))
    return (p.groupBy("p_type", "size_band")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"),
                 F.expr("CAST(sum(cents) DIV count(*) AS BIGINT)")
                 .alias("avg_retail_cents"))
            .orderBy("p_type", "size_band"))


_PARTPROF_SQL = """
SELECT p_type, CAST(length(bin(p_size)) AS INT) AS size_band,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) // count(*)
            AS BIGINT) AS avg_retail_cents
FROM part
GROUP BY 1, 2
ORDER BY p_type, size_band
"""

# ---------------------------------------------------------------------------
# q_customer_repeat_share — retention by market segment: of the segment's
# customers who ordered at all, what ppm ordered AGAIN (≥2 orders)?  The
# one-number answer to "does this segment retain?".
#
# 100-TB design: orders collapse to O(|customers|) counts map-side; the
# dimension join is customer-sized; the final census is O(|segments|).
# ---------------------------------------------------------------------------


def q_customer_repeat_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (load_table(spark, sf_dir, "orders")
                .groupBy("o_custkey")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders")))
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), "c_mktsegment")
    return (per_cust.join(c, per_cust.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
                 F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
                 .cast("bigint").alias("n_repeat"))
            .select("c_mktsegment", "n_buyers", "n_repeat",
                    F.expr("CAST(n_repeat * 1000000 DIV n_buyers AS BIGINT)")
                    .alias("repeat_ppm"))
            .orderBy("c_mktsegment"))


_REPEAT_SQL = """
WITH per_cust AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
), seg AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_buyers,
         CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repeat
  FROM per_cust JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
)
SELECT c_mktsegment, n_buyers, n_repeat,
       CAST(n_repeat * 1000000 // n_buyers AS BIGINT) AS repeat_ppm
FROM seg
ORDER BY c_mktsegment
"""

# ---------------------------------------------------------------------------
# q_first_order_cohort_value — acquisition-cohort LTV: customers bucketed
# by FIRST-order year; per cohort the customer count, total lifetime
# cents, and exact average lifetime value (BIGINT floor division).  The
# cohort table every growth dashboard opens with.
#
# 100-TB design: one customer-key census (min date + sum cents fold in
# the same map-side pass), then an O(|years|) rollup.  No windows.
# ---------------------------------------------------------------------------


def q_first_order_cohort_value(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    per_cust = (load_table(spark, sf_dir, "orders")
                .groupBy("o_custkey")
                .agg(F.year(F.min("o_orderdate")).cast("bigint")
                     .alias("cohort_year"),
                     F.sum(F.round(F.col("o_totalprice") * 100)
                           .cast("bigint")).cast("bigint")
                     .alias("lifetime_cents")))
    return (per_cust.groupBy("cohort_year")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                 F.sum("lifetime_cents").cast("bigint")
                 .alias("cohort_cents"))
            .select("cohort_year", "n_customers", "cohort_cents",
                    F.expr("CAST(cohort_cents DIV n_customers AS BIGINT)")
                    .alias("avg_ltv_cents"))
            .orderBy("cohort_year"))


_COHORT_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(year(min(o_orderdate)) AS BIGINT) AS cohort_year,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS lifetime_cents
  FROM orders GROUP BY 1
)
SELECT cohort_year, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(lifetime_cents) AS BIGINT) AS cohort_cents,
       CAST(sum(lifetime_cents) // count(*) AS BIGINT) AS avg_ltv_cents
FROM per_cust
GROUP BY 1
ORDER BY cohort_year
"""

# ---------------------------------------------------------------------------
# q_supplier_nation_herfindahl — per-nation supplier revenue
# concentration (Herfindahl–Hirschman index): HHI = Σ share_ppm² over the
# nation's suppliers, share in exact ppm of the nation's lineitem
# revenue.  Integer end-to-end: cents → ppm (BIGINT DIV) → squared →
# summed (Σ share² ≤ 10¹² fits int64 since Σ share = 10⁶).  The
# concentration monitor procurement risk teams run per region.
#
# 100-TB design: the fact table collapses to O(|suppliers|) revenue rows
# map-side; supplier→nation is a broadcast dim join; the nation total and
# HHI are O(|nations|) rollups of the supplier relation.  One shuffle.
# ---------------------------------------------------------------------------


def q_supplier_nation_herfindahl(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .groupBy("l_suppkey")
          .agg(F.sum(F.round(F.col("l_extendedprice") * 100)
                     .cast("bigint")).cast("bigint").alias("cents")))
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    per_supp = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
                .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                .select("n_name", "cents"))
    shares = per_supp.select(
        "n_name",
        F.expr("CAST(cents * 1000000 DIV "
               "sum(cents) OVER (PARTITION BY n_name) AS BIGINT)")
        .alias("share_ppm"))
    return (shares.groupBy("n_name")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
                 F.sum(F.col("share_ppm") * F.col("share_ppm"))
                 .cast("bigint").alias("hhi"))
            .orderBy("n_name"))


_HHI_SQL = """
WITH per_supp AS (
  SELECT l_suppkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                         AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
), named AS (
  SELECT n_name, cents
  FROM per_supp
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
), shares AS (
  SELECT n_name,
         CAST(cents * 1000000 // sum(cents) OVER (PARTITION BY n_name)
              AS BIGINT) AS share_ppm
  FROM named
)
SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(share_ppm * share_ppm) AS BIGINT) AS hhi
FROM shares
GROUP BY 1
ORDER BY n_name
"""

# ---------------------------------------------------------------------------
# q_brand_discount_profile — per-brand discount posture: line count,
# exact average discount in basis points (decimal-domain l_discount ×
# 10⁴ → BIGINT; integer average via floor division), and discounted
# revenue cents.  The pricing-policy drift monitor.
#
# 100-TB design: one broadcast dim join (part) + a map-side-combinable
# census over the bounded brand domain.
# ---------------------------------------------------------------------------


def q_brand_discount_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey",
                  (F.col("l_discount").cast("decimal(6,4)") * 10000)
                  .cast("bigint").alias("bps"),
                  (F.col("l_extendedprice").cast("decimal(12,4)")
                   * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)")))
                  .alias("rev")))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                 F.expr("CAST(sum(bps) DIV count(*) AS BIGINT)")
                 .alias("avg_discount_bps"),
                 F.floor(F.sum("rev") * 100).cast("bigint")
                 .alias("revenue_cents"))
            .orderBy("p_brand"))


_BRANDDISC_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT) AS bps,
         CAST(l_extendedprice AS DECIMAL(12,4))
           * (1 - CAST(l_discount AS DECIMAL(6,4))) AS rev
  FROM lineitem
)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(bps) // count(*) AS BIGINT) AS avg_discount_bps,
       CAST(floor(sum(rev) * 100) AS BIGINT) AS revenue_cents
FROM li JOIN part ON l_partkey = p_partkey
GROUP BY 1
ORDER BY p_brand
"""

# ---------------------------------------------------------------------------
# events_user_lifecycle — account-age census: per user the span in days
# between first and last event plus the event count, censused in
# power-of-two day buckets (`length(bin(days))`).  Distinct from
# window_inter_event_gap (consecutive-gap distribution): this is the
# LIFETIME span — the activation/churn lens.
#
# 100-TB design: min/max/count fold in ONE map-side pass per user key
# (no window, no sort), then an O(|buckets|) census.
# ---------------------------------------------------------------------------


def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (load_table(spark, sf_dir, "events")
                .groupBy("user_id")
                .agg(F.datediff(F.to_date(F.max("ts")),
                                F.to_date(F.min("ts")))
                     .alias("span_days"),
                     F.count(F.lit(1)).cast("bigint").alias("n_events")))
    return (per_user.groupBy(F.length(F.bin("span_days")).cast("int")
                             .alias("span_bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.sum("n_events").cast("bigint").alias("n_events"),
                 F.min("span_days").cast("int").alias("min_days"),
                 F.max("span_days").cast("int").alias("max_days"))
            .orderBy("span_bucket"))


_LIFECYCLE_SQL = """
WITH per_user AS (
  SELECT user_id,
         date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
           AS span_days,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT CAST(length(bin(span_days)) AS INT) AS span_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(min(span_days) AS INT) AS min_days,
       CAST(max(span_days) AS INT) AS max_days
FROM per_user
GROUP BY 1
ORDER BY span_bucket
"""

# ---------------------------------------------------------------------------
# events_props_value_histogram — typed extraction from the JSON props
# column: pull $.k (an int payload), bucket by k DIV 10, census events
# and exact value cents per bucket.  The semi-structured-column path the
# reference's shredder motivates (DatabaseManager.java flattens JSON into
# typed columns; here the extraction stays lazy and columnar).
#
# 100-TB design: get_json_object is JVM-side codegen (no Python); the
# census is map-side-combinable over the bounded bucket domain.
# ---------------------------------------------------------------------------


def events_props_value_histogram(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    e = (load_table(spark, sf_dir, "events")
         .select(F.get_json_object("props", "$.k").cast("bigint")
                 .alias("k"),
                 F.round(F.col("value") * 100).cast("bigint")
                 .alias("cents")))
    return (e.groupBy(F.expr("CAST(k DIV 10 AS INT)").alias("k_bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.sum("cents").cast("bigint").alias("value_cents"),
                 F.min("k").cast("int").alias("min_k"),
                 F.max("k").cast("int").alias("max_k"))
            .orderBy("k_bucket"))


_PROPSHIST_SQL = """
WITH e AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT CAST(k // 10 AS INT) AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS value_cents,
       CAST(min(k) AS INT) AS min_k, CAST(max(k) AS INT) AS max_k
FROM e
GROUP BY 1
ORDER BY k_bucket
"""

# ---------------------------------------------------------------------------
# events_props_topk — per-event-type top-5 most frequent $.k payload
# values (count desc, k asc tie-break) — the categorical-payload
# profiler.  Plans as WindowGroupLimit: the rank is pushed below the
# exchange so the shuffle carries O(types × k) candidate rows.
#
# 100-TB design: JSON extraction is JVM codegen; the census collapses to
# O(types × |k domain|) map-side; WindowGroupLimit bounds the sort.
# ---------------------------------------------------------------------------

_PROPS_TOPK = 5


def events_props_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    census = (load_table(spark, sf_dir, "events")
              .select("event_type",
                      F.get_json_object("props", "$.k").cast("bigint")
                      .alias("k"))
              .groupBy("event_type", "k")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    wt = (W.partitionBy("event_type")
          .orderBy(F.desc("n"), F.asc("k")))
    return (census.withColumn("rnk", F.row_number().over(wt))
            .filter(F.col("rnk") <= _PROPS_TOPK)
            .select("event_type", "k", "n",
                    F.col("rnk").cast("int").alias("rnk"))
            .orderBy("event_type", "rnk"))


_PROPSTOPK_SQL = f"""
WITH census AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, k, n,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY n DESC, k ASC) AS INT) AS rnk
  FROM census
)
SELECT event_type, k, n, rnk
FROM ranked WHERE rnk <= {_PROPS_TOPK}
ORDER BY event_type, rnk
"""

# ---------------------------------------------------------------------------
# q_nation_acctbal_profile — per-nation customer balance-sheet: customer
# count, exact total/average account balance in cents, and the ppm of
# customers in the red (negative balance).  The receivables-risk lens on
# the customer dimension.
#
# 100-TB design: one broadcast dim join (nation) + a map-side census
# over the 25-nation domain.  Customer-table-sized input, one shuffle.
# ---------------------------------------------------------------------------


def q_nation_acctbal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "customer")
         .select("c_nationkey",
                 F.round(F.col("c_acctbal") * 100).cast("bigint")
                 .alias("cents")))
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                 F.sum("cents").cast("bigint").alias("total_cents"),
                 F.sum(F.when(F.col("cents") < 0, 1).otherwise(0))
                 .cast("bigint").alias("n_negative"))
            .select("n_name", "n_customers", "total_cents",
                    F.expr("CAST(total_cents DIV n_customers AS BIGINT)")
                    .alias("avg_cents"),
                    F.expr("CAST(n_negative * 1000000 DIV n_customers "
                           "AS BIGINT)").alias("negative_ppm"))
            .orderBy("n_name"))


_NATBAL_SQL = """
WITH c AS (
  SELECT c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
), per AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(sum(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_negative
  FROM c JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1
)
SELECT n_name, n_customers, total_cents,
       CAST(total_cents // n_customers AS BIGINT) AS avg_cents,
       CAST(n_negative * 1000000 // n_customers AS BIGINT) AS negative_ppm
FROM per
ORDER BY n_name
"""

# ---------------------------------------------------------------------------
# doc_check_constraints — the CHECK-constraint lifecycle as a driver row
# (A5; Delta ADD/DROP CONSTRAINT at the DocumentStore layer — the last
# store surface without hash-checked driver evidence): commit orders
# (v0), ADD `cents >= 0` (v1, metadata-only), watch a negative-cents
# append ABORT (ConstraintViolation — nothing committed), commit a
# passing upsert (v2), DROP the rule (v3), and re-append the previously
# violating delta (v4, now admitted).  Output: one (version, n_rules,
# n_rows, sum_cents) row per version — the oracle hash-checks both the
# rejection (v2's totals show no trace of the bad delta) and the
# versioned rule metadata (n_rules 0→1→1→0→0).
#
# 100-TB design: enforcement is O(delta) — one aggregation pass over the
# DELTA validates every rule at once; add_constraint's full-table scan
# happens once at rule creation; both rule commits are metadata-only.
# ---------------------------------------------------------------------------


def doc_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..documents.model import KEY
    from ..documents.store import ConstraintViolation
    from .staged_r12 import _fresh_store, _orders_kv, _version_rollup

    store = _fresh_store(spark, "doc_checkcon")
    t = _orders_kv(spark, sf_dir)
    store.upsert(t, "o")                                   # v0
    store.add_constraint("o", "cents_pos", "cents >= 0")   # v1 (metadata)
    bad = (t.filter(F.col(KEY) % 100 == 1)
           .select((F.col(KEY) + F.lit(10**9)).alias(KEY),
                   F.lit(-1).cast("bigint").alias("cents")))
    try:
        store.append(bad, "o")
        raise AssertionError("CHECK constraint failed to fire")
    except ConstraintViolation:
        pass                  # aborted: v1 stays the head, nothing written
    good = (t.filter(F.col(KEY) % 100 == 2)
            .withColumn("cents", F.col("cents") + 1))
    store.upsert(good, "o")                                # v2
    store.drop_constraint("o", "cents_pos")                # v3 (metadata)
    store.append(bad, "o")                                 # v4 (admitted)
    entries = [([F.lit(v).cast("int").alias("version"),
                 F.lit(len(store.constraints("o", v))).cast("int")
                 .alias("n_rules")], "o", v) for v in range(5)]
    return _version_rollup(store, entries).orderBy("version")


_CHECKCON_SQL = """
WITH t AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), base AS (
  SELECT CAST(count(*) AS BIGINT) AS n0, CAST(sum(cents) AS BIGINT) AS s0
  FROM t
), g AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM t WHERE k % 100 = 2),
   b AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM t WHERE k % 100 = 1)
SELECT * FROM (
  SELECT 0 AS version, 0 AS n_rules, n0 AS n_rows, s0 AS sum_cents
  FROM base
  UNION ALL SELECT 1, 1, n0, s0 FROM base
  UNION ALL SELECT 2, 1, n0, s0 + ng FROM base, g
  UNION ALL SELECT 3, 0, n0, s0 + ng FROM base, g
  UNION ALL SELECT 4, 0, n0 + nb, s0 + ng - nb FROM base, g, b
)
ORDER BY version
"""

# ---------------------------------------------------------------------------
# events_type_cooccurrence — the unordered event-type co-presence matrix:
# for every type pair (a < b), how many USERS exhibit both (plus each
# type's solo user count on the diagonal view's behalf via the input
# census).  events_transition_matrix asks "what follows what in time";
# this asks "which behaviors coexist in a user" — the feature-bundling
# lens.  Output ≤ C(|types|, 2) rows.
#
# 100-TB design: the (user, type) DISTINCT collapse is the one real
# shuffle; the per-user pair explosion is bounded by C(|types|, 2) ≤ 10
# rows per user; the census is map-side-combinable over the bounded
# pair domain.
# ---------------------------------------------------------------------------


def events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ut = (load_table(spark, sf_dir, "events")
          .select("user_id", "event_type").distinct())
    return (ut.alias("a")
            .join(ut.select("user_id",
                            F.col("event_type").alias("type_b")).alias("b"),
                  ["user_id"])
            .filter(F.col("a.event_type") < F.col("type_b"))
            .groupBy(F.col("a.event_type").alias("type_a"), "type_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .orderBy("type_a", "type_b"))


_COOCCUR_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM ut a JOIN ut b ON a.user_id = b.user_id
WHERE a.event_type < b.event_type
GROUP BY 1, 2
ORDER BY type_a, type_b
"""

# ---------------------------------------------------------------------------
# q_order_value_band_by_segment — market-segment × order-value-band
# census (power-of-two dollar bands over o_totalprice): order count and
# exact cents per cell.  The price-point mix question ("do MACHINERY
# customers place bigger orders?") as one bounded matrix.
#
# 100-TB design: one broadcast-sized dimension join (customer segment),
# then a map-side-combinable census over the bounded segment×band
# domain.
# ---------------------------------------------------------------------------


def q_order_value_band_by_segment(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .select("o_custkey",
                 F.round(F.col("o_totalprice") * 100).cast("bigint")
                 .alias("cents")))
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment",
                     F.length(F.bin(F.expr("cents DIV 10000")))
                     .cast("int").alias("value_band"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                 F.sum("cents").cast("bigint").alias("band_cents"))
            .orderBy("c_mktsegment", "value_band"))


_VALBAND_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT c_mktsegment,
       CAST(length(bin(cents // 10000)) AS INT) AS value_band,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS band_cents
FROM o JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
ORDER BY c_mktsegment, value_band
"""

# Promoted round 13 (r12 verdict next-round #1); empty STAGED kept so the
# staged-protocol tests can pin that nothing is both staged and registered.
from ..registry import register  # noqa: E402  (promotion epilogue)

for _name, (_fn, _sql) in {
    "doc_check_constraints": (doc_check_constraints, _CHECKCON_SQL),
    "events_type_cooccurrence": (events_type_cooccurrence, _COOCCUR_SQL),
    "q_order_value_band_by_segment": (q_order_value_band_by_segment,
                                      _VALBAND_SQL),
    "q_priority_escalation_matrix": (q_priority_escalation_matrix,
                                     _ESCMAT_SQL),
    "q_quarter_revenue_share": (q_quarter_revenue_share, _QTRSHARE_SQL),
    "q_part_type_size_profile": (q_part_type_size_profile, _PARTPROF_SQL),
    "q_customer_repeat_share": (q_customer_repeat_share, _REPEAT_SQL),
    "q_first_order_cohort_value": (q_first_order_cohort_value,
                                   _COHORT_SQL),
    "q_supplier_nation_herfindahl": (q_supplier_nation_herfindahl,
                                     _HHI_SQL),
    "q_brand_discount_profile": (q_brand_discount_profile,
                                 _BRANDDISC_SQL),
    "events_user_lifecycle": (events_user_lifecycle, _LIFECYCLE_SQL),
    "events_props_value_histogram": (events_props_value_histogram,
                                     _PROPSHIST_SQL),
    "events_props_topk": (events_props_topk, _PROPSTOPK_SQL),
    "q_nation_acctbal_profile": (q_nation_acctbal_profile, _NATBAL_SQL),
}.items():
    register(_name, _sql)(_fn)

STAGED: dict = {}
