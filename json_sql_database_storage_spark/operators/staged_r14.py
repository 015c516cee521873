"""Relational / window / events / store shapes STAGED for round 14 (the
window-budgeting protocol of operators/staged_r9.py — round 13's driver
window is filled by the 22 r13 promotions plus the r6/r7-stale refresh
cohort, so these ship as verified (callable, oracle) payloads and are
promoted by moving the STAGED entry into a @register decorator next
round).  Every entry runs driver-identically against DuckDB at sf0.001
AND sf0.01 via tests/test_staged_r14.py.

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
# q_supplier_part_diversity — per-supplier catalog breadth: shipped line
# count, DISTINCT parts shipped, diversity in exact ppm (distinct parts
# per million lines — a supplier shipping many lines of few parts is a
# volume specialist; many parts over few lines, a long-tail generalist),
# and exact quantity units.  The assortment lens procurement uses beside
# q_supplier_lineload's pure volume ranking.
#
# 100-TB design: ONE map-side-combinable census per supplier key (the
# distinct-part count partials via count(DISTINCT) within the same agg —
# Spark plans a two-phase partial_count(distinct) expand, shuffle bytes
# O(|suppliers| × distinct partials)).  Output O(|suppliers|), no joins,
# no windows.
# ---------------------------------------------------------------------------


def q_supplier_part_diversity(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_suppkey", "l_partkey",
                  F.col("l_quantity").cast("bigint").alias("qty")))
    return (li.groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                 F.countDistinct("l_partkey").cast("bigint")
                 .alias("n_parts"),
                 F.sum("qty").cast("bigint").alias("qty_units"))
            .select("l_suppkey", "n_lines", "n_parts",
                    F.expr("CAST(n_parts * 1000000 DIV n_lines AS BIGINT)")
                    .alias("diversity_ppm"),
                    "qty_units")
            .orderBy("l_suppkey"))


_SUPPDIV_SQL = """
SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(CAST(count(DISTINCT l_partkey) AS BIGINT) * 1000000
            // count(*) AS BIGINT) AS diversity_ppm,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_units
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
"""

# ---------------------------------------------------------------------------
# q_tax_discount_matrix — the pricing-policy grid: line count and exact
# revenue cents per (discount bps × tax bps) cell.  Both keys are exact
# integer basis points via the decimal snap (the q_brand_discount_profile
# recipe), so the matrix is a bounded-domain census (TPC-H discounts
# 0–10%, taxes 0–8% → ≤ 99 cells) that answers "which discount/tax
# combinations carry the book".
#
# 100-TB design: per-row decimal arithmetic (JVM codegen), one
# map-side-combinable census over the bounded bps×bps domain.  No joins.
# ---------------------------------------------------------------------------


def q_tax_discount_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select((F.col("l_discount").cast("decimal(6,4)") * 10000)
                  .cast("bigint").alias("disc_bps"),
                  (F.col("l_tax").cast("decimal(6,4)") * 10000)
                  .cast("bigint").alias("tax_bps"),
                  (F.col("l_extendedprice").cast("decimal(12,4)")
                   * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)")))
                  .alias("rev")))
    return (li.groupBy("disc_bps", "tax_bps")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                 F.floor(F.sum("rev") * 100).cast("bigint")
                 .alias("revenue_cents"))
            .orderBy("disc_bps", "tax_bps"))


_TAXDISC_SQL = """
WITH li AS (
  SELECT CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT)
           AS disc_bps,
         CAST(CAST(l_tax AS DECIMAL(6,4)) * 10000 AS BIGINT) AS tax_bps,
         CAST(l_extendedprice AS DECIMAL(12,4))
           * (1 - CAST(l_discount AS DECIMAL(6,4))) AS rev
  FROM lineitem
)
SELECT disc_bps, tax_bps, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(floor(sum(rev) * 100) AS BIGINT) AS revenue_cents
FROM li
GROUP BY disc_bps, tax_bps
ORDER BY disc_bps, tax_bps
"""

# ---------------------------------------------------------------------------
# q_region_brand_affinity — region × brand revenue LIFT vs independence
# (the q_basket_lift recipe lifted onto the dimension grid: lift > 1 ⇔
# the region over-indexes on the brand relative to both marginals — the
# regional-assortment planner's signal).  Cell/marginal/total revenues
# are exact cents BIGINTs; the lift evaluates in doubles cast from those
# exact ints with one fixed expression shape — bit-identical cross-engine
# (the q_discount_quantity_corr convention).
#
# 100-TB design: the 6-table star collapses to a ≤|regions×brands| cell
# census map-side; marginals and the total are WINDOW sums over that
# bounded census (≤125 rows — the single-partition exchange carries a
# bounded relation, never corpus rows).  nation/region ride broadcast
# joins; part and customer are plain equi-joins (they grow with SF — AQE
# decides).
# ---------------------------------------------------------------------------


def q_region_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey",
                  (F.col("l_extendedprice").cast("decimal(12,4)")
                   * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)")))
                  .alias("rev")))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey",
                                                   "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cell = (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .join(p, li.l_partkey == p.p_partkey)
            .groupBy("r_name", "p_brand")
            .agg(F.floor(F.sum("rev") * 100).cast("bigint")
                 .alias("cell_cents")))
    wr = W.partitionBy("r_name")
    wb = W.partitionBy("p_brand")
    wg = W.partitionBy()
    d = lambda c: c.cast("double")    # noqa: E731
    lift = F.floor(
        d(F.col("cell_cents")) * d(F.col("total_cents"))
        / (d(F.col("region_cents")) * d(F.col("brand_cents")))
        * F.lit(1000000.0)).cast("bigint")
    return (cell
            .withColumn("region_cents",
                        F.sum("cell_cents").over(wr).cast("bigint"))
            .withColumn("brand_cents",
                        F.sum("cell_cents").over(wb).cast("bigint"))
            .withColumn("total_cents",
                        F.sum("cell_cents").over(wg).cast("bigint"))
            .select("r_name", "p_brand", "cell_cents",
                    lift.alias("lift_ppm"))
            .orderBy("r_name", "p_brand"))


_AFFINITY_SQL = """
WITH cell AS (
  SELECT r_name, p_brand,
         CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                        * (1 - CAST(l_discount AS DECIMAL(6,4)))) * 100)
              AS BIGINT) AS cell_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY r_name, p_brand
), m AS (
  SELECT r_name, p_brand, cell_cents,
         CAST(sum(cell_cents) OVER (PARTITION BY r_name) AS BIGINT)
           AS region_cents,
         CAST(sum(cell_cents) OVER (PARTITION BY p_brand) AS BIGINT)
           AS brand_cents,
         CAST(sum(cell_cents) OVER () AS BIGINT) AS total_cents
  FROM cell
)
SELECT r_name, p_brand, cell_cents,
       CAST(floor(CAST(cell_cents AS DOUBLE) * CAST(total_cents AS DOUBLE)
                  / (CAST(region_cents AS DOUBLE)
                     * CAST(brand_cents AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS lift_ppm
FROM m
ORDER BY r_name, p_brand
"""

# ---------------------------------------------------------------------------
# q_order_linecount_value_corr — global Pearson correlation between an
# order's line count and its lineitem revenue (in whole dollars): does
# basket SIZE drive basket VALUE, or do few-line big-ticket orders carry
# the book?  Two-level aggregation: the per-order census (count + exact
# revenue cents → dollars BIGINT), then ONE five-moment global fold;
# r evaluates in doubles cast from exact ints (the assortativity /
# q_discount_quantity_corr recipe — n·Σyy would overflow int64 at sf0.1,
# the cross-moment products live in the double domain by design).
#
# 100-TB design: the per-order census is the one real shuffle (map-side
# partials on the order key); the moment fold is a 1-row scalar
# aggregate (one partial row per partition).  Output is one row.
# ---------------------------------------------------------------------------


def q_order_linecount_value_corr(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    per = (load_table(spark, sf_dir, "lineitem")
           .select("l_orderkey",
                   (F.col("l_extendedprice").cast("decimal(12,4)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)")))
                   .alias("rev"))
           .groupBy("l_orderkey")
           .agg(F.count(F.lit(1)).cast("bigint").alias("x"),
                F.expr("CAST(floor(sum(rev) * 100) DIV 100 AS BIGINT)")
                .alias("y")))
    m = per.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("x").cast("bigint").alias("sx"),
                F.sum("y").cast("bigint").alias("sy"),
                F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
                F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
                F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"))
    d = lambda c: F.col(c).cast("double")    # noqa: E731
    den = (F.sqrt(d("n") * d("sxx") - d("sx") * d("sx"))
           * F.sqrt(d("n") * d("syy") - d("sy") * d("sy")))
    corr = F.when(den > 0,
                  (d("n") * d("sxy") - d("sx") * d("sy")) / den)
    return m.select(F.col("n").alias("n_orders"),
                    F.col("sx").alias("sum_lines"),
                    F.col("sy").alias("sum_dollars"),
                    corr.alias("lines_value_corr"))


_LCVCORR_SQL = """
WITH per AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS x,
         CAST(CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                             * (1 - CAST(l_discount AS DECIMAL(6,4))))
                         * 100) AS BIGINT) // 100 AS BIGINT) AS y
  FROM lineitem GROUP BY l_orderkey
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM per
)
SELECT n AS n_orders, sx AS sum_lines, sy AS sum_dollars,
       CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS lines_value_corr
FROM m
"""

# ---------------------------------------------------------------------------
# window_revenue_acceleration — per-brand monthly revenue SECOND
# difference (accel = rev − 2·lag + lag2, the trend-inflection detector:
# a big positive first difference says "growing", a big second difference
# says "growth just changed"), top-20 inflections by |accel| with a
# deterministic (brand, month) tie-break.  The lag-of-lag window shape —
# distinct from every registered single-lag window.
#
# 100-TB design: the fact table collapses to a (brand × month) census
# map-side BEFORE the window (the window input is catalog-bounded, never
# corpus rows); both lags ride ONE brand-key window; TakeOrdered heaps
# bound the output.
# ---------------------------------------------------------------------------


def window_revenue_acceleration(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select((F.year("l_shipdate") * 100 + F.month("l_shipdate"))
                  .cast("int").alias("ym"),
                  (F.col("l_extendedprice").cast("decimal(12,4)")
                   * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)")))
                  .alias("rev"),
                  "l_partkey"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (li.join(p, li.l_partkey == p.p_partkey)
               .groupBy("p_brand", "ym")
               .agg(F.floor(F.sum("rev") * 100).cast("bigint")
                    .alias("rev_cents")))
    wb = W.partitionBy("p_brand").orderBy("ym")
    acc = (monthly
           .withColumn("lag1", F.lag("rev_cents", 1).over(wb))
           .withColumn("lag2", F.lag("rev_cents", 2).over(wb))
           .filter(F.col("lag2").isNotNull())
           .select("p_brand", "ym", "rev_cents",
                   (F.col("rev_cents") - 2 * F.col("lag1") + F.col("lag2"))
                   .cast("bigint").alias("accel_cents")))
    return (acc.orderBy(F.abs(F.col("accel_cents")).desc(),
                        "p_brand", "ym")
            .limit(20))


_REVACC_SQL = """
WITH monthly AS (
  SELECT p_brand,
         CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ym,
         CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                        * (1 - CAST(l_discount AS DECIMAL(6,4)))) * 100)
              AS BIGINT) AS rev_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), acc AS (
  SELECT p_brand, ym, rev_cents,
         CAST(rev_cents - 2 * lag(rev_cents, 1) OVER w
              + lag(rev_cents, 2) OVER w AS BIGINT) AS accel_cents
  FROM monthly
  WINDOW w AS (PARTITION BY p_brand ORDER BY ym)
)
SELECT p_brand, ym, rev_cents, accel_cents
FROM acc WHERE accel_cents IS NOT NULL
ORDER BY abs(accel_cents) DESC, p_brand, ym
LIMIT 20
"""

# ---------------------------------------------------------------------------
# events_peak_hour_share — per event-type peak load hour: the 24-bucket
# hour-of-day census, the busiest hour (deterministic argmax via a
# rank-1 window over the bounded census — count desc, hour asc), and its
# exact ppm share of the type's events.  The capacity-planning number:
# a share near 42000 ppm (1/24) is flat load, near 1e6 is a single
# nightly spike.
#
# 100-TB design: the event log collapses to a ≤(types × 24) census
# map-side; the rank and share ride windows over that bounded relation.
# No joins, no corpus-sized window.
# ---------------------------------------------------------------------------


def events_peak_hour_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    census = (load_table(spark, sf_dir, "events")
              .select("event_type",
                      F.hour("ts").cast("int").alias("hr"))
              .groupBy("event_type", "hr")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    wt = W.partitionBy("event_type")
    ranked = (census
              .withColumn("total_n", F.sum("n").over(wt).cast("bigint"))
              .withColumn("rk", F.row_number().over(
                  wt.orderBy(F.desc("n"), F.asc("hr")))))
    return (ranked.filter(F.col("rk") == 1)
            .select("event_type", F.col("hr").alias("peak_hour"),
                    F.col("n").alias("peak_n"), "total_n",
                    F.expr("CAST(n * 1000000 DIV total_n AS BIGINT)")
                    .alias("share_ppm"))
            .orderBy("event_type"))


_PEAKHOUR_SQL = """
WITH census AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, hr, n,
         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total_n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, hr ASC) AS rk
  FROM census
)
SELECT event_type, hr AS peak_hour, n AS peak_n, total_n,
       CAST(n * 1000000 // total_n AS BIGINT) AS share_ppm
FROM ranked WHERE rk = 1
ORDER BY event_type
"""

# ---------------------------------------------------------------------------
# window_activation_latency — time-to-Nth-event (N = 5): for every user
# with ≥ 5 events, the span in days from their FIRST to their FIFTH
# event, censused in power-of-two day buckets (`length(bin())`).  The
# activation-funnel latency metric growth teams pair with the retention
# cohort — distinct from events_user_lifecycle (full first→last span)
# and window_inter_event_gap (consecutive gaps).
#
# 100-TB design: one user-key window for the event rank, a conditional
# min fold per user (rows 1 and 5 only survive the filter), then an
# O(|buckets|) census.  Per-user state is two dates.
# ---------------------------------------------------------------------------

_ACTIVATION_N = 5


def window_activation_latency(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "ts", "event_id")
          .withColumn("rn", F.row_number().over(wu))
          .filter(F.col("rn").isin(1, _ACTIVATION_N))
          .groupBy("user_id")
          .agg(F.min(F.when(F.col("rn") == 1, F.to_date("ts")))
               .alias("d1"),
               F.min(F.when(F.col("rn") == _ACTIVATION_N,
                            F.to_date("ts"))).alias("dn"))
          .filter(F.col("dn").isNotNull())
          .select(F.datediff("dn", "d1").cast("bigint").alias("days")))
    return (ev.groupBy(F.length(F.bin("days")).cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.min("days").alias("min_days"),
                 F.max("days").alias("max_days"))
            .orderBy("bucket"))


_ACTLAT_SQL = f"""
WITH ranked AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), per AS (
  SELECT user_id,
         min(CASE WHEN rn = 1 THEN d END) AS d1,
         min(CASE WHEN rn = {_ACTIVATION_N} THEN d END) AS dn
  FROM ranked WHERE rn IN (1, {_ACTIVATION_N})
  GROUP BY user_id
), spans AS (
  SELECT CAST(datediff('day', d1, dn) AS BIGINT) AS days
  FROM per WHERE dn IS NOT NULL
)
SELECT CAST(length(bin(days)) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       min(days) AS min_days, max(days) AS max_days
FROM spans
GROUP BY 1
ORDER BY bucket
"""

# ---------------------------------------------------------------------------
# doc_bucket_stats — the store's physical-layout balance census as a
# driver row (the storage twin of sim_cell_balance: a skewed bucket turns
# its lookups into scans and its upserts into large rewrites; rebucket
# starts from exactly this table): commit orders into an 8-bucket store,
# then read EACH bucket's data dirs through the manifest — physically,
# the way lookup() prunes — and count rows + sum cents per bucket.  The
# oracle recomputes from the bucketing SPEC (key mod 8), so the row
# hash-checks that physical placement matches the layout contract.
#
# 100-TB design: per-bucket reads are manifest-pruned to 1/B of the
# dirs; the per-bucket aggregate is a scalar (map-side partials).  The
# bucket loop is catalog-bounded (B = 8), not data-bounded.
# ---------------------------------------------------------------------------

_BUCKET_N = 8


def doc_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .staged_r12 import _fresh_store, _orders_kv

    store = _fresh_store(spark, "doc_bucket_stats_store",
                         n_buckets=_BUCKET_N)
    t = _orders_kv(spark, sf_dir)
    store.upsert(t, "orders_bkt")                                  # v0
    m = store._manifest("orders_bkt", 0)
    out = None
    for b in range(_BUCKET_N):
        dirs = store._dirs_of(m, {b})
        if dirs:
            one = (spark.read.parquet(*dirs)
                   .agg(F.lit(b).cast("int").alias("bucket"),
                        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                        F.sum("cents").cast("bigint").alias("sum_cents")))
        else:
            one = spark.range(1).select(
                F.lit(b).cast("int").alias("bucket"),
                F.lit(0).cast("bigint").alias("n_rows"),
                F.lit(0).cast("bigint").alias("sum_cents"))
        out = one if out is None else out.unionByName(one)
    return out.orderBy("bucket")


_BUCKSTATS_SQL = f"""
SELECT CAST(o_orderkey % {_BUCKET_N} AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM orders
GROUP BY 1
ORDER BY bucket
"""

# ---------------------------------------------------------------------------
# q_returns_by_nation_year — the returns TREND: per (customer nation ×
# ship year) line count, returned count, return rate in exact ppm and
# returned revenue cents.  Q10 ranks who returned in one quarter;
# q_returned_share_by_brand asks what gets returned; this is the
# geography × time surface quality teams watch for drift.
#
# 100-TB design: customer is a plain equi-join (grows with SF — AQE
# decides), nation a broadcast; the census collapses map-side onto the
# bounded (25 nations × ~7 years) domain.
# ---------------------------------------------------------------------------


def q_returns_by_nation_year(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey",
                  F.year("l_shipdate").cast("int").alias("yr"),
                  (F.col("l_returnflag") == "R").alias("ret"),
                  (F.col("l_extendedprice").cast("decimal(12,4)")
                   * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)")))
                  .alias("rev")))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(c, o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
           .groupBy("n_name", "yr")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                F.sum(F.when(F.col("ret"), 1).otherwise(0)).cast("bigint")
                .alias("n_returned"),
                F.floor(F.sum(F.when(F.col("ret"), F.col("rev"))
                              .otherwise(F.lit(0).cast("decimal(12,4)")))
                        * 100).cast("bigint").alias("returned_cents")))
    return (per.select("n_name", "yr", "n_lines", "n_returned",
                       F.expr("CAST(n_returned * 1000000 DIV n_lines "
                              "AS BIGINT)").alias("returned_ppm"),
                       "returned_cents")
            .orderBy("n_name", "yr"))


_RETNATION_SQL = """
WITH li AS (
  SELECT l_orderkey, CAST(year(l_shipdate) AS INT) AS yr,
         l_returnflag = 'R' AS ret,
         CAST(l_extendedprice AS DECIMAL(12,4))
           * (1 - CAST(l_discount AS DECIMAL(6,4))) AS rev
  FROM lineitem
), per AS (
  SELECT n_name, yr, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN ret THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returned,
         CAST(floor(sum(CASE WHEN ret THEN rev
                             ELSE CAST(0 AS DECIMAL(12,4)) END) * 100)
              AS BIGINT) AS returned_cents
  FROM li
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, yr
)
SELECT n_name, yr, n_lines, n_returned,
       CAST(n_returned * 1000000 // n_lines AS BIGINT) AS returned_ppm,
       returned_cents
FROM per
ORDER BY n_name, yr
"""

# ---------------------------------------------------------------------------
# q_customer_value_migration — the year-over-year customer value-band
# transition matrix: each customer's yearly order value (whole dollars,
# exact) lands in a power-of-two band; count customers per (band_y →
# band_y+1) transition.  The upgrade/downgrade flow behind churn-risk
# models — the q_priority_escalation_matrix recipe on a DERIVED temporal
# self-join key (custkey, year+1) instead of a lag window.
#
# 100-TB design: orders collapse to O(|customers| × |years|) yearly
# values map-side; the transition join is an equi-join on (custkey,
# year+1) — co-partitioned by the same key hash, no cartesian; the final
# census is bounded by |bands|².
# ---------------------------------------------------------------------------


def q_customer_value_migration(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    yearly = (load_table(spark, sf_dir, "orders")
              .groupBy(F.col("o_custkey").alias("ck"),
                       F.year("o_orderdate").cast("int").alias("yr"))
              .agg(F.expr("CAST(floor(sum(CAST(o_totalprice AS "
                          "DECIMAL(12,4))) * 100) DIV 100 AS BIGINT)")
                   .alias("dollars"))
              .select("ck", "yr",
                      F.length(F.bin("dollars")).cast("int").alias("band")))
    a = yearly.select(F.col("ck").alias("a_ck"),
                      (F.col("yr") + 1).alias("a_next"),
                      F.col("band").alias("band_from"))
    b = yearly.select(F.col("ck").alias("b_ck"), F.col("yr").alias("b_yr"),
                      F.col("band").alias("band_to"))
    return (a.join(b, (F.col("a_ck") == F.col("b_ck"))
                   & (F.col("a_next") == F.col("b_yr")))
            .groupBy("band_from", "band_to")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
            .orderBy("band_from", "band_to"))


_MIGRATION_SQL = """
WITH yearly AS (
  SELECT o_custkey AS ck, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(length(bin(CAST(floor(sum(CAST(o_totalprice AS
                                             DECIMAL(12,4)))
                                    * 100) AS BIGINT) // 100)) AS INT)
           AS band
  FROM orders GROUP BY 1, 2
)
SELECT a.band AS band_from, b.band AS band_to,
       CAST(count(*) AS BIGINT) AS n_customers
FROM yearly a JOIN yearly b
  ON a.ck = b.ck AND a.yr + 1 = b.yr
GROUP BY 1, 2
ORDER BY band_from, band_to
"""

# ---------------------------------------------------------------------------
# q_brand_seasonal_amplitude — per-brand seasonality: calendar-month
# revenue census (months pooled across years), the peak month
# (deterministic rank-1 argmax over the ≤12-row census) and the
# amplitude — (max month − min month) as exact ppm of the brand's total.
# Near 0 ppm = flat demand; large = seasonal.  The de-trending input for
# inventory planning one level under q_quarter_revenue_share's global
# mix.  Months absent from a brand's census (zero revenue) don't enter
# min — the amplitude is over OBSERVED months (documented spec).
#
# 100-TB design: map-side census onto the bounded (brand × 12) domain;
# rank/extremes ride brand-partitioned windows over that census.
# ---------------------------------------------------------------------------


def q_brand_seasonal_amplitude(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select(F.month("l_shipdate").cast("int").alias("mo"),
                  (F.col("l_extendedprice").cast("decimal(12,4)")
                   * (F.lit(1) - F.col("l_discount").cast("decimal(6,4)")))
                  .alias("rev"),
                  "l_partkey"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (li.join(p, li.l_partkey == p.p_partkey)
               .groupBy("p_brand", "mo")
               .agg(F.floor(F.sum("rev") * 100).cast("bigint")
                    .alias("cents")))
    wb = W.partitionBy("p_brand")
    ranked = (monthly
              .withColumn("total", F.sum("cents").over(wb).cast("bigint"))
              .withColumn("mx", F.max("cents").over(wb).cast("bigint"))
              .withColumn("mn", F.min("cents").over(wb).cast("bigint"))
              .withColumn("rk", F.row_number().over(
                  wb.orderBy(F.desc("cents"), F.asc("mo")))))
    return (ranked.filter(F.col("rk") == 1)
            .select("p_brand", F.col("mo").alias("peak_month"),
                    F.expr("CAST((mx - mn) * 1000000 DIV total AS BIGINT)")
                    .alias("amplitude_ppm"),
                    F.col("total").alias("total_cents"))
            .orderBy("p_brand"))


_SEASONAMP_SQL = """
WITH monthly AS (
  SELECT p_brand, CAST(month(l_shipdate) AS INT) AS mo,
         CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                        * (1 - CAST(l_discount AS DECIMAL(6,4)))) * 100)
              AS BIGINT) AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT p_brand, mo, cents,
         CAST(sum(cents) OVER (PARTITION BY p_brand) AS BIGINT) AS total,
         CAST(max(cents) OVER (PARTITION BY p_brand) AS BIGINT) AS mx,
         CAST(min(cents) OVER (PARTITION BY p_brand) AS BIGINT) AS mn,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY cents DESC, mo ASC) AS rk
  FROM monthly
)
SELECT p_brand, mo AS peak_month,
       CAST((mx - mn) * 1000000 // total AS BIGINT) AS amplitude_ppm,
       total AS total_cents
FROM ranked WHERE rk = 1
ORDER BY p_brand
"""

# ---------------------------------------------------------------------------
# q_part_name_terms — catalog text mining: the top-20 part-name terms by
# part count with exact ppm of the catalog (p_name is a space-joined
# word list in TPC-H — its term census is the product-catalog keyword
# profile, the relational cousin of text_top_terms).  Deterministic
# (count desc, term asc) TakeOrdered; ppm against a 1-row part-count
# scalar broadcast.
#
# 100-TB design: explode + map-side census over the bounded name vocab;
# the doc-count scalar is a 1-row broadcast; TakeOrdered heaps bound the
# output.
# ---------------------------------------------------------------------------

_NAME_TERMS_K = 20


def q_part_name_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    total = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    census = (p.select(F.explode(F.split("p_name", " ")).alias("term"))
              .groupBy("term")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    return (census.crossJoin(F.broadcast(total))
            .select("term", "n",
                    F.expr("CAST(n * 1000000 DIV n_parts AS BIGINT)")
                    .alias("parts_ppm"))
            .orderBy(F.desc("n"), F.asc("term"))
            .limit(_NAME_TERMS_K))


_NAMETERMS_SQL = f"""
WITH census AS (
  SELECT unnest(string_split(p_name, ' ')) AS term FROM part
), counted AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n FROM census GROUP BY term
), total AS (
  SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part
)
SELECT term, n,
       CAST(n * 1000000 // n_parts AS BIGINT) AS parts_ppm
FROM counted, total
ORDER BY n DESC, term ASC
LIMIT {_NAME_TERMS_K}
"""

# ---------------------------------------------------------------------------
# q_cohort_retention_triangle — the classic acquisition-cohort retention
# triangle on the ORDER book: customers bucketed by first-order year
# (cohort); for each (cohort, age k) the count still ordering k years
# later and the exact ppm of the cohort (k = 0 row is the cohort size,
# retained_ppm = 1e6 by construction — the self-checking diagonal).
# events_retention_cohort is the event-log weekly twin; this is the
# revenue-book yearly one, joined against q_first_order_cohort_value's
# LTV column by every growth dashboard.
#
# 100-TB design: orders collapse to the DISTINCT (customer, year) census
# map-side; the first-year fold is a per-customer min; the triangle
# census is bounded by |years|²; the cohort-size join broadcasts a
# ≤|years|-row relation.
# ---------------------------------------------------------------------------


def q_cohort_retention_triangle(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    cy = (load_table(spark, sf_dir, "orders")
          .select(F.col("o_custkey").alias("ck"),
                  F.year("o_orderdate").cast("int").alias("yr"))
          .distinct())
    first = cy.groupBy("ck").agg(F.min("yr").alias("cohort"))
    tri = (cy.join(first, "ck")
           .groupBy("cohort", (F.col("yr") - F.col("cohort")).alias("k"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_active")))
    size = (tri.filter(F.col("k") == 0)
            .select(F.col("cohort").alias("c0"),
                    F.col("n_active").alias("cohort_size")))
    return (tri.join(F.broadcast(size), tri.cohort == size.c0)
            .select("cohort", F.col("k").cast("int").alias("k"),
                    "n_active", "cohort_size",
                    F.expr("CAST(n_active * 1000000 DIV cohort_size "
                           "AS BIGINT)").alias("retained_ppm"))
            .orderBy("cohort", "k"))


_COHORTTRI_SQL = """
WITH cy AS (
  SELECT DISTINCT o_custkey AS ck, CAST(year(o_orderdate) AS INT) AS yr
  FROM orders
), first AS (
  SELECT ck, min(yr) AS cohort FROM cy GROUP BY ck
), tri AS (
  SELECT cohort, yr - cohort AS k, CAST(count(*) AS BIGINT) AS n_active
  FROM cy JOIN first USING (ck)
  GROUP BY 1, 2
), size AS (
  SELECT cohort AS c0, n_active AS cohort_size FROM tri WHERE k = 0
)
SELECT cohort, CAST(k AS INT) AS k, n_active, cohort_size,
       CAST(n_active * 1000000 // cohort_size AS BIGINT) AS retained_ppm
FROM tri JOIN size ON cohort = c0
ORDER BY cohort, k
"""

# ---------------------------------------------------------------------------
# q_supplier_balance_vs_volume — does financial standing track shipping
# volume?  Suppliers land in (balance band × volume band) cells: balance
# band = account-balance cents DIV 100000 (thousand-dollar steps,
# truncation toward zero in BOTH engines — negative balances land in
# band 0/-0 territory by the same rule), volume band = power-of-two line
# count (`length(bin())`).  The counterparty-risk grid.
#
# 100-TB design: the fact table collapses to per-supplier line counts
# map-side; the supplier dim is a plain equi-join (grows with SF — AQE
# decides); the final census is bounded by |bands|².
# ---------------------------------------------------------------------------


def q_supplier_balance_vs_volume(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    vol = (load_table(spark, sf_dir, "lineitem")
           .groupBy(F.col("l_suppkey").alias("sk"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines")))
    s = (load_table(spark, sf_dir, "supplier")
         .select(F.col("s_suppkey").alias("sk2"),
                 F.round(F.col("s_acctbal") * 100).cast("bigint")
                 .alias("bal_cents")))
    return (vol.join(s, vol.sk == s.sk2)
            .groupBy(F.expr("CAST(bal_cents DIV 100000 AS INT)")
                     .alias("bal_band"),
                     F.length(F.bin("n_lines")).cast("int")
                     .alias("vol_band"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
                 F.sum("n_lines").cast("bigint").alias("total_lines"))
            .orderBy("bal_band", "vol_band"))


_BALVOL_SQL = """
WITH vol AS (
  SELECT l_suppkey AS sk, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
)
SELECT CAST(CAST(round(s_acctbal * 100) AS BIGINT) // 100000 AS INT)
         AS bal_band,
       CAST(length(bin(n_lines)) AS INT) AS vol_band,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(n_lines) AS BIGINT) AS total_lines
FROM vol JOIN supplier ON sk = s_suppkey
GROUP BY 1, 2
ORDER BY bal_band, vol_band
"""

STAGED: dict = {
    "q_supplier_part_diversity": (q_supplier_part_diversity,
                                  _SUPPDIV_SQL),
    "q_tax_discount_matrix": (q_tax_discount_matrix, _TAXDISC_SQL),
    "q_region_brand_affinity": (q_region_brand_affinity, _AFFINITY_SQL),
    "q_order_linecount_value_corr": (q_order_linecount_value_corr,
                                     _LCVCORR_SQL),
    "window_revenue_acceleration": (window_revenue_acceleration,
                                    _REVACC_SQL),
    "events_peak_hour_share": (events_peak_hour_share, _PEAKHOUR_SQL),
    "window_activation_latency": (window_activation_latency,
                                  _ACTLAT_SQL),
    "doc_bucket_stats": (doc_bucket_stats, _BUCKSTATS_SQL),
    "q_returns_by_nation_year": (q_returns_by_nation_year,
                                 _RETNATION_SQL),
    "q_customer_value_migration": (q_customer_value_migration,
                                   _MIGRATION_SQL),
    "q_brand_seasonal_amplitude": (q_brand_seasonal_amplitude,
                                   _SEASONAMP_SQL),
    "q_part_name_terms": (q_part_name_terms, _NAMETERMS_SQL),
    "q_cohort_retention_triangle": (q_cohort_retention_triangle,
                                    _COHORTTRI_SQL),
    "q_supplier_balance_vs_volume": (q_supplier_balance_vs_volume,
                                     _BALVOL_SQL),
}
