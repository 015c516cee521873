"""Relational / window / store shapes STAGED for round 11 (the
window-budgeting protocol of operators/staged_r10.py — round 10's driver
window is filled by the 15 r10 promotions plus stale refreshes, so these
ship as verified (callable, oracle) payloads and are promoted by moving
the STAGED entry into a @register decorator next round).  Every entry
runs driver-identically against DuckDB at sf0.001 AND sf0.01 via
tests/test_staged_r11.py.

Reference parity note (SURVEY.md §2 docstring convention): the reference
(DatabaseManager.java:280-381) has no analytical surface; these rows are
Part-B derived operators plus a driver-checkable exhibit of the round-10
`vacuum_family` store verb (the doc_family_read precedent).

Per-operator 100-TB notes live in each section comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec, dec_factor, dsum_expr
from ..sources import load_table

# ---------------------------------------------------------------------------
# q_supplier_churn — per-year supplier attrition: suppliers who shipped in
# year y but not in y+1 (the retention question every marketplace asks of
# its supply side).  Activity is one DISTINCT (year, supplier) census;
# churn is a self anti-join on (supplier, next-year) — both
# map-side-combinable equi-ops on int keys.  The last data year is
# excluded (no y+1 to churn into).  churn_rate divides two exact BIGINTs
# as doubles — bit-identical cross-engine.
#
# 100-TB design: the distinct census collapses the fact table to
# O(years × suppliers) rows before any join; the anti-join and the final
# census shuffle dimension-sized rows only.  No global step.
# ---------------------------------------------------------------------------


def q_supplier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..registry import scoped_persist

    # act feeds FOUR subtrees (both anti-join sides, the per-year census,
    # the last-year scalar) — persist the distinct census once instead of
    # re-scanning lineitem and re-shuffling the DISTINCT per consumer
    act = scoped_persist(
        load_table(spark, sf_dir, "lineitem")
        .select(F.year("l_shipdate").cast("int").alias("y"), "l_suppkey")
        .distinct())
    last_y = act.agg(F.max("y").alias("m"))
    churned = (act.alias("a")
               .join(act.select((F.col("y") - 1).alias("y"),
                                F.col("l_suppkey")).alias("b"),
                     ["y", "l_suppkey"], "left_anti"))
    per = (act.groupBy("y")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_active")))
    chn = (churned.groupBy("y")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned")))
    return (per.join(chn, "y", "left")
            .join(F.broadcast(last_y), F.col("y") < F.col("m"))
            .select(F.col("y").alias("year"), "n_active",
                    F.coalesce(F.col("n_churned"), F.lit(0)).cast("bigint")
                    .alias("n_churned"))
            .withColumn("churn_rate",
                        F.col("n_churned").cast("double")
                        / F.col("n_active").cast("double"))
            .orderBy("year"))


_CHURN_SQL = """
WITH act AS (
  SELECT DISTINCT CAST(year(l_shipdate) AS INT) AS y, l_suppkey
  FROM lineitem
), churned AS (
  SELECT a.y, a.l_suppkey FROM act a
  WHERE NOT EXISTS (SELECT 1 FROM act b
                    WHERE b.l_suppkey = a.l_suppkey AND b.y = a.y + 1)
)
SELECT a.y AS year,
       CAST(count(DISTINCT a.l_suppkey) AS BIGINT) AS n_active,
       CAST(count(DISTINCT c.l_suppkey) AS BIGINT) AS n_churned,
       CAST(count(DISTINCT c.l_suppkey) AS DOUBLE)
       / CAST(count(DISTINCT a.l_suppkey) AS DOUBLE) AS churn_rate
FROM act a
LEFT JOIN churned c ON c.y = a.y AND c.l_suppkey = a.l_suppkey
WHERE a.y < (SELECT max(y) FROM act)
GROUP BY a.y
ORDER BY year
"""

# ---------------------------------------------------------------------------
# window_inter_event_gap — the inter-arrival-time distribution per user
# (the latency histogram of user behavior; the input to session-timeout
# tuning).  Gaps ride as exact BIGINT milliseconds from ONE lag window
# per user; the census buckets by power-of-two millisecond magnitude
# (`length(bin(gap_ms))` — the graph_degree_histogram integer-bucket
# recipe, no float log flap).
#
# 100-TB design: one user_id exchange + sort for the lag; the census is
# map-side-combinable (int, int) rows.  No global step.
# ---------------------------------------------------------------------------


def window_inter_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "event_id",
                  F.unix_millis("ts").alias("ms")))
    wu = W.partitionBy("user_id").orderBy("ms", "event_id")
    gaps = (ev.select((F.col("ms") - F.lag("ms").over(wu)).alias("gap_ms"))
            .filter(F.col("gap_ms").isNotNull() & (F.col("gap_ms") > 0)))
    return (gaps.groupBy(F.length(F.bin("gap_ms")).cast("int")
                         .alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
                 F.min("gap_ms").alias("min_ms"),
                 F.max("gap_ms").alias("max_ms"))
            .orderBy("bucket"))


_GAP_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
), gaps AS (
  SELECT ms - lag(ms) OVER (PARTITION BY user_id
                            ORDER BY ms, event_id) AS gap_ms
  FROM ev
)
SELECT CAST(length(bin(gap_ms)) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_gaps,
       min(gap_ms) AS min_ms, max(gap_ms) AS max_ms
FROM gaps WHERE gap_ms IS NOT NULL AND gap_ms > 0
GROUP BY 1
ORDER BY bucket
"""

# ---------------------------------------------------------------------------
# doc_vacuum_family — the round-10 `vacuum_family` verb surfaced as a
# driver row (the doc_family_read convention): THREE save_docs commits of
# a 2-table family, then vacuum_family(keep_last=2) — the oldest family
# manifest expires, the per-child GC floor moves up, and the two retained
# family versions still read end-to-end through read_family.  The output
# carries the retained-manifest count so the GC effect itself is
# hash-checked, not just the survivors.
#
# 100-TB design: vacuum_family touches only the tiny _family CAS log plus
# per-table manifests; data deletion is bucket-dir granular (store vacuum
# contract).  Reads after GC are ordinary bucket-pruned AS-OF reads.
# ---------------------------------------------------------------------------

_VFAM_DOCS = [
    [{"rowNum": 1, "name": "v0",
      "items": [{"type": "pay", "rowNum": 11, "amt": 10}]}],
    [{"rowNum": 1, "name": "v1",
      "items": [{"type": "pay", "rowNum": 11, "amt": 20},
                {"type": "pay", "rowNum": 12, "amt": 5}]}],
    [{"rowNum": 2, "name": "w2",
      "items": [{"type": "pay", "rowNum": 21, "amt": 7}]}],
]


def doc_vacuum_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..documents.fixtures import docs_df
    from ..documents.store import DocumentStore
    from .scans import _sink
    from .staged_r10 import family_version_rollup

    # fresh store per invocation (under the session-lifetime sink, so the
    # returned lazy reads stay valid): family VERSION NUMBERS are part of
    # the output, so reusing one store across invocations — the plan
    # sweep and the oracle harness both call this — would drift them
    import os

    base = _sink("doc_vacuum_family_store", spark)
    os.makedirs(base, exist_ok=True)
    store = DocumentStore(spark, tempfile.mkdtemp(dir=base))
    for batch in _VFAM_DOCS:
        store.save_docs(docs_df(spark, batch), "vfam")   # family v0,v1,v2
    res = store.vacuum_family("vfam", keep_last=2, min_age_seconds=0)
    n_kept = len(res["kept_family_versions"])
    out = None
    for fv in res["kept_family_versions"]:
        one = (family_version_rollup(store, "vfam", "pay", fv)
               .select("fam_version",
                       F.lit(n_kept).alias("n_kept_versions"),
                       "doc", "name", "total_amt"))
        out = one if out is None else out.unionByName(one)
    return out.orderBy("fam_version", "doc")


_VFAM_SQL = """
SELECT * FROM (VALUES
  (1, 2, CAST(1 AS BIGINT), 'v1', CAST(25 AS BIGINT)),
  (2, 2, CAST(1 AS BIGINT), 'v1', CAST(25 AS BIGINT)),
  (2, 2, CAST(2 AS BIGINT), 'w2', CAST(7 AS BIGINT))
) AS t(fam_version, n_kept_versions, doc, name, total_amt)
ORDER BY fam_version, doc
"""

# ---------------------------------------------------------------------------
# q_nation_trade_balance — per-nation outbound revenue (as the SUPPLIER
# nation) vs inbound spend (as the CUSTOMER nation) and the balance — the
# import/export ledger of the trade graph, a 6-table star that exercises
# both fact→dimension directions in one query.  Revenue follows the
# functions/exact.py decimal discipline, so both sums and the balance are
# bit-identical cross-engine.
#
# 100-TB design: the fact table is scanned once per direction with only
# the join keys + money columns read; both nation joins broadcast (25
# rows); each side collapses map-side to 25 partial rows before the final
# 25-row join.  No global step.
# ---------------------------------------------------------------------------


def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = F.broadcast(load_table(spark, sf_dir, "nation")
                    .select("n_nationkey", "n_name"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey",
                                                     "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_custkey")
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey",
                  (dec("l_extendedprice")
                   * dec_factor(1 - F.col("l_discount"))).alias("rev")))
    outb = (li.join(s, li["l_suppkey"] == s["s_suppkey"])
            .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(dsum_expr(F.col("rev")).alias("outbound")))
    inb = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
           .join(c, o["o_custkey"] == c["c_custkey"])
           .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
           .groupBy("n_name")
           .agg(dsum_expr(F.col("rev")).alias("inbound")))
    return (outb.join(inb, "n_name", "full")
            .select(F.col("n_name").alias("nation"),
                    F.coalesce("outbound", F.lit(0.0)).alias("outbound"),
                    F.coalesce("inbound", F.lit(0.0)).alias("inbound"))
            .withColumn("balance", F.col("outbound") - F.col("inbound"))
            .orderBy("nation"))


_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(12,4)) "
            "* CAST(1 - l_discount AS DECIMAL(6,4))")

_TRADE_SQL = f"""
WITH outb AS (
  SELECT n_name, CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS outbound
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  GROUP BY n_name
), inb AS (
  SELECT n_name, CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS inbound
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY n_name
)
SELECT coalesce(outb.n_name, inb.n_name) AS nation,
       coalesce(outbound, 0.0) AS outbound,
       coalesce(inbound, 0.0) AS inbound,
       coalesce(outbound, 0.0) - coalesce(inbound, 0.0) AS balance
FROM outb FULL JOIN inb ON outb.n_name = inb.n_name
ORDER BY nation
"""

# ---------------------------------------------------------------------------
# q_brand_monthly_movers — the largest month-over-month demand swings per
# part brand (the inventory planner's exception report).  Monthly
# quantities ride as exact BIGINT centi-units; the MoM delta is one lag
# window per brand (months are contiguous within the data range or the
# lag row simply doesn't exist); the global top-20 by |delta| is
# TakeOrdered (per-partition heaps, no global sort), with deterministic
# (|delta| desc, brand, month) tie-break.
#
# 100-TB design: the fact scan collapses map-side to O(brands × months)
# rows before the window; ONE brand-key exchange; TakeOrderedAndProject
# bounds the driver result to k rows.
# ---------------------------------------------------------------------------

_MOVERS_K = 20


def q_brand_monthly_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey",
                  # month rides as TIMESTAMP: a cross-engine DATE output
                  # canonicalizes differently (date vs midnight-timestamp
                  # pandas dtypes) — the compare convention every
                  # registered query follows
                  F.date_trunc("month", "l_shipdate").alias("month"),
                  F.round(F.col("l_quantity") * 100).cast("bigint")
                  .alias("q")))
    # no broadcast hint on part: it's 2 columns of a dimension table, but
    # dimension-scale ≠ bounded at 100 TB — AQE picks broadcast when the
    # runtime size qualifies
    monthly = (li.join(p, li["l_partkey"] == p["p_partkey"])
               .groupBy("p_brand", "month")
               .agg(F.sum("q").cast("bigint").alias("qty")))
    wb = W.partitionBy("p_brand").orderBy("month")
    delta = (monthly
             .select("p_brand", "month", "qty",
                     (F.col("qty") - F.lag("qty").over(wb)).alias("delta"))
             .filter(F.col("delta").isNotNull()))
    return (delta
            .orderBy(F.abs("delta").desc(), "p_brand", "month")
            .limit(_MOVERS_K)
            .select("p_brand", "month", "qty", "delta"))


_MOVERS_SQL = f"""
WITH monthly AS (
  SELECT p_brand,
         CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
), delta AS (
  SELECT p_brand, month, qty,
         qty - lag(qty) OVER (PARTITION BY p_brand ORDER BY month)
           AS delta
  FROM monthly
)
SELECT p_brand, month, qty, delta
FROM delta WHERE delta IS NOT NULL
ORDER BY abs(delta) DESC, p_brand, month
LIMIT {_MOVERS_K}
"""

# ---------------------------------------------------------------------------
# q9_product_type_profit — TPC-H Q9 analog, adapted (no partsupp, so
# ps_supplycost has no source — the per-unit cost becomes a documented
# 60% share of p_retailprice, the q20 adaptation convention): profit =
# revenue − cost for suffix-filtered parts, by SUPPLIER nation × ship
# year (no o_orderdate join needed — l_shipdate carries the year, as
# q7/yearly-growth do).  All money stays in the decimal domain
# (functions/exact.py) until ONE round(…, 2)::DOUBLE — bit-identical
# cross-engine.
#
# 100-TB design: the part filter prunes before the fact join (broadcast —
# suffix-filtered part keys + retail price, dimension-bounded); supplier
# and nation join broadcast; the profit aggregate is map-side combinable
# on (nation, year) — 25×|years| partials.  No global step.
# ---------------------------------------------------------------------------

_Q9_SUFFIX = "bolt"
_Q9_COST_SHARE = "0.6"          # documented supply-cost share of retail


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_name").endswith(_Q9_SUFFIX))
         .select(F.col("p_partkey").alias("l_partkey"), "p_retailprice"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey",
                                                     "s_nationkey")
    n = F.broadcast(load_table(spark, sf_dir, "nation")
                    .select(F.col("n_nationkey").alias("s_nationkey"),
                            F.col("n_name").alias("nation")))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
        "l_extendedprice", "l_discount")
    amount = (dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))
              - dec("p_retailprice")
              * dec_factor(F.lit(float(_Q9_COST_SHARE)))
              * dec("l_quantity"))
    # no broadcast hint on the suffix-filtered part set: a fixed fraction
    # of an SF-growing table is NOT bounded — AQE decides at runtime
    return (li.join(p, "l_partkey")
            .join(s, li["l_suppkey"] == s["s_suppkey"])
            .join(n, "s_nationkey")
            .groupBy("nation",
                     F.year("l_shipdate").cast("bigint").alias("o_year"))
            .agg(dsum_expr(amount).alias("profit"))
            .orderBy("nation", F.col("o_year").desc()))


_Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       CAST(round(sum(
         CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(1 - l_discount AS DECIMAL(6,4))
         - CAST(p_retailprice AS DECIMAL(12,4))
           * CAST({_Q9_COST_SHARE} AS DECIMAL(6,4))
           * CAST(l_quantity AS DECIMAL(12,4))
       ), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%{_Q9_SUFFIX}'
GROUP BY n_name, year(l_shipdate)
ORDER BY nation, o_year DESC
"""

# ---------------------------------------------------------------------------
# events_weekday_profile — event volume by (event_type × weekday), the
# seasonality fingerprint behind capacity planning and anomaly baselines.
# Weekday via Spark's weekday() (0 = Monday) ≡ DuckDB isodow − 1 — pure
# integer calendar arithmetic, no locale/week-start flap (dayofweek()
# would differ: Spark 1 = Sunday, DuckDB 0 = Sunday).
#
# 100-TB design: one map-side-combinable census on a 5×7-value domain;
# value cents sum exact.  No joins, no global step.
# ---------------------------------------------------------------------------


def events_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("weekday(ts)").cast("int").alias("wd"),
                  F.round(F.col("value") * 100).cast("bigint")
                  .alias("cents")))
    return (ev.groupBy("event_type", "wd")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.sum("cents").cast("bigint").alias("total_cents"))
            .orderBy("event_type", "wd"))


_WEEKDAY_SQL = """
SELECT event_type, CAST(isodow(ts) - 1 AS INT) AS wd,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
GROUP BY 1, 2
ORDER BY event_type, wd
"""

# ---------------------------------------------------------------------------
# q2_min_cost_supplier — TPC-H Q2 analog, adapted (no partsupp, so
# ps_supplycost has no source — "cost" becomes each (part, supplier)'s
# MINIMUM OBSERVED line total from lineitem, an exact integer): for
# size-filtered parts, the EUROPE-region supplier(s) achieving the
# part's minimum cost.  Q2's defining shape is preserved: a per-group
# MIN aggregate EQUALITY-JOINED BACK onto the detail (the decorrelated
# form of Q2's correlated subquery), supplier details re-attached by a
# dimension join, TakeOrdered output (acctbal desc, deterministic
# tie-break).
#
# 100-TB design: region+size filters prune both dimension scans before
# any fact work; the regional supplier set broadcasts (twice — cost join
# and detail join, both audited); the min/join-back pair is two
# map-side-combinable aggs + one equi-join on (part, cents); TakeOrdered
# bounds the result.
# ---------------------------------------------------------------------------

_Q2_SIZE = 13
_Q2_REGION = "EUROPE"
_Q2_K = 20


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = (load_table(spark, sf_dir, "region")
         .filter(F.col("r_name") == _Q2_REGION).select("r_regionkey"))
    n = (load_table(spark, sf_dir, "nation")
         .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
         .select("n_nationkey", "n_name"))
    su = (load_table(spark, sf_dir, "supplier")
          .join(F.broadcast(n),
                F.col("s_nationkey") == F.col("n_nationkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_size") == _Q2_SIZE)
         .select(F.col("p_partkey").alias("l_partkey")))
    # size-filtered part and region-filtered supplier sets are fixed
    # FRACTIONS of SF-growing tables — no broadcast hints (AQE decides);
    # only region (1 row) and nation (25 rows) broadcast above
    cost = (load_table(spark, sf_dir, "lineitem")
            .join(p, "l_partkey")
            .join(su.select("s_suppkey"),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.round(F.col("l_extendedprice") * 100)
                       .cast("bigint")).cast("bigint").alias("cents")))
    best = (cost.groupBy("l_partkey")
            .agg(F.min("cents").alias("min_cents"))
            .select(F.col("l_partkey").alias("b_partkey"), "min_cents"))
    return (cost.join(best, (F.col("l_partkey") == F.col("b_partkey"))
                      & (F.col("cents") == F.col("min_cents")))
            .select(F.col("l_partkey").alias("p_partkey"),
                    "l_suppkey", "cents")
            .join(su, F.col("l_suppkey") == su["s_suppkey"])
            .select("s_name", "s_acctbal", "n_name", "p_partkey", "cents")
            .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
            .limit(_Q2_K))


_Q2_SQL = f"""
WITH su AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = '{_Q2_REGION}'
), cost AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN su ON s_suppkey = l_suppkey
  WHERE p_size = {_Q2_SIZE}
  GROUP BY 1, 2
), best AS (
  SELECT l_partkey, min(cents) AS min_cents FROM cost GROUP BY 1
)
SELECT s_name, s_acctbal, n_name, cost.l_partkey AS p_partkey, cents
FROM cost
JOIN best ON best.l_partkey = cost.l_partkey AND cents = min_cents
JOIN su ON su.s_suppkey = cost.l_suppkey
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT {_Q2_K}
"""

# ---------------------------------------------------------------------------
# q11_important_stock — TPC-H Q11 analog, adapted (no partsupp
# availqty/supplycost — part "stock value" becomes Σ quantity×retailprice
# over the target supplier group's lineitems, exact integer centi²):
# parts whose value share within the group exceeds 1/1000 of the group
# total, Q11's defining HAVING-share-of-global-scalar shape (the
# q15/q22 1-row-threshold-broadcast pattern).  The nation cut follows
# q20's convention (s_nationkey < 5 — a single named nation is empty at
# sf0.001's 10-supplier scale).
#
# 100-TB design: the supplier filter prunes at the scan; the value
# aggregate is map-side combinable on partkey; the threshold is ONE
# 1-row broadcast scalar; the share test is the exact integer cross
# product v·1000 > t, with the corpus-wide total t held in the 38-digit
# decimal domain (Spark) / HUGEINT (DuckDB) — an int64 sum fails past
# ~9e9 lineitems (ANSI throws; non-ANSI wraps silently — broken either
# way, the decimal domain stays exact).
# ---------------------------------------------------------------------------

_Q11_NATIONS = 5
_Q11_DEN = 1000          # share threshold 1/1000 of the group total


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = (load_table(spark, sf_dir, "supplier")
         .filter(F.col("s_nationkey") < _Q11_NATIONS).select("s_suppkey"))
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.round(F.col("p_retailprice") * 100).cast("bigint")
        .alias("retail_cents"))
    # no broadcast hints on part OR the nation-filtered supplier set —
    # both are fixed fractions of SF-growing tables (AQE decides); per-
    # part v is an exact BIGINT (overflows only past ~9e15 cents² on ONE
    # part ≈ 9M max-priced lines of a single part), while the GLOBAL
    # total t runs in the 38-digit decimal domain — a corpus-wide cents²
    # sum exceeds int64 around ~9e9 lineitems (sf ~1500), far below the
    # design point; DuckDB's sum(BIGINT) is HUGEINT-exact to match
    val = (load_table(spark, sf_dir, "lineitem")
           .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
           .join(p, "l_partkey")
           .groupBy("l_partkey")
           .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")
                      * F.col("retail_cents")).cast("bigint").alias("v")))
    tot = val.agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("t"))
    return (val.crossJoin(F.broadcast(tot))
            .filter(F.col("v").cast("decimal(38,0)") * _Q11_DEN
                    > F.col("t"))
            .select(F.col("l_partkey").alias("p_partkey"), "v")
            .orderBy(F.col("v").desc(), "p_partkey"))


_Q11_SQL = f"""
WITH val AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)
                  * CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
           AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN part ON p_partkey = l_partkey
  WHERE s_nationkey < {_Q11_NATIONS}
  GROUP BY 1
), tot AS (SELECT sum(CAST(v AS HUGEINT)) AS t FROM val)
SELECT l_partkey AS p_partkey, v
FROM val, tot
WHERE CAST(v AS HUGEINT) * {_Q11_DEN} > t
ORDER BY v DESC, p_partkey
"""

# ---------------------------------------------------------------------------
# q_order_size_histogram — the lineitems-per-order distribution (the
# basket-size census behind co-purchase cost models: q_copurchase_pairs'
# pair blow-up is Σ C(items,2), and THIS is the table that bounds it).
# Two map-side-combinable censuses — per-order item count, then the
# count-of-counts — plus one exact share division.
#
# 100-TB design: the first census collapses the fact table to one row
# per order before the second touches anything; the histogram itself is
# a ≤max-basket-size table.  No joins, no global step, no windows.
# ---------------------------------------------------------------------------


def q_order_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_order = (load_table(spark, sf_dir, "lineitem")
                 .groupBy("l_orderkey")
                 .agg(F.count(F.lit(1)).cast("bigint").alias("n_items")))
    hist = (per_order.groupBy("n_items")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders")))
    tot = hist.agg(F.sum("n_orders").cast("bigint").alias("t"))
    return (hist.crossJoin(F.broadcast(tot))
            .select("n_items", "n_orders",
                    (F.col("n_orders").cast("double")
                     / F.col("t").cast("double")).alias("share"))
            .orderBy("n_items"))


_OSIZE_SQL = """
WITH per_order AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY 1
), hist AS (
  SELECT n_items, CAST(count(*) AS BIGINT) AS n_orders
  FROM per_order GROUP BY 1
), tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS t FROM hist)
SELECT n_items, n_orders,
       CAST(n_orders AS DOUBLE) / CAST(t AS DOUBLE) AS share
FROM hist, tot
ORDER BY n_items
"""

# ---------------------------------------------------------------------------
# q_discount_quantity_corr — per-brand Pearson correlation between
# discount and quantity (the price-elasticity proxy: does discounting
# move volume, and for which brands).  Both variables live in exact
# integer domains (discount → whole percent via the cents-snap, quantity
# integral by construction), so all five moments are exact BIGINTs;
# r = (n·Σxy − Σx·Σy) / (√(n·Σxx−Σx²)·√(n·Σyy−Σy²)) evaluates in doubles
# with IEEE-exact sqrt — bit-identical cross-engine (the assortativity
# moment recipe, per-group).
#
# 100-TB design: the brand-key join is a plain equi-join — part GROWS
# with SF (200k rows/SF in TPC-H), so it is NOT broadcast (the audited
# part broadcasts elsewhere are all row-filtered first); AQE broadcasts
# it at runtime when the actual scan is small, shuffles when it isn't.
# The moments are map-side-combinable per brand (a catalog-sized
# domain).  Per-row squares are ≤ 2500, so the BIGINT moment sums hold
# exactly to ~10^15 rows per brand; the cross-moment PRODUCTS (n·Σxx
# etc.) evaluate in the double domain (the assortativity recipe) — no
# int64 overflow at any scale, and both engines run the identical IEEE
# ops.  No windows, no global step.
# ---------------------------------------------------------------------------


def q_discount_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey",
                  F.floor(F.col("l_discount") * 100 + F.lit(0.5))
                  .cast("bigint").alias("x"),
                  F.col("l_quantity").cast("bigint").alias("y")))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    m = (li.join(part, li.l_partkey == part.p_partkey)
         .groupBy("p_brand")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("x").cast("bigint").alias("sx"),
              F.sum("y").cast("bigint").alias("sy"),
              F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
              F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
              F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy")))
    d = lambda c: F.col(c).cast("double")    # noqa: E731
    den = (F.sqrt(d("n") * d("sxx") - d("sx") * d("sx"))
           * F.sqrt(d("n") * d("syy") - d("sy") * d("sy")))
    # zero-variance guard (a brand with constant discount or quantity):
    # Spark's 0.0/0.0 is NaN, DuckDB's division by zero is NULL —
    # when(den>0) emits NULL on both (correlation undefined)
    corr = F.when(den > 0,
                  (d("n") * d("sxy") - d("sx") * d("sy")) / den)
    return (m.select("p_brand", "n", corr.alias("disc_qty_corr"))
            .orderBy("p_brand"))


_DQCORR_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM li JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS disc_qty_corr
FROM m
ORDER BY p_brand
"""

# ---------------------------------------------------------------------------
# q_ship_latency_p95 — exact p95 order→ship latency per supplier nation
# (the SLA tail metric; mean latency hides exactly the tail that
# matters).  The testdata carries no commit/receipt dates, so latency =
# datediff(l_shipdate, o_orderdate) — the q12/q21 delay adaptation,
# documented there.  Exact percentile WITHOUT a per-nation sort over the
# fact table: latencies live in a bounded integer day domain, so a
# (nation, delay) census + a cumulative window over that TINY table
# yields the exact rank statistic — p95 = min delay with cum ≥
# ceil(0.95·n), the ceil computed in pure integers ((19n+19) DIV 20).
#
# 100-TB design: the census is map-side-combinable; the window runs over
# ≤ nations × day-domain rows (thousands, not billions) — this is the
# two-pass histogram-percentile pattern that replaces the per-group sort
# a naive percentile_disc would shuffle.  Contrast agg_median_percentile,
# which prices the generic any-domain path.
# ---------------------------------------------------------------------------


def q_ship_latency_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey",
                                                     "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # supplier GROWS with SF (10k rows/SF) — plain equi-join, AQE decides;
    # nation is a true 25-row dim, broadcast explicitly
    delays = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(s, li.l_suppkey == s.s_suppkey)
              .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
              .select("n_name",
                      F.datediff("l_shipdate", "o_orderdate")
                      .cast("bigint").alias("delay")))
    census = (delays.groupBy("n_name", "delay")
              .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    wc = (W.partitionBy("n_name").orderBy("delay")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = (census
           .withColumn("cum", F.sum("c").over(wc).cast("bigint"))
           .withColumn("n", F.sum("c").over(W.partitionBy("n_name"))
                       .cast("bigint")))
    rank95 = F.expr("(19 * n + 19) DIV 20")
    return (cum.filter(F.col("cum") >= rank95)
            .groupBy("n_name")
            .agg(F.min("delay").cast("bigint").alias("p95_ship_days"),
                 F.min("n").cast("bigint").alias("n_lines"))
            .select("n_name", "n_lines", "p95_ship_days")
            .orderBy("n_name"))


_SHIPP95_SQL = """
WITH delays AS (
  SELECT n_name,
         CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS delay
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
), census AS (
  SELECT n_name, delay, CAST(count(*) AS BIGINT) AS c
  FROM delays GROUP BY 1, 2
), cum AS (
  SELECT n_name, delay, c,
         CAST(sum(c) OVER (PARTITION BY n_name ORDER BY delay
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(c) OVER (PARTITION BY n_name) AS BIGINT) AS n
  FROM census
)
SELECT n_name, CAST(min(n) AS BIGINT) AS n_lines,
       CAST(min(delay) AS BIGINT) AS p95_ship_days
FROM cum
WHERE cum >= (19 * n + 19) // 20
GROUP BY n_name
ORDER BY n_name
"""

# Promoted round 11 (r10 verdict next-round #1); empty STAGED kept so the
# staged-protocol tests can pin that nothing is both staged and registered.
from ..registry import register  # noqa: E402  (promotion epilogue)

for _name, (_fn, _sql) in {
    "q2_min_cost_supplier": (q2_min_cost_supplier, _Q2_SQL),
    "q11_important_stock": (q11_important_stock, _Q11_SQL),
    "q_supplier_churn": (q_supplier_churn, _CHURN_SQL),
    "window_inter_event_gap": (window_inter_event_gap, _GAP_SQL),
    "doc_vacuum_family": (doc_vacuum_family, _VFAM_SQL),
    "q_nation_trade_balance": (q_nation_trade_balance, _TRADE_SQL),
    "q_brand_monthly_movers": (q_brand_monthly_movers, _MOVERS_SQL),
    "q9_product_type_profit": (q9_product_type_profit, _Q9_SQL),
    "events_weekday_profile": (events_weekday_profile, _WEEKDAY_SQL),
    "q_order_size_histogram": (q_order_size_histogram, _OSIZE_SQL),
    "q_discount_quantity_corr": (q_discount_quantity_corr, _DQCORR_SQL),
    "q_ship_latency_p95": (q_ship_latency_p95, _SHIPP95_SQL),
}.items():
    register(_name, _sql)(_fn)

STAGED: dict = {}
