"""Join operators (SURVEY.md §2 B3).

Reference parity: the reference's only "join" is the implicit parent↔child
reassembly done via N+1 recursive point lookups (DatabaseManager.java:317-321
per child object, :336-341 per parent×child-type) — b3.11 here replaces that
with a single shuffle join + collect_list(struct).  The rest is the join
surface the reference's SQL backend provides.

Scale strategy (SURVEY.md §4.3):
- dimension tables (region/nation/supplier/part) are wrapped in
  F.broadcast() — no shuffle of the fact side, valid at any SF since dims
  don't grow with fact data;
- fact↔fact joins (orders⋈lineitem, customer⋈orders) shuffle on the join
  key and rely on AQE for partition sizing/skew; both sides arrive hashed on
  the same key so no extra exchange;
- range/theta joins are joined against tiny literal tables via broadcast
  nested-loop — the only NLJ shapes here keep the big side streaming;
- the as-of join avoids the classic inequality-join row explosion entirely:
  union both streams + one window pass (single shuffle, O(n) state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec, dec_factor
from ..registry import register
from ..sources import load_table


# ---------------------------------------------------------------------------
# b3.1 broadcast hash equi-join: nation ⋈ region (both dims, broadcast side
# explicit so the plan is broadcast at any scale, not just when AQE sees
# small stats).
# ---------------------------------------------------------------------------

@register(
    "join_broadcast_dim",
    oracle="""
SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
ORDER BY n.n_nationkey
""",
    tags=("b3.1",),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))
        .orderBy("n_nationkey")
    )


# ---------------------------------------------------------------------------
# b3.2 shuffle / sort-merge equi-join on the two fact tables.  Both sides
# shuffle once on l_orderkey/o_orderkey; aggregates use exact decimals.
# ---------------------------------------------------------------------------

@register(
    "join_orders_lineitem",
    oracle="""
SELECT
  o.o_orderkey,
  o.o_orderstatus,
  count(*) AS n_lines,
  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,4))
             * CAST(1 - l.l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY o.o_orderkey, o.o_orderstatus
ORDER BY o.o_orderkey
""",
    tags=("b3.2",),
)
def join_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_lines"),
             F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# b3.3 multi-way star join (TPC-H Q5 shape): revenue by customer nation.
# lineitem⋈orders⋈customer shuffle on their keys; nation/region/supplier are
# broadcast — at 100 TB the plan is two shuffles + three broadcasts.
# ---------------------------------------------------------------------------

@register(
    "join_star_revenue",
    oracle="""
SELECT
  n.n_name AS nation,
  r.r_name AS region,
  count(*) AS n_lines,
  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,4))
             * CAST(1 - l.l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
WHERE o.o_orderstatus != 'P'
GROUP BY n.n_name, r.r_name
ORDER BY nation
""",
    tags=("b3.3",),
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    rev = dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))
    return (
        # explicit broadcast ONLY for the constant-size dims (nation=25,
        # region=5 rows at every SF); orders/customer/supplier grow with SF,
        # so their strategy is left to stats+AQE — broadcast at bench scale,
        # shuffle join at the 100-TB regime where they no longer fit
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_lines"),
             F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# b3.4 outer joins: customer LEFT JOIN orders (keeps customers w/o orders)
# ---------------------------------------------------------------------------

@register(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
ORDER BY c.c_custkey, o.o_orderkey
""",
    tags=("b3.4",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000), "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


@register(
    "join_full_outer",
    oracle="""
WITH big AS (SELECT * FROM orders WHERE o_totalprice > 450000),
     rich AS (SELECT * FROM customer WHERE c_acctbal > 9000)
SELECT rich.c_custkey, rich.c_name, big.o_orderkey, big.o_totalprice
FROM rich FULL OUTER JOIN big ON rich.c_custkey = big.o_custkey
ORDER BY rich.c_custkey, big.o_orderkey
""",
    tags=("b3.4",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# b3.5 left semi (EXISTS) / b3.6 left anti (NOT EXISTS) — semi/anti never
# duplicate or widen rows, so they shuffle only the key columns of the
# filtering side.
# ---------------------------------------------------------------------------

@register(
    "join_left_semi",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
    tags=("b3.5",),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_left_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
ORDER BY c_custkey
""",
    tags=("b3.6",),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# b3.7 cross join (bounded: 5 regions × 25 nations)
# ---------------------------------------------------------------------------

@register(
    "join_cross",
    oracle="""
SELECT r.r_name, n.n_name,
       CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_home
FROM region r CROSS JOIN nation n
ORDER BY r.r_name, n.n_name
""",
    tags=("b3.7",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(F.broadcast(n))
        .select("r_name", "n_name",
                F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1)
                 .otherwise(0).alias("is_home"))
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# b3.8 theta / range join: orders against literal year buckets (broadcast
# nested-loop on a tiny in-memory side — the fact side streams once).
# ---------------------------------------------------------------------------

_YEAR_BUCKETS = [(y, f"{y}-01-01 00:00:00", f"{y + 1}-01-01 00:00:00")
                 for y in range(1995, 2002)]


@register(
    "join_range_theta",
    oracle="""
WITH buckets(bucket_year, lo, hi) AS (
  VALUES {values}
)
SELECT b.bucket_year, count(*) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total
FROM orders o
JOIN buckets b ON o.o_orderdate >= CAST(b.lo AS TIMESTAMP)
              AND o.o_orderdate < CAST(b.hi AS TIMESTAMP)
GROUP BY b.bucket_year
ORDER BY b.bucket_year
""".format(values=",\n          ".join(
        f"({y}, '{lo}', '{hi}')" for y, lo, hi in _YEAR_BUCKETS)),
    tags=("b3.8",),
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    buckets = spark.createDataFrame(
        _YEAR_BUCKETS, "bucket_year INT, lo STRING, hi STRING"
    ).select("bucket_year",
             F.col("lo").cast("timestamp").alias("lo"),
             F.col("hi").cast("timestamp").alias("hi"))
    return (
        o.join(F.broadcast(buckets),
               (o.o_orderdate >= F.col("lo")) & (o.o_orderdate < F.col("hi")))
        .groupBy("bucket_year")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias("total"))
        .orderBy("bucket_year")
    )


# ---------------------------------------------------------------------------
# b3.9 self join: consecutive event pairs per user (row_number alignment,
# then shifted equi-join — stays an equi-join, no inequality explosion).
# ---------------------------------------------------------------------------

@register(
    "join_self_consecutive",
    oracle="""
WITH numbered AS (
  SELECT user_id, event_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
)
SELECT a.user_id, a.event_id AS from_event, b.event_id AS to_event,
       a.event_type AS from_type, b.event_type AS to_type
FROM numbered a JOIN numbered b
  ON a.user_id = b.user_id AND a.rn + 1 = b.rn
ORDER BY a.user_id, from_event
""",
    tags=("b3.9",),
)
def join_self_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    numbered = ev.select("user_id", "event_id", "event_type", "ts",
                         F.row_number().over(w).alias("rn"))
    a = numbered.alias("a")
    b = numbered.alias("b")
    return (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
               & (F.col("a.rn") + 1 == F.col("b.rn")))
        .select(F.col("a.user_id").alias("user_id"),
                F.col("a.event_id").alias("from_event"),
                F.col("b.event_id").alias("to_event"),
                F.col("a.event_type").alias("from_type"),
                F.col("b.event_type").alias("to_type"))
        .orderBy("user_id", "from_event")
    )


# ---------------------------------------------------------------------------
# b3.10 as-of join: for each event, the user's most recent order with
# o_orderdate <= ts.  Implemented as union + single window pass — one
# shuffle, O(1) state per row — instead of an inequality join whose
# intermediate explodes quadratically at scale.  Deterministic under
# same-date order ties via the (ts, is_event, o_orderkey) sort.
# ---------------------------------------------------------------------------

def _asof_tagged(spark: SparkSession, sf_dir: str):
    """The shared as-of union+window scaffold (events ∪ orders tagged by
    is_event, last-order carry-forward per user) behind join_asof and
    join_asof_tolerance — r10 review: the two inline copies had already
    drifted on the o_orderdate timestamp cast.  Returns the tagged frame
    WITH asof_ts (the tolerance twin's extra carry; join_asof ignores
    it)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(1).alias("is_event"))
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        F.lit(0).alias("is_event"))
    w = (W.partitionBy("user_id")
         .orderBy("ts", "is_event", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        ev.unionByName(o)
        .withColumn("asof_orderkey",
                    F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("asof_ts",
                    F.last(F.when(F.col("is_event") == 0, F.col("ts")),
                           ignorenulls=True).over(w)))


@register(
    "join_asof",
    oracle="""
WITH unioned AS (
  SELECT user_id, ts, event_id, NULL::BIGINT AS o_orderkey, 1 AS is_event
  FROM events
  UNION ALL
  SELECT o_custkey AS user_id, o_orderdate AS ts, NULL::BIGINT AS event_id,
         o_orderkey, 0 AS is_event
  FROM orders
), tagged AS (
  SELECT user_id, ts, event_id, is_event,
         last_value(o_orderkey IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts, is_event, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
  FROM unioned
)
SELECT event_id, user_id, ts, asof_orderkey
FROM tagged WHERE is_event = 1
ORDER BY event_id
""",
    tags=("b3.10",),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _asof_tagged(spark, sf_dir)
        .filter(F.col("is_event") == 1)
        # no final presentational sort: the result SET is the contract —
        # the driver's oracle hash is row-canonicalized (56 order-free
        # registered queries have matched ORDER BY oracles since r1) and a
        # global sort of a row-per-input output costs a rangepartitioning
        # exchange + a sampling pass of the whole result (guide §2.4:
        # "an orderBy used only to make output deterministic")
        .select("event_id", "user_id", "ts", "asof_orderkey")
    )


# ---------------------------------------------------------------------------
# b3.11 parent↔child re-nest (reference A2/A11 parity).  The reference
# rebuilds each parent document with one SELECT per child type per parent
# (DatabaseManager.java:336-341, N+1); here it is ONE shuffle join + one
# aggregation producing nested rows.  Nested output → rows-only check.
# ---------------------------------------------------------------------------

@register(
    "join_renest_documents",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
       coalesce(CAST(to_json(n.lines) AS VARCHAR), '[]') AS lines
FROM orders o LEFT JOIN (
  SELECT l_orderkey,
         list(struct_pack(
                ln := l_linenumber, pk := l_partkey,
                qty_c := CAST(round(l_quantity * 100) AS BIGINT),
                price_c := CAST(round(l_extendedprice * 100) AS BIGINT),
                disc_c := CAST(round(l_discount * 100) AS BIGINT))
              ORDER BY l_linenumber, l_partkey, l_quantity,
                       l_extendedprice, l_discount) AS lines
  FROM lineitem GROUP BY l_orderkey
) n ON o.o_orderkey = n.l_orderkey
ORDER BY o_orderkey
""",
    tags=("b3.11", "A2", "A11"),
)
def join_renest_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Nested array-of-struct output is rendered to a canonical JSON string so
    # the driver's value hasher (which cannot hash lists) still gets the full
    # nested payload.  Decimal fields go through exact integer cents — Spark
    # and DuckDB disagree on double→JSON rendering (1.0E9 vs 1000000000.0)
    # but agree bit-for-bit on integers.  The struct sort compares all five
    # fields (cents scaling is monotone, so the oracle can order by the raw
    # values), making the array order deterministic on both engines.
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def _cents(col: str):
        # repo-wide cents idiom (round, not a truncating decimal cast —
        # r10 review: Spark's decimal->bigint cast truncates while
        # DuckDB's rounds, diverging on any 3rd/4th-decimal value)
        return F.round(F.col(col) * 100).cast("bigint")

    line_struct = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.col("l_partkey").alias("pk"),
        _cents("l_quantity").alias("qty_c"),
        _cents("l_extendedprice").alias("price_c"),
        _cents("l_discount").alias("disc_c"),
    )
    nested = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list(line_struct)).alias("lines"))
    )
    return (
        o.join(nested, o.o_orderkey == nested.l_orderkey, "left")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                F.coalesce(F.to_json("lines"), F.lit("[]")).alias("lines"))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# b3.12 broadcast nested-loop join on pure inequality (no equi key):
# parts against literal price bands.
# ---------------------------------------------------------------------------

_PRICE_BANDS = [("budget", 0.0, 500.0), ("mid", 500.0, 800.0),
                ("premium", 800.0, 1e9)]


@register(
    "join_bnlj_price_bands",
    oracle="""
WITH bands(band, lo, hi) AS (VALUES {values})
SELECT b.band, count(*) AS n_parts,
       CAST(round(sum(CAST(p.p_retailprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_price
FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band
ORDER BY b.band
""".format(values=", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)),
    tags=("b3.12",),
)
def join_bnlj_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_PRICE_BANDS, "band STRING, lo DOUBLE, hi DOUBLE")
    return (
        p.join(F.broadcast(bands),
               (p.p_retailprice >= F.col("lo")) & (p.p_retailprice < F.col("hi")))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_parts"),
             F.round(F.sum(dec("p_retailprice")), 2).cast("double").alias("total_price"))
        .orderBy("band")
    )


# b3.13 (r4 addendum) as-of join WITH TOLERANCE (pandas merge_asof's
# `tolerance=`, QuestDB ASOF JOIN ... TOLERANCE): each event takes the
# latest order at-or-before it ONLY if the gap is within 30 days, else
# NULL.  Same scale-safe union+window shape as join_asof (one shuffle on
# user_id, no inequality join), carrying the matched order's timestamp so
# the gap test is a pure projection afterwards.  Gap arithmetic is exact
# integer epoch-micros in both engines.
_ASOF_TOL_US = 30 * 86400 * 1_000_000  # 30 days in microseconds


@register(
    "join_asof_tolerance",
    oracle=f"""
WITH unioned AS (
  SELECT user_id, ts, event_id, NULL::BIGINT AS o_orderkey, 1 AS is_event
  FROM events
  UNION ALL
  SELECT o_custkey AS user_id, o_orderdate AS ts, NULL::BIGINT AS event_id,
         o_orderkey, 0 AS is_event
  FROM orders
), tagged AS (
  SELECT user_id, ts, event_id, is_event,
         last_value(o_orderkey IGNORE NULLS) OVER w AS asof_orderkey,
         last_value(CASE WHEN is_event = 0 THEN ts END IGNORE NULLS)
           OVER w AS asof_ts
  FROM unioned
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts, is_event, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts,
       CASE WHEN epoch_us(ts) - epoch_us(asof_ts) <= {_ASOF_TOL_US}
            THEN asof_orderkey END AS asof_orderkey_30d
FROM tagged WHERE is_event = 1
ORDER BY event_id
""",
    tags=("b3.13", "b3.10"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    tagged = _asof_tagged(spark, sf_dir)
    return (
        tagged.filter(F.col("is_event") == 1)
        .select("event_id", "user_id", "ts",
                F.when(F.unix_micros("ts") - F.unix_micros("asof_ts")
                       <= _ASOF_TOL_US,
                       F.col("asof_orderkey")).alias("asof_orderkey_30d"))
    )


# b3.14 (r4 addendum) big-big interval join via time binning.  Unlike
# join_range_theta (small side broadcast) this is the case with NO equi
# key and BOTH sides large — purchases falling inside ±1 h incident
# windows around error events — where the naive inequality join is a
# broadcast-nested-loop O(n·m) at scale.  The standard rewrite: bin time
# into fixed hour buckets, replicate each interval to the 2-3 buckets it
# overlaps (bounded fan-out = ceil(len/bucket)+1), tag each point with its
# single bucket, EQUI-join on the bucket, then apply the exact range
# predicate as a residual filter.  A point lives in exactly one bucket, so
# no pair dedup is needed.  Plan-asserted equi-join (no BNLJ/cartesian) in
# tests/test_plans.py.
@register(
    "join_interval_binned",
    oracle="""
SELECT e.event_id AS incident_id, p.event_id AS purchase_id
FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
JOIN (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.ts >= e.ts - INTERVAL 1 HOUR AND p.ts < e.ts + INTERVAL 1 HOUR
ORDER BY incident_id, purchase_id
""",
    tags=("b3.14", "b3.8"),
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"))
    # replicate each window to every hour bucket it overlaps (here 2-3)
    binned = err.select(
        "incident_id", "w_start", "w_end",
        F.explode(F.sequence(F.date_trunc("hour", "w_start"),
                             F.date_trunc("hour", "w_end"),
                             F.expr("INTERVAL 1 HOUR"))).alias("b"))
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts"),
        F.date_trunc("hour", "ts").alias("b"))
    return (
        binned.join(pur, "b")
        .filter((F.col("pts") >= F.col("w_start"))
                & (F.col("pts") < F.col("w_end")))
        .select("incident_id", "purchase_id")
    )


# ---------------------------------------------------------------------------
# r6.12 (b3.16) — NULL-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the
# join form where NULL keys MATCH each other instead of vanishing — what
# dimension lookups over dirty keys actually need (a plain equi-join
# silently drops every NULL-keyed fact row; the null-safe form routes them
# to the NULL bucket).  Spark plans eqNullSafe as a hash join on a
# null-wrapped key, so it shuffles exactly like the plain form — no BNLJ
# regression.  Nulls are introduced deterministically (c_custkey % 13)
# and the right side is the per-segment count table, so the NULL group's
# membership is itself part of the checked result.
# ---------------------------------------------------------------------------


@register(
    "join_null_safe",
    oracle="""
WITH c AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_mktsegment END AS seg
  FROM customer WHERE c_custkey < 500
), g AS (
  SELECT seg, count(*) AS group_size FROM c GROUP BY seg
)
SELECT c.c_custkey, c.seg, CAST(g.group_size AS BIGINT) AS group_size
FROM c JOIN g ON c.seg IS NOT DISTINCT FROM g.seg
ORDER BY c.c_custkey
""",
    tags=("r6.12", "b3.16"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_custkey") < 500)
         .select("c_custkey",
                 F.when(F.col("c_custkey") % 13 == 0, F.lit(None))
                  .otherwise(F.col("c_mktsegment")).alias("seg")))
    g = (c.groupBy("seg").agg(F.count(F.lit(1)).cast("bigint")
                              .alias("group_size"))
         .select(F.col("seg").alias("g_seg"), "group_size"))
    return (
        c.join(g, c["seg"].eqNullSafe(g["g_seg"]))
        .select("c_custkey", "seg", "group_size")
        .orderBy("c_custkey")
    )
