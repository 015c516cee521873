"""Aggregation operators (SURVEY.md §2 B4).

The reference has no aggregation at all — it shreds JSON into SQLite so the
SQL layer can aggregate (reference README.md:2).  These are the bulk-agg
capabilities that layer must expose, expressed as declarative Spark plans so
Catalyst emits partial (map-side) aggregation before the shuffle and
whole-stage codegen for the agg loops.

Float determinism: all sums/avgs follow the exact-decimal conventions in
``functions/exact.py`` — results are bit-identical to the DuckDB oracle and
invariant under partitioning, which is what makes them stable from local[4]
to a 1000-executor cluster.

Scale notes: every groupBy here shuffles only the grouped keys + partial agg
buffers (bytes per group, not per row).  Group-key cardinality is bounded
(flags, statuses, dates), so these scale to 100 TB without skew concerns;
high-cardinality groupBys (per-customer) ride AQE partition coalescing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import cents, davg, dec, dec_factor, dsum, dsum_expr
from ..registry import register
from ..sources import load_table

# ---------------------------------------------------------------------------
# b4.1 flagship — TPC-H Q1 shape: scan + filter + computed projection +
# hash agg (8 aggregates) + sort.  Also the driver's entry() smoke query.
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE)      AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
              * CAST(1 - l_discount AS DECIMAL(6,4))), 2) AS DOUBLE)    AS sum_disc_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))
              * CAST(1 - l_discount AS DECIMAL(6,4))
              * CAST(1 + l_tax AS DECIMAL(6,4))), 2) AS DOUBLE)         AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / count(*)      AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / count(*)      AS avg_disc,
  count(*)                                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE, tags=("b4.1", "flagship"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * dec_factor(1 - F.col("l_discount"))
    charge = disc_price * dec_factor(1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr(disc_price).alias("sum_disc_price"),
            dsum_expr(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# b4.2 global (no-group) aggregation
# ---------------------------------------------------------------------------

@register(
    "agg_global",
    oracle="""
SELECT
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_price,
  CAST(sum(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / count(*)     AS mean_discount,
  min(l_quantity)                                                       AS min_qty,
  max(l_quantity)                                                       AS max_qty,
  count(*)                                                              AS n_rows
FROM lineitem
""",
    tags=("b4.2",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        dsum("l_extendedprice").alias("total_price"),
        davg("l_discount").alias("mean_discount"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# b4.3 count distinct (exact).  Spark plans this as expand + two-phase agg;
# at scale prefer approx_count_distinct (b4.4) when tolerance allows.
# ---------------------------------------------------------------------------

@register(
    "agg_count_distinct",
    oracle="""
SELECT
  o_orderstatus,
  count(DISTINCT o_custkey)       AS n_customers,
  count(DISTINCT o_orderpriority) AS n_priorities,
  count(*)                        AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("b4.3",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# b4.4 approximate count distinct (HLL++).  The sketch estimate itself is not
# oracle-hashable (different sketch implementations), so the registered output
# is the derived invariant: the exact distinct counts (hash-checked against
# DuckDB) plus a 0/1 flag that the HLL++ estimate landed within 3× the
# configured rsd (0.02 → 6% band; HLL++ error is approximately normal with
# sd=rsd, so 3σ holds deterministically for a fixed dataset — verified at
# sf0.001/0.01/0.1).  The raw estimate stays covered by tests/test_oracle
# rows-only smoke + a tolerance assert in tests.
# ---------------------------------------------------------------------------

@register(
    "agg_approx_count_distinct",
    oracle="""
SELECT CAST(count(DISTINCT user_id) AS BIGINT)  AS exact_users,
       CAST(count(DISTINCT event_id) AS BIGINT) AS exact_events,
       CAST(1 AS BIGINT) AS users_within_6pct,
       CAST(1 AS BIGINT) AS events_within_6pct
FROM events
""",
    tags=("b4.4",),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    within = lambda approx, exact: (
        (F.abs(approx - exact) <= 0.06 * exact).cast("bigint"))
    agg = ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.approx_count_distinct("event_id", 0.02).alias("approx_events"),
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct("event_id").alias("exact_events"),
    )
    return agg.select(
        "exact_users", "exact_events",
        within(F.col("approx_users"), F.col("exact_users"))
            .alias("users_within_6pct"),
        within(F.col("approx_events"), F.col("exact_events"))
            .alias("events_within_6pct"),
    )


# ---------------------------------------------------------------------------
# b4.5 rollup (GROUPING SETS family)
# ---------------------------------------------------------------------------

@register(
    "agg_rollup",
    oracle="""
SELECT
  coalesce(o_orderstatus, 'ALL')   AS status,
  coalesce(o_orderpriority, 'ALL') AS priority,
  count(*)                         AS n,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
    tags=("b4.5",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("o_totalprice").alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n", "total",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# b4.5 cube
# ---------------------------------------------------------------------------

@register(
    "agg_cube",
    oracle="""
SELECT
  coalesce(l_returnflag, 'ALL') AS returnflag,
  coalesce(l_linestatus, 'ALL') AS linestatus,
  count(*)                      AS n,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
    tags=("b4.5",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("l_quantity").alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n", "qty",
        )
        .orderBy("returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# b4.6 HAVING — post-aggregation filter on the exact decimal sum, so the
# predicate boundary can't flap between engines.
# ---------------------------------------------------------------------------

@register(
    "agg_having",
    oracle="""
SELECT o_custkey,
       CAST(round(spend_dec, 2) AS DOUBLE) AS spend,
       n_orders
FROM (
  SELECT o_custkey,
         sum(CAST(o_totalprice AS DECIMAL(12,4))) AS spend_dec,
         count(*) AS n_orders
  FROM orders
  GROUP BY o_custkey
)
WHERE spend_dec > 400000
ORDER BY o_custkey
""",
    tags=("b4.6",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("spend_dec"),
             F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("spend_dec") > 400000)
        .select("o_custkey",
                F.round("spend_dec", 2).cast("double").alias("spend"),
                "n_orders")
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# b4.7 stddev / variance — computed from exact decimal sums so both engines
# evaluate the identical double expression (sum-of-squares formulation);
# built-in stddev_samp over doubles is summation-order-dependent and cannot
# hash-match across engines.
# ---------------------------------------------------------------------------

@register(
    "agg_stats",
    oracle="""
SELECT
  l_returnflag,
  sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0)) AS qty_stddev,
  (sxx - sx * sx / n) / (n - 1)       AS qty_var,
  sqrt(greatest((dxx - dx * dx / n) / n, 0))       AS disc_stddev_pop,
  (dxx - dx * dx / n) / n             AS disc_var_pop
FROM (
  SELECT
    l_returnflag,
    count(*) AS n,
    CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE)  AS sx,
    CAST(sum(CAST(l_quantity AS DECIMAL(12,4))
           * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE)  AS sxx,
    CAST(sum(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE)  AS dx,
    CAST(sum(CAST(l_discount AS DECIMAL(12,4))
           * CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE)  AS dxx
  FROM lineitem
  GROUP BY l_returnflag
)
ORDER BY l_returnflag
""",
    tags=("b4.7",),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("l_quantity")).cast("double").alias("sx"),
            F.sum(dec("l_quantity") * dec("l_quantity")).cast("double").alias("sxx"),
            F.sum(dec("l_discount")).cast("double").alias("dx"),
            F.sum(dec("l_discount") * dec("l_discount")).cast("double").alias("dxx"),
        )
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    dx, dxx = F.col("dx"), F.col("dxx")
    # try_divide on the (n-1) sample denominators: a single-row group
    # (first incremental batch, filtered partition) must yield NULL like
    # the oracle's x/0, not an ANSI DIVIDE_BY_ZERO abort (r10 review)
    return (
        base.select(
            "l_returnflag",
            # greatest(…, 0) under the sqrt: floating rounding can
            # push a true-zero variance a hair negative — Spark's
            # sqrt(-eps) is NaN but DuckDB's ERRORS, so both sides clamp
            F.sqrt(F.greatest(F.try_divide(sxx - sx * sx / n, n - 1),
                              F.lit(0.0))).alias("qty_stddev"),
            F.try_divide(sxx - sx * sx / n, n - 1).alias("qty_var"),
            F.sqrt(F.greatest((dxx - dx * dx / n) / n, F.lit(0.0)))
            .alias("disc_stddev_pop"),
            ((dxx - dx * dx / n) / n).alias("disc_var_pop"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# b4.8 exact median + percentiles over cents-snapped integers: order
# statistics and interpolation then operate on exact integer doubles, which
# both engines interpolate identically (FIXTURES.md §3 determinism rules).
# ---------------------------------------------------------------------------

@register(
    "agg_median_percentile",
    oracle="""
SELECT
  o_orderstatus,
  median(floor(o_totalprice * 10000 + 0.5)) / 10000               AS med_price,
  quantile_cont(floor(o_totalprice * 10000 + 0.5), 0.25) / 10000  AS p25,
  quantile_cont(floor(o_totalprice * 10000 + 0.5), 0.90) / 10000  AS p90
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("b4.8",),
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    # ONE percentile buffer for all three points: median() is exactly
    # Percentile(0.5), so the array form computes the identical values
    # while maintaining one value-count map per group instead of three
    # (guide §1.2 per-task work — 3× the agg state and sort collapsed)
    pct = F.percentile(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.90)))
    return (
        o.groupBy("o_orderstatus")
        .agg(pct.alias("_pct"))
        .select(
            "o_orderstatus",
            (F.col("_pct")[1] / 10000).alias("med_price"),
            (F.col("_pct")[0] / 10000).alias("p25"),
            (F.col("_pct")[2] / 10000).alias("p90"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# b4.9 collect_list / collect_set — array_sort for deterministic comparison.
# Reassembly building block: the reference's child-array reconstruction
# (DatabaseManager.java:327-348) is collect_list(struct) in this engine.
# ---------------------------------------------------------------------------

@register(
    "agg_collect",
    oracle="""
SELECT
  l_orderkey,
  CAST(to_json(list_sort(list(l_linenumber))) AS VARCHAR)          AS linenumbers,
  CAST(to_json(list_sort(list(DISTINCT l_returnflag))) AS VARCHAR) AS flags
FROM lineitem
WHERE l_orderkey <= 100
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
    tags=("b4.9",),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array outputs are rendered to canonical JSON strings (identical compact
    # form in Spark and DuckDB for int/string arrays) so the driver's value
    # hasher can hash them; the array semantics stay covered as real arrays
    # in tests/test_operators.py.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 100)
        .groupBy("l_orderkey")
        .agg(
            F.to_json(F.array_sort(F.collect_list("l_linenumber")))
             .alias("linenumbers"),
            F.to_json(F.array_sort(F.collect_set("l_returnflag")))
             .alias("flags"),
        )
        .orderBy("l_orderkey")
    )


# ---------------------------------------------------------------------------
# b4.10 min_by / max_by (argmin/argmax) — latest event per user.
# Determinism: event ts is globally unique in the generated data (verified at
# sf0.001/0.01/0.1), so a plain ts ordering key has no ties.
# ---------------------------------------------------------------------------

@register(
    "agg_min_by_max_by",
    oracle="""
SELECT
  user_id,
  arg_max(event_type, ts) AS last_type,
  arg_min(event_type, ts) AS first_type,
  count(*)                AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    tags=("b4.10",),
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_type", F.col("ts")).alias("last_type"),
            F.min_by("event_type", F.col("ts")).alias("first_type"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# b4.11 conditional aggregation — sum(when(...)) ≡ SQL FILTER clause.
# ---------------------------------------------------------------------------

@register(
    "agg_conditional",
    oracle="""
SELECT
  o_orderpriority,
  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,4)))
             FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE) AS finished_total
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("b4.11",),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
            F.round(F.sum(F.when(F.col("o_orderstatus") == "F",
                                 dec("o_totalprice"))), 2)
             .cast("double").alias("finished_total"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# b4.12 pivot — event counts by type × weekday.  Pivot values are listed
# explicitly (no extra distinct-collect job); oracle rewrites as conditional
# aggregation, the same plan Spark generates.
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("signup", "purchase", "error", "click", "view")


@register(
    "agg_pivot",
    oracle="""
SELECT
  CAST(date_part('dow', ts) AS INTEGER) AS dow,
  count(*) FILTER (WHERE event_type = 'signup')   AS signup,
  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  count(*) FILTER (WHERE event_type = 'error')    AS error,
  count(*) FILTER (WHERE event_type = 'click')    AS click,
  count(*) FILTER (WHERE event_type = 'view')     AS view
FROM events
GROUP BY 1
ORDER BY dow
""",
    tags=("b4.12",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("dow", (F.dayofweek("ts") - F.lit(1)).cast("int"))
        .groupBy("dow")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# b4.8b approximate percentiles (t-digest class) with a derived-invariant
# oracle (same pattern as agg_approx_count_distinct): Spark's
# approx_percentile sketch is engine-specific, so the registered output is
# the exact percentile (hash-checked) plus a flag that the approximation
# stayed within the rank-error band.  accuracy=10000 → rank error <= 1e-4;
# the flag checks the VALUE sits within the exact p±1% rank window — loose
# enough to be deterministic, tight enough to catch a broken sketch.
# ---------------------------------------------------------------------------

@register(
    "agg_approx_percentile",
    oracle="""
SELECT
  o_orderstatus,
  quantile_cont(floor(o_totalprice * 10000 + 0.5), 0.50) / 10000 AS p50_exact,
  quantile_cont(floor(o_totalprice * 10000 + 0.5), 0.95) / 10000 AS p95_exact,
  CAST(1 AS BIGINT) AS p50_in_band,
  CAST(1 AS BIGINT) AS p95_in_band
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("b4.8", "b4.4"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    in_band = lambda approx, lo, hi: ((approx >= lo) & (approx <= hi)) \
        .cast("bigint")
    agg = o.groupBy("o_orderstatus").agg(
        (F.percentile(c, F.lit(0.50)) / 10000).alias("p50_exact"),
        (F.percentile(c, F.lit(0.95)) / 10000).alias("p95_exact"),
        (F.percentile_approx(c, F.lit(0.50), F.lit(10000)) / 10000)
            .alias("p50_approx"),
        (F.percentile_approx(c, F.lit(0.95), F.lit(10000)) / 10000)
            .alias("p95_approx"),
        (F.percentile(c, F.lit(0.49)) / 10000).alias("p50_lo"),
        (F.percentile(c, F.lit(0.51)) / 10000).alias("p50_hi"),
        (F.percentile(c, F.lit(0.94)) / 10000).alias("p95_lo"),
        (F.percentile(c, F.lit(0.96)) / 10000).alias("p95_hi"),
    )
    return (
        agg.select(
            "o_orderstatus", "p50_exact", "p95_exact",
            in_band(F.col("p50_approx"), F.col("p50_lo"), F.col("p50_hi"))
                .alias("p50_in_band"),
            in_band(F.col("p95_approx"), F.col("p95_lo"), F.col("p95_hi"))
                .alias("p95_in_band"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# b4 addendum: table profiling — the stats-collection pass every pipeline
# runs before/after a big write (null rates, distinct counts, ranges).  One
# scan, all aggregates map-side-combinable; the exact-decimal sum keeps the
# double column hashable.
# ---------------------------------------------------------------------------

@register(
    "agg_profile_table",
    oracle="""
SELECT
  count(*)                                         AS n_rows,
  CAST(count(o_custkey) AS BIGINT)                 AS custkey_nonnull,
  CAST(count(DISTINCT o_custkey) AS BIGINT)        AS custkey_distinct,
  CAST(count(DISTINCT o_orderstatus) AS BIGINT)    AS status_distinct,
  min(o_orderdate)                                 AS first_order,
  max(o_orderdate)                                 AS last_order,
  CAST(min(o_totalprice) AS DOUBLE)                AS price_min,
  CAST(max(o_totalprice) AS DOUBLE)                AS price_max,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,4))), 2) AS DOUBLE)
                                                   AS price_sum
FROM orders
""",
    tags=("b4.2",),
)
def agg_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").cast("bigint").alias("custkey_nonnull"),
        F.countDistinct("o_custkey").cast("bigint").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("status_distinct"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.min("o_totalprice").cast("double").alias("price_min"),
        F.max("o_totalprice").cast("double").alias("price_max"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,4)")), 2)
            .cast("double").alias("price_sum"),
    )


# ---------------------------------------------------------------------------
# b4.12b unpivot/melt — the inverse reshape of agg_pivot: wide metric
# columns to (metric, value) rows.  Spark's unpivot is a zero-shuffle
# row-expansion (like explode); the oracle uses the portable UNION ALL form.
# ---------------------------------------------------------------------------

@register(
    "agg_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, value FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
         CAST(l_quantity AS DOUBLE) AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice',
         CAST(l_extendedprice AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount',
         CAST(l_discount AS DOUBLE) FROM lineitem
)
WHERE l_orderkey <= 200
ORDER BY l_orderkey, l_linenumber, metric
""",
    tags=("b4.12",),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return (
        li.select("l_orderkey", "l_linenumber",
                  F.col("l_quantity").alias("quantity"),
                  F.col("l_extendedprice").alias("extendedprice"),
                  F.col("l_discount").alias("discount"))
        .unpivot(["l_orderkey", "l_linenumber"],
                 ["quantity", "extendedprice", "discount"],
                 "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


# b4.14 (r4 addendum) mergeable HLL sketch rollup — THE 100-TB distinct-
# count primitive: per-shard sketches (here per nation) are tiny fixed-size
# binaries that merge associatively to any coarser grain (region) without
# re-touching the data, which is what makes distinct-count rollups,
# incremental refresh, and cross-partition unions O(shards), not O(rows).
# Spark's hll_sketch_agg / hll_union_agg / hll_sketch_estimate (Apache
# DataSketches) are deterministic for a given input multiset, but DuckDB
# estimates with a different sketch — so the driver-checkable contract is
# the accuracy bound, not the estimate: the oracle computes the EXACT
# distinct count and asserts the merged-sketch estimate lands within 5%
# (lgConfigK=12 → σ ≈ 1.6%, 5% ≈ 3σ).  A local pytest pins the estimates
# themselves.
@register(
    "agg_hll_sketch_rollup",
    oracle="""
SELECT n.n_regionkey AS r_key,
       count(DISTINCT o.o_custkey) AS n_exact,
       CAST(1 AS BIGINT) AS est_within_5pct
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_regionkey
ORDER BY r_key
""",
    tags=("b4.14",),
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    keyed = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    # stage 1: one sketch per nation (the per-shard build).  Note the
    # sketch is the ONLY distinct-tracking state carried forward: exact
    # per-nation distincts could not be summed to region anyway (a customer
    # appearing under two nations would double-count), which is precisely
    # why the mergeable sketch exists.
    per_nation = keyed.groupBy("n_nationkey", "n_regionkey").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"))
    # stage 2: merge nation sketches up to region — no row re-scan
    per_region = per_nation.groupBy(F.col("n_regionkey").alias("r_key")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    exact = keyed.groupBy(F.col("n_regionkey").alias("r_key")).agg(
        F.countDistinct("o_custkey").alias("n_exact"))
    return (
        exact.join(per_region, "r_key")
        .select("r_key", "n_exact",
                (F.abs(F.col("est") - F.col("n_exact"))
                 <= 0.05 * F.col("n_exact")).cast("bigint")
                .alias("est_within_5pct"))
        .orderBy("r_key")
    )


# b4.15 (r4 addendum) incremental aggregate refresh: the O(delta)
# materialized-view maintenance pattern — yesterday's finalized partial
# aggregate merges with today's delta partial by RE-AGGREGATING the
# partials (sum of counts, sum of sums), never re-scanning the base.  At
# 100 TB the base partial is thousands of rows per grain while the base
# data is the 100 TB; correctness rests on the aggregates being
# associative/commutative, which the oracle (one full-scan aggregate over
# everything) proves.  Money in integer cents (functions/exact.py).
@register(
    "agg_incremental_refresh",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("b4.15",),
)
def agg_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    split = "1996-01-01"  # base = history before, delta = arrivals since

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"))

    base = partial(o.filter(F.col("o_orderdate") < split))
    delta = partial(o.filter(F.col("o_orderdate") >= split))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("n_orders").alias("n_orders"),
             F.sum("total_cents").cast("bigint").alias("total_cents"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# b4.16 (r5 addendum) mergeable QUANTILE sketch rollup — the order-statistics
# sibling of agg_hll_sketch_rollup.  Per-nation equi-depth summaries (B
# quantile points + a row count) merge up to region as weighted points; the
# region median comes from the merged summary WITHOUT re-scanning raw rows.
# At 100 TB the per-shard summary is B rows while the shard is terabytes —
# exact medians cannot be combined across shards at all (the median of
# medians is not the median), which is precisely why the mergeable summary
# exists.
#
# Accuracy contract (same shape as the HLL rollup): each nation's equi-depth
# discretization carries rank error ≤ n_p/B, so the merged estimate's TRUE
# rank within its region is within ~N/B of N/2; the query verifies that
# exactly — one broadcast join of the 5 region estimates back to the fact
# rows, one map-side-combinable conditional count — and emits the flag.
# The oracle pins the contract (flag must be 1) plus the exact per-region
# row counts; the estimate itself is sketch-specific so it stays out of the
# compared columns (pinned in pytest instead, tests/test_event_ops.py).
# ---------------------------------------------------------------------------

_QSK_B = 64  # points per per-nation summary


@register(
    "agg_quantile_sketch_rollup",
    oracle="""
SELECT n.n_regionkey AS r_key,
       count(*) AS n_rows,
       CAST(1 AS BIGINT) AS est_within_rank_eps
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_regionkey
ORDER BY r_key
""",
    tags=("b4.16",),
)
def agg_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    keyed = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .select(F.col("n_nationkey").alias("nk"),
                     F.col("n_regionkey").alias("r_key"),
                     F.col("o_totalprice").alias("v")))
    probs = [i / _QSK_B for i in range(1, _QSK_B + 1)]
    # stage 1: per-nation summary — B near-exact equi-depth points (GK with
    # tight accuracy; deterministic) + the shard row count.  This is the
    # ONLY state carried forward per shard.
    per_nation = keyed.groupBy("nk", "r_key").agg(
        F.percentile_approx("v", probs, 100_000).alias("qs"),
        F.count(F.lit(1)).alias("n_p"))
    # stage 2: merge to region — each point represents n_p/B rows of its
    # nation; the region median estimate is the first point whose running
    # merged weight reaches half the region total.  |points| = B × nations
    # per region (a few hundred rows total at ANY data scale).
    points = per_nation.select(
        "r_key", F.explode("qs").alias("pv"),
        (F.col("n_p") / F.lit(float(_QSK_B))).alias("w"))
    cum = points.withColumn(
        "cw", F.sum("w").over(
            W.partitionBy("r_key").orderBy("pv", "w")
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
    # region totals from per_nation's carried shard counts — a few-dozen
    # row rollup, NOT a third scan+join of the fact table (r10 review)
    totals = per_nation.groupBy("r_key").agg(
        F.sum("n_p").alias("n_rows"))
    est = (cum.join(F.broadcast(totals), "r_key")
           .filter(F.col("cw") >= F.col("n_rows") / 2.0)
           .groupBy("r_key").agg(F.min("pv").alias("est")))
    # verification: exact rank of the estimate via one broadcast join of the
    # 5-row estimate table back to the fact rows + a conditional count.
    # Rank tolerance 3N/B: N/B merge discretization + one point's weight of
    # pick slack + GK's own eps·n_p, rounded up generously.
    ranked = (keyed.join(F.broadcast(est), "r_key")
              .groupBy("r_key")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum((F.col("v") <= F.col("est")).cast("bigint"))
                    .alias("rank_le")))
    return (
        ranked.select(
            "r_key", "n_rows",
            (F.abs(F.col("rank_le") - F.col("n_rows") / 2.0)
             <= 3.0 * F.col("n_rows") / _QSK_B).cast("bigint")
            .alias("est_within_rank_eps"))
        .orderBy("r_key")
    )
