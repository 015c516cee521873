"""Window-function operators (SURVEY.md §2 B5).

Window functions need one shuffle on the partition key, then sorted
evaluation inside each partition — no N+1, no self-joins.  Running/moving
aggregates over doubles are computed on exact decimals (functions/exact.py)
because windowed summation association differs between engines (Spark
accumulates, DuckDB may use segment trees); decimal arithmetic is
associative so both produce identical values.

Determinism: every ORDER BY inside a window uses a tie-free composite
(dates are day-granular, so (date, key) not date alone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..registry import register
from ..sources import load_table


# b5.1 ranking family
@register(
    "window_ranking",
    oracle="""
SELECT
  o_custkey, o_orderkey,
  row_number() OVER w AS rn,
  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)       AS prio_rank,
  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_dense_rank,
  ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
    tags=("b5.1",),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        o.select(
            "o_custkey", "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(wp).alias("prio_rank"),
            F.dense_rank().over(wp).alias("prio_dense_rank"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# b5.2 lag / lead over event streams
@register(
    "window_lag_lead",
    oracle="""
SELECT
  user_id, event_id, event_type,
  lag(event_type) OVER w            AS prev_type,
  lead(event_type) OVER w           AS next_type,
  lag(event_type, 2, 'NONE') OVER w AS prev2_type,
  CAST(date_diff('microsecond', lag(ts) OVER w, ts) AS BIGINT) AS us_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
ORDER BY user_id, event_id
""",
    tags=("b5.2",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    return (
        ev.select(
            "user_id", "event_id", "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.lag("event_type", 2, "NONE").over(w).alias("prev2_type"),
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            .alias("us_since_prev"),
        )
        .orderBy("user_id", "event_id")
    )


# b5.3 running total (rows frame, exact decimal accumulation)
@register(
    "window_running_total",
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
    tags=("b5.3",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (unpartitioned) running total — the SURVEY-mandated b5.3
    semantics; Spark plans a SinglePartition WindowExec, so input must be
    bounded (here: one customer slice).  At scale use the oracle-identical
    two-pass form `scale_running_total` (operators/scale.py), which
    range-buckets, windows per bucket, and broadcasts per-bucket offsets —
    no single-partition exchange (asserted in tests/test_plans.py)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (W.orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        o.select(
            "o_orderkey", "o_orderdate",
            F.round(F.sum(dec("o_totalprice")).over(w), 2)
             .cast("double").alias("running_total"),
            F.row_number().over(W.orderBy("o_orderdate", "o_orderkey")).alias("seq"),
        )
        .orderBy("seq")
    )


# b5.4 moving average over a time-range frame (10 minutes preceding).
# Range key = epoch seconds (integer) so both engines bound the frame
# identically; the mean is exact-decimal-sum / count.
@register(
    "window_moving_avg",
    oracle="""
SELECT
  user_id, event_id, sec,
  CAST(sum(CAST(value AS DECIMAL(12,4))) OVER w AS DOUBLE) / count(*) OVER w AS moving_avg,
  count(*) OVER w AS n_in_window
FROM (
  SELECT user_id, event_id, value, epoch_us(ts) // 1000000 AS sec
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
    tags=("b5.4",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "event_id", "value",
        (F.unix_micros("ts") / F.lit(1000000)).cast("long").alias("sec"))
    w = W.partitionBy("user_id").orderBy("sec").rangeBetween(-600, 0)
    return (
        base.select(
            "user_id", "event_id", "sec",
            (F.sum(dec("value")).over(w).cast("double")
             / F.count(F.lit(1)).over(w)).alias("moving_avg"),
            F.count(F.lit(1)).over(w).alias("n_in_window"),
        )
        .orderBy("user_id", "event_id")
    )


# b5.5 percent_rank / cume_dist (rank-based — deterministic under value ties)
@register(
    "window_percent_rank",
    oracle="""
SELECT
  c_custkey, c_acctbal,
  percent_rank() OVER (ORDER BY c_acctbal) AS pr,
  cume_dist() OVER (ORDER BY c_acctbal)    AS cd
FROM customer
ORDER BY c_custkey
""",
    tags=("b5.5",),
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank-based window — b5.5 semantics over a broadcastable
    dimension (customer).  For fact-scale input use the two-pass twin
    `scale_percent_rank` (operators/scale.py): per-bucket ranks + ≤32-row
    cumulative-count broadcast, no SinglePartition exchange."""
    c = load_table(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal")
    return (
        c.select(
            "c_custkey", "c_acctbal",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .orderBy("c_custkey")
    )


# b5.6 top-N per group: 3 most expensive orders per customer
@register(
    "window_top_n_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
WHERE rk <= 3
ORDER BY o_custkey, rk
""",
    tags=("b5.6",),
)
def window_top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice",
                 F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    )


# b5.7 first/last value over an explicit frame
@register(
    "window_first_last",
    oracle="""
SELECT
  user_id, event_id,
  first_value(event_type) OVER w AS session_first,
  last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS session_last,
  nth_value(event_type, 2) OVER w AS session_second
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY user_id, event_id
""",
    tags=("b5.7",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts")
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return (
        ev.select(
            "user_id", "event_id",
            F.first("event_type").over(w).alias("session_first"),
            F.last("event_type").over(w).alias("session_last"),
            F.nth_value("event_type", 2).over(w).alias("session_second"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# b5 addendum: time-series gap fill with forward fill (hypertable-rollup
# shape): per-user hourly grid from first to last event, hourly mean in
# exact-decimal cents, empty hours forward-filled from the last observed
# hour via last_value IGNORE NULLS over a PARTITIONED window.  The grid
# explode is per-user (embarrassingly parallel); nothing global.
# ---------------------------------------------------------------------------

@register(
    "window_gap_fill",
    oracle="""
WITH ev AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE user_id < 3
), hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         count(*) AS n_events,
         CAST(sum(cents) AS DOUBLE) / count(*) / 100.0 AS avg_value
  FROM ev GROUP BY user_id, date_trunc('hour', ts)
), bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
  FROM ev GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
  FROM bounds
)
SELECT g.user_id, g.h AS hour,
       coalesce(hy.n_events, 0) AS n_events,
       last_value(hy.avg_value IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.h
               ROWS UNBOUNDED PRECEDING) AS avg_value_ffill
FROM grid g LEFT JOIN hourly hy
  ON g.user_id = hy.user_id AND g.h = hy.h
ORDER BY g.user_id, g.h
""",
    tags=("b5.7", "b9.1"),
)
def window_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < 3)
          .select("user_id", "ts",
                  F.round(F.col("value") * 100).cast("bigint").alias("cents")))
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             (F.sum("cents").cast("double") / F.count(F.lit(1)) / 100.0)
             .alias("avg_value")))
    bounds = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("hour", F.min("ts")).alias("t0"),
             F.max("ts").alias("t1")))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR")))
         .alias("h"))
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id", F.col("h").alias("hour"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(
                W.partitionBy("user_id").orderBy("h")
                 .rowsBetween(W.unboundedPreceding, 0))
             .alias("avg_value_ffill"))
        .orderBy("user_id", "hour")
    )


# b5.8 (r4 addendum) ordered event funnel: per user, the strictly
# time-ordered chain view → click → purchase.  ONE real shuffle: a stack of
# whole-partition window minima over user_id (t2 references t1, t3
# references t2 — Catalyst plans them as consecutive Window operators over
# the same Exchange), then the per-user rows collapse to funnel-step
# counts.  The 100-TB shape: no self-joins over the event log (the
# compositional 3-join funnel re-shuffles the log per step), partials
# combine map-side, and the user_id partitioning is reused end-to-end.
def funnel_times(ev: DataFrame, steps: list[str], *,
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Generic strictly-ordered funnel: one row per user with columns
    t1..tN = earliest completion time of each step given the previous step
    completed strictly before it (null = never reached).  N dependent
    whole-partition window minima stack over a single user_col exchange
    regardless of step count — the registered 3-step query pins this shape
    and tests/test_event_ops.py drives a 4-step instance against a
    brute-force model."""
    w = W.partitionBy(user_col)
    per = ev
    prev: str | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"t{i + 1}"
        per = per.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
    cols = [f"t{i + 1}" for i in range(len(steps))]
    # rows within a user agree on t1..tN; collapse reuses the user_col
    # partitioning (no second exchange)
    return per.groupBy(user_col).agg(
        *[F.first(c).alias(c) for c in cols])



@register(
    "window_funnel_steps",
    oracle="""
WITH t1 AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
  FROM events GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
  GROUP BY e.user_id
)
SELECT count(t1.t1)  AS n_view,
       count(t2.t2)  AS n_view_click,
       count(t3.t3)  AS n_full_funnel,
       CAST(count(t2.t2) AS DOUBLE) / count(t1.t1) AS click_rate,
       CAST(count(t3.t3) AS DOUBLE) / count(t2.t2) AS purchase_rate
FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        LEFT JOIN t3 ON t1.user_id = t3.user_id
""",
    tags=("b5.8",),
)
def window_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = funnel_times(ev, ["view", "click", "purchase"])
    # try_divide: a step with zero completions (no clicks in the slice)
    # must yield a NULL rate like the oracle's x/0, not an ANSI
    # DIVIDE_BY_ZERO abort (Spark 4 ANSI throws even for double/long —
    # r10 review, reproduced)
    return per_user.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full_funnel"),
        F.try_divide(F.count("t2").cast("double"),
                     F.count("t1")).alias("click_rate"),
        F.try_divide(F.count("t3").cast("double"),
                     F.count("t2")).alias("purchase_rate"),
    )


# ---------------------------------------------------------------------------
# r6.11 (b5.9) — RANGE interval frame: a trailing 30-DAY revenue window per
# customer.  Distinct semantics from every ROWS frame above: the frame is
# VALUE-bounded (all rows whose order date falls in [current − 30 days,
# current]), so ties share a frame and gaps shrink it — the moving metric
# a time series actually wants.  Spark expresses interval frames as
# rangeBetween over an epoch-seconds ordering column; the oracle uses the
# native RANGE BETWEEN INTERVAL form — same frame membership, and the
# framed sums are exact BIGINT cents, so results hash-match.
# Scale: one hash exchange on the partition key like every b5 window; the
# frame evaluation is a per-partition sliding two-pointer, O(rows).
# ---------------------------------------------------------------------------

_RANGE_DAYS = 30


@register(
    "window_range_interval_frame",
    oracle=f"""
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL {_RANGE_DAYS} DAYS PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cents_trailing
FROM orders
WHERE o_custkey < 200
ORDER BY o_custkey, o_orderdate, o_orderkey
""",
    tags=("r6.11", "b5.9"),
)
def window_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") < 200)
         .select("o_orderkey", "o_custkey", "o_orderdate",
                 F.round(F.col("o_totalprice") * 100).cast("bigint")
                  .alias("cents")))
    # NTZ has no direct long cast; the session is pinned UTC, so
    # NTZ → timestamp → epoch-seconds is the identity wall-clock mapping
    w = (W.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
         .rangeBetween(-_RANGE_DAYS * 86400, 0))
    return (
        o.select("o_orderkey", "o_custkey", "o_orderdate",
                 F.sum("cents").over(w).cast("bigint")
                  .alias("cents_trailing"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )
