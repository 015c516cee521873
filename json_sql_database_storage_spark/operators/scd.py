"""Slowly-changing-dimension type 2 (SCD2) versioning — the CDC/merge
pattern every warehouse dimension table needs and plain parquet lacks a
MERGE INTO for: applying a change batch closes the current version of each
changed key (valid_to stamped) and opens a new open-ended version, while
unchanged keys pass through untouched.

Reference parity: the reference's only mutation is a row-level
INSERT-or-UPDATE keyed on rowNum (DatabaseManager.java:211-229) — update in
place, history lost.  SCD2 is the history-preserving refinement of that
same upsert, expressed with the anti-join + union shape `doc_upsert`
already uses, plus version interval columns.

Scale design: one equi-join of the dimension against the (comparatively
tiny, broadcastable) change batch plus one union — no windows over the
whole dimension, no global state.  At 100 TB the dimension is partitioned
by key range and the change batch broadcasts; the rewrite touches only
files containing changed keys when the table format supports file-level
pruning (the b1.14/b1.15 layouts).

The change batch here is synthesized DETERMINISTICALLY from the customer
table (keys ≡ 0 mod 7 move market segment; keys ≡ 3 mod 11 get an account
credit) with the identical expressions in the DuckDB oracle, so the full
versioned output hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

_BATCH_TS = 1  # the change batch's version timestamp (v0 = initial load)


@register(
    "scd2_dimension_versioning",
    oracle=f"""
WITH dim AS (
  SELECT c_custkey, c_name, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acct_cents,
         0 AS valid_from, CAST(NULL AS INT) AS valid_to
  FROM customer WHERE c_custkey < 500
), changes AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END
           AS c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT)
           + CASE WHEN c_custkey % 11 = 3 THEN 10000 ELSE 0 END AS acct_cents
  FROM customer
  WHERE c_custkey < 500 AND (c_custkey % 7 = 0 OR c_custkey % 11 = 3)
), closed AS (
  SELECT d.c_custkey, d.c_name, d.c_mktsegment, d.acct_cents,
         d.valid_from, {_BATCH_TS} AS valid_to
  FROM dim d WHERE EXISTS (SELECT 1 FROM changes c
                           WHERE c.c_custkey = d.c_custkey)
), untouched AS (
  SELECT d.* FROM dim d
  WHERE NOT EXISTS (SELECT 1 FROM changes c
                    WHERE c.c_custkey = d.c_custkey)
), opened AS (
  SELECT c_custkey, c_name, c_mktsegment, acct_cents,
         {_BATCH_TS} AS valid_from, CAST(NULL AS INT) AS valid_to
  FROM changes
)
SELECT c_custkey, c_name, c_mktsegment,
       CAST(acct_cents AS BIGINT) AS acct_cents,
       CAST(valid_from AS INT) AS valid_from,
       CAST(valid_to AS INT) AS valid_to
FROM (SELECT * FROM untouched UNION ALL
      SELECT * FROM closed UNION ALL
      SELECT * FROM opened)
ORDER BY c_custkey, valid_from
""",
    tags=("b1.9", "A5"),
)
def scd2_dimension_versioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money is carried as integer cents (functions/exact.py convention) so
    the credit arithmetic is exact in both engines; valid_to NULL marks the
    open version.  Every source row appears in the output exactly once per
    version — changed keys twice (closed v0 + open v1), unchanged once."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    dim = cust.select(
        "c_custkey", "c_name", "c_mktsegment",
        cents.alias("acct_cents"),
        F.lit(0).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"))
    changes = (
        cust.filter((F.col("c_custkey") % 7 == 0)
                    | (F.col("c_custkey") % 11 == 3))
        .select(
            "c_custkey", "c_name",
            F.when(F.col("c_custkey") % 7 == 0, F.lit("MOVED"))
             .otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
            (cents + F.when(F.col("c_custkey") % 11 == 3, F.lit(10000))
                      .otherwise(F.lit(0))).alias("acct_cents")))
    change_keys = F.broadcast(changes.select("c_custkey"))
    closed = (dim.join(change_keys, "c_custkey", "left_semi")
              .withColumn("valid_to", F.lit(_BATCH_TS).cast("int")))
    untouched = dim.join(change_keys, "c_custkey", "left_anti")
    opened = changes.select(
        "c_custkey", "c_name", "c_mktsegment", "acct_cents",
        F.lit(_BATCH_TS).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"))
    return (
        untouched.unionByName(closed).unionByName(opened)
        .select("c_custkey", "c_name", "c_mktsegment",
                F.col("acct_cents").cast("bigint").alias("acct_cents"),
                F.col("valid_from").cast("int").alias("valid_from"),
                F.col("valid_to").cast("int").alias("valid_to"))
        .orderBy("c_custkey", "valid_from")
    )


# b1.17 (r4 addendum) CDC read-side compaction: latest row per key.  The
# standard "changelog → current state" read every CDC-fed table needs
# (QUALIFY row_number() = 1 in warehouse dialects, "upsert view" in table
# formats).  Implemented as max_by over a lexicographic (ts, event_id)
# struct rather than the window-rank form the SQL dialects write: an
# AGGREGATE gets map-side partial combine — each scan task reduces its
# slice to one candidate row per key before the shuffle — so shuffle bytes
# are O(distinct keys), not O(changelog), and no partition-wide sort
# happens at all.  The deterministic (ts, event_id) tiebreak keeps the
# survivor well-defined with equal timestamps; the oracle states the same
# semantics in the QUALIFY-style form, proving the two formulations agree.
def latest_by_key(df: DataFrame, keys: list[str], order_by: list[F.Column],
                  payload: list[F.Column]) -> DataFrame:
    """Generic changelog→current-state compaction: per key group, keep the
    payload of the row with the lexicographically greatest order_by tuple.
    One map-side-combinable aggregate (partial_max_by) — shuffle bytes are
    O(distinct keys).  order_by must be a deterministic total order within
    each key (append a unique id column to break timestamp ties)."""
    return (
        df.groupBy(*keys)
        .agg(F.max_by(F.struct(*payload), F.struct(*order_by)).alias("r"))
        .select(*keys, "r.*")
    )


def event_latest_state(df: DataFrame) -> DataFrame:
    """The one source of truth for the events-changelog compaction spec
    shared by cdc_latest_by_key and the streaming upsert
    (streaming/queries.py): keys (user_id, event_type), order (ts,
    event_id), payload (last_ts, last_event_id, last_value_cents) — kept
    PACKED as struct ``r`` so streaming state versions can merge by
    re-applying the same order.  Precondition for any merge built on
    this: event_id is unique within a key, so (ts, event_id) is a total
    order and max_by never tie-breaks arbitrarily."""
    return df.groupBy("user_id", "event_type").agg(
        F.max_by(
            F.struct(F.col("ts").alias("last_ts"),
                     F.col("event_id").alias("last_event_id"),
                     F.round(F.col("value") * 100).cast("bigint")
                      .alias("last_value_cents")),
            F.struct("ts", "event_id")).alias("r"))



@register(
    "cdc_latest_by_key",
    oracle="""
SELECT user_id, event_type, ts AS last_ts, event_id AS last_event_id,
       CAST(round(value * 100) AS BIGINT) AS last_value_cents
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, event_type
    ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id, event_type
""",
    tags=("b1.17", "A5"),
)
def cdc_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (event_latest_state(ev)
            .select("user_id", "event_type", "r.*")
            .orderBy("user_id", "event_type"))


# ---------------------------------------------------------------------------
# r6.10 (b3.15) — POINT-IN-TIME join over the SCD2 dimension: every fact
# row joins the dimension VERSION that was valid when the fact happened —
# the query SCD2 exists to serve, closing the loop on b1.16.  Facts carry
# an as-of version (orders before/after the cut date → batch 0/1); the
# join is an EQUI-join on the key with the validity interval as a residual
# predicate — per-key version fan-out is the (small) version count, so the
# plan stays a plain shuffled equi-join at any dimension size, never an
# interval explosion.
#
# The oracle reconstructs each version DIRECTLY from the change rules
# (v0 = original attributes, v1 = changes merged over v0) — so the check
# also proves the SCD2 interval encoding round-trips: reading "the version
# valid at t" out of the versioned table equals rebuilding version t from
# scratch.
# ---------------------------------------------------------------------------

_PIT_CUT = "1998-01-01 00:00:00"

# The versioned-dimension CTE pair — THE one place the <500 customer cut
# and the %7 'MOVED' rule live on the oracle side (shared with
# stream_scd2_enrichment's oracle, operators/staged_r10.py; the Spark
# side's single definition is scd2_dimension_versioning above).
SCD2_DIM_V_SQL = """cust AS (
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 500
), dim_v AS (
  SELECT 0 AS as_of, c_custkey, c_mktsegment FROM cust
  UNION ALL
  SELECT 1 AS as_of, c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END
  FROM cust
)"""


def scd2_as_of_predicate(dim, fact, key: str, asof: str):
    """The SCD2 validity-interval join predicate (equi-key + interval
    residual) — shared by join_scd2_point_in_time and
    stream_scd2_enrichment so the interval semantics have one
    definition."""
    return ((dim["c_custkey"] == fact[key])
            & (dim["valid_from"] <= fact[asof])
            & (dim["valid_to"].isNull() | (dim["valid_to"] > fact[asof])))


@register(
    "join_scd2_point_in_time",
    oracle=f"""
WITH {SCD2_DIM_V_SQL}, f AS (
  SELECT o_custkey,
         CASE WHEN o_orderdate < TIMESTAMP '{_PIT_CUT}' THEN 0 ELSE 1 END
           AS as_of,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_custkey < 500
)
SELECT f.as_of, d.c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(f.cents) AS BIGINT) AS total_cents
FROM f JOIN dim_v d ON d.c_custkey = f.o_custkey AND d.as_of = f.as_of
GROUP BY f.as_of, d.c_mktsegment
ORDER BY f.as_of, d.c_mktsegment
""",
    tags=("r6.10", "b1.16"),
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders join the SCD2 customer version valid at their as-of batch:
    equi-join on c_custkey, validity interval as the residual predicate."""
    dim = scd2_dimension_versioning(spark, sf_dir)
    f = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_custkey") < 500)
         .select("o_custkey",
                 F.when(F.col("o_orderdate")
                        < F.lit(_PIT_CUT).cast("timestamp"), 0)
                  .otherwise(1).alias("as_of"),
                 F.round(F.col("o_totalprice") * 100).cast("bigint")
                  .alias("cents")))
    pit = f.join(dim, scd2_as_of_predicate(dim, f, "o_custkey", "as_of"))
    return (
        pit.groupBy("as_of", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum("cents").cast("bigint").alias("total_cents"))
        .orderBy("as_of", "c_mktsegment")
    )
