"""Relational / graph / window / streaming / store shapes STAGED for
round 10 (the window-budgeting protocol of operators/staged_r9.py —
round 9's driver window is filled by the 29 r9 promotions plus stale
refreshes, so these ship as verified (callable, oracle) payloads and are
promoted by moving the STAGED entry into a @register decorator next
round).  Every entry runs driver-identically against DuckDB at sf0.001
AND sf0.01 via tests/test_staged_r10.py.

Reference parity note (SURVEY.md §2 docstring convention): the reference
(DatabaseManager.java:280-381) has no analytical surface; these rows are
Part-B derived operators plus driver-checkable exhibits of the round-9
store/transaction verbs (doc_merge precedent).

Per-operator 100-TB notes live in each section comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table

# ---------------------------------------------------------------------------
# graph_degree_assortativity — degree-degree Pearson correlation over the
# co-purchase graph (Newman 2002: do high-degree products co-occur with
# other high-degree products?).  Edges are distinct co-purchased part
# pairs, kept in BOTH directions so the edge list is symmetric and the
# correlation is the standard undirected assortativity.
#
# 100-TB design: the pair explosion is the bounded q_copurchase_pairs
# shape (partition-local per order, ≤ (items/order choose 2) — a constant
# factor, never quadratic); degrees are one map-side-combinable groupBy;
# the edge-degree join is two equi-joins on int keys; the final moment
# sums (m, Σdx, Σdy, Σdxdy, Σdx², Σdy²) are BIGINT map-side partials — one
# row per input partition reaches the single final partition.  The Pearson
# ratio is computed from the six BIGINT moments with ONE double expression
# evaluated identically in both engines (per-row products stay BIGINT —
# deg ≤ corpus-bounded fan-out, so dx·dy < 2^53 — while cross-moment
# products are computed in the double domain to avoid BIGINT overflow at
# scale).
# ---------------------------------------------------------------------------


def _symmetrize(pairs: DataFrame) -> DataFrame:
    """Canonical (pa < pb) pairs → the symmetric (src, dst) edge list."""
    pairs = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric edge list served from the shared artifact (build-once/
    probe-many — see graph_triangle_count's note in staged_r9.py)."""
    from .graph_edges import edges_for, edges_load

    return _symmetrize(edges_load(spark, edges_for(spark, sf_dir)))


def graph_degree_assortativity(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    return degree_assortativity_from_edges(_copurchase_edges(spark, sf_dir))


def degree_assortativity_from_edges(edges: DataFrame) -> DataFrame:
    """Probe half of the build/probe split: `edges` is the SYMMETRIC
    (src, dst) edge list — _symmetrize(one-shot plan) or
    _symmetrize(edges_load(...)) from the persisted artifact."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint")
                                   .alias("deg"))
    ed = (edges
          .join(deg.select(F.col("src"), F.col("deg").alias("dx")), "src")
          .join(deg.select(F.col("src").alias("dst"),
                           F.col("deg").alias("dy")), "dst"))
    # per-row degree products fit int64 (deg ≤ ~3e9 before dx·dy wraps),
    # but their SUMS grow with edge count × deg² and wrap int64 well
    # inside the design scale — the moment sums run in the 38-digit
    # decimal domain (DuckDB twin: HUGEINT, its native sum(BIGINT) type)
    d38 = "decimal(38,0)"
    mom = ed.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("dx").cast(d38)).alias("sx"),
        F.sum(F.col("dy").cast(d38)).alias("sy"),
        F.sum((F.col("dx") * F.col("dy")).cast(d38)).alias("sxy"),
        F.sum((F.col("dx") * F.col("dx")).cast(d38)).alias("sxx"),
        F.sum((F.col("dy") * F.col("dy")).cast(d38)).alias("syy"))
    d = lambda c: F.col(c).cast("double")    # noqa: E731
    den = F.sqrt((d("m") * d("sxx") - d("sx") * d("sx"))
                 * (d("m") * d("syy") - d("sy") * d("sy")))
    # degenerate (regular) graph guard: zero degree variance makes the
    # denominator 0 — Spark's 0.0/0.0 is NaN while DuckDB's division by
    # zero is NULL; when(den>0) emits NULL on both engines (assortativity
    # is undefined for a regular graph)
    return mom.select(
        "m",
        F.when(den > 0,
               (d("m") * d("sxy") - d("sx") * d("sy")) / den)
        .alias("assortativity"))


_EDGES_SQL = """
  pairs AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
  ), edges AS (
    SELECT src, dst FROM pairs
    UNION ALL
    SELECT dst AS src, src AS dst FROM pairs
  )"""

_ASSORT_SQL = f"""
WITH {_EDGES_SQL},
deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
), ed AS (
  SELECT dx.deg AS dx, dy.deg AS dy
  FROM edges e
  JOIN deg dx ON dx.src = e.src
  JOIN deg dy ON dy.src = e.dst
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         sum(dx) AS sx, sum(dy) AS sy,
         sum(dx * dy) AS sxy,
         sum(dx * dx) AS sxx,
         sum(dy * dy) AS syy
  FROM ed)
SELECT m,
       (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS assortativity
FROM mom
"""

# ---------------------------------------------------------------------------
# graph_degree_histogram — degree distribution in power-of-two buckets
# (the first thing anyone plots about a graph; the heavy-tail check that
# decides whether skew mitigation is needed downstream).  Bucket id =
# number of binary digits of the degree (`length(bin(deg))` — pure
# integer, bit-identical cross-engine; floor(log2) via floating log would
# flap at exact powers of two where log(8)/log(2) rounds below 3).
#
# 100-TB design: one map-side-combinable degree groupBy + one bucket
# census — two shuffles of (int, int) rows; no global step at all.
# ---------------------------------------------------------------------------


def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_histogram_from_edges(_copurchase_edges(spark, sf_dir))


def degree_histogram_from_edges(edges: DataFrame) -> DataFrame:
    """Probe half of the build/probe split (symmetric (src, dst) input,
    as degree_assortativity_from_edges)."""
    deg = (edges
           .groupBy("src").agg(F.count(F.lit(1)).cast("bigint")
                               .alias("deg")))
    return (deg.groupBy(F.length(F.bin("deg")).cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                 F.min("deg").alias("min_deg"),
                 F.max("deg").alias("max_deg"))
            .orderBy("bucket"))


_DEGHIST_SQL = f"""
WITH {_EDGES_SQL},
deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
)
SELECT CAST(length(bin(deg)) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       min(deg) AS min_deg, max(deg) AS max_deg
FROM deg
GROUP BY 1
ORDER BY bucket
"""

# ---------------------------------------------------------------------------
# events_anomaly_mad — robust per-user outlier detection by median
# absolute deviation (the Hampel filter's core: median/MAD resist the
# very outliers mean/stddev absorb).  Values ride as integer cents; the
# median is the LOWER median (sorted element at 0-based index (n−1)/2) so
# both engines pick the identical integer with no interpolation float.
# A row is an outlier when |x − med| > 5·MAD (integers both sides —
# exact).  Users whose MAD is 0 (constant-ish series) are excluded: every
# deviation would flag.
#
# 100-TB design: three user_id-partitioned passes (median, MAD, flag
# count) — the exact-median cost is the per-user sorted array, bounded by
# events-per-user (corpus-bounded, not scale-bounded); at extreme
# per-user volumes swap in the quantile-sketch rollup
# (agg_quantile_sketch_rollup) for an approximate MAD with the same plan
# shape.  No global step.
# ---------------------------------------------------------------------------


def _lower_median(col: str) -> F.Column:
    arr = F.sort_array(F.collect_list(col))
    return F.get(arr, F.floor((F.size(arr) - 1) / 2).cast("int"))


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id",
                  F.round(F.col("value") * 100).cast("bigint")
                  .alias("cents")))
    med = ev.groupBy("user_id").agg(_lower_median("cents").alias("med"))
    dev = (ev.join(med, "user_id")
           .select("user_id", "med",
                   F.abs(F.col("cents") - F.col("med")).alias("adev")))
    mad = dev.groupBy("user_id").agg(_lower_median("adev").alias("mad"))
    return (dev.join(mad, "user_id")
            .filter((F.col("mad") > 0)
                    & (F.col("adev") > 5 * F.col("mad")))
            .groupBy("user_id")
            .agg(F.min("med").alias("med"), F.min("mad").alias("mad"),
                 F.count(F.lit(1)).cast("bigint").alias("n_outliers"))
            .orderBy("user_id"))


_MAD_SQL = """
WITH ev AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), med AS (
  SELECT user_id,
         list_sort(list(cents))[(count(*) + 1) // 2] AS med
  FROM ev GROUP BY user_id
), dev AS (
  SELECT ev.user_id, med, abs(cents - med) AS adev
  FROM ev JOIN med ON med.user_id = ev.user_id
), mad AS (
  SELECT user_id,
         list_sort(list(adev))[(count(*) + 1) // 2] AS mad
  FROM dev GROUP BY user_id
)
SELECT dev.user_id, min(dev.med) AS med, min(mad.mad) AS mad,
       CAST(count(*) AS BIGINT) AS n_outliers
FROM dev JOIN mad ON mad.user_id = dev.user_id
WHERE mad.mad > 0 AND dev.adev > 5 * mad.mad
GROUP BY dev.user_id
ORDER BY dev.user_id
"""

# ---------------------------------------------------------------------------
# window_rolling_zscore — online standardization over a trailing row
# frame (the feature-engineering staple: z-score each event against its
# user's recent window).  Mean and variance come from BIGINT frame sums
# (Σx, Σx², n) cast to double in ONE shared expression form, so the score
# is bit-identical cross-engine; only full 7-row frames emit (shorter
# frames would z-score against too little history), and |z| > 2 filters
# to the interesting rows.
#
# 100-TB design: ONE user_id exchange + one sort evaluates all three
# frame aggregates in a single Window operator; the filter is map-side.
# No global step, no second shuffle.
# ---------------------------------------------------------------------------

_ZW = 7     # frame length (6 preceding + current)


def window_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "event_id", "ts",
                  F.round(F.col("value") * 100).cast("bigint")
                  .alias("cents")))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-(_ZW - 1), 0))
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum("cents").over(w).cast("double")
    sxx = F.sum(F.col("cents") * F.col("cents")).over(w).cast("double")
    x = F.col("cents").cast("double")
    mu = sx / n
    var = sxx / n - mu * mu
    # zero-variance guard (a frame of 7 equal values): unguarded, Spark's
    # 0.0/0.0 is NaN — and NaN compares GREATER than everything, so the
    # row would pass the filter — while DuckDB's division by zero is NULL
    # and drops it.  when(var>0) makes Spark emit NULL too: both engines
    # drop the undefined row (the events_anomaly_mad mad>0 discipline).
    z = F.when(var > 0, (x - mu) / F.sqrt(var))
    # ONE projection carries every window expression → ONE Window operator
    # (separate withColumn calls stack a second Window node)
    return (ev.select("user_id", "event_id",
                      F.count(F.lit(1)).over(w).alias("nn"),
                      z.alias("z"))
            .filter((F.col("nn") == _ZW) & (F.col("z") * F.col("z") > 4))
            .select("user_id", "event_id", "z")
            .orderBy("user_id", "event_id"))


_ZSCORE_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), fr AS (
  SELECT user_id, event_id, cents,
         CAST(count(*) OVER w AS BIGINT) AS nn,
         CAST(sum(cents) OVER w AS DOUBLE) AS sx,
         CAST(sum(cents * cents) OVER w AS DOUBLE) AS sxx,
         CAST(count(*) OVER w AS DOUBLE) AS n
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_ZW - 1} PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, z
FROM (
  SELECT user_id, event_id, nn,
         (CAST(cents AS DOUBLE) - sx / n)
         / sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0)) AS z
  FROM fr
)
WHERE nn = {_ZW} AND z * z > 4
ORDER BY user_id, event_id
"""

# ---------------------------------------------------------------------------
# sql_lateral_unnest — the LATERAL VIEW / table-function join shape
# (Hive's LATERAL VIEW posexplode, Spark's posexplode, SQL:2016 UNNEST
# WITH ORDINALITY): per-order part arrays re-expanded WITH POSITION.  The
# staple for array-modeled data (multi-valued attributes, tokenized
# columns) where position matters.
#
# 100-TB design: the array build is one map-side-combinable groupBy; the
# explode is generate-time (no join, no shuffle beyond the groupBy); the
# key filter prunes at the scan.  Output bounded to the first 3 positions
# of every 50th order.
# ---------------------------------------------------------------------------


def sql_lateral_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    arrs = (load_table(spark, sf_dir, "lineitem")
            .filter(F.col("l_orderkey") % 50 == 0)
            .groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_list("l_partkey")).alias("parts"))
            .filter(F.size("parts") >= 5))
    return (arrs.select("l_orderkey",
                        F.posexplode("parts").alias("pos", "partkey"))
            .filter(F.col("pos") < 3)
            .select("l_orderkey", F.col("pos").cast("int").alias("pos"),
                    "partkey")
            .orderBy("l_orderkey", "pos"))


_LATERAL_SQL = """
WITH arrs AS (
  SELECT l_orderkey, list_sort(list(l_partkey)) AS parts
  FROM lineitem WHERE l_orderkey % 50 = 0
  GROUP BY l_orderkey HAVING count(*) >= 5
), ex AS (
  SELECT l_orderkey, parts,
         unnest(generate_series(1, 3)) AS i
  FROM arrs
)
SELECT l_orderkey, CAST(i - 1 AS INT) AS pos, parts[i] AS partkey
FROM ex
ORDER BY l_orderkey, pos
"""

# ---------------------------------------------------------------------------
# stream_scd2_enrichment — streaming events enriched against a SLOWLY
# CHANGING dimension: each event joins the SCD2 customer version valid at
# its OWN as-of epoch (the streaming point-in-time join every CDC-fed
# feature pipeline runs; join_scd2_point_in_time is the batch twin).
# Stream-static equi-join on user_id with the validity interval as the
# residual predicate; per-(epoch, segment) census in complete mode.
#
# 100-TB design: the dimension is the broadcast side (SCD2 dims are
# metadata-sized next to the event stream); the stream side never
# shuffles for the join — only the final census aggregates, map-side
# partial per micro-batch.  Replay-exact: enrichment is stateless per
# event, so chunked replay equals the batch join (the stream_*_batch
# oracle convention).
# ---------------------------------------------------------------------------

_SCD2_CUT = "2024-01-16 00:00:00"


def stream_scd2_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.runner import (cleanup, read_event_stream,
                                    run_stream_to_table, stage_event_chunks)
    from .scd import scd2_dimension_versioning

    staged = stage_event_chunks(spark, sf_dir)
    try:
        dim = scd2_dimension_versioning(spark, sf_dir)
        ev = (read_event_stream(spark, staged)
              .filter(F.col("user_id") < 500)
              .select("user_id",
                      F.when(F.col("ts")
                             < F.lit(_SCD2_CUT).cast("timestamp"), 0)
                      .otherwise(1).alias("as_of"),
                      F.round(F.col("value") * 100).cast("bigint")
                      .alias("cents")))
        from .scd import scd2_as_of_predicate

        joined = ev.join(F.broadcast(dim),
                         scd2_as_of_predicate(dim, ev, "user_id", "as_of"))
        agg = (joined.groupBy("as_of", "c_mktsegment")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                    F.sum("cents").cast("bigint").alias("total_cents")))
        return (run_stream_to_table(agg, output_mode="complete")
                .orderBy("as_of", "c_mktsegment"))
    finally:
        cleanup(staged)


def _scd2_stream_sql() -> str:
    # the shared versioned-dimension CTE (scd.py::SCD2_DIM_V_SQL — the
    # %7/'MOVED' rule has ONE oracle-side definition)
    from .scd import SCD2_DIM_V_SQL

    return f"""
WITH {SCD2_DIM_V_SQL}, ev AS (
  SELECT user_id,
         CASE WHEN ts < TIMESTAMP '{_SCD2_CUT}' THEN 0 ELSE 1 END AS as_of,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE user_id < 500
)
SELECT ev.as_of, d.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(ev.cents) AS BIGINT) AS total_cents
FROM ev JOIN dim_v d ON d.c_custkey = ev.user_id AND d.as_of = ev.as_of
GROUP BY ev.as_of, d.c_mktsegment
ORDER BY ev.as_of, d.c_mktsegment
"""

# ---------------------------------------------------------------------------
# doc_family_read — the round-9 cross-table FAMILY TRANSACTION surfaced
# as a driver-checkable query (the doc_merge convention): two save_docs
# commits of a 2-table document family (parent + typed-array child), read
# back AT EACH FAMILY VERSION through read_family — never a torn mix of
# one table's new rows with a sibling's old.  Fixture-literal docs with
# explicit rowNums (the doc_typing_rules in-memory precedent), so the
# oracle is a VALUES table.
#
# 100-TB design: the family manifest is one tiny JSON CAS claim
# regardless of child-table count or size (A1-tx, store.py); the reads
# are ordinary bucket-pruned AS-OF reads at the pinned versions.
# ---------------------------------------------------------------------------

_FAMX_V0 = [
    {"rowNum": 1, "name": "alpha",
     "items": [{"type": "pay", "rowNum": 11, "amt": 10},
               {"type": "pay", "rowNum": 12, "amt": 5}]},
    {"rowNum": 2, "name": "beta",
     "items": [{"type": "pay", "rowNum": 21, "amt": 7}]},
]
_FAMX_V1 = [
    {"rowNum": 1, "name": "alpha2",
     "items": [{"type": "pay", "rowNum": 11, "amt": 11},
               {"type": "pay", "rowNum": 12, "amt": 6}]},
]


def family_version_rollup(store, family: str, child: str,
                          fv: int) -> DataFrame:
    """ONE family version's parent⋈child read-back rollup (parent name +
    summed child amt, tagged with the version) — the shared exhibit
    primitive behind doc_family_read and doc_vacuum_family
    (operators/staged_r11.py), so the family read-back recipe has one
    definition."""
    from ..documents.model import KEY

    parent = store.read_family(family, family, fv).select(
        F.col(KEY).alias("doc"), "name")
    child_df = (store.read_family(family, child, fv)
                .groupBy(F.col(family).alias("doc"))
                .agg(F.sum("amt").cast("bigint").alias("total_amt")))
    return (parent.join(child_df, "doc")
            .select(F.lit(fv).alias("fam_version"),
                    F.col("doc").cast("bigint").alias("doc"),
                    "name", "total_amt"))


def doc_family_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..documents.fixtures import docs_df
    from ..documents.store import DocumentStore
    from .scans import _sink

    store = DocumentStore(spark, _sink("doc_family_store", spark))
    store.save_docs(docs_df(spark, _FAMX_V0), "famx")     # family v0
    store.save_docs(docs_df(spark, _FAMX_V1), "famx")     # family v1
    out = None
    for fv in (0, 1):
        one = family_version_rollup(store, "famx", "pay", fv)
        out = one if out is None else out.unionByName(one)
    return out.orderBy("fam_version", "doc")


_FAMILY_SQL = """
SELECT * FROM (VALUES
  (0, CAST(1 AS BIGINT), 'alpha',  CAST(15 AS BIGINT)),
  (0, CAST(2 AS BIGINT), 'beta',   CAST(7 AS BIGINT)),
  (1, CAST(1 AS BIGINT), 'alpha2', CAST(17 AS BIGINT)),
  (1, CAST(2 AS BIGINT), 'beta',   CAST(7 AS BIGINT))
) AS t(fam_version, doc, name, total_amt)
ORDER BY fam_version, doc
"""

# ---------------------------------------------------------------------------
# doc_quarantine — the expect-or-quarantine ingest verb surfaced as a
# driver row (A5-quarantine; DLT expect_or_drop with a dead-letter
# table): a base commit, a CHECK constraint, then ONE upsert whose delta
# mixes clean updates (key ≡ 2 mod 100: +1 cent) and violating ones
# (key ≡ 1 mod 100: +2·10⁸ cents, breaching the cap).  Clean rows commit;
# violators land in the quarantine table tagged with the broken rule.
# Output: the quarantine table union the updated clean rows, op-tagged.
#
# 100-TB design: the verdict column is ONE expression pass over the
# delta; both halves commit bucket-granular; the quarantine table is
# delta-of-deltas-sized, never corpus-sized.
# ---------------------------------------------------------------------------

_Q_CAP = 100_000_000          # cents — every base row is far below this
_Q_BUMP = 200_000_000


def doc_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..documents.model import KEY
    from ..documents.store import DocumentStore
    from .scans import _sink

    # the store name carries the SF token: the exists() first-ingest
    # guard below would otherwise freeze the base at whichever sf_dir
    # the session saw FIRST (bench warms at sf0.001 then times sf0.1 in
    # one session — the upserts would land on a 100×-smaller stale base)
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    store = DocumentStore(spark,
                          _sink(f"doc_quarantine_store_{tag}", spark))
    t = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias(KEY),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    if not store.exists("orders_q"):
        store.upsert(t, "orders_q")
        store.add_constraint("orders_q", "cents_cap",
                             f"cents <= {_Q_CAP}")
    bad = (t.filter(F.col(KEY) % 100 == 1)
           .withColumn("cents", F.col("cents") + _Q_BUMP))
    good = (t.filter(F.col(KEY) % 100 == 2)
            .withColumn("cents", F.col("cents") + 1))
    store.upsert_with_quarantine(bad.unionByName(good), "orders_q",
                                 "orders_q_dead")
    dead = store.read("orders_q_dead").select(
        F.lit("quarantined").alias("op"), KEY, "cents",
        F.col("_broken").alias("broken"))
    live = (store.read("orders_q").filter(F.col(KEY) % 100 == 2)
            .select(F.lit("committed").alias("op"), KEY, "cents",
                    F.lit(None).cast("string").alias("broken")))
    return dead.unionByName(live).orderBy("op", KEY)


_QUARANTINE_SQL = f"""
WITH t AS (
  SELECT o_orderkey AS "rowNum",
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT 'committed' AS op, "rowNum", cents + 1 AS cents,
       CAST(NULL AS VARCHAR) AS broken
FROM t WHERE "rowNum" % 100 = 2
UNION ALL
SELECT 'quarantined', "rowNum", cents + {_Q_BUMP},
       '["cents_cap"]'
FROM t WHERE "rowNum" % 100 = 1
ORDER BY op, "rowNum"
"""

# ---------------------------------------------------------------------------
# q_customer_pareto — revenue-concentration census (the 80/20 question:
# which revenue decile of customers carries what share of total revenue).
# The global revenue ranking uses the TWO-PASS recipe from
# operators/scale.py (scale_percent_rank): bucket by the revenue VALUE
# (ties can never straddle a bucket), rank within buckets, add
# ≤32-bucket literal offsets — so there is no single-partition global
# sort anywhere; the only global step is the 10-row decile cumulative.
#
# 100-TB design: one map-side-combinable revenue agg, one value-range
# bucketing (bounded 2×32-row collects of bucket stats — index-metadata
# class), per-bucket windows, then a 10-row census.  Cumulative share is
# exact-integer cents divided as doubles — bit-identical cross-engine.
# ---------------------------------------------------------------------------

_PARETO_BUCKETS = 32


def q_customer_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..registry import scoped_persist
    from .scale import prefix_count_offsets, value_range_buckets

    # rev is a full orders-fact aggregation consumed by THREE evaluations
    # (the lo/hi collect, the bucket-count collect, the final job) —
    # persist it once instead of re-scanning orders per pass
    rev = scoped_persist(
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
             .cast("bigint").alias("cents")))
    # the shared two-pass bucketed global-rank recipe (scale.py) — rank
    # DESC by cents: offset(b) = customers in HIGHER-value buckets
    base, pcnt, n_total = value_range_buckets(rev, "cents",
                                              _PARETO_BUCKETS)
    off = prefix_count_offsets(pcnt, _PARETO_BUCKETS, descending=True)
    off_map = F.create_map(*[x for b in range(_PARETO_BUCKETS)
                             for x in (F.lit(b), F.lit(off[b]))])
    wrk = W.partitionBy("__b").orderBy(F.col("cents").desc(), "o_custkey")
    ranked = base.select(
        "cents",
        (off_map[F.col("__b")] + F.row_number().over(wrk)).alias("rk"))
    per = (ranked
           .select("cents",
                   F.least(F.lit(9),
                           F.expr(f"CAST(((rk - 1) * 10) DIV {n_total} "
                                  f"AS INT)")).alias("decile"))
           .groupBy("decile")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.sum("cents").cast("bigint").alias("decile_cents")))
    wcum = W.orderBy("decile").rowsBetween(W.unboundedPreceding,
                                           W.currentRow)
    tot = F.sum("decile_cents").over(
        W.orderBy("decile").rowsBetween(W.unboundedPreceding,
                                        W.unboundedFollowing))
    return (per.select("decile", "n_customers", "decile_cents",
                       (F.sum("decile_cents").over(wcum).cast("double")
                        / tot.cast("double")).alias("cum_share"))
            .orderBy("decile"))


_PARETO_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), rk AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk,
         count(*) OVER () AS n
  FROM rev
), per AS (
  SELECT CAST(least(9, ((rk - 1) * 10) // n) AS INT) AS decile,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS decile_cents
  FROM rk GROUP BY 1
)
SELECT decile, n_customers, decile_cents,
       CAST(sum(decile_cents)
              OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE)
       / CAST(sum(decile_cents)
                OVER (ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING)
              AS DOUBLE) AS cum_share
FROM per
ORDER BY decile
"""

# ---------------------------------------------------------------------------
# window_streak_detection — gaps-and-islands: each user's longest run of
# CONSECUTIVE active days (the retention/engagement staple; the classic
# `date − row_number()` island trick).  Portable island key: integer
# days-since-epoch minus the per-user day rank.
#
# 100-TB design: one distinct over (user, day) — map-side combinable;
# one per-user window (single user_id exchange); one (user, island)
# census.  No global step.
# ---------------------------------------------------------------------------


def window_streak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (load_table(spark, sf_dir, "events")
            .select("user_id", F.to_date("ts").alias("d")).distinct())
    wd = W.partitionBy("user_id").orderBy("d")
    grp = (days.select(
        "user_id",
        (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
         - F.row_number().over(wd)).alias("grp")))
    runs = (grp.groupBy("user_id", "grp")
            .agg(F.count(F.lit(1)).cast("bigint").alias("len")))
    return (runs.groupBy("user_id")
            .agg(F.sum("len").cast("bigint").alias("n_active_days"),
                 F.max("len").alias("longest_streak"))
            .orderBy("user_id"))


_STREAK_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), r AS (
  SELECT user_id, d,
         row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM days
), runs AS (
  SELECT user_id,
         datediff('day', DATE '1970-01-01', d) - rn AS grp,
         count(*) AS len
  FROM r GROUP BY user_id, grp
)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM runs
GROUP BY user_id
ORDER BY user_id
"""

# Promoted round 10 (r9 verdict next-round #1); empty STAGED kept so the
# staged-protocol tests can pin that nothing is both staged and registered.
from ..registry import register  # noqa: E402  (promotion epilogue)

for _name, (_fn, _sql) in {
    "graph_degree_assortativity": (graph_degree_assortativity, _ASSORT_SQL),
    "graph_degree_histogram": (graph_degree_histogram, _DEGHIST_SQL),
    "events_anomaly_mad": (events_anomaly_mad, _MAD_SQL),
    "window_rolling_zscore": (window_rolling_zscore, _ZSCORE_SQL),
    "sql_lateral_unnest": (sql_lateral_unnest, _LATERAL_SQL),
    "stream_scd2_enrichment": (stream_scd2_enrichment, _scd2_stream_sql()),
    "doc_family_read": (doc_family_read, _FAMILY_SQL),
    "doc_quarantine": (doc_quarantine, _QUARANTINE_SQL),
    "q_customer_pareto": (q_customer_pareto, _PARETO_SQL),
    "window_streak_detection": (window_streak_detection, _STREAK_SQL),
}.items():
    register(_name, _sql)(_fn)

STAGED: dict = {}
