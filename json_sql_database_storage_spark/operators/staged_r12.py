"""Relational / window / store shapes STAGED for round 12 (the
window-budgeting protocol of operators/staged_r9.py — round 11's driver
window is filled by the 23 r11 promotions plus stale refreshes, so these
ship as verified (callable, oracle) payloads and are promoted by moving
the STAGED entry into a @register decorator next round).  Every entry
runs driver-identically against DuckDB at sf0.001 AND sf0.01 via
tests/test_staged_r12.py.

Reference parity note (SURVEY.md §2 docstring convention): the reference
(DatabaseManager.java:280-381) has no analytical surface; these rows are
Part-B derived operators plus driver-checkable exhibits of the remaining
store verbs (restore / compact / rebucket — the doc_merge / doc_quarantine
precedent: every A5 verb gets a hash-checked driver row, not just lib
tests).

Per-operator 100-TB notes live in each section comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table

# ---------------------------------------------------------------------------
# doc_restore — the store restore verb surfaced as a driver row (A5;
# Delta RESTORE / Iceberg rollback at the DocumentStore layer, the
# snapshot_rollback twin one level down): commit orders as v0, commit an
# upsert that bumps keys ≡ 1 (mod 100) as v1, then restore(v0) — a
# METADATA-ONLY commit (v2 re-references v0's bucket dirs verbatim, no
# data copied).  The output aggregates all three versions, so the oracle
# hash-checks that v2 ≡ v0 while v1 stays AS-OF readable.
#
# 100-TB design: restore is O(1) — one manifest claim; the version reads
# are ordinary bucket-pruned AS-OF scans.  The exhibit's aggregate is a
# 1-row scalar per version (map-side partials).
# ---------------------------------------------------------------------------


def _orders_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..documents.model import KEY

    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias(KEY),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))


def _fresh_store(spark: SparkSession, name: str, **kw):
    """Fresh store per invocation under the session-lifetime sink (the
    doc_vacuum_family recipe): VERSION NUMBERS are part of each exhibit's
    output, so reusing one store across invocations — the plan sweep and
    the oracle harness both call these — would drift them."""
    import os
    import tempfile

    from ..documents.store import DocumentStore
    from .scans import _sink

    base = _sink(name, spark)
    os.makedirs(base, exist_ok=True)
    return DocumentStore(spark, tempfile.mkdtemp(dir=base), **kw)


def _version_rollup(store, entries) -> DataFrame:
    """One (n_rows, sum_cents) aggregate row per (leading literal columns,
    table, version) entry — the shared tail of every store exhibit here
    (r11 review: four inline copies varied only in the leading labels)."""
    out = None
    for lead, table, v in entries:
        one = (store.read_asof(table, v)
               .agg(*lead,
                    F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.sum("cents").cast("bigint").alias("sum_cents")))
        out = one if out is None else out.unionByName(one)
    return out


def doc_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..documents.model import KEY

    store = _fresh_store(spark, "doc_restore_store")
    t = _orders_kv(spark, sf_dir)
    store.upsert(t, "orders_rst")                                   # v0
    store.upsert(t.filter(F.col(KEY) % 100 == 1)
                 .withColumn("cents", F.col("cents") + 500),
                 "orders_rst")                                      # v1
    store.restore("orders_rst", 0)                                  # v2 ≡ v0
    return _version_rollup(
        store,
        [([F.lit(v).cast("int").alias("version")], "orders_rst", v)
         for v in (0, 1, 2)]).orderBy("version")


_RESTORE_SQL = """
WITH t AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), base AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM t
), upd AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents + CASE WHEN k % 100 = 1 THEN 500 ELSE 0 END)
              AS BIGINT) AS s
  FROM t
)
SELECT 0 AS version, n AS n_rows, s AS sum_cents FROM base
UNION ALL SELECT 1, n, s FROM upd
UNION ALL SELECT 2, n, s FROM base
ORDER BY version
"""

# ---------------------------------------------------------------------------
# doc_compact — the compact verb surfaced as a driver row (A5; Delta
# OPTIMIZE / Iceberg rewrite_data_files): a base commit plus FOUR
# APPEND deltas (append is the O(delta) verb that accumulates dirs —
# upsert's bucket COW never fragments) pile multiple dirs onto every
# touched bucket, then compact() merges each fragmented bucket back to
# one dir as a normal versioned commit.  The output aggregates the
# pre-compact head and the post-compact head — value-neutrality AND the
# post-commit version arithmetic are the hash-checked contract
# (file-count mechanics are pinned at the lib level in test_documents).
#
# 100-TB design: compact rewrites ONLY fragmented buckets (dir-list
# length > 1) and physically reuses the rest — the lakehouse small-files
# fix without a full table rewrite; pre-compact history stays AS-OF
# readable until vacuum.
# ---------------------------------------------------------------------------


def doc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..documents.model import KEY

    store = _fresh_store(spark, "doc_compact_store")
    t = _orders_kv(spark, sf_dir)
    store.upsert(t, "orders_cpt")                                   # v0
    # appended keys offset past max(key) (the doc_merge collision note)
    off = int(t.agg(F.max(KEY)).collect()[0][0]) + 1
    for j in (1, 2, 3, 4):                                          # v1..v4
        store.append(t.filter(F.col(KEY) % 100 == j)
                     .select((F.col(KEY) + F.lit(j * off)).alias(KEY),
                             (F.col("cents") + j * 100).alias("cents")),
                     "orders_cpt")
    pre_v = store.version("orders_cpt")
    store.compact("orders_cpt")                                     # v5
    post_v = store.version("orders_cpt")
    return _version_rollup(
        store,
        [([F.lit(phase).alias("phase"),
           F.lit(v).cast("int").alias("version")], "orders_cpt", v)
         for phase, v in (("pre", pre_v), ("post", post_v))]
    ).orderBy("version")


_COMPACT_SQL = """
WITH t AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), final AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM (SELECT k, cents FROM t
        UNION ALL
        SELECT k + (k % 100) * ((SELECT max(k) FROM t) + 1),
               cents + (k % 100) * 100
        FROM t WHERE k % 100 IN (1, 2, 3, 4))
)
SELECT 'pre' AS phase, 4 AS version, n AS n_rows, s AS sum_cents FROM final
UNION ALL SELECT 'post', 5, n, s FROM final
ORDER BY version
"""

# ---------------------------------------------------------------------------
# doc_rebucket — the rebucket verb surfaced as a driver row (A5; the
# bucket-count migration every hash-partitioned store eventually needs
# when a table outgrows its layout): commit orders at 8 buckets, then
# rebucket(32) — a full rewrite committed as one normal version.  The
# output aggregates both layouts; content invariance is the hash-checked
# contract (lookup pruning at the new layout is pinned at the lib level).
#
# 100-TB design: rebucket is the ONE deliberately O(table) verb (every
# engine's repartition/rewrite is); it commits atomically like any other
# version, so readers never see a half-migrated layout, and the old
# layout stays AS-OF readable until vacuum.
# ---------------------------------------------------------------------------


def doc_rebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _fresh_store(spark, "doc_rebucket_store", n_buckets=8)
    t = _orders_kv(spark, sf_dir)
    store.upsert(t, "orders_rbk")                                   # v0 @ 8
    store.rebucket("orders_rbk", 32)                                # v1 @ 32
    return _version_rollup(
        store,
        [([F.lit(v).cast("int").alias("version"),
           F.lit(b).cast("int").alias("n_buckets")], "orders_rbk", v)
         for v, b in ((0, 8), (1, 32))]).orderBy("version")


_REBUCKET_SQL = """
WITH t AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
  FROM orders
)
SELECT 0 AS version, 8 AS n_buckets, n AS n_rows, s AS sum_cents FROM t
UNION ALL SELECT 1, 32, n, s FROM t
ORDER BY version
"""

# ---------------------------------------------------------------------------
# q_orders_open_aging — aging census of NON-finalized orders (the AR /
# fulfillment-backlog report: how much open order value sits how far in
# the past, by status).  Age anchors at the corpus's max order date (the
# data's "today" — deterministic, no wall clock) and buckets by whole
# years via integer floor division of the exact day difference.
#
# 100-TB design: the anchor is a 1-row max scalar (map-side partials —
# one row per input partition; broadcast onto the census), and the
# census itself is map-side-combinable over a (status × ~8 age-year)
# domain.  Money rides as exact cents BIGINTs.  No windows, no joins.
# ---------------------------------------------------------------------------


def q_orders_open_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") != "F")
         .select("o_orderstatus", "o_orderdate",
                 F.round(F.col("o_totalprice") * 100).cast("bigint")
                 .alias("cents")))
    anchor = o.agg(F.max("o_orderdate").alias("anchor"))
    return (o.crossJoin(F.broadcast(anchor))
            .select("o_orderstatus", "cents",
                    F.expr("CAST(datediff(anchor, o_orderdate) DIV 365 "
                           "AS INT)").alias("age_years"))
            .groupBy("o_orderstatus", "age_years")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                 F.sum("cents").cast("bigint").alias("open_cents"))
            .orderBy("o_orderstatus", "age_years"))


_AGING_SQL = """
WITH o AS (
  SELECT o_orderstatus, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus <> 'F'
), anchor AS (SELECT max(o_orderdate) AS a FROM o)
SELECT o_orderstatus,
       CAST(date_diff('day', o_orderdate, a) // 365 AS INT) AS age_years,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS open_cents
FROM o, anchor
GROUP BY 1, 2
ORDER BY o_orderstatus, age_years
"""

# ---------------------------------------------------------------------------
# q_supplier_lineload — the top-20 suppliers by shipped line count with
# each supplier's exact share of the whole book (the workload-skew
# report behind allocation rebalancing; q15's revenue ranking asks who
# EARNS most — this asks who SHIPS most).  Share rides as exact
# parts-per-million via BIGINT floor division (n·10⁶ DIV total —
# identical integer semantics in both engines; no double division to
# flap).  Global top-k is TakeOrdered (per-partition heaps),
# deterministic (n desc, suppkey) tie-break.
#
# 100-TB design: the census collapses the fact table to O(|suppliers|)
# rows map-side; the total is a 1-row scalar broadcast; TakeOrdered
# forwards ≤20 rows per partition.  No global sort, no windows.
# ---------------------------------------------------------------------------

_LINELOAD_TOPK = 20


def q_supplier_lineload(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_supp = (load_table(spark, sf_dir, "lineitem")
                .groupBy("l_suppkey")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines")))
    tot = per_supp.agg(F.sum("n_lines").cast("bigint").alias("t"))
    return (per_supp.crossJoin(F.broadcast(tot))
            .select("l_suppkey", "n_lines",
                    F.expr("CAST(n_lines * 1000000 DIV t AS BIGINT)")
                    .alias("share_ppm"))
            .orderBy(F.desc("n_lines"), "l_suppkey")
            .limit(_LINELOAD_TOPK))


_LINELOAD_SQL = f"""
WITH per_supp AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
), tot AS (SELECT CAST(sum(n_lines) AS BIGINT) AS t FROM per_supp)
SELECT l_suppkey, n_lines,
       CAST(n_lines * 1000000 // t AS BIGINT) AS share_ppm
FROM per_supp, tot
ORDER BY n_lines DESC, l_suppkey
LIMIT {_LINELOAD_TOPK}
"""

# ---------------------------------------------------------------------------
# window_reorder_interval — the repeat-purchase latency distribution:
# days between a customer's consecutive orders, censused in power-of-two
# day buckets (`length(bin(days))` — the integer-bucket recipe;
# window_inter_event_gap's twin on the ORDER timeline, where the gap is
# the retention metric itself).  Same-day repeat orders (gap 0) are kept
# as their own bucket (bin(0) = '0', length 1, both engines).
#
# 100-TB design: one customer-key exchange + sort for the lag window;
# the census is map-side-combinable (int, int) rows.  No global step.
# ---------------------------------------------------------------------------


def window_reorder_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (load_table(spark, sf_dir, "orders")
         .select("o_custkey", "o_orderdate", "o_orderkey"))
    wc = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (o.select(F.datediff(F.col("o_orderdate"),
                                F.lag("o_orderdate").over(wc))
                     .alias("gap_days"))
            .filter(F.col("gap_days").isNotNull()))
    return (gaps.groupBy(F.length(F.bin("gap_days")).cast("int")
                         .alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
                 F.min("gap_days").cast("int").alias("min_days"),
                 F.max("gap_days").cast("int").alias("max_days"))
            .orderBy("bucket"))


_REORDER_SQL = """
WITH gaps AS (
  SELECT date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
)
SELECT CAST(length(bin(gap_days)) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_days) AS INT) AS min_days,
       CAST(max(gap_days) AS INT) AS max_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1
ORDER BY bucket
"""

# ---------------------------------------------------------------------------
# window_user_value_trend — per-user least-squares slope of event value
# over the user's own event sequence (the engagement-trajectory metric:
# is this user's spend rising or falling?).  x = the user's event index
# (row_number over (ts, event_id) — exact, gapless), y = value in exact
# cents; the five moments are exact BIGINTs and the slope is ONE double
# expression (n·Σxy − Σx·Σy)/(n·Σxx − Σx²) — the q_discount_quantity_corr
# moment recipe, per user.  Users with a single event are excluded
# (slope undefined); x is distinct within a user so the denominator is
# positive whenever n ≥ 2.
#
# 100-TB design: one user_id exchange + sort for the index window, then
# map-side-combinable moments per user; per-row x·y ≤ events-per-user ×
# max-cents (≪ 2⁶³); cross-moment products evaluate in doubles.  Output
# is O(|users|).  No global step.
# ---------------------------------------------------------------------------


def window_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "ts", "event_id",
                  F.floor(F.col("value") * 10000 + F.lit(0.5))
                  .cast("bigint").alias("y")))
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    xy = ev.select("user_id", "y",
                   F.row_number().over(wu).cast("bigint").alias("x"))
    m = (xy.groupBy("user_id")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
              F.sum("x").cast("bigint").alias("sx"),
              F.sum("y").cast("bigint").alias("sy"),
              F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
              F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"))
         .filter(F.col("n") >= 2))
    d = lambda c: F.col(c).cast("double")    # noqa: E731
    slope = ((d("n") * d("sxy") - d("sx") * d("sy"))
             / (d("n") * d("sxx") - d("sx") * d("sx")))
    return (m.select("user_id", "n", slope.alias("value_slope"))
            .orderBy("user_id"))


_TREND_SQL = """
WITH xy AS (
  SELECT user_id,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS x,
         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS y
  FROM events
), m AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy GROUP BY 1
)
SELECT user_id, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS value_slope
FROM m WHERE n >= 2
ORDER BY user_id
"""

# ---------------------------------------------------------------------------
# q_price_band_share — revenue share by part retail-price band ($1000
# bands; the price-mix report behind assortment planning).  Revenue
# follows the functions/exact.py decimal discipline snapped to exact
# cents BIGINTs; shares ride as exact parts-per-million via BIGINT floor
# division against a 1-row total broadcast (the q_clerk_workload share
# recipe).
#
# 100-TB design: the part join is a plain equi-join (part grows with SF
# — NOT broadcast; AQE decides at runtime), the band census collapses
# map-side to O(|bands|) rows, and the total is a 1-row scalar.  No
# windows, no global sort.
# ---------------------------------------------------------------------------


def q_price_band_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import dec, dec_factor

    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey",
                  (dec("l_extendedprice")
                   * dec_factor(F.lit(1) - F.col("l_discount")))
                  .alias("rev")))
    part = (load_table(spark, sf_dir, "part")
            .select("p_partkey",
                    F.floor(F.col("p_retailprice") / 1000).cast("int")
                    .alias("price_band")))
    band = (li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("price_band")
            .agg(F.floor(F.sum("rev") * 100).cast("bigint")
                 .alias("revenue_cents")))
    tot = band.agg(F.sum("revenue_cents").cast("bigint").alias("t"))
    return (band.crossJoin(F.broadcast(tot))
            .select("price_band", "revenue_cents",
                    F.expr("CAST(revenue_cents * 1000000 DIV t AS BIGINT)")
                    .alias("share_ppm"))
            .orderBy("price_band"))


_PBAND_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(l_extendedprice AS DECIMAL(12,4))
         * CAST(1 - l_discount AS DECIMAL(6,4)) AS rev
  FROM lineitem
), band AS (
  SELECT CAST(floor(p_retailprice / 1000) AS INT) AS price_band,
         CAST(floor(sum(rev) * 100) AS BIGINT) AS revenue_cents
  FROM li JOIN part ON l_partkey = p_partkey
  GROUP BY 1
), tot AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS t FROM band)
SELECT price_band, revenue_cents,
       CAST(revenue_cents * 1000000 // t AS BIGINT) AS share_ppm
FROM band, tot
ORDER BY price_band
"""

# ---------------------------------------------------------------------------
# doc_clone — the clone verb surfaced as a driver row (A5; Delta SHALLOW
# CLONE / Iceberg snapshot ref): commit orders, shallow-clone it (a
# metadata-only commit re-referencing the SAME bucket dirs — zero data
# copied), then upsert a delta INTO THE CLONE — copy-on-write isolation
# means the original's head must not move and must read the original
# content.  The output aggregates (original head, clone v0, clone head),
# so the oracle hash-checks both the zero-copy equality and the
# post-divergence isolation.
#
# 100-TB design: shallow clone is O(1) regardless of table size — the
# dev/test-branch primitive every lakehouse ships; the clone's own
# upserts COW only the buckets they touch.
# ---------------------------------------------------------------------------


def doc_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..documents.model import KEY

    store = _fresh_store(spark, "doc_clone_store")
    t = _orders_kv(spark, sf_dir)
    store.upsert(t, "orders_src")                                   # src v0
    store.clone("orders_src", "orders_cln")                         # cln v0
    store.upsert(t.filter(F.col(KEY) % 100 == 7)
                 .withColumn("cents", F.col("cents") + 900),
                 "orders_cln")                                      # cln v1
    return _version_rollup(
        store,
        [([F.lit(label).alias("which"),
           F.lit(v).cast("int").alias("version")], table, v)
         for label, v, table in
         (("src_head", store.version("orders_src"), "orders_src"),
          ("clone_v0", 0, "orders_cln"),
          ("clone_head", store.version("orders_cln"), "orders_cln"))]
    ).orderBy("which")


_CLONE_SQL = """
WITH t AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), base AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM t
), diverged AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents + CASE WHEN k % 100 = 7 THEN 900 ELSE 0 END)
              AS BIGINT) AS s
  FROM t
)
SELECT 'clone_head' AS which, 1 AS version, n AS n_rows, s AS sum_cents
FROM diverged
UNION ALL SELECT 'clone_v0', 0, n, s FROM base
UNION ALL SELECT 'src_head', 0, n, s FROM base
ORDER BY which
"""

# ---------------------------------------------------------------------------
# events_session_length_histogram — batch sessionization census: split
# each user's event timeline at >30-minute silences (the
# stream_session_window gap, derived relationally via gaps-and-islands),
# then census sessions by power-of-two event count.  Gap arithmetic is
# exact epoch-microsecond integers (the streaming-oracle convention —
# second-granularity date_diff had a documented flake zone); the island
# id is a cumulative sum of 0/1 new-session flags.
#
# 100-TB design: one user_id exchange + sort serves BOTH windows (lag
# and the running island sum — same partitioning and ordering, one
# Window exec); the per-session census and the bucket census are
# map-side-combinable.  No global step.
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 1_800_000_000        # 30 min


def events_session_length_histogram(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "event_id", F.unix_micros("ts").alias("us")))
    wu = W.partitionBy("user_id").orderBy("us", "event_id")
    flagged = ev.select(
        "user_id", "us", "event_id",
        F.when(F.col("us") - F.lag("us").over(wu) > _SESSION_GAP_US, 1)
        .when(F.lag("us").over(wu).isNull(), 1)
        .otherwise(0).alias("new_s"))
    sess = (flagged
            .select("user_id",
                    F.sum("new_s").over(
                        wu.rowsBetween(W.unboundedPreceding, 0))
                    .alias("sid"))
            .groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))
    return (sess.groupBy(F.length(F.bin("n_events")).cast("int")
                         .alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
                 F.min("n_events").alias("min_events"),
                 F.max("n_events").alias("max_events"))
            .orderBy("bucket"))


_SESSHIST_SQL = f"""
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {_SESSION_GAP_US} THEN 1
              ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), sess AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events
  FROM (SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
  GROUP BY user_id, sid
)
SELECT CAST(length(bin(n_events)) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_sessions,
       min(n_events) AS min_events, max(n_events) AS max_events
FROM sess
GROUP BY 1
ORDER BY bucket
"""

# ---------------------------------------------------------------------------
# doc_history — the version-log introspection verb surfaced as a driver
# row (A5; Delta DESCRIBE HISTORY / Iceberg snapshots table): commit
# orders (v0), APPEND a key-offset slice (v1 — dir lists grow by one per
# touched bucket), compact (v2 — fragmented buckets merge back to one
# dir).  history() is pure manifest metadata; its n_data_dirs column is
# exactly predictable because bucket id = pmod(key, B) is ARITHMETIC
# (documents/store.py layout note), so the oracle recomputes the
# fragmentation arc relationally: |B₀| → |B₀| + |T₁| → |B₀|.
# commit_ts is wall-clock and excluded from the output.
#
# 100-TB design: history() reads O(versions) tiny manifests, never a
# data dir — the introspection every table format serves from metadata.
# ---------------------------------------------------------------------------

_HIST_BUCKETS = 16


def doc_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..documents.model import KEY

    store = _fresh_store(spark, "doc_history_store",
                         n_buckets=_HIST_BUCKETS)
    t = _orders_kv(spark, sf_dir)
    store.upsert(t, "orders_h")                                     # v0
    off = int(t.agg(F.max(KEY)).collect()[0][0]) + 1
    store.append(t.filter(F.col(KEY) % 100 == 5)
                 .select((F.col(KEY) + F.lit(off)).alias(KEY), "cents"),
                 "orders_h")                                        # v1
    store.compact("orders_h")                                       # v2
    return (store.history("orders_h")
            .select("version", "n_buckets", "n_live_buckets",
                    "n_data_dirs")
            .orderBy("version"))


_HISTORY_SQL = f"""
WITH t AS (SELECT o_orderkey AS k FROM orders),
b0 AS (SELECT CAST(count(DISTINCT k % {_HIST_BUCKETS}) AS INT) AS n FROM t),
t1 AS (
  SELECT CAST(count(DISTINCT (k + (SELECT max(k) + 1 FROM t))
                    % {_HIST_BUCKETS}) AS INT) AS n
  FROM t WHERE k % 100 = 5
),
-- |B0 ∪ T1| computed as a real union (r11 review: emitting b0.n for the
-- v1/v2 live-bucket and v2 dir counts silently assumed T1 ⊆ B0, true
-- only for dense 0..N-1 keys — sparse keys would hash-mismatch)
u AS (
  SELECT CAST(count(DISTINCT b) AS INT) AS n
  FROM (SELECT k % {_HIST_BUCKETS} AS b FROM t
        UNION
        SELECT (k + (SELECT max(k) + 1 FROM t)) % {_HIST_BUCKETS}
        FROM t WHERE k % 100 = 5)
)
SELECT 0 AS version, {_HIST_BUCKETS} AS n_buckets,
       b0.n AS n_live_buckets, b0.n AS n_data_dirs
FROM b0
UNION ALL
SELECT 1, {_HIST_BUCKETS}, u.n, b0.n + t1.n FROM b0, t1, u
UNION ALL
SELECT 2, {_HIST_BUCKETS}, u.n, u.n FROM u
ORDER BY version
"""

# ---------------------------------------------------------------------------
# doc_diff_cdf — the change-data-feed introspection verb surfaced as a
# driver row (A5/b1.17's store-layer sibling; Delta table_changes): v0
# commits orders, v1 MERGEs a delta that updates keys ≡ 1 (mod 100) and
# deletes keys ≡ 2, then diff(0, 1) emits exactly the per-key change
# events.  The output censuses the feed by op with the exact key sums,
# so a spurious event for an untouched key (same-bucket neighbors are
# rewritten by the COW but must fingerprint as unchanged) breaks the
# hash.
#
# 100-TB design: diff is BUCKET-PRUNED — only buckets whose dir lists
# differ between the versions are read (manifest comparison, no full
# scan), and the fingerprint anti-joins are per-bucket equi-joins.
# ---------------------------------------------------------------------------


def doc_diff_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..documents.model import KEY

    store = _fresh_store(spark, "doc_diff_store")
    t = _orders_kv(spark, sf_dir)
    store.upsert(t, "orders_d")                                     # v0
    upd = (t.filter(F.col(KEY) % 100 == 1)
           .withColumn("cents", F.col("cents") + 500))
    dels = (t.filter(F.col(KEY) % 100 == 2)
            .withColumn("cents", F.lit(-1).cast("bigint")))
    store.merge(upd.unionByName(dels), "orders_d",
                delete_when="cents < 0")                            # v1
    return (store.diff("orders_d", 0, 1)
            .groupBy("op")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                 F.sum(KEY).cast("bigint").alias("sum_keys"))
            .orderBy("op"))


_DIFF_SQL = """
WITH t AS (SELECT o_orderkey AS k FROM orders)
SELECT 'delete' AS op, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(k) AS BIGINT) AS sum_keys
FROM t WHERE k % 100 = 2
UNION ALL
SELECT 'upsert', CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT)
FROM t WHERE k % 100 = 1
ORDER BY op
"""

# ---------------------------------------------------------------------------
# q_returned_share_by_brand — per-brand return rate and returned revenue
# (the quality/defect report behind vendor scorecards; Q10 asks WHO
# returned — this asks WHAT gets returned).  Line counts are exact
# integers, the share rides as exact parts-per-million via BIGINT floor
# division, and returned revenue follows the functions/exact.py decimal
# discipline snapped to cents.
#
# 100-TB design: one conditional map-side census per brand after a plain
# part equi-join (part grows with SF — NOT broadcast; AQE decides).  No
# windows, no global step.
# ---------------------------------------------------------------------------


def q_returned_share_by_brand(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from ..functions.exact import dec, dec_factor

    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_partkey",
                  (F.col("l_returnflag") == "R").alias("ret"),
                  (dec("l_extendedprice")
                   * dec_factor(F.lit(1) - F.col("l_discount")))
                  .alias("rev")))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per = (li.join(part, li.l_partkey == part.p_partkey)
           .groupBy("p_brand")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                F.sum(F.when(F.col("ret"), 1).otherwise(0)).cast("bigint")
                .alias("n_returned"),
                F.floor(F.sum(F.when(F.col("ret"), F.col("rev"))
                              .otherwise(F.lit(0).cast("decimal(12,4)")))
                        * 100).cast("bigint").alias("returned_cents")))
    return (per.select("p_brand", "n_lines", "n_returned",
                       F.expr("CAST(n_returned * 1000000 DIV n_lines "
                              "AS BIGINT)").alias("returned_ppm"),
                       "returned_cents")
            .orderBy("p_brand"))


_RETSHARE_SQL = """
WITH li AS (
  SELECT l_partkey, l_returnflag = 'R' AS ret,
         CAST(l_extendedprice AS DECIMAL(12,4))
         * CAST(1 - l_discount AS DECIMAL(6,4)) AS rev
  FROM lineitem
), per AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN ret THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returned,
         CAST(floor(sum(CASE WHEN ret THEN rev
                             ELSE CAST(0 AS DECIMAL(12,4)) END) * 100)
              AS BIGINT) AS returned_cents
  FROM li JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, n_lines, n_returned,
       CAST(n_returned * 1000000 // n_lines AS BIGINT) AS returned_ppm,
       returned_cents
FROM per
ORDER BY p_brand
"""

# Promoted round 12 (r11 verdict next-round #2); empty STAGED kept so the
# staged-protocol tests can pin that nothing is both staged and registered.
from ..registry import register  # noqa: E402  (promotion epilogue)

for _name, (_fn, _sql) in {
    "doc_restore": (doc_restore, _RESTORE_SQL),
    "q_returned_share_by_brand": (q_returned_share_by_brand,
                                  _RETSHARE_SQL),
    "doc_clone": (doc_clone, _CLONE_SQL),
    "doc_history": (doc_history, _HISTORY_SQL),
    "doc_diff_cdf": (doc_diff_cdf, _DIFF_SQL),
    "events_session_length_histogram": (events_session_length_histogram,
                                        _SESSHIST_SQL),
    "doc_compact": (doc_compact, _COMPACT_SQL),
    "doc_rebucket": (doc_rebucket, _REBUCKET_SQL),
    "q_orders_open_aging": (q_orders_open_aging, _AGING_SQL),
    "q_supplier_lineload": (q_supplier_lineload, _LINELOAD_SQL),
    "window_reorder_interval": (window_reorder_interval, _REORDER_SQL),
    "window_user_value_trend": (window_user_value_trend, _TREND_SQL),
    "q_price_band_share": (q_price_band_share, _PBAND_SQL),
}.items():
    register(_name, _sql)(_fn)

STAGED: dict = {}
