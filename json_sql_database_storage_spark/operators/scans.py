"""Source / sink operators (SURVEY.md §2 B1).

Reference parity: the reference's only "sources" are a JsonObject in and a
SQLite row out (DatabaseManager.java:118/:253); its storage is row-oriented
SQLite.  Here the storage layer is columnar Parquet read through Spark's
vectorized reader with pushdown/pruning, plus JSON/CSV/in-memory ingest and
append/partitioned/JSON-lines sinks.

Sink queries write under /tmp (overwrite mode — rerun-safe) and return the
read-back result, so the checks exercise the full write→read cycle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources import load_table

_SINK_ROOT = os.path.join(tempfile.gettempdir(), "json_sql_dbs_spark_sinks")


_CLEANUP_REGISTERED: set[str] = set()
_STALE_SINK_SECONDS = 24 * 3600


def _sink(name: str, spark: SparkSession | None = None) -> str:
    """Scratch-sink path for write-then-read exhibits.  When a session is
    supplied the path is scoped by its applicationId so two concurrent
    sessions (pytest + bench, or the driver alongside either) never
    overwrite / half-read each other's sink mid-query.

    Lifecycle: each process removes its own applicationId directory at
    exit, and the first _sink call also sweeps sibling directories older
    than a day (left by crashed runs) — without this, every run would
    leak a full set of sink outputs in the temp dir.  Every call touches
    the live session's own directory (directory mtime otherwise only
    moves on direct-entry changes), so a >24h session whose sinks have
    gone idle is never mistaken for a crashed run by a newer process's
    sweep."""
    root = _SINK_ROOT
    if spark is not None:
        app_id = spark.sparkContext.applicationId
        root = os.path.join(root, app_id)
        if app_id not in _CLEANUP_REGISTERED:
            _CLEANUP_REGISTERED.add(app_id)
            import atexit
            import shutil
            import time

            atexit.register(shutil.rmtree, root, ignore_errors=True)
            try:
                cutoff = time.time() - _STALE_SINK_SECONDS
                for entry in os.scandir(_SINK_ROOT):
                    if (entry.is_dir() and entry.name != app_id
                            and entry.stat().st_mtime < cutoff):
                        shutil.rmtree(entry.path, ignore_errors=True)
            except OSError:
                pass
    os.makedirs(root, exist_ok=True)
    if spark is not None:
        try:
            os.utime(root)
        except OSError:
            pass
    return os.path.join(root, name)


# b1.1 parquet scan (vectorized columnar read)
@register(
    "scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    tags=("b1.1",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load_table(spark, sf_dir, "region")
            .select("r_regionkey", "r_name").orderBy("r_regionkey"))


# b1.3 JSON-string column parse (from_json with explicit schema)
@register(
    "scan_json_column",
    oracle="""
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
ORDER BY event_id
""",
    tags=("b1.3",),
)
def scan_json_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return (
        ev.select("event_id", parsed["k"].alias("k"))
        .filter(F.col("k") > 50)
        .orderBy("event_id")
    )


# b1.4 CSV sink + scan round trip: nation → csv (header) → read back with
# explicit schema; values must survive the text round trip.
@register(
    "scan_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    tags=("b1.4",),
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    path = _sink("nation_csv", spark)
    n.write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ])
    return (spark.read.schema(schema).option("header", "true").csv(path)
            .orderBy("n_nationkey"))


# b1.5 in-memory source (createDataFrame) — literal rows, VALUES oracle
_CALENDAR = [(1, "Q1"), (2, "Q1"), (3, "Q1"), (4, "Q2"), (5, "Q2"), (6, "Q2"),
             (7, "Q3"), (8, "Q3"), (9, "Q3"), (10, "Q4"), (11, "Q4"), (12, "Q4")]


@register(
    "scan_in_memory",
    oracle="""
WITH cal(m, quarter) AS (VALUES {values})
SELECT quarter, count(*) AS n_months, CAST(sum(m) AS BIGINT) AS month_sum
FROM cal GROUP BY quarter ORDER BY quarter
""".format(values=", ".join(f"({m}, '{q}')" for m, q in _CALENDAR)),
    tags=("b1.5",),
)
def scan_in_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    cal = spark.createDataFrame(_CALENDAR, "m INT, quarter STRING")
    return (
        cal.groupBy("quarter")
        .agg(F.count(F.lit(1)).alias("n_months"),
             F.sum("m").cast("bigint").alias("month_sum"))
        .orderBy("quarter")
    )


# b1.6 parquet append sink (A4 parity): two appends → read back must hold
# both batches exactly once each.  Oracle = what the read-back must equal if
# append-exactly-once holds: one full copy of region per batch.
@register(
    "sink_parquet_append",
    oracle="""
SELECT 1 AS batch, count(*) AS n_rows FROM region
UNION ALL
SELECT 2 AS batch, count(*) AS n_rows FROM region
ORDER BY batch
""",
    tags=("b1.6", "A4", "A6"),
)
def sink_parquet_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    path = _sink("region_append", spark)
    r.write.mode("overwrite").parquet(path)          # reset
    r.withColumn("batch", F.lit(2)).write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        back.groupBy(F.coalesce("batch", F.lit(1)).alias("batch"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("batch")
    )


# b1.7 partitioned sink: hive-style partition dirs; reading one partition
# back must prune to that directory (partition pruning at the file listing,
# the 100-TB-critical access path).  Oracle = the same aggregate straight
# off the source table: the write→prune→read cycle must be lossless.
@register(
    "sink_partitioned",
    oracle="""
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS qty
FROM lineitem
WHERE l_returnflag = 'R'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("b1.7",),
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    path = _sink("lineitem_by_flag", spark)
    (li.select("l_orderkey", "l_quantity", "l_returnflag")
       .write.mode("overwrite").partitionBy("l_returnflag").parquet(path))
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return (
        back.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum(F.col("l_quantity").cast("decimal(12,4)")).cast("double")
              .alias("qty"))
        .orderBy("l_returnflag")
    )


# b1.2 JSON file ingest with schema inference (A1 parity at file level):
# write documents as JSON lines, re-ingest with inference.  Oracle = the
# same aggregate on the source rows: the JSON round-trip must be lossless.
@register(
    "scan_json_ingest_inference",
    oracle="""
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE doc_id < 100
GROUP BY lang
ORDER BY lang
""",
    tags=("b1.2", "A1"),
)
def scan_json_ingest_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    path = _sink("documents_jsonl", spark)
    d.select(F.to_json(F.struct("doc_id", "text", "lang", "n_chars"))
             .alias("value")).write.mode("overwrite").text(path)
    back = spark.read.json(path)   # schema inferred
    return (
        back.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"))
        .orderBy("lang")
    )


def jdbc_source(spark: SparkSession, url: str, table: str,
                **options) -> DataFrame:
    """b1.10 JDBC source (the reference's SQLite analog, DatabaseManager.java
    :59-69).  Requires the matching JDBC driver jar on the classpath; see
    ensure_jdbc_driver for runtime loading from a local artifact cache."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


_DUCKDB_DRIVER = "org.duckdb.DuckDBDriver"


def find_jdbc_jar(pattern: str = "duckdb_jdbc*.jar") -> str | None:
    """Locate a JDBC driver jar in the standard local artifact-cache layouts
    (coursier / ivy / maven).  Environment discovery only — nothing is
    downloaded."""
    import glob as _glob

    for base in ("~/.cache/coursier", "~/.ivy2", "~/.m2"):
        hits = _glob.glob(os.path.expanduser(f"{base}/**/{pattern}"),
                          recursive=True)
        if hits:
            return sorted(hits)[-1]
    return None


def ensure_jdbc_driver(spark: SparkSession, jar: str,
                       driver_class: str = _DUCKDB_DRIVER) -> None:
    """Make a JDBC driver loadable in an already-running session.

    Spark's context classloader is a MutableURLClassLoader, so a jar can be
    appended at runtime — the only way to attach a driver when the session
    was built by an external harness (classpath fixed at JVM launch).  In
    local mode the driver and executors share this loader; on a real cluster
    you'd ship the jar with --jars instead (executor side needs it too).
    Idempotent: returns fast if the class already resolves."""
    jvm = spark._jvm
    loader = jvm.java.lang.Thread.currentThread().getContextClassLoader()
    try:
        jvm.java.lang.Class.forName(driver_class, False, loader)
        return
    except Exception:
        pass
    loader.addURL(jvm.java.net.URL("file://" + jar))
    jvm.java.lang.Class.forName(driver_class, False, loader)


def _jdbc_execute(spark: SparkSession, url: str, *statements: str) -> None:
    """Run DDL over a direct driver connection (py4j).  Needed because
    Spark's JDBC writer probes table existence with a SELECT that some
    embedded engines report as a catalog *error* rather than empty — so we
    create the target table ourselves and append."""
    jvm = spark._jvm
    loader = jvm.java.lang.Thread.currentThread().getContextClassLoader()
    cls = jvm.java.lang.Class.forName(_DUCKDB_DRIVER, True, loader)
    driver = cls.newInstance()
    conn = driver.connect(url, jvm.java.util.Properties())
    try:
        st = conn.createStatement()
        for sql in statements:
            st.execute(sql)
        st.close()
    finally:
        conn.close()


# b1.10 JDBC source + sink round trip.  The reference's entire storage layer
# is an embedded SQL database reached over JDBC (SQLite,
# DatabaseManager.java:59-69); the parity exhibit writes a table out through
# Spark's JDBC sink into an embedded DuckDB file, reads it back through the
# JDBC *source* with a partitioned (parallel) scan, and aggregates — so both
# directions and the partition-pushdown path are exercised.  The aggregate
# recomputed from the original parquet is the oracle.
@register(
    "scan_jdbc_roundtrip",
    oracle="""
SELECT n_regionkey,
       count(*)                         AS n_nations,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
       min(n_name)                      AS first_name
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
    tags=("b1.10",),
)
def scan_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    jar = find_jdbc_jar()
    if jar is None:
        raise EnvironmentError(
            "no duckdb_jdbc jar found in local artifact caches — "
            "b1.10 requires a JDBC driver jar (see COVERAGE.md)")
    ensure_jdbc_driver(spark, jar)

    db = _sink("jdbc_roundtrip.duckdb", spark)
    for suffix in ("", ".wal"):
        if os.path.exists(db + suffix):
            os.remove(db + suffix)
    url = f"jdbc:duckdb:{db}"
    _jdbc_execute(
        spark, url,
        "CREATE TABLE nation_jdbc (n_nationkey INTEGER, n_name VARCHAR, "
        "n_regionkey INTEGER)")

    n = load_table(spark, sf_dir, "nation")
    (n.select("n_nationkey", "n_name", "n_regionkey")
     .coalesce(1)   # embedded single-file target: one writer connection
     .write.format("jdbc")
     .option("url", url).option("dbtable", "nation_jdbc")
     .option("driver", _DUCKDB_DRIVER)
     .mode("append").save())

    back = (
        spark.read.format("jdbc")
        .option("url", url).option("dbtable", "nation_jdbc")
        .option("driver", _DUCKDB_DRIVER)
        # partitioned read: 4 parallel range-pruned scans, the shape a
        # sharded JDBC ingest takes on a cluster
        .option("partitionColumn", "n_nationkey")
        .option("lowerBound", "0").option("upperBound", "25")
        .option("numPartitions", "4")
        .load())
    return (
        back.groupBy(F.col("n_regionkey").cast("int").alias("n_regionkey"))
        .agg(F.count(F.lit(1)).alias("n_nations"),
             F.sum(F.col("n_nationkey").cast("bigint")).cast("bigint")
              .alias("key_sum"),
             F.min("n_name").alias("first_name"))
        .orderBy("n_regionkey")
    )


# b1.12 ORC sink + scan round trip: Spark's second first-class columnar
# format (vectorized reader, predicate pushdown, column pruning — the same
# 100-TB access-path properties as parquet, and the interchange format a
# Hive-era warehouse hands you).  orders → ORC → read back with pushdown
# filter → aggregate; oracle = the identical aggregate straight off the
# parquet source, so the write→read cycle must be lossless.
@register(
    "scan_orc_roundtrip",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("b1.12",),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    path = _sink("orders_orc", spark)
    (o.select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
       .write.mode("overwrite").orc(path))
    back = spark.read.orc(path).filter(F.col("o_orderstatus") == "O")
    return (
        back.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double")
              .alias("total_price"))
        .orderBy("o_orderpriority")
    )


# b1.13 small-file compaction — the table-maintenance job every long-lived
# 100-TB table needs: streaming appends and partitioned writes accrete
# thousands of small files whose per-file open/footer cost eventually
# dominates scan time, and compaction rewrites them into few large files.
# Here: fragment a lineitem projection into 64 files, compact to 4, and
# emit (planned vs measured file counts, row count, exact quantity sum) —
# the oracle pins the invariant that compaction moved bytes without
# creating/dropping/duplicating a single row.  At scale the same job runs
# per table-partition with a target file SIZE; the explicit counts here
# keep the exhibit deterministic for the hash check.
@register(
    "sink_compaction",
    oracle="""
SELECT CAST(64 AS BIGINT) AS n_files_before, CAST(4 AS BIGINT) AS n_files_after,
       count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
FROM lineitem
""",
    tags=("b1.13",),
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag")
    frag = _sink("lineitem_fragmented", spark)
    li.repartition(64).write.mode("overwrite").parquet(frag)
    comp = _sink("lineitem_compacted", spark)
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(comp)

    def _n_part_files(path: str) -> int:
        return len([f for f in os.listdir(path)
                    if f.startswith("part-") and f.endswith(".parquet")])

    back = spark.read.parquet(comp)
    return back.agg(
        F.lit(_n_part_files(frag)).cast("bigint").alias("n_files_before"),
        F.lit(_n_part_files(comp)).cast("bigint").alias("n_files_after"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(12,4)")).cast("double")
         .alias("sum_qty"),
    )


# b1.14 range-sorted write for data skipping — the layout-maintenance twin
# of compaction: repartitionByRange + sortWithinPartitions on the filter
# column clusters each value range into few files AND few row groups, so a
# time-range scan reads a fraction of the table from parquet min/max stats
# alone (the 100-TB access pattern behind every date-partitioned fact
# table).  The read-back filter must land in PushedFilters (asserted in
# tests/test_plans.py); the oracle is the same aggregate off the unsorted
# source — layout changes bytes on disk, never results.
@register(
    "sink_range_sorted_skipping",
    oracle="""
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("b1.14",),
)
def sink_range_sorted_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity", "l_returnflag")
    path = _sink("lineitem_range_sorted", spark)
    (li.repartitionByRange(8, "l_shipdate")
       .sortWithinPartitions("l_shipdate")
       .write.mode("overwrite").parquet(path))
    back = (spark.read.parquet(path)
            .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                    & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))))
    return (
        back.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum(F.col("l_quantity").cast("decimal(12,4)")).cast("double")
              .alias("sum_qty"))
        .orderBy("l_returnflag")
    )


def _morton16(a: F.Column, b: F.Column) -> F.Column:
    """Morton (Z-order) code interleaving the low 16 bits of two keys:
    bit i of `a` → position 2i, bit i of `b` → 2i+1.  Pure JVM bit
    arithmetic — one projection, no shuffle, exactly the OPTIMIZE ZORDER
    primitive lakehouse table formats run, expressed on plain parquet.

    Callers must feed NORMALIZED keys (same bit width): raw keys of
    different magnitudes degenerate the code to a sort on the wider key —
    measured on lineitem, raw (partkey 11-bit, suppkey 7-bit) interleaving
    left suppkey spanning its full range in every output file because
    partkey's high bits outrank every suppkey bit."""
    z = F.lit(0).cast("long")
    for i in range(16):
        z = z.bitwiseOR(F.shiftleft(
            F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(F.shiftleft(
            F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def _norm16(col: F.Column, lo: int, hi: int) -> F.Column:
    """Scale a key from [lo, hi] onto the full 16-bit [0, 65535] range so
    both interleaved dimensions carry equal weight at every bit position.
    At 100 TB the bounds come from table statistics; here a 2-value agg."""
    span = max(hi - lo, 1)
    return ((col - F.lit(lo)).cast("double") * F.lit(65535.0 / span)) \
        .cast("long")


# b1.15 Z-order clustered write — multi-dimensional data skipping, the
# layout move range-sorting (b1.14) cannot make: sorting on one key leaves
# the other scattered through every file, so only one dimension ever skips.
# Interleaving the bit patterns of BOTH join/filter keys into one Morton
# code and range-sorting on it keeps each file's min/max tight on each key
# simultaneously — a (partkey AND suppkey) box predicate prunes files/row
# groups on either dimension at 100 TB.  Layout never changes results: the
# oracle is the identical box aggregate straight off the unsorted source.
@register(
    "sink_zorder_skipping",
    oracle="""
SELECT count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
       CAST(min(l_partkey) AS BIGINT) AS min_pk,
       CAST(max(l_suppkey) AS BIGINT) AS max_sk
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 10 AND 60
""",
    tags=("b1.15",),
)
def sink_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    path = _sink("lineitem_zorder", spark)
    # key bounds for normalization: a 4-value agg (the layout job's
    # equivalent of reading table stats — bounded driver traffic)
    bounds = li.agg(
        F.min("l_partkey").alias("pk_lo"), F.max("l_partkey").alias("pk_hi"),
        F.min("l_suppkey").alias("sk_lo"), F.max("l_suppkey").alias("sk_hi"),
    ).first()
    z = _morton16(
        _norm16(F.col("l_partkey"), bounds["pk_lo"], bounds["pk_hi"]),
        _norm16(F.col("l_suppkey"), bounds["sk_lo"], bounds["sk_hi"]))
    (li.withColumn("zcode", z)
       .repartitionByRange(8, "zcode")
       .sortWithinPartitions("zcode")
       .drop("zcode")
       .write.mode("overwrite").parquet(path))
    back = (spark.read.parquet(path)
            .filter(F.col("l_partkey").between(100, 400)
                    & F.col("l_suppkey").between(10, 60)))
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(12,4)")).cast("double")
         .alias("sum_qty"),
        F.min("l_partkey").cast("bigint").alias("min_pk"),
        F.max("l_suppkey").cast("bigint").alias("max_sk"),
    )


# b1.21 (r5 addendum) federated three-source join: parquet fact ⨝ CSV
# dimension ⨝ JDBC dimension in ONE Catalyst plan — the "put JSON where SQL
# can reach it" contract generalized to "put ANY source where one query can
# reach it", which is the practical reason a lakehouse engine replaces the
# reference's single-JDBC-database design (DatabaseManager.java:59-69).
# Each source keeps its own access path (parquet column pruning; CSV schema
# read; JDBC pushdown) and the optimizer broadcasts both dimension sides.
@register(
    "scan_federated_join",
    oracle="""
SELECT n_name,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    tags=("b1.21",),
)
def scan_federated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dimension 1 → CSV (header + explicit schema read-back)
    cust_csv = _sink("customer_fed_csv", spark)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    c.write.mode("overwrite").option("header", True).csv(cust_csv)
    c_back = (spark.read.option("header", True)
              .schema("c_custkey BIGINT, c_nationkey BIGINT").csv(cust_csv))

    # dimension 2 → embedded DuckDB over JDBC
    jar = find_jdbc_jar()
    if jar is None:
        raise EnvironmentError("no duckdb_jdbc jar found (see COVERAGE.md)")
    ensure_jdbc_driver(spark, jar)
    db = _sink("federated.duckdb", spark)
    for suffix in ("", ".wal"):
        if os.path.exists(db + suffix):
            os.remove(db + suffix)
    url = f"jdbc:duckdb:{db}"
    _jdbc_execute(
        spark, url,
        "CREATE TABLE nation_fed (n_nationkey INTEGER, n_name VARCHAR)")
    (load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
     .coalesce(1).write.format("jdbc")
     .option("url", url).option("dbtable", "nation_fed")
     .option("driver", _DUCKDB_DRIVER).mode("append").save())
    n_back = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", "nation_fed")
              .option("driver", _DUCKDB_DRIVER).load()
              .select(F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
                      "n_name"))

    # fact stays parquet; both dims broadcast into one plan
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    return (
        o.join(F.broadcast(c_back), o.o_custkey == c_back.c_custkey)
        .join(F.broadcast(n_back),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum("cents").cast("bigint").alias("total_cents"))
        .orderBy("n_name")
    )
