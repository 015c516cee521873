"""Scalar function groups (SURVEY.md §2 B8).

Reference parity: the reference's expression surface is its type-inference
rules (DatabaseManager.java:514-534) plus whatever SQL its backend evaluates;
this module is that expression surface, Spark-native.  Every function here is
a built-in pyspark.sql.functions call — JVM-side, inside whole-stage codegen,
never a Python UDF (the b10 module exists to exercise UDFs deliberately).

Dialect parity notes (verified against DuckDB 1.0):
- double→string and timestamp→string both use shortest / trailing-zero-
  trimmed forms in both engines;
- double→int casts TRUNCATE in Spark but round-half-even in DuckDB — oracle
  uses CAST(trunc(x) AS BIGINT) to mirror Spark;
- pmod(a,b) ↔ ((a % b) + b) % b;
- libm-backed fns (log/exp/pow) are rounded to 6dp: engine libms may differ
  in the last ulp, and irrational results never sit on decimal boundaries,
  so 6dp rounding is flap-free (unlike rounding exact decimal products).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources import load_table


# ---------------------------------------------------------------------------
# b8.1 string functions
# ---------------------------------------------------------------------------

@register(
    "fn_string",
    oracle="""
SELECT
  p_partkey,
  upper(p_name)                                   AS name_upper,
  lower(p_type)                                   AS type_lower,
  length(p_name)                                  AS name_len,
  substring(p_name, 1, 5)                         AS name_pre,
  concat_ws('|', p_brand, p_type)                 AS brand_type,
  trim('  ' || p_brand || ' ')                    AS brand_trim,
  split_part(p_type, ' ', 1)                      AS type_first_word,
  regexp_extract(p_type, '([A-Z]+)$', 1)          AS type_last_word,
  regexp_replace(p_name, '[aeiou]', '_', 'g')     AS name_devoweled,
  strpos(p_type, 'BRASS')                         AS brass_at,
  lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
  reverse(p_brand)                                AS brand_rev,
  replace(p_type, ' ', '-')                       AS type_dashed
FROM part
ORDER BY p_partkey
""",
    tags=("b8.1",),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.lower("p_type").alias("type_lower"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_pre"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
            F.split(F.col("p_type"), " ")[0].alias("type_first_word"),
            F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_last_word"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
            F.instr("p_type", "BRASS").cast("bigint").alias("brass_at"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.reverse("p_brand").alias("brand_rev"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("-")).alias("type_dashed"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# b8.2 date/time functions
# ---------------------------------------------------------------------------

@register(
    "fn_datetime",
    oracle="""
SELECT
  o_orderkey,
  year(o_orderdate)                                   AS y,
  month(o_orderdate)                                  AS m,
  day(o_orderdate)                                    AS d,
  CAST(quarter(o_orderdate) AS INTEGER)               AS q,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  date_diff('day', o_orderdate,
            TIMESTAMP '2000-01-01 00:00:00')          AS days_to_y2k,
  CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR)     AS due_date,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR)          AS order_day,
  epoch_us(o_orderdate)                               AS us_epoch,
  CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR)     AS ym,
  CAST(date_part('dow', o_orderdate) AS INTEGER)      AS dow
FROM orders
ORDER BY o_orderkey
""",
    tags=("b8.2",),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
            F.quarter("o_orderdate").alias("q"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.datediff(F.lit("2000-01-01").cast("date"),
                       F.col("o_orderdate").cast("date")).cast("bigint")
             .alias("days_to_y2k"),
            F.date_add(F.col("o_orderdate").cast("date"), 30)
             .cast("string").alias("due_date"),
            F.col("o_orderdate").cast("date").cast("string").alias("order_day"),
            # parquet ms-timestamps load as TIMESTAMP_NTZ; cast is identity
            # under the pinned UTC session zone
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us_epoch"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# b8.3 math functions
# ---------------------------------------------------------------------------

@register(
    "fn_math",
    oracle="""
SELECT
  l_orderkey, l_linenumber,
  abs(l_quantity - 25)                                  AS qty_dev,
  ceil(l_discount * 100)                                AS disc_pct_ceil,
  floor(l_quantity / 7)                                 AS qty_div7,
  pow(l_quantity, 2)                                    AS qty_sq,
  sqrt(l_quantity)                                      AS qty_sqrt,
  round(ln(l_extendedprice), 6)                         AS price_ln,
  round(log10(l_extendedprice), 6)                      AS price_log10,
  round(exp(l_discount), 6)                             AS disc_exp,
  ((CAST(l_linenumber AS BIGINT) - 4) % 3 + 3) % 3      AS line_pmod,
  CAST(sign(l_quantity - 25) AS BIGINT)                 AS qty_sign
FROM lineitem
WHERE l_orderkey <= 300
ORDER BY l_orderkey, l_linenumber
""",
    tags=("b8.3",),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 300)
        .select(
            "l_orderkey", "l_linenumber",
            F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
            F.ceil(F.col("l_discount") * 100).cast("double").alias("disc_pct_ceil"),
            F.floor(F.col("l_quantity") / 7).cast("double").alias("qty_div7"),
            F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
            F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
            F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
            F.round(F.exp("l_discount"), 6).alias("disc_exp"),
            F.pmod(F.col("l_linenumber").cast("bigint") - 4, F.lit(3)).alias("line_pmod"),
            F.signum(F.col("l_quantity") - 25).cast("bigint").alias("qty_sign"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# b8.4 null / conditional functions
# ---------------------------------------------------------------------------

@register(
    "fn_null_conditional",
    oracle="""
SELECT
  c_custkey,
  coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT')  AS seg_or_default,
  ifnull(nullif(c_acctbal, 0.0), -1.0)                   AS bal_nvl,
  greatest(c_acctbal, 5000.0)                            AS bal_floor5k,
  least(c_acctbal, 5000.0)                               AS bal_cap5k,
  greatest(c_custkey, c_nationkey)                       AS max_key,
  CASE WHEN c_acctbal IS NULL THEN 'null' ELSE 'set' END AS bal_state
FROM customer
ORDER BY c_custkey
""",
    tags=("b8.4",),
)
def fn_null_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("DEFAULT"))
             .alias("seg_or_default"),
            F.nvl(F.nullif("c_acctbal", F.lit(0.0)), F.lit(-1.0)).alias("bal_nvl"),
            F.greatest("c_acctbal", F.lit(5000.0)).alias("bal_floor5k"),
            F.least("c_acctbal", F.lit(5000.0)).alias("bal_cap5k"),
            F.greatest(F.col("c_custkey"), F.col("c_nationkey").cast("bigint"))
             .alias("max_key"),
            F.when(F.col("c_acctbal").isNull(), "null").otherwise("set")
             .alias("bal_state"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# b8.5 cast / conversion.  double→int mirrors Spark truncation via
# CAST(trunc(x)) on the DuckDB side (DuckDB rounds by default).
# ---------------------------------------------------------------------------

@register(
    "fn_cast",
    oracle="""
SELECT
  o_orderkey,
  CAST(o_orderkey AS DOUBLE)                          AS key_dbl,
  CAST(trunc(o_totalprice) AS BIGINT)                 AS price_int,
  CAST(CAST(o_totalprice AS DECIMAL(14,4)) AS VARCHAR) AS price_dec_str,
  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT)         AS key_roundtrip,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR)          AS od_str,
  CAST(o_orderstatus = 'F' AS INTEGER)                AS is_f_int,
  CAST(CAST(o_custkey % 32768 AS SMALLINT) AS INTEGER) AS custkey_16
FROM orders
ORDER BY o_orderkey
""",
    tags=("b8.5",),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.col("o_orderkey").cast("double").alias("key_dbl"),
            F.col("o_totalprice").cast("bigint").alias("price_int"),
            F.col("o_totalprice").cast("decimal(14,4)").cast("string")
             .alias("price_dec_str"),
            F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
            F.col("o_orderdate").cast("date").cast("string").alias("od_str"),
            (F.col("o_orderstatus") == "F").cast("int").alias("is_f_int"),
            # bounded before the narrowing cast: raw custkeys exceed int16
            # above sf~0.25 and ANSI mode would throw instead of wrapping
            F.pmod(F.col("o_custkey"), F.lit(32768)).cast("short").cast("int")
             .alias("custkey_16"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# b8.6 array functions over the embedding vectors (multimodal column b11.8:
# dense float vectors as first-class ArrayType columns)
# ---------------------------------------------------------------------------

def _micro_json(arr: F.Column) -> F.Column:
    """Render a float array as a JSON string of exact micro-unit BIGINTs."""
    return F.to_json(F.transform(
        arr,
        lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5))
                   .cast("bigint")))


@register(
    "fn_array",
    oracle="""
SELECT
  vec_id,
  len(embedding)                                    AS dim,
  embedding[1]                                      AS first_coord,
  list_max(embedding)                               AS coord_max,
  list_min(embedding)                               AS coord_min,
  CAST(to_json(list_transform(embedding[1:4],
       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)))
       AS VARCHAR)                                  AS head4,
  CAST(to_json(list_transform(list_sort(embedding[1:4]),
       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)))
       AS VARCHAR)                                  AS head4_sorted,
  CAST(list_contains(embedding, 0.0) AS BIGINT)     AS has_zero,
  CAST(to_json(list_transform(flatten([embedding[1:2], embedding[3:4]]),
       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)))
       AS VARCHAR)                                  AS recombined,
  CAST(list_distinct(embedding[1:3]) IS NOT NULL AS BIGINT) AS distinct_ok
FROM embeddings
ORDER BY vec_id
""",
    tags=("b8.6", "b11.8"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    a = F.col("embedding")
    return (
        e.select(
            "vec_id",
            F.size(a).cast("bigint").alias("dim"),
            a[0].alias("first_coord"),
            F.array_max(a).alias("coord_max"),
            F.array_min(a).alias("coord_min"),
            # Array outputs render as JSON strings of exact micro-units:
            # float32→double widening is exact, and floor(x*1e6+0.5) is the
            # same IEEE op in both engines, so the int arrays are
            # bit-identical — raw double arrays are NOT (the engines differ
            # on double→JSON scientific-notation thresholds).
            _micro_json(F.slice(a, 1, 4)).alias("head4"),
            _micro_json(F.array_sort(F.slice(a, 1, 4))).alias("head4_sorted"),
            F.array_contains(a, F.lit(0.0)).cast("bigint").alias("has_zero"),
            _micro_json(F.flatten(F.array(F.slice(a, 1, 2), F.slice(a, 3, 2))))
            .alias("recombined"),
            F.array_distinct(F.slice(a, 1, 3)).isNotNull().cast("bigint")
            .alias("distinct_ok"),
        )
        .orderBy("vec_id")
    )


# b8.6b explode / posexplode (row-generating array ops)
@register(
    "fn_array_explode",
    oracle="""
SELECT vec_id,
       CAST(unnest(range(len(embedding[1:8]))) AS INTEGER) AS pos,
       unnest(embedding[1:8]) AS coord
FROM embeddings
WHERE vec_id < 20
ORDER BY vec_id, pos
""",
    tags=("b8.6",),
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") < 20)
        .select("vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "coord"))
        .orderBy("vec_id", "pos")
    )


# ---------------------------------------------------------------------------
# b8.7 map functions — props is single-key ({"k": int}, FIXTURES.md), so
# every map projection is deterministic.  Oracle builds structs where Spark
# builds maps: DuckDB MAPs reach pandas as {key: [...], value: [...]}, while
# single-entry structs canonicalize to the same {k: v} shape as Spark maps.
# ---------------------------------------------------------------------------

@register(
    "fn_map",
    oracle="""
SELECT event_id,
       CAST(to_json(struct_pack(
         k := CAST(json_extract(props, '$.k') AS BIGINT))) AS VARCHAR)
         AS props_map,
       CAST(to_json(['k']) AS VARCHAR) AS keys,
       CAST(to_json([CAST(json_extract(props, '$.k') AS BIGINT)]) AS VARCHAR)
         AS values,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
       CAST(to_json(struct_pack(event_type := event_type)) AS VARCHAR)
         AS meta_map
FROM events
ORDER BY event_id
""",
    tags=("b8.7",),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Map/array outputs render as canonical JSON strings (driver hasher
    # cannot hash lists/dicts); single-key maps make the key order — Spark
    # map order vs DuckDB struct field order — trivially identical.
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), T.MapType(T.StringType(), T.LongType()))
    return (
        ev.select(
            "event_id",
            F.to_json(m).alias("props_map"),
            F.to_json(F.map_keys(m)).alias("keys"),
            F.to_json(F.map_values(m)).alias("values"),
            F.element_at(m, "k").alias("k_value"),
            F.to_json(F.map_from_entries(
                F.array(F.struct(F.lit("event_type").alias("key"),
                                 F.col("event_type").alias("value")))
            )).alias("meta_map"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# b8.8 JSON expression functions on the events.props JSON-string column —
# the expression-level twin of the reference's document shred/assemble
# (DatabaseManager.java:118-241/280-381 work at document granularity; these
# work per-value inside a column).
# ---------------------------------------------------------------------------

@register(
    "fn_json",
    oracle="""
SELECT
  event_id,
  json_extract_string(props, '$.k')                 AS k_str,
  CAST(json_extract(props, '$.k') AS BIGINT)        AS k_int,
  json_extract_string(props, '$.missing')           AS missing_val,
  CAST(json_valid(props) AS BIGINT)                 AS is_valid
FROM events
ORDER BY event_id
""",
    tags=("b8.8",),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), T.StructType(
        [T.StructField("k", T.LongType())]))
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            parsed["k"].alias("k_int"),
            F.get_json_object("props", "$.missing").alias("missing_val"),
            F.get_json_object("props", "$").isNotNull().cast("bigint")
             .alias("is_valid"),
        )
        .orderBy("event_id")
    )


# b8.8b to_json / from_json round-trip + schema_of_json.  Both engines
# render compact {"k":69} JSON for structs (verified cell-for-cell), and
# schema_of_json of a literal is a constant, so the round-trip is
# oracle-checkable.
@register(
    "fn_json_roundtrip",
    oracle="""
SELECT event_id, props,
       CAST(to_json(struct_pack(
         k := CAST(json_extract(props, '$.k') AS BIGINT))) AS VARCHAR)
         AS rebuilt,
       'STRUCT<k: BIGINT>' AS inferred_schema,
       CAST(to_json(struct_pack(event_id := event_id,
                                event_type := event_type)) AS VARCHAR)
         AS event_doc
FROM events
ORDER BY event_id
""",
    tags=("b8.8",),
)
def fn_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = F.from_json(F.col("props"), schema)
    return (
        ev.select(
            "event_id",
            "props",
            F.to_json(parsed).alias("rebuilt"),
            F.schema_of_json(F.lit('{"k": 87}')).alias("inferred_schema"),
            F.to_json(F.struct("event_id", "event_type")).alias("event_doc"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# b8.9 hash / checksum functions
# ---------------------------------------------------------------------------

@register(
    "fn_hash",
    oracle="""
SELECT
  doc_id,
  md5(text)     AS text_md5,
  sha256(text)  AS text_sha256
FROM documents
ORDER BY doc_id
""",
    tags=("b8.9",),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.sha2("text", 256).alias("text_sha256"),
        )
        .orderBy("doc_id")
    )


# b8.9b spark-specific hashes (xxhash64 / murmur3 / crc32 /
# monotonically_increasing_id).  The raw values have no DuckDB twin, so the
# registered output is the invariant summary DuckDB CAN check: distinct-text
# count (recomputed exactly by the oracle), xxhash64 injectivity over the
# corpus (64-bit: collision odds ~2e-10 at sf0.1; deterministic for the fixed
# corpus — verified at all three sfs), hash determinism (two evaluations
# agree per-row), crc32 within uint32 range, and monotonically_increasing_id
# unique per row.  murmur3 is 32-bit — injectivity is NOT asserted (birthday
# bound makes collisions plausible at sf0.1), only determinism.
@register(
    "fn_hash_spark_native",
    oracle="""
SELECT CAST(count(*) AS BIGINT)               AS n_docs,
       CAST(count(DISTINCT text) AS BIGINT)   AS n_distinct_texts,
       CAST(1 AS BIGINT) AS xx64_injective,
       CAST(1 AS BIGINT) AS hashes_deterministic,
       CAST(1 AS BIGINT) AS crc_in_uint32_range,
       CAST(1 AS BIGINT) AS mono_id_unique
FROM documents
""",
    tags=("b8.9",),
)
def fn_hash_spark_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select(
        "text",
        F.hash("text").alias("murmur3"),
        F.hash("text").alias("murmur3_again"),
        F.xxhash64("text").alias("xx64"),
        F.xxhash64("text").alias("xx64_again"),
        F.crc32("text").alias("crc"),
        F.monotonically_increasing_id().alias("mono_id"),
    )
    flag = lambda c: F.min(c.cast("bigint"))
    return hashed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        (F.countDistinct("xx64") == F.countDistinct("text"))
            .cast("bigint").alias("xx64_injective"),
        flag((F.col("murmur3") == F.col("murmur3_again"))
             & (F.col("xx64") == F.col("xx64_again")))
            .alias("hashes_deterministic"),
        flag((F.col("crc") >= 0) & (F.col("crc") <= F.lit(4294967295)))
            .alias("crc_in_uint32_range"),
        (F.countDistinct("mono_id") == F.count(F.lit(1)))
            .cast("bigint").alias("mono_id_unique"),
    )


# ---------------------------------------------------------------------------
# b8.10 VariantType JSON path (Spark 4): parse_json → binary variant →
# typed variant_get extraction.  This is the engine-native successor to
# both the reference's store-JSON-as-TEXT encoding
# (DatabaseManager.java:187-193) and from_json-with-declared-schema
# (scan_json_column): the variant binary keeps the full dynamic structure
# with no schema declared, extraction is typed and lazy, and the parquet
# writer shreds hot paths columnar — the schema-on-read endgame for
# semi-structured columns at 100 TB.  Output columns are plain
# BIGINT/VARCHAR (the lint forbids variant itself in results), and the
# aggregate shape matches the DuckDB json_extract twin exactly.
# ---------------------------------------------------------------------------

@register(
    "fn_variant_json",
    oracle="""
SELECT
  CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
  count(*) AS n_events,
  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
  CAST(min(CASE WHEN json_type(json(props)) = 'OBJECT'
                THEN 'OBJECT' ELSE 'OTHER' END) AS VARCHAR) AS variant_kind
FROM events
GROUP BY CAST(json_extract(props, '$.k') AS BIGINT) % 10
ORDER BY k_mod
""",
    tags=("b8.10",),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"))
    k = F.variant_get(F.col("v"), "$.k", "bigint")
    # schema_of_variant renders OBJECT<...>; both engines collapse their
    # native kind labels onto the same OBJECT/OTHER binary (the oracle
    # applies the identical CASE to json_type), so a non-object props row
    # maps to 'OTHER' on BOTH sides instead of diverging
    kind = F.when(F.schema_of_variant(F.col("v")).startswith("OBJECT"),
                  F.lit("OBJECT")).otherwise(F.lit("OTHER"))
    return (
        v.select((k % 10).alias("k_mod"), k.alias("k"), kind.alias("kind"))
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("k").cast("bigint").alias("k_sum"),
             F.min("kind").alias("variant_kind"))
        .orderBy("k_mod")
    )
