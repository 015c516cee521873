"""Registry queries for the document layer (reference Part-A parity).

The oracle-checkable piece is the upsert (b1.9 — pure relational rewrite);
shred/assemble produce nested/JSON output → rows-only checks, with strict
round-trip equality asserted in tests/test_documents.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .fixtures import ALL_FIXTURES, docs_df
from .model import assemble, shred, to_documents
from .typing_rules import apply_reference_typing


# b1.9 / A5 — upsert as a deterministic join rewrite: "new" rows replace
# same-key rows, others survive.  Expressed over the orders table so DuckDB
# can run the equivalent MERGE-free SQL.
@register(
    "doc_upsert",
    oracle="""
WITH new AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         o_totalprice + 1.0 AS o_totalprice
  FROM orders WHERE o_orderkey < 100
), merged AS (
  SELECT * FROM new
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM new n
                                  WHERE n.o_orderkey = o.o_orderkey)
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM merged
ORDER BY o_orderkey
""",
    tags=("b1.9", "A5"),
)
def doc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    new = (o.filter(F.col("o_orderkey") < 100)
           .withColumn("o_orderstatus", F.lit("X"))
           .withColumn("o_totalprice", F.col("o_totalprice") + 1.0))
    merged = new.unionByName(o.join(new.select("o_orderkey"),
                                    on="o_orderkey", how="left_anti"))
    return merged.orderBy("o_orderkey")


# A1+A2 — full shred → assemble → JSON round trip over every fixture family.
# The reassembled JSON itself contains engine-assigned rowNums (root keys are
# monotonically_increasing_id-based → partition-layout-sensitive), so the
# hashable output is the per-fixture invariant: doc count plus strict
# key-stripped canonical-JSON multiset equality, computed here exactly as
# tests/test_documents.py asserts it.  The fixtures are constant in-code
# documents (a handful of rows), so the driver-side collect is bounded by
# construction — this is fixture verification, not a data-scan path.
@register(
    "doc_shred_assemble_roundtrip",
    oracle="""
SELECT fixture, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(1 AS BIGINT) AS roundtrip_ok
FROM (VALUES ('f1', 1), ('f2', 1), ('f3', 1), ('f4', 1), ('f5', 1),
             ('f6', 1), ('f7', 1), ('f8', 1), ('f9', 2)) t(fixture, n_docs)
ORDER BY fixture
""",
    tags=("A1", "A2", "A8", "A9", "A10", "A11", "A12", "A13", "A14", "b1.2"),
)
def doc_shred_assemble_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    def strip_keys(obj):
        if isinstance(obj, dict):
            return {k: strip_keys(v) for k, v in obj.items() if k != "rowNum"}
        if isinstance(obj, list):
            return [strip_keys(x) for x in obj]
        return obj

    def canon(docs):
        return sorted(_json.dumps(strip_keys(d), sort_keys=True) for d in docs)

    rows = []
    for root, docs in ALL_FIXTURES.items():
        result = shred(docs_df(spark, docs), root)
        out = [_json.loads(r["doc"])
               for r in to_documents(assemble(result)).collect()]
        rows.append((root, len(out), int(canon(out) == canon(docs))))
    return spark.createDataFrame(
        rows, "fixture string, n_docs bigint, roundtrip_ok bigint"
    ).orderBy("fixture")


# A1+A2 at DATA scale — the fixture round trip above proves structural
# parity on a handful of constant docs; this one drives the same shred →
# assemble machinery through the sf-scaled `documents` table with
# synthesized nesting (flattened sub-object, ref child, struct-array
# child), end-to-end distributed: no collect, verification is a join of
# the assembled output back onto the recomputed input plus a per-lang
# aggregate.  The oracle states the invariant (every doc round-trips),
# so any lost/duplicated child row, broken FK, or reordered array chunk
# shows up as a count mismatch on the driver's hash compare.
@register(
    "doc_shred_scale_roundtrip",
    oracle="""
SELECT lang, count(*) AS n_docs, count(*) AS n_meta_ok,
       count(*) AS n_chunks_ok, count(*) AS n_body_ok,
       count(*) AS n_source_ok
FROM documents GROUP BY lang ORDER BY lang
""",
    tags=("A1", "A2", "A8", "A9", "A10", "A12"),
)
def doc_shred_scale_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(_CHUNK))
    # nested shape: meta = keyless sub-object ($-flattened, A9); src = struct
    # WITH rowNum (ref child table + real FK, A10); chunks = struct array
    # (posexplode child with derived keys, A11/A8) of 32-token slices
    nested = d.select(
        (F.col("doc_id") + 1).alias("rowNum"),   # doc_id 0 would read as "assign me"
        "lang",
        F.struct(F.length("text").alias("n_chars"),
                 F.size(toks).alias("n_tokens")).alias("meta"),
        F.struct(F.lit(None).cast("long").alias("rowNum"),
                 F.concat_ws(":", "lang", "doc_id").alias("tag")).alias("src"),
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                F.concat_ws(" ", F.slice(toks, i * _CHUNK + 1, _CHUNK))
                 .alias("body"),
                F.least(F.size(toks) - i * _CHUNK, F.lit(_CHUNK)).alias("n")),
        ).alias("chunks"))
    assembled = assemble(shred(nested, "docs_scale"))
    bodies = F.array_join(
        F.transform("chunks",
                    lambda c: F.try_variant_get(c, "$.body", "string")), " ")
    chunk_tok_sum = F.aggregate(
        F.transform("chunks",
                    lambda c: F.try_variant_get(c, "$.n", "long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    flat = assembled.select(
        (F.col("rowNum") - 1).alias("doc_id"),
        F.col("lang").alias("r_lang"),
        F.col("meta.n_chars").alias("r_chars"),
        F.col("meta.n_tokens").alias("r_toks"),
        F.col("src.tag").alias("r_tag"),
        F.size("chunks").alias("r_nchunks"),
        bodies.alias("r_body"),
        chunk_tok_sum.alias("r_toksum"))
    joined = d.join(flat, "doc_id")
    ok = lambda c: F.sum(c.cast("long")).alias  # noqa: E731
    return (
        joined.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             ok((F.col("r_chars") == F.length("text"))
                & (F.col("r_toks") == F.size(toks))
                & (F.col("r_lang") == F.col("lang")))("n_meta_ok"),
             ok((F.col("r_nchunks") == n_chunks)
                & (F.col("r_toksum") == F.size(toks)))("n_chunks_ok"),
             ok(F.col("r_body") == F.array_join(toks, " "))("n_body_ok"),
             ok(F.col("r_tag") == F.concat_ws(":", "lang", "doc_id"))
             ("n_source_ok"))
        .orderBy("lang")
    )


_CHUNK = 32


# A7 — reference typing rules applied to the F1 fixture ("time"-key ISO
# heuristic on; int-string collapse behind its compat flag).  The fixture is
# a constant, so the oracle is the expected GOLDEN row — a regression pin on
# the typing rules, not a recomputation.
@register(
    "doc_typing_rules",
    oracle="""
SELECT 'alice' AS name, CAST(31 AS BIGINT) AS age, CAST(1 AS BIGINT) AS active,
       '2024-01-01 10:30:00' AS login_ts, CAST(7 AS BIGINT) AS numeric_string,
       CAST(140 AS BIGINT) AS bio_len
""",
    tags=("A7", "A15"),
)
def doc_typing_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = docs_df(spark, ALL_FIXTURES["f1"])
    typed = apply_reference_typing(df, compat_int_strings=True)
    return typed.select(
        "name", F.col("age").cast("bigint").alias("age"),
        F.col("active").cast("bigint").alias("active"),
        F.col("loginTime").cast("string").alias("login_ts"),
        F.col("numeric_string").cast("bigint").alias("numeric_string"),
        F.length("bio").cast("bigint").alias("bio_len"),
    )


# b1.8 — JSON-lines rendering of re-nested relational docs (A2 output over
# real tables: orders with their lineitems as nested arrays).  Both engines
# render compact JSON with shortest-round-trip doubles (44.0, 112946.26 —
# verified byte-identical), so the rendered lines are oracle-checkable.
@register(
    "doc_tojson_lines",
    oracle="""
SELECT CAST(to_json(struct_pack(
         o_orderkey := o.o_orderkey, o_orderstatus := o.o_orderstatus,
         o_totalprice := o.o_totalprice, lines := coalesce(n.lines, [])))
       AS VARCHAR) AS doc
FROM orders o LEFT JOIN (
  SELECT l_orderkey,
         list(struct_pack(l_linenumber := l_linenumber,
                          l_quantity := l_quantity,
                          l_extendedprice := l_extendedprice)
              ORDER BY l_linenumber, l_quantity, l_extendedprice) AS lines
  FROM lineitem GROUP BY l_orderkey
) n ON o.o_orderkey = n.l_orderkey
WHERE o.o_orderkey < 200
ORDER BY o.o_orderkey
""",
    tags=("b1.8", "A2"),
)
def doc_tojson_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list(
            F.struct("l_linenumber", "l_quantity", "l_extendedprice")))
            .alias("lines")))
    docs = (
        o.join(nested, o.o_orderkey == nested.l_orderkey, "left")
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
                F.coalesce("lines", F.array()).alias("lines")))
    return to_documents(docs.orderBy("o_orderkey"))


# A14 at data scale — the null-compat flag as a driver-checkable exhibit.
# The reference reads SQL NULL back as "" (DatabaseManager.java:309-311);
# this engine keeps real nulls by default and reproduces the lossy behavior
# only behind assemble(compat_null_as_empty=True).  Both assemblies run over
# the SAME shred result of a documents-derived nested doc whose meta.note is
# NULL on every 7th doc, and the output states the contract per lang: the
# native assembly preserves exactly those nulls, the compat assembly has
# zero nulls and the same count of ''-coalesced values.
@register(
    "doc_compat_null_empty",
    oracle="""
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_native,
       CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_empty_compat,
       CAST(0 AS BIGINT) AS n_null_compat
FROM documents GROUP BY lang ORDER BY lang
""",
    tags=("A14",),
)
def doc_compat_null_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    nested = d.select(
        (F.col("doc_id") + 1).alias("rowNum"),
        "lang",
        F.struct(F.when(F.col("doc_id") % 7 != 0, F.col("lang"))
                  .alias("note")).alias("meta"))
    result = shred(nested, "docs_nullcompat")
    native = assemble(result)
    compat = assemble(result, compat_null_as_empty=True)
    n_agg = (native.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.col("meta.note").isNull().cast("long"))
                   .alias("n_null_native")))
    c_agg = (compat.groupBy("lang")
             .agg(F.sum((F.col("meta.note") == "").cast("long"))
                   .alias("n_empty_compat"),
                  F.sum(F.col("meta.note").isNull().cast("long"))
                   .alias("n_null_compat")))
    return n_agg.join(c_agg, "lang").orderBy("lang")


# A15 — numeric introspection as a driver-checkable exhibit: the engine's
# JVM-side classify_expr (typing_rules.py, mirroring
# DatabaseManager.java:514-534) runs over a values table synthesized from
# events (six key/value shapes per row — ISO timestamps under a time-key,
# a time-key with a non-ISO value, the "007" zero-padded int collapse, a
# JSON blob under a non-time key, a >=128-char TEXT value, and a per-row
# NUMBER/string mixture), and the oracle restates the reference's rules as
# an independent DuckDB CASE.  Any drift in branch order, the int regex,
# or the time-key heuristic shows up as a class-count mismatch.
@register(
    "doc_typing_introspect",
    oracle="""
WITH vals(k, v) AS (
  SELECT 'loginTime', strftime(ts, '%Y-%m-%dT%H:%M:%S') FROM events
  UNION ALL SELECT 'eventTime_label', event_type FROM events
  UNION ALL SELECT 'user_code', lpad(CAST(user_id AS VARCHAR), 7, '0')
            FROM events
  UNION ALL SELECT 'props', props FROM events
  UNION ALL SELECT 'note_long', rpad(event_type, 150, 'x') FROM events
  UNION ALL SELECT 'mixed', CASE WHEN event_id % 5 = 0
                                 THEN CAST(event_id AS VARCHAR)
                                 ELSE event_type END FROM events
)
SELECT k,
       CASE WHEN regexp_matches(v, '^[+-]?[0-9]+$') THEN 'NUMBER'
            WHEN strpos(lower(k), 'time') > 0 AND strpos(v, ':') > 0
                 AND strpos(v, 'T') > 0 THEN 'DATE'
            WHEN length(v) < 128 THEN 'MEDIUM_STRING'
            ELSE 'TEXT' END AS cls,
       count(*) AS n
FROM vals GROUP BY k, cls ORDER BY k, cls
""",
    tags=("A15", "A7"),
)
def doc_typing_introspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .typing_rules import classify_expr

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "props")
    kv = lambda k, v: F.struct(F.lit(k).alias("k"),      # noqa: E731
                               v.cast("string").alias("v"))
    pairs = ev.select(F.explode(F.array(
        kv("loginTime", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")),
        kv("eventTime_label", F.col("event_type")),
        kv("user_code", F.lpad(F.col("user_id").cast("string"), 7, "0")),
        kv("props", F.col("props")),
        kv("note_long", F.rpad(F.col("event_type"), 150, "x")),
        kv("mixed", F.when(F.col("event_id") % 5 == 0,
                           F.col("event_id").cast("string"))
                     .otherwise(F.col("event_type"))),
    )).alias("p")).select("p.k", "p.v")
    return (pairs
            .select("k", classify_expr(F.col("k"), F.col("v")).alias("cls"))
            .groupBy("k", "cls").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("k", "cls"))


# ---------------------------------------------------------------------------
# A6 companion (r5 addendum) — schema drift report between ingestion
# batches.  The reference asserts columns into existence on every write
# (auto-DDL, DatabaseManager.java:130,152,200) but can never TELL you what
# changed; this operator makes schema evolution a queryable artifact: two
# JSON batches in, one row per key out with its inferred type in each batch
# and an added/removed/stable/type_changed status.  Type inference is
# value-lexical like the reference's getType (DatabaseManager.java:514-534)
# but reads the RAW json token, so "123" (quoted) stays a string while 123
# is a number — the distinction auto-DDL actually needs.
#
# Both engines run the identical literal-pattern tokenizer
# (regexp_extract_all pair scan → fixed-pattern key/value split), so the
# report is engine-exact.  Scale: tokenize + explode + one (version, key)
# aggregate — map-side combinable, output is O(|schema|) rows.
# ---------------------------------------------------------------------------

_DRIFT_PAIR_RE = r'"[^"]+"\s*:\s*("[^"]*"|[^,}]+)'
_DRIFT_KEY_RE = r'^"([^"]+)"'
_DRIFT_VAL_RE = r':\s*(.*)$'
_DRIFT_CLS_SQL = """CASE
  WHEN raw LIKE '"%' THEN 'string'
  WHEN raw IN ('true', 'false') THEN 'boolean'
  WHEN regexp_matches(raw, '^-?[0-9]+(\\.[0-9]+)?$') THEN 'number'
  ELSE 'other' END"""


@register(
    "doc_schema_drift",
    oracle=rf"""
WITH b1 AS (
  SELECT to_json(struct_pack(id := doc_id, lang := lang,
                             n_chars := n_chars)) AS js
  FROM documents WHERE doc_id % 2 = 0
), b2 AS (
  SELECT to_json(struct_pack(id := doc_id, lang := lang,
                             n_chars := CAST(n_chars AS VARCHAR),
                             source := source)) AS js
  FROM documents WHERE doc_id % 2 = 1
), tok AS (
  SELECT 1 AS v, unnest(regexp_extract_all(js, '{_DRIFT_PAIR_RE}')) AS pair
  FROM b1
  UNION ALL
  SELECT 2 AS v, unnest(regexp_extract_all(js, '{_DRIFT_PAIR_RE}')) AS pair
  FROM b2
), kv AS (
  SELECT v, regexp_extract(pair, '{_DRIFT_KEY_RE}', 1) AS k,
         regexp_extract(pair, '{_DRIFT_VAL_RE}', 1) AS raw
  FROM tok
), typed AS (
  SELECT v, k, min({_DRIFT_CLS_SQL}) AS t FROM kv GROUP BY v, k
), piv AS (
  SELECT coalesce(a.k, b.k) AS key_name, a.t AS type_v1, b.t AS type_v2
  FROM (SELECT k, t FROM typed WHERE v = 1) a
  FULL OUTER JOIN (SELECT k, t FROM typed WHERE v = 2) b ON a.k = b.k
)
SELECT key_name,
       coalesce(type_v1, 'absent') AS type_v1,
       coalesce(type_v2, 'absent') AS type_v2,
       CASE WHEN type_v1 IS NULL THEN 'added'
            WHEN type_v2 IS NULL THEN 'removed'
            WHEN type_v1 = type_v2 THEN 'stable'
            ELSE 'type_changed' END AS status
FROM piv
ORDER BY key_name
""",
    tags=("A6", "r5.12"),
)
def doc_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    b1 = (d.filter(F.col("doc_id") % 2 == 0)
          .select(F.to_json(F.struct(
              F.col("doc_id").alias("id"), "lang", "n_chars")).alias("js"),
              F.lit(1).alias("v")))
    b2 = (d.filter(F.col("doc_id") % 2 == 1)
          .select(F.to_json(F.struct(
              F.col("doc_id").alias("id"), "lang",
              F.col("n_chars").cast("string").alias("n_chars"),
              "source")).alias("js"),
              F.lit(2).alias("v")))
    tok = (b1.unionByName(b2)
           .select("v", F.explode(
               F.regexp_extract_all("js", F.lit(_DRIFT_PAIR_RE), F.lit(0)))
               .alias("pair")))
    kv = tok.select(
        "v", F.regexp_extract("pair", _DRIFT_KEY_RE, 1).alias("k"),
        F.regexp_extract("pair", _DRIFT_VAL_RE, 1).alias("raw"))
    cls = (F.when(F.col("raw").startswith('"'), "string")
           .when(F.col("raw").isin("true", "false"), "boolean")
           .when(F.col("raw").rlike(r"^-?[0-9]+(\.[0-9]+)?$"), "number")
           .otherwise("other"))
    typed = (kv.select("v", "k", cls.alias("t"))
             .groupBy("v", "k").agg(F.min("t").alias("t")))
    a = typed.filter(F.col("v") == 1).select(F.col("k"), F.col("t").alias("type_v1"))
    b = typed.filter(F.col("v") == 2).select(F.col("k").alias("kb"),
                                             F.col("t").alias("type_v2"))
    piv = a.join(b, a.k == b.kb, "full_outer")
    return (
        piv.select(
            F.coalesce(F.col("k"), F.col("kb")).alias("key_name"),
            F.coalesce("type_v1", F.lit("absent")).alias("type_v1"),
            F.coalesce("type_v2", F.lit("absent")).alias("type_v2"),
            F.when(F.col("type_v1").isNull(), "added")
             .when(F.col("type_v2").isNull(), "removed")
             .when(F.col("type_v1") == F.col("type_v2"), "stable")
             .otherwise("type_changed").alias("status"))
        .orderBy("key_name")
    )


# ---------------------------------------------------------------------------
# r6.4 — A3/A5 at the LIBRARY surface (r5 verdict next-round #8): the same
# save-then-fetch contract the reference exposes (DatabaseManager.java:118
# save / :253-269 fetch-by-(table, rowNum)), driven through DocumentStore
# itself rather than the filter_point_lookup plan exhibit.  upsert(base) →
# upsert(delta, same keys win) → lookup() × 4 keys, one of them updated —
# proving the API's MERGE semantics and the point-lookup read path compose.
# Lookup keys are literals, so each lookup's key predicate reaches the
# parquet scan (min/max row-group skip — the A3 pushdown property already
# plan-asserted for filter_point_lookup).  The 4-key union is O(keys)
# driver-side plan construction, not data movement.
# ---------------------------------------------------------------------------

_LOOKUP_KEYS = (1, 7, 32, 101)  # 101 ≡ 1 (mod 100) → served from the upsert


@register(
    "doc_lookup_api",
    oracle=f"""
WITH t AS (
  SELECT o_orderkey AS "rowNum", o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), upd AS (
  SELECT "rowNum", o_custkey, cents + 500 AS cents
  FROM t WHERE "rowNum" % 100 = 1
), merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT * FROM t WHERE "rowNum" % 100 != 1
)
SELECT "rowNum", o_custkey, cents
FROM merged
WHERE "rowNum" IN ({", ".join(str(k) for k in _LOOKUP_KEYS)})
ORDER BY "rowNum"
""",
    tags=("r6.4", "A3", "A5"),
)
def doc_lookup_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from ..operators.scans import _sink
    from .model import KEY
    from .store import DocumentStore

    base = _sink("doc_store_api", spark)
    store = DocumentStore(spark, base)
    t = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias(KEY), "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    store.upsert(t, "orders_api")
    store.upsert(t.filter(F.col(KEY) % 100 == 1)
                 .withColumn("cents", F.col("cents") + 500), "orders_api")
    outs = [store.lookup("orders_api", k) for k in _LOOKUP_KEYS]
    return reduce(lambda a, b: a.unionByName(b), outs).orderBy(KEY)


# ---------------------------------------------------------------------------
# r7.3 — AS-OF document lookup through the CAS-committed store (r6 verdict
# next-round #3): DocumentStore.upsert now commits through the snapshot
# manifest log (put-if-absent version files — crash-safe, concurrent-writer
# safe; documents/store.py docstring), which buys version history for free.
# This exhibit drives it at the library surface: upsert v0 → overwriting
# upsert v1 → the SAME key fetched AS-OF both versions returns the
# pre-update row at v0 and the updated row at v1 — the fetch the reference
# cannot answer (DatabaseManager.java:425-447 destroys the old row).
# Lookup keys are literals, so each AS-OF lookup's key predicate reaches
# its version's parquet scan (min/max row-group skip).
# ---------------------------------------------------------------------------

_ASOF_KEYS = (1, 101)   # 101 ≡ 1 (mod 100) → rewritten by the v1 upsert


@register(
    "doc_lookup_asof",
    oracle=f"""
WITH t AS (
  SELECT o_orderkey AS "rowNum", o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), upd AS (
  SELECT "rowNum", o_custkey, cents + 500 AS cents
  FROM t WHERE "rowNum" % 100 = 1
), merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT * FROM t WHERE "rowNum" % 100 != 1
)
SELECT 0 AS version, "rowNum", o_custkey, cents FROM t
WHERE "rowNum" IN ({", ".join(str(k) for k in _ASOF_KEYS)})
UNION ALL
SELECT 1 AS version, "rowNum", o_custkey, cents FROM merged
WHERE "rowNum" IN ({", ".join(str(k) for k in _ASOF_KEYS)})
ORDER BY version, "rowNum"
""",
    tags=("r7.3", "A3", "A5"),
)
def doc_lookup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from ..operators.scans import _sink
    from .model import KEY
    from .store import DocumentStore

    base = _sink("doc_store_asof", spark)
    store = DocumentStore(spark, base)
    t = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias(KEY), "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    store.upsert(t, "orders_asof")                                  # v0
    store.upsert(t.filter(F.col(KEY) % 100 == 1)
                 .withColumn("cents", F.col("cents") + 500),
                 "orders_asof")                                     # v1
    outs = [
        store.lookup_asof("orders_asof", k, v)
        .select(F.lit(v).alias("version"), KEY, "o_custkey", "cents")
        for v in (0, 1) for k in _ASOF_KEYS
    ]
    return reduce(lambda a, b: a.unionByName(b), outs) \
        .orderBy("version", KEY)
