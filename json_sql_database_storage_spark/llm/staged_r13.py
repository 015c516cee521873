"""LLM-pipeline operators STAGED for round 13 (window-budgeting protocol
— see operators/staged_r13.py header; promoted next round by moving the
STAGED entry into a @register decorator).  Every entry runs
driver-identically against DuckDB at sf0.001 AND sf0.01 via
tests/test_staged_r13.py.

Per-operator 100-TB notes live in each section comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .similarity import as_double
from .text_analysis import tokens

# ---------------------------------------------------------------------------
# text_stopword_profile — per-source stopword density in exact ppm over a
# FIXED 16-word function-word list (the cheapest language-quality proxy:
# natural prose carries 30-60% function words; keyword spam, tables and
# OCR soup carry almost none).  Counts are exact integers; the ratio is
# BIGINT floor division.
#
# 100-TB design: one explode + a map-side-combinable (source, is_stop)
# census; the stoplist is a 16-element literal folded into the filter
# expression (no join, no broadcast).  Output O(|sources|).
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
              "it", "for", "on", "with", "as", "at", "by")


def text_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (load_table(spark, sf_dir, "documents")
            .select("source", F.explode(tokens(F.col("text"))).alias("w")))
    return (toks.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                 F.sum(F.when(F.col("w").isin(*_STOPWORDS), 1).otherwise(0))
                 .cast("bigint").alias("n_stop"))
            .select("source", "n_tokens", "n_stop",
                    F.expr("CAST(n_stop * 1000000 DIV n_tokens AS BIGINT)")
                    .alias("stop_ppm"))
            .orderBy("source"))


_STOPLIST_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)
_STOPPROF_SQL = rf"""
WITH toks AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '\s+')) AS w
  FROM documents
), per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN w IN ({_STOPLIST_SQL}) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_stop
  FROM toks GROUP BY source
)
SELECT source, n_tokens, n_stop,
       CAST(n_stop * 1000000 // n_tokens AS BIGINT) AS stop_ppm
FROM per
ORDER BY source
"""

# ---------------------------------------------------------------------------
# text_char_class_profile — per-source character-class composition in
# exact ppm: letters / digits / whitespace / other over the raw text
# (the mojibake-and-markup detector: prose is ~80% letters, scraped
# tables and binary-leak docs are not).  Class counts come from exact
# length deltas under regexp_replace (replace-all in BOTH engines —
# DuckDB needs the explicit 'g' flag), so everything is integer.
#
# 100-TB design: per-row scalar expressions (JVM codegen) + one bounded
# census — the corpus is touched once, nothing leaves the partition but
# O(|sources|) partials.
# ---------------------------------------------------------------------------


def text_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.length("text").cast("bigint").alias("n"),
        (F.length("text")
         - F.length(F.regexp_replace("text", "[A-Za-z]", "")))
        .cast("bigint").alias("alpha"),
        (F.length("text")
         - F.length(F.regexp_replace("text", "[0-9]", "")))
        .cast("bigint").alias("digit"),
        (F.length("text")
         - F.length(F.regexp_replace("text", r"[ \t\n\r]", "")))
        .cast("bigint").alias("ws"))
    per = (d.groupBy("source")
           .agg(F.sum("n").alias("n_chars"),
                F.sum("alpha").alias("a"),
                F.sum("digit").alias("dg"),
                F.sum("ws").alias("w")))
    return (per.select(
        "source", F.col("n_chars").cast("bigint").alias("n_chars"),
        F.expr("CAST(a * 1000000 DIV n_chars AS BIGINT)")
        .alias("alpha_ppm"),
        F.expr("CAST(dg * 1000000 DIV n_chars AS BIGINT)")
        .alias("digit_ppm"),
        F.expr("CAST(w * 1000000 DIV n_chars AS BIGINT)")
        .alias("space_ppm"),
        F.expr("CAST((n_chars - a - dg - w) * 1000000 DIV n_chars "
               "AS BIGINT)").alias("other_ppm"))
        .orderBy("source"))


_CHARCLASS_SQL = r"""
WITH d AS (
  SELECT source, CAST(length(text) AS BIGINT) AS n,
         CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '',
                                                   'g')) AS BIGINT)
           AS alpha,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '',
                                                   'g')) AS BIGINT)
           AS digit,
         CAST(length(text) - length(regexp_replace(text, '[ \t\n\r]', '',
                                                   'g')) AS BIGINT) AS ws
  FROM documents
), per AS (
  SELECT source, sum(n) AS n_chars, sum(alpha) AS a, sum(digit) AS dg,
         sum(ws) AS w
  FROM d GROUP BY source
)
SELECT source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(a * 1000000 // n_chars AS BIGINT) AS alpha_ppm,
       CAST(dg * 1000000 // n_chars AS BIGINT) AS digit_ppm,
       CAST(w * 1000000 // n_chars AS BIGINT) AS space_ppm,
       CAST((n_chars - a - dg - w) * 1000000 // n_chars AS BIGINT)
         AS other_ppm
FROM per
ORDER BY source
"""

# ---------------------------------------------------------------------------
# text_burstiness_topk — Church-style term burstiness: for every term
# seen in ≥ _BURST_MIN_DF docs, the variance-to-mean ratio of its
# per-doc occurrence count over the docs that CONTAIN it, in exact
# micro units: VMR_micro = (df·Σc² − (Σc)²) · 10⁶ DIV (df · Σc).
# A bursty term (VMR ≫ 1) concentrates in few docs (topical/boilerplate);
# a Poisson-ish term spreads evenly (function words).  Top-20 by
# (VMR desc, term asc).  The quadratic moment runs in the 38-digit
# decimal domain (Spark) / HUGEINT (DuckDB auto-promotes) — df·Σc²·10⁶
# wraps int64 around Σc² ~ 10¹² which a 100-TB corpus reaches easily.
#
# 100-TB design: one (term, doc) census (grams never leave their doc's
# partition until the term-key combine), one per-term fold, TakeOrdered
# top-k (per-partition heaps).  No windows, no global sort.
# ---------------------------------------------------------------------------

_BURST_MIN_DF = 8
_BURST_K = 20


def text_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tc = (load_table(spark, sf_dir, "documents")
          .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
          .groupBy("doc_id", "w")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    per = (tc.groupBy("w")
           .agg(F.count(F.lit(1)).cast("bigint").alias("df"),
                F.sum("c").cast("bigint").alias("cf"),
                F.sum(F.col("c") * F.col("c")).cast("bigint")
                .alias("c2")))
    # integral `div` in the decimal domain, not `/` + cast: Spark decimal
    # division rounds HALF_UP at the result scale, so a quotient within
    # 5e-7 below an integer would round UP while DuckDB's // does not —
    # div and // both truncate toward zero, and the operands here are
    # non-negative by Cauchy–Schwarz (df·Σc² ≥ (Σc)²), so the two
    # engines agree exactly
    scored = (per.filter(F.col("df") >= _BURST_MIN_DF)
              .select("w", "df", "cf",
                      F.expr("CAST(((CAST(df AS DECIMAL(38,0)) * c2"
                             " - CAST(cf AS DECIMAL(38,0)) * cf)"
                             " * 1000000)"
                             " div (CAST(df AS DECIMAL(38,0)) * cf)"
                             " AS BIGINT)").alias("vmr_micro")))
    return scored.orderBy(F.desc("vmr_micro"), "w").limit(_BURST_K)


_BURST_SQL = rf"""
WITH tc AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents)
  GROUP BY doc_id, w
), per AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(c) AS BIGINT) AS cf,
         CAST(sum(c * c) AS BIGINT) AS c2
  FROM tc GROUP BY w
)
SELECT w, df, cf,
       CAST((CAST(df AS HUGEINT) * c2 - CAST(cf AS HUGEINT) * cf)
            * 1000000 // (CAST(df AS HUGEINT) * cf) AS BIGINT)
         AS vmr_micro
FROM per WHERE df >= {_BURST_MIN_DF}
ORDER BY vmr_micro DESC, w
LIMIT {_BURST_K}
"""

# ---------------------------------------------------------------------------
# text_prefix_dup_census — duplicated-prefix clusters: group docs by
# their first 32 lowercased characters, keep groups of ≥2, census the
# cluster-size distribution (n_clusters, n_docs per size).  The cheapest
# near-dup tripwire — mirrored boilerplate and crawl echoes share
# prefixes long before MinHash runs; this census sizes that problem in
# ONE pass with no signatures.
#
# 100-TB design: one prefix-key census (32-byte keys, map-side
# combinable), one bounded size census.  No joins.
# ---------------------------------------------------------------------------

_PREFIX_LEN = 32


def text_prefix_dup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    pref = (load_table(spark, sf_dir, "documents")
            .select(F.substring(F.lower("text"), 1, _PREFIX_LEN)
                    .alias("p"))
            .groupBy("p")
            .agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
            .filter(F.col("sz") >= 2))
    return (pref.groupBy("sz")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
                 (F.count(F.lit(1)) * F.col("sz").cast("bigint"))
                 .alias("n_docs"))
            .select(F.col("sz").alias("cluster_size"), "n_clusters",
                    F.col("n_docs").cast("bigint").alias("n_docs"))
            .orderBy("cluster_size"))


_PREFDUP_SQL = f"""
WITH pref AS (
  SELECT substring(lower(text), 1, {_PREFIX_LEN}) AS p,
         CAST(count(*) AS BIGINT) AS sz
  FROM documents GROUP BY 1
  HAVING count(*) >= 2
)
SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(count(*) * sz AS BIGINT) AS n_docs
FROM pref
GROUP BY sz
ORDER BY cluster_size
"""

# ---------------------------------------------------------------------------
# text_word_length_by_lang — per-language token-length census (length in
# characters, naturally bounded ≪ 30 for natural language): token count
# per (lang, len).  The tokenizer-budget planner input — mean word
# length drives BPE vocab sizing per language.
#
# 100-TB design: explode + map-side-combinable census over the bounded
# (lang × len) domain.  Output O(|langs| × max_len).
# ---------------------------------------------------------------------------


def text_word_length_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (load_table(spark, sf_dir, "documents")
            .select("lang", F.explode(tokens(F.col("text"))).alias("w"))
            .filter(F.length("w") > 0))
    return (toks.groupBy("lang",
                         F.length("w").cast("int").alias("word_len"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
            .orderBy("lang", "word_len"))


_WORDLEN_SQL = r"""
WITH toks AS (
  SELECT lang,
         unnest(regexp_split_to_array(lower(text), '\s+')) AS w
  FROM documents
)
SELECT lang, CAST(length(w) AS INT) AS word_len,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM toks WHERE length(w) > 0
GROUP BY 1, 2
ORDER BY lang, word_len
"""

# ---------------------------------------------------------------------------
# sim_inner_product_stats — dot-product distribution over a DETERMINISTIC
# vector sample: the _SAMPLE_K lowest-md5(vec_id) vectors (reproducible
# across partitionings — the sample_reservoir_global recipe), all C(k,2)
# pairs' inner products via the ordered zip_with fold (dim order — the
# one float-summation order both engines share), censused in unit-width
# buckets.  The similarity-scale calibration every ANN threshold is set
# from.
#
# 100-TB design: the sample is a k-row TakeOrdered (per-partition
# heaps); the k×k pair grid is a broadcast self-join of a k-row table —
# bounded compute regardless of corpus size.
# ---------------------------------------------------------------------------

_SAMPLE_K = 48


def sim_inner_product_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("e"),
                 F.md5(F.col("vec_id").cast("string")).alias("h"))
         .orderBy("h", "vec_id").limit(_SAMPLE_K)
         .select("vec_id", "e"))
    a = v.select(F.col("vec_id").alias("ida"), F.col("e").alias("ea"))
    b = v.select(F.col("vec_id").alias("idb"), F.col("e").alias("eb"))
    dots = (a.crossJoin(F.broadcast(b))
            .filter(F.col("ida") < F.col("idb"))
            .select(F.aggregate(F.zip_with("ea", "eb",
                                           lambda x, y: x * y),
                                F.lit(0.0), lambda acc, x: acc + x)
                    .alias("dot")))
    return (dots.groupBy(F.floor("dot").cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.min("dot").alias("min_dot"),
                 F.max("dot").alias("max_dot"))
            .orderBy("bucket"))


_IPSTATS_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {_SAMPLE_K}
), dots AS (
  SELECT list_sum(list_transform(range(1, len(a.e) + 1),
                                 i -> a.e[i] * b.e[i])) AS dot
  FROM v a, v b
  WHERE a.vec_id < b.vec_id
)
SELECT CAST(floor(dot) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_pairs,
       min(dot) AS min_dot, max(dot) AS max_dot
FROM dots
GROUP BY 1
ORDER BY bucket
"""

# ---------------------------------------------------------------------------
# sim_label_centroid_norms — per-label centroid L2 norm (plus member
# count): mean per dimension via the ordered fold (sum in vec_id order —
# bit-identical cross-engine), then the dim-ordered sum of squares and
# one sqrt.  A label whose centroid norm collapses toward 0 has
# internally-cancelling members (mixed cluster); the embedding-space
# class-health monitor.
#
# 100-TB design: the per-(label, dim) census is map-side-combinable;
# labels × dims is catalog-bounded, so the final norm fold is O(L·D).
# The ordered collect is per (label, dim) over the profile's bounded
# sample at scale (the sim_dimension_profile note).
# ---------------------------------------------------------------------------


def sim_label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .select("label", "vec_id",
                 F.posexplode(as_double(F.col("embedding")))
                 .alias("dim", "x")))
    per_dim = (v.groupBy("label", "dim")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.aggregate(
                        F.array_sort(F.collect_list(
                            F.struct("vec_id", "x"))),
                        F.lit(0.0), lambda acc, s: acc + s["x"])
                    .alias("sx")))
    means = per_dim.select("label", "dim", "n",
                           (F.col("sx") / F.col("n").cast("double"))
                           .alias("m"))
    return (means.groupBy("label")
            .agg(F.max("n").cast("bigint").alias("n_vectors"),
                 F.sqrt(F.aggregate(
                     F.array_sort(F.collect_list(F.struct("dim", "m"))),
                     F.lit(0.0), lambda acc, s: acc + s["m"] * s["m"]))
                 .alias("centroid_norm"))
            .select(F.col("label").cast("int").alias("label"),
                    "n_vectors", "centroid_norm")
            .orderBy("label"))


_LABELNORM_SQL = """
WITH v AS (
  SELECT label, vec_id, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
), per_dim AS (
  SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
         list_sum(list(x ORDER BY vec_id)) AS sx
  FROM v GROUP BY label, dim
), means AS (
  SELECT label, dim, n, sx / CAST(n AS DOUBLE) AS m
  FROM per_dim
)
SELECT CAST(label AS INT) AS label,
       CAST(max(n) AS BIGINT) AS n_vectors,
       sqrt(list_sum(list(m * m ORDER BY dim))) AS centroid_norm
FROM means
GROUP BY label
ORDER BY label
"""

# ---------------------------------------------------------------------------
# text_first_token_census — top-20 document OPENING tokens by count with
# their ppm of the corpus (boilerplate detector at token granularity —
# crawl templates and generated docs open identically long before a
# 32-char prefix matches; text_prefix_dup_census's cheap cousin).
# Deterministic (count desc, token asc) TakeOrdered.
#
# 100-TB design: ONE token per document (no explode of the body), a
# map-side census over first tokens, a 1-row doc-count scalar broadcast,
# TakeOrdered top-k.
# ---------------------------------------------------------------------------

_FIRSTTOK_K = 20


def text_first_token_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    first = (load_table(spark, sf_dir, "documents")
             .select(F.get(tokens(F.col("text")), 0).alias("w")))
    census = (first.groupBy("w")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")))
    tot = census.agg(F.sum("n_docs").cast("bigint").alias("t"))
    return (census.crossJoin(F.broadcast(tot))
            .select("w", "n_docs",
                    F.expr("CAST(n_docs * 1000000 DIV t AS BIGINT)")
                    .alias("doc_ppm"))
            .orderBy(F.desc("n_docs"), "w").limit(_FIRSTTOK_K))


_FIRSTTOK_SQL = rf"""
WITH census AS (
  SELECT regexp_split_to_array(lower(text), '\s+')[1] AS w,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
), tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM census)
SELECT w, n_docs, CAST(n_docs * 1000000 // t AS BIGINT) AS doc_ppm
FROM census, tot
ORDER BY n_docs DESC, w
LIMIT {_FIRSTTOK_K}
"""

# Promoted round 13 (r12 verdict next-round #1); empty STAGED kept so the
# staged-protocol tests can pin that nothing is both staged and registered.
from ..registry import register  # noqa: E402  (promotion epilogue)

for _name, (_fn, _sql) in {
    "text_first_token_census": (text_first_token_census, _FIRSTTOK_SQL),
    "text_stopword_profile": (text_stopword_profile, _STOPPROF_SQL),
    "text_char_class_profile": (text_char_class_profile, _CHARCLASS_SQL),
    "text_burstiness_topk": (text_burstiness_topk, _BURST_SQL),
    "text_prefix_dup_census": (text_prefix_dup_census, _PREFDUP_SQL),
    "text_word_length_by_lang": (text_word_length_by_lang, _WORDLEN_SQL),
    "sim_inner_product_stats": (sim_inner_product_stats, _IPSTATS_SQL),
    "sim_label_centroid_norms": (sim_label_centroid_norms, _LABELNORM_SQL),
}.items():
    register(_name, _sql)(_fn)

STAGED: dict = {}
