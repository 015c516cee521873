"""LLM-pipeline operators STAGED for round 10 (window-budgeting protocol
of llm/staged_r9.py).  Each entry is a complete ``(callable, oracle)``
register() payload, driver-identically verified at sf0.001 AND sf0.01 by
tests/test_staged_r10.py; round 10 promotes them by moving the dict entry
into a @register decorator.

1. text_index_maintenance — the round-9 TOMBSTONE-AWARE index loop
   surfaced as a driver row: build BM25 over the corpus, then apply ONE
   change feed (update an indexed doc's text, delete another, insert a
   fresh doc) through bm25_apply_changes, and probe.  The oracle scores
   the POST-CHANGE corpus with the registered text_bm25_topk oracle SQL
   (same snapped-idf / integer-cleared tf-norm discipline), so a stale
   posting, an unfixed df count, or a double-counted dl row all
   hash-mismatch.  100-TB: the change application is O(changed docs +
   tombstone join) — the base corpus is tokenized once at build, never
   again (llm/search.py b11.27g).

2. text_ngram_novelty — per-decile 5-gram novelty (the tail signal of
   corpus growth: what fraction of each decile's distinct 5-grams was
   never seen in any earlier document; near-duplicate-heavy crawls show
   novelty collapse).  Grams ride as (doc_id, gram) DISTINCT rows; first
   occurrence is one min(doc_id) groupBy; novelty is a flag join back —
   two map-side-combinable shuffles of hashed-gram-sized rows, one 1-row
   doc-count scalar (the text_vocab_growth shape, one gram order wider).

Reference parity note: the reference (DatabaseManager.java:280-381) has
no analytical surface; these are Part-B derived operators mandated by the
driver contract's LLM-pipeline families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .text_analysis import tokens

# ---------------------------------------------------------------------------
# text_index_maintenance
# ---------------------------------------------------------------------------

_MAINT_UPD_ID = 7       # gets new text (now matching the query terms hard)
_MAINT_DEL_ID = 11      # deleted from the corpus
_MAINT_UPD_TEXT = "join vector join vector benchmark"
_MAINT_NEW_TEXT = "join vector fresh crawl page"


def text_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .search import (_BM25_TERMS, _BM25_TOPK, bm25_apply_changes,
                         bm25_build, bm25_probe)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = bm25_build(spark, docs, "bm25_maint")
    new_id = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    upserts = spark.createDataFrame(
        [(_MAINT_UPD_ID, _MAINT_UPD_TEXT), (new_id, _MAINT_NEW_TEXT)],
        "doc_id bigint, text string")
    deleted = spark.createDataFrame([(_MAINT_DEL_ID,)], "doc_id bigint")
    bm25_apply_changes(spark, paths, upserts, deleted)
    return bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK)


def _maint_oracle() -> str:
    # the registered BM25 scoring SQL (search.py::bm25_score_sql — ONE
    # definition of the exactness discipline), scored over the
    # POST-CHANGE corpus
    from .search import bm25_score_sql

    return bm25_score_sql(
        corpus_sql="documents_m",
        prologue=f"""documents_m AS (
  SELECT doc_id,
         CASE WHEN doc_id = {_MAINT_UPD_ID} THEN '{_MAINT_UPD_TEXT}'
              ELSE text END AS text
  FROM documents WHERE doc_id <> {_MAINT_DEL_ID}
  UNION ALL
  SELECT (SELECT max(doc_id) + 1 FROM documents), '{_MAINT_NEW_TEXT}'
), """)


# ---------------------------------------------------------------------------
# text_ngram_novelty
# ---------------------------------------------------------------------------

_NOV_N = 5      # gram order


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    toks = (docs.select("doc_id", tokens(F.col("text")).alias("t"))
            # BEFORE the explode: F.sequence(0, negative) would generate a
            # DESCENDING range, not an empty one
            .filter(F.size("t") >= _NOV_N))
    grams = (toks
             .select("doc_id",
                     F.explode(F.transform(
                         F.sequence(F.lit(0),
                                    F.size("t") - F.lit(_NOV_N)),
                         lambda i: F.concat_ws(
                             " ", *[F.get(F.col("t"), i + k)
                                    for k in range(_NOV_N)])))
                     .alias("g"))
             .distinct())
    first = grams.groupBy("g").agg(F.min("doc_id").alias("f"))
    flagged = (grams.join(first, "g")
               .select("doc_id",
                       (F.col("doc_id") == F.col("f")).cast("int")
                       .alias("novel")))
    per_doc = (flagged.groupBy("doc_id")
               .agg(F.sum("novel").cast("bigint").alias("novel"),
                    F.count(F.lit(1)).cast("bigint").alias("total")))
    dec = (per_doc.crossJoin(F.broadcast(n_docs))
           # integer DIV, as the oracle's `//` — no float quotient anywhere
           .select(F.least(F.lit(9),
                           F.expr("CAST((doc_id * 10) DIV n AS INT)"))
                   .alias("decile"),
                   "novel", "total"))
    return (dec.groupBy("decile")
            .agg(F.sum("novel").cast("bigint").alias("novel_grams"),
                 F.sum("total").cast("bigint").alias("total_grams"))
            .withColumn("novelty",
                        F.col("novel_grams").cast("double")
                        / F.col("total_grams").cast("double"))
            .orderBy("decile"))


_NOVELTY_SQL = rf"""
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
         FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]
              || ' ' || t[i + 4] AS g
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, len(t) - {_NOV_N - 1})) AS i
        FROM toks WHERE len(t) >= {_NOV_N})
), first AS (
  SELECT g, min(doc_id) AS f FROM grams GROUP BY g
), per_doc AS (
  SELECT grams.doc_id,
         CAST(sum(CASE WHEN grams.doc_id = first.f THEN 1 ELSE 0 END)
              AS BIGINT) AS novel,
         CAST(count(*) AS BIGINT) AS total
  FROM grams JOIN first USING (g)
  GROUP BY grams.doc_id
)
SELECT CAST(least(9, (doc_id * 10) // n_docs) AS INT) AS decile,
       CAST(sum(novel) AS BIGINT) AS novel_grams,
       CAST(sum(total) AS BIGINT) AS total_grams,
       CAST(sum(novel) AS DOUBLE) / CAST(sum(total) AS DOUBLE) AS novelty
FROM per_doc CROSS JOIN n
GROUP BY 1
ORDER BY decile
"""

# ---------------------------------------------------------------------------
# text_code_detection — symbol-density code-vs-prose heuristic (the cheap
# first-stage router every code-aware pretraining pipeline runs before an
# expensive classifier): a doc is code-like when its code-symbol count
# ({} ; = () — counted via length-minus-replace, pure integers) exceeds
# 2% of its characters, tested as the integer cross product
# symbols·50 > chars so the decision is exact in both engines.
#
# 100-TB design: per-doc counters are map-side expressions; the census is
# one map-side-combinable groupBy(source).  No joins, no global step.
# ---------------------------------------------------------------------------

_CODE_SYMBOLS = ("{", "}", ";", "=", "(", ")")


def text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sym = None
    for ch in _CODE_SYMBOLS:
        c = F.length("text") - F.length(F.replace(F.col("text"), F.lit(ch)))
        sym = c if sym is None else sym + c
    flagged = docs.select(
        "source",
        (sym.cast("bigint") * 50 > F.length("text").cast("bigint"))
        .cast("int").alias("codelike"))
    return (flagged.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("codelike").cast("bigint").alias("n_codelike"))
            .orderBy("source"))


_CODE_SQL = """
WITH f AS (
  SELECT source,
         CASE WHEN CAST(
                (length(text) - length(replace(text, '{', '')))
              + (length(text) - length(replace(text, '}', '')))
              + (length(text) - length(replace(text, ';', '')))
              + (length(text) - length(replace(text, '=', '')))
              + (length(text) - length(replace(text, '(', '')))
              + (length(text) - length(replace(text, ')', '')))
              AS BIGINT) * 50 > CAST(length(text) AS BIGINT)
         THEN 1 ELSE 0 END AS codelike
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(codelike) AS BIGINT) AS n_codelike
FROM f GROUP BY source
ORDER BY source
"""

# ---------------------------------------------------------------------------
# sample_token_budget_epochs — per-source epoch plan under a global token
# budget (the operational half of the mixture question sample_domain_
# mixture answers: with budget B = T/10 tokens and sqrt-temperature
# weights w_i, source i contributes quota_i = w_i·B tokens, i.e.
# epochs_i = quota_i / tokens_i passes over that source — rare domains
# epoch above 1, huge ones sample down).  The denominator and every
# derived double use the ordered-fold convention (source-name order), so
# all floats are bit-equal cross-engine.
#
# 100-TB design: one map-side-combinable token census per source + a
# 1-row ordered fold; the plan is a catalog-sized table of per-source
# scalars, computed without touching the corpus twice.
# ---------------------------------------------------------------------------


def sample_token_budget_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (load_table(spark, sf_dir, "documents")
           .select("source",
                   F.size(F.split("text", " ")).cast("long").alias("ntok"))
           .groupBy("source")
           .agg(F.sum("ntok").alias("n_tokens"))
           .withColumn("s", F.sqrt(F.col("n_tokens").cast("double"))))
    tot = per.agg(
        F.aggregate(F.array_sort(F.collect_list(F.struct("source", "s"))),
                    F.lit(0.0), lambda acc, x: acc + x["s"]).alias("denom"),
        F.sum("n_tokens").cast("bigint").alias("t_total"))
    w = F.col("s") / F.col("denom")
    budget = F.expr("t_total DIV 10").cast("double")    # integer floor-div
    return (per.crossJoin(F.broadcast(tot))
            .select("source", "n_tokens",
                    w.alias("weight"),
                    (w * budget).alias("quota_tokens"),
                    ((w * budget) / F.col("n_tokens").cast("double"))
                    .alias("epochs"))
            .orderBy("source"))


_EPOCHS_SQL = """
WITH per AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
w AS (SELECT source, n_tokens,
             sqrt(CAST(n_tokens AS DOUBLE)) AS s FROM per),
d AS (SELECT list_sum(list(s ORDER BY source)) AS denom,
             CAST(sum(n_tokens) AS BIGINT) AS t_total FROM w)
SELECT source, n_tokens, s / denom AS weight,
       (s / denom) * CAST(t_total // 10 AS DOUBLE) AS quota_tokens,
       ((s / denom) * CAST(t_total // 10 AS DOUBLE))
         / CAST(n_tokens AS DOUBLE) AS epochs
FROM w, d
ORDER BY source
"""

# Promoted round 10 (r9 verdict next-round #1 and #5); empty STAGED kept so
# the staged-protocol tests can pin that nothing is both staged and
# registered.
from ..registry import register  # noqa: E402  (promotion epilogue)

for _name, (_fn, _sql) in {
    "text_index_maintenance": (text_index_maintenance, _maint_oracle()),
    "text_ngram_novelty": (text_ngram_novelty, _NOVELTY_SQL),
    "text_code_detection": (text_code_detection, _CODE_SQL),
    "sample_token_budget_epochs": (sample_token_budget_epochs, _EPOCHS_SQL),
}.items():
    register(_name, _sql)(_fn)

STAGED: dict = {}
