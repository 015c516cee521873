"""Text analysis operators (SURVEY.md §2 B11.5-11.7 + BASELINE.json mandate:
language-ID, quality scoring, token counting, fingerprinting, tf-idf).

All JVM-side expressions (split/explode/regexp/aggregate) — token pipelines
stay inside whole-stage codegen; explode fan-out shuffles only (term, 1)
pairs for the counting steps, the canonical map-side-combinable shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register, scoped_persist
from ..sources import load_table
from .dedup import _CORPUS_CTE_LANG, WS_RE


def tokens(col: F.Column) -> F.Column:
    # WS_RE, not a raw \s+: Java's \s includes \x0B, RE2's (the
    # oracles') does not — one explicit class both engines agree on
    return F.split(F.lower(col), WS_RE)


# ---------------------------------------------------------------------------
# b11.5 text stats per language: doc counts, exact char sums (ints), token
# counts, type-token ratio.
# ---------------------------------------------------------------------------

@register(
    "text_stats",
    oracle=r"""
SELECT
  lang,
  count(*)                                        AS n_docs,
  CAST(sum(n_chars) AS BIGINT)                    AS total_chars,
  CAST(sum(n_chars) AS DOUBLE) / count(*)         AS avg_chars,
  CAST(sum(len(regexp_split_to_array(lower(text), '\s+'))) AS BIGINT) AS total_tokens,
  CAST(sum(len(list_distinct(regexp_split_to_array(lower(text), '\s+')))) AS BIGINT) AS total_distinct_tokens
FROM documents
GROUP BY lang
ORDER BY lang
""",
    tags=("b11.5",),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
            F.sum(F.size(toks)).cast("bigint").alias("total_tokens"),
            F.sum(F.size(F.array_distinct(toks))).cast("bigint")
             .alias("total_distinct_tokens"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# b11.6 term frequency / global top terms
# ---------------------------------------------------------------------------

@register(
    "text_top_terms",
    oracle=r"""
SELECT term, count(*) AS freq, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
      FROM documents)
GROUP BY term
ORDER BY freq DESC, term
LIMIT 20
""",
    tags=("b11.6",),
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"),
             F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("freq").desc(), "term")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# b11.7 tf-idf: top-3 scoring terms per document (bounded doc set for the
# oracle; the pipeline shape is corpus-wide).  ln() is libm → round 6.
# ---------------------------------------------------------------------------

@register(
    "text_tfidf",
    oracle=r"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
        FROM documents)
  GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rk
  FROM scored
)
SELECT doc_id, term, tfidf, rk
FROM ranked WHERE rk <= 3 AND doc_id < 100
ORDER BY doc_id, rk
""",
    tags=("b11.7",),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    terms = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf is one row per (doc_id, term), so count(*) per term IS the
    # distinct-doc count — countDistinct here forced an Expand + an extra
    # aggregate exchange for a set the grouping already deduplicated
    # (guide §2.4: remove shuffles outright)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # Corpus size joins in as a broadcast 1-row aggregate (mirrors the
    # oracle's `CROSS JOIN n` CTE) — the whole query stays ONE plan with no
    # separate count() action (r4 verdict §wrong item 3: the extra scan
    # pass per invocation).
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf",
                    F.round(F.col("tf")
                            * F.log(F.col("n_docs") / F.col("df")), 6))
        .drop("n_docs"))
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "term", "tfidf", "rk")
        .orderBy("doc_id", "rk")
    )


# ---------------------------------------------------------------------------
# b11.5b quality scoring: length/punctuation/stopword/uniqueness ratios —
# integer counts with identical double divisions, fully oracle-checkable.
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


@register(
    "text_quality_score",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, n_chars,
         regexp_split_to_array(lower(text), '\s+') AS toks,
         len(regexp_extract_all(text, '[[:punct:]]')) AS n_punct
  FROM documents
)
SELECT doc_id,
  len(toks)                                                   AS n_tokens,
  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)        AS uniq_ratio,
  CAST(len(list_filter(toks, x -> list_contains({list(_STOPWORDS)}, x))) AS DOUBLE)
    / len(toks)                                               AS stopword_ratio,
  CAST(n_punct AS DOUBLE) / n_chars                           AS punct_ratio,
  CAST(n_chars AS DOUBLE) / len(toks)                         AS avg_token_len
FROM t
ORDER BY doc_id
""",
    tags=("b11.5",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    base = d.select(
        "doc_id", "n_chars",
        toks.alias("toks"),
        F.size(F.regexp_extract_all("text", F.lit(r"[\p{Punct}]"), 0))
         .alias("n_punct"))
    n_toks = F.size("toks")
    return (
        base.select(
            "doc_id",
            n_toks.cast("bigint").alias("n_tokens"),
            (F.size(F.array_distinct("toks")).cast("double") / n_toks)
             .alias("uniq_ratio"),
            (F.size(F.filter("toks", lambda x: F.array_contains(stop_arr, x)))
             .cast("double") / n_toks).alias("stopword_ratio"),
            (F.col("n_punct").cast("double") / F.col("n_chars"))
             .alias("punct_ratio"),
            (F.col("n_chars").cast("double") / n_toks).alias("avg_token_len"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# b11.5c n-gram-heuristic language ID: score each candidate language by its
# marker-token hit rate, pick argmax.  Markers are corpus-derived (top terms
# per labeled lang) in a real pipeline; literals here keep it deterministic.
# Oracle: the same score/argmax in DuckDB — struct comparison is
# lexicographic by field order in both engines, so max over (score, lang)
# pairs ties-break identically; confidence stays a raw int/int quotient
# (identical IEEE division both sides).  Accuracy additionally asserted in
# tests against the labeled lang column.
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("的", "是", "了", "在"),
}


def _lang_id_oracle() -> str:
    score = ("(CAST(len(list_filter(toks, x -> list_contains({markers}, x))) "
             "AS DOUBLE) / len(toks))")
    pairs = ", ".join(
        "struct_pack(s := " + score.format(
            markers="[" + ", ".join(f"'{m}'" for m in markers) + "]")
        + f", l := '{lang}')"
        for lang, markers in _LANG_MARKERS.items())
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         regexp_split_to_array(lower(text), '\\s+') AS toks
  FROM documents
), scored AS (
  SELECT doc_id, lang, list_max([{pairs}]) AS best FROM t
)
SELECT doc_id, lang,
       CASE WHEN best.s > 0 THEN best.l ELSE 'unknown' END AS predicted_lang,
       best.s AS confidence
FROM scored
ORDER BY doc_id
"""


@register("text_lang_id", oracle=_lang_id_oracle(), tags=("b11.5",))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = d.select("doc_id", "lang", toks.alias("toks"))
    def hit_ratio(markers: tuple[str, ...]) -> F.Column:
        arr = F.array(*[F.lit(m) for m in markers])
        return (F.size(F.filter("toks", lambda x: F.array_contains(arr, x)))
                .cast("double") / F.size("toks"))

    scores = [hit_ratio(markers).alias(f"score_{lang}")
              for lang, markers in _LANG_MARKERS.items()]
    scored = base.select("doc_id", "lang", *scores)
    pairs = F.array(*[
        F.struct(F.col(f"score_{lang}").alias("s"), F.lit(lang).alias("l"))
        for lang in _LANG_MARKERS
    ])
    best = F.array_max(pairs)
    return (
        scored.select(
            "doc_id", "lang",
            F.when(best["s"] > 0, best["l"]).otherwise(F.lit("unknown"))
             .alias("predicted_lang"),
            best["s"].alias("confidence"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# b11.5d document fingerprinting (winnowing): k-gram rolling hashes, window
# minima as the fingerprint set.  Seeded xxhash64 → deterministic; Spark-
# specific hash → rows-only.
# ---------------------------------------------------------------------------

def winnowing_fingerprints(docs: DataFrame) -> DataFrame:
    """Per-doc winnowing fingerprint (doc_id, fingerprint JSON, fp_size)
    over any (doc_id, text) frame.

    Each stage materializes behind a persist barrier: the window-minima
    transform references the gram array once per window position, and the
    gram transform indexes the token array 4× per gram — left as one
    projection, Catalyst's collapse re-inlines the full upstream expression
    at every reference (tokens re-split per gram per window), which
    measured 160 s for 500 docs at sf0.01; staged, it is sub-second."""
    k, win = 4, 5
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks")).transform(scoped_persist)
    t = F.col("toks")
    grams_expr = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(t) - k, F.lit(0))),
        lambda i: F.xxhash64(F.lit(3), F.concat_ws(
            " ", t[i], t[i + 1], t[i + 2], t[i + 3])))
    grammed = toked.select("doc_id", grams_expr.alias("grams")).transform(scoped_persist)
    g = F.col("grams")
    windows = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(g) - win, F.lit(0))),
        lambda i: F.array_min(F.slice(g, i + 1, win)))
    return (
        grammed.select(
            "doc_id",
            F.array_sort(F.array_distinct(windows)).alias("fp"))
        .withColumn("fp_size", F.size("fp"))
        .select("doc_id", F.to_json("fp").alias("fingerprint"), "fp_size")
    )


# The raw fingerprints are xxhash64-specific (no DuckDB twin), so the
# registered output is the oracle-computable invariant: run the fingerprint
# over the corpus WITH planted exact copies (doc d < 30 duplicated as
# d+100000 — same construction as the dedup family) and emit, per planted
# pair, whether the two fingerprint sets are identical and non-trivial.
# Identical text ⇒ identical grams ⇒ identical winnowed minima, so a correct
# pipeline yields fp_equal=1 for every pair; any nondeterminism or indexing
# bug in the gram/window stages breaks it.  The per-doc fingerprint shape
# stays covered by winnowing_fingerprints + pytest.
@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id AS id_orig, doc_id + 100000 AS id_copy,
       CAST(1 AS BIGINT) AS fp_equal, CAST(1 AS BIGINT) AS fp_nonempty
FROM documents WHERE doc_id < 30
ORDER BY id_orig
""",
    tags=("b11.5",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") < 30)
        .withColumn("doc_id", F.col("doc_id") + 100000))
    fp = winnowing_fingerprints(corpus)
    orig = fp.filter(F.col("doc_id") < 30).alias("o")
    copy = fp.filter(F.col("doc_id") >= 100000).alias("c")
    return (
        orig.join(copy,
                  F.col("c.doc_id") == F.col("o.doc_id") + 100000)
        .select(
            F.col("o.doc_id").alias("id_orig"),
            F.col("c.doc_id").alias("id_copy"),
            (F.col("o.fingerprint") == F.col("c.fingerprint"))
                .cast("bigint").alias("fp_equal"),
            (F.col("o.fp_size") > 0).cast("bigint").alias("fp_nonempty"),
        )
        .orderBy("id_orig")
    )


# ---------------------------------------------------------------------------
# b11 token counting with a BPE-ish regex (words, numbers, punctuation as
# separate tokens) — regex dialect agreed between engines.
# ---------------------------------------------------------------------------

@register(
    "text_token_count",
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
       len(string_split(text, ' '))                               AS n_ws_tokens
FROM documents
ORDER BY doc_id
""",
    tags=("b11.5",),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.size(F.regexp_extract_all(
                "text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
             .cast("bigint").alias("n_bpe_tokens"),
            F.size(F.split("text", " ", -1)).cast("bigint").alias("n_ws_tokens"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# b11 LM-style quality scoring in the exact-integer domain: rare-bigram
# novelty.  The production pattern (CCNet-style perplexity filtering) scores
# each document against an n-gram model of the corpus; log-prob outputs are
# engine-divergent at the ulp level (Math.log vs libm), so the registered
# form counts corpus-rare bigrams instead — the same signal (template text
# scores low, noisy/novel text high) with BIGINT outputs both engines agree
# on exactly.
#
# Scale shape: bigram explode → map-side-combinable count, then a
# co-partitioned join back on (w1, w2) and a per-doc agg — three shuffles,
# all on keys with corpus-count cardinality, no driver-side state.
# ---------------------------------------------------------------------------

@register(
    "text_bigram_novelty",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
), idx AS (
  SELECT doc_id, t, unnest(range(len(t) - 1)) AS i FROM toks WHERE len(t) >= 2
), pairs AS (
  SELECT doc_id, t[CAST(i AS INT) + 1] AS w1, t[CAST(i AS INT) + 2] AS w2
  FROM idx
), cnt AS (
  SELECT w1, w2, count(*) AS c FROM pairs GROUP BY w1, w2
)
SELECT p.doc_id,
       count(*)                         AS n_bigrams,
       count(*) FILTER (WHERE c.c = 1)  AS n_hapax,
       count(*) FILTER (WHERE c.c <= 2) AS n_rare
FROM pairs p JOIN cnt c ON p.w1 = c.w1 AND p.w2 = c.w2
GROUP BY p.doc_id
ORDER BY p.doc_id
""",
    tags=("b11.5",),
)
def text_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # persist: the token array is referenced twice by the slice pair (HOF
    # re-inlining rule — see winnowing_fingerprints)
    toked = (d.select("doc_id", tokens(F.col("text")).alias("t"))
             .filter(F.size("t") >= 2).transform(scoped_persist))
    t = F.col("t")
    pairs = (
        toked.select(
            "doc_id",
            F.explode(F.arrays_zip(
                F.slice(t, 1, F.size(t) - 1).alias("w1"),
                F.slice(t, 2, F.size(t) - 1).alias("w2"))).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")))
    cnt = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    return (
        pairs.join(cnt, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
              .cast("bigint").alias("n_hapax"),
             F.sum(F.when(F.col("c") <= 2, 1).otherwise(0))
              .cast("bigint").alias("n_rare"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# b11 PII-style scrubbing: pattern redaction with an audit count.  The
# production op replaces emails/phones/ids; the synthetic corpus is word
# soup, so the registered pattern redacts marker tokens — the pipeline shape
# (global regexp_replace + per-doc audit count, one projection, no shuffle)
# is identical.  \b word boundaries behave the same in Java regex and RE2.
# ---------------------------------------------------------------------------

@register(
    "text_redact",
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\b(customer|supplier)\b'))     AS n_redactions,
       regexp_replace(text, '\b(customer|supplier)\b', '<REDACTED>', 'g')
         AS redacted
FROM documents
ORDER BY doc_id
""",
    tags=("b11.5",),
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pat = r"\b(customer|supplier)\b"
    return (
        d.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(pat), 0))
             .cast("bigint").alias("n_redactions"),
            F.regexp_replace("text", pat, "<REDACTED>").alias("redacted"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# b11 deterministic stratified sampling (training-mixture weighting): keep a
# per-language quota of documents, selected by an arithmetic hash of doc_id
# (multiplicative Knuth hash mod 1000 — no rand(), so task retries and both
# engines agree exactly).  This is the data-mixing primitive: re-weight
# language/source shares without materializing a shuffle (a filter, fully
# pushdown-friendly).
# ---------------------------------------------------------------------------

_SAMPLE_QUOTA = {"en": 500, "de": 300, "fr": 300}     # per-mille keep rates
_SAMPLE_DEFAULT = 100


def permille_keep(quota: dict = _SAMPLE_QUOTA,
                  default: int = _SAMPLE_DEFAULT):
    """(hash_expr, quota_expr): the arithmetic Knuth-hash per-mille
    sampler — ONE definition shared by text_stratified_sample and
    pipeline_curation_summary (r10 review: the two spelled the hash
    differently and duplicated the quota constants).  doc_id ≥ 0, so the
    single pmod is already non-negative."""
    h = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1000))
    q = F.coalesce(
        F.create_map(*[F.lit(x) for kv in quota.items() for x in kv])
        [F.col("lang")],
        F.lit(default))
    return h, q


@register(
    "text_stratified_sample",
    oracle=f"""
WITH hashed AS (
  SELECT doc_id, lang, ((doc_id * 2654435761) % 1000 + 1000) % 1000 AS h
  FROM documents
)
SELECT doc_id, lang FROM hashed
WHERE h < CASE lang
  {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _SAMPLE_QUOTA.items())}
  ELSE {_SAMPLE_DEFAULT} END
ORDER BY doc_id
""",
    tags=("b11.5",),
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h, quota = permille_keep()
    return (d.filter(h < quota).select("doc_id", "lang").orderBy("doc_id"))


# ---------------------------------------------------------------------------
# b11 sequence packing (training-batch assignment): within each language
# shard, documents are packed greedily in doc_id order into bins of
# ~2048 tokens — bin id = floor((cumsum - own) / 2048) over a PARTITIONED
# window (per-lang, never a global single-task window; cross-shard packing
# is embarrassingly parallel by construction).
# ---------------------------------------------------------------------------

@register(
    "text_seq_packing",
    oracle=r"""
WITH t AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(lower(text), '\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin_id
FROM c
ORDER BY doc_id
""",
    tags=("b11.5",),
)
def text_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang",
                 F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"))
    w = (W.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, 0))
    return (
        t.withColumn("cum", F.sum("n_tokens").over(w))
        .select("doc_id", "lang", "n_tokens",
                F.floor((F.col("cum") - F.col("n_tokens")) / 2048)
                 .cast("bigint").alias("bin_id"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# b11 benchmark decontamination: flag training documents sharing any 8-token
# gram with the held-out eval set (doc_id < 20 plays the eval split).  The
# canonical pretraining hygiene pass (GPT-3/CCNet style).  Join key is the
# gram TEXT itself — no hashing — so the whole pipeline is exactly
# recomputable in SQL; at 100 TB you'd swap the key for xxhash64(gram) and
# keep the identical shape (explode → distinct eval side → equi-join →
# per-doc count), broadcast-ing the eval gram set when it fits.
# ---------------------------------------------------------------------------

@register(
    "text_decontaminate",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
), grams AS (
  SELECT doc_id,
         array_to_string(t[CAST(i AS INT) + 1:CAST(i AS INT) + 8], ' ') AS gram
  FROM (SELECT doc_id, t, unnest(range(len(t) - 7)) AS i
        FROM toks WHERE len(t) >= 8)
), eval_grams AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id < 20
)
SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared_grams
FROM grams g JOIN eval_grams e ON g.gram = e.gram
WHERE g.doc_id >= 20
GROUP BY g.doc_id
ORDER BY g.doc_id
""",
    tags=("b11.2", "b11.5"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toked = (d.select("doc_id", tokens(F.col("text")).alias("t"))
             .filter(F.size("t") >= 8).transform(scoped_persist))
    t = F.col("t")
    grams = toked.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size(t) - 8),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, 8)))).alias("gram"))
    eval_grams = (grams.filter(F.col("doc_id") < 20)
                  .select("gram").distinct())
    return (
        grams.filter(F.col("doc_id") >= 20)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# b11 RAG/training chunking: overlapping 64-token windows, stride 48.  A
# pure per-doc expansion (no shuffle until a downstream op needs one); both
# engines clamp slice-past-end identically, so chunk text hash-matches.
# ---------------------------------------------------------------------------

@register(
    "text_chunk_windows",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
), idx AS (
  SELECT doc_id, t, unnest(range(0, len(t), 48)) AS s FROM toks
)
SELECT doc_id,
       CAST(s // 48 AS BIGINT) AS chunk_id,
       array_to_string(t[CAST(s AS INT) + 1:CAST(s AS INT) + 64], ' ')
         AS chunk_text,
       CAST(least(64, len(t) - s) AS BIGINT) AS n_tokens
FROM idx
ORDER BY doc_id, chunk_id
""",
    tags=("b11.5", "b11.8"),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens(F.col("text")).alias("t")).transform(scoped_persist)
    t = F.col("t")
    starts = F.sequence(F.lit(0), F.size(t) - 1, F.lit(48))
    return (
        toked.select("doc_id", "t", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.floor(F.col("s") / 48).cast("bigint").alias("chunk_id"),
            F.concat_ws(" ", F.slice(t, F.col("s") + 1, 64)).alias("chunk_text"),
            F.least(F.lit(64), F.size(t) - F.col("s")).cast("bigint")
             .alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# ---------------------------------------------------------------------------
# b11.5c repetition-based quality rules (Gopher-style, Rae et al. 2021
# §A1.1): a document dominated by one token or one bigram is boilerplate /
# spam, and a low distinct-token ratio marks degenerate repetition.  Per
# doc: top-token fraction, top-bigram fraction, distinct-token ratio, and
# the keep verdict.
#
# Scale shape: explode → groupBy(doc_id, gram) → max-count per doc is the
# map-side-combinable counting shape (text_top_terms precedent) — two
# shuffles keyed by doc_id, no global state, linear in corpus size.  The
# fractions are exact-integer divisions (identical doubles both engines);
# the keep thresholds compare those exact doubles to shared literals.
# ---------------------------------------------------------------------------

@register(
    "text_repetition_quality",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
  FROM documents
), base AS (
  SELECT doc_id, len(t) AS n_tokens,
         len(list_distinct(t)) AS n_distinct
  FROM toks
), uni AS (
  SELECT doc_id, max(cnt) AS top_token_cnt
  FROM (SELECT doc_id, term, count(*) AS cnt
        FROM (SELECT doc_id, unnest(t) AS term FROM toks)
        GROUP BY doc_id, term)
  GROUP BY doc_id
), big AS (
  SELECT doc_id, max(cnt) AS top_bigram_cnt
  FROM (SELECT doc_id, bg, count(*) AS cnt
        FROM (SELECT doc_id,
                     unnest(list_transform(range(0, len(t) - 1),
                            i -> t[i + 1] || ' ' || t[i + 2])) AS bg
              FROM toks WHERE len(t) >= 2)
        GROUP BY doc_id, bg)
  GROUP BY doc_id
)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(u.top_token_cnt AS DOUBLE) / b.n_tokens AS top_token_frac,
       CAST(coalesce(g.top_bigram_cnt, 0) AS DOUBLE)
         / greatest(b.n_tokens - 1, 1) AS top_bigram_frac,
       CAST(b.n_distinct AS DOUBLE) / b.n_tokens AS distinct_ratio,
       CAST(CAST(u.top_token_cnt AS DOUBLE) / b.n_tokens <= 0.12
        AND CAST(coalesce(g.top_bigram_cnt, 0) AS DOUBLE)
              / greatest(b.n_tokens - 1, 1) <= 0.08
        AND CAST(b.n_distinct AS DOUBLE) / b.n_tokens >= 0.45 AS BIGINT) AS keep
FROM base b JOIN uni u USING (doc_id) LEFT JOIN big g USING (doc_id)
ORDER BY doc_id
""",
    tags=("b11.5", "b11.17"),
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    toks = d.select("doc_id", t.alias("t"))
    base = toks.select(
        "doc_id", F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"))
    uni = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term").count()
        .groupBy("doc_id").agg(F.max("count").alias("top_token_cnt")))
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("t") - 2),
        lambda i: F.concat_ws(" ", F.col("t")[i], F.col("t")[i + 1]))
    big = (
        toks.filter(F.size("t") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg").count()
        .groupBy("doc_id").agg(F.max("count").alias("top_bigram_cnt")))
    top_token_frac = (F.col("top_token_cnt").cast("double")
                      / F.col("n_tokens"))
    top_bigram_frac = (F.coalesce(F.col("top_bigram_cnt"), F.lit(0))
                       .cast("double")
                       / F.greatest(F.col("n_tokens") - 1, F.lit(1)))
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens")
    return (
        base.join(uni, "doc_id").join(big, "doc_id", "left")
        .select(
            "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"),
            top_token_frac.alias("top_token_frac"),
            top_bigram_frac.alias("top_bigram_frac"),
            distinct_ratio.alias("distinct_ratio"),
            # BIGINT 0/1, not boolean (driver-hasher lint)
            ((top_token_frac <= 0.12) & (top_bigram_frac <= 0.08)
             & (distinct_ratio >= 0.45)).cast("bigint").alias("keep"))
        .orderBy("doc_id")
    )


# b11.20 (r4 addendum) length-bucket histogram — curriculum / batch-shape
# planning needs the corpus length distribution in coarse bins; integer
# floor-division bucketing keeps the domain exact and the aggregation
# map-side combinable (one short-key shuffle regardless of corpus size).
@register(
    "text_length_histogram",
    oracle="""
SELECT n_chars // 128 AS bucket,
       (n_chars // 128) * 128 AS bucket_lo,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY n_chars // 128
ORDER BY bucket
""",
    tags=("b11.20",),
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / 128).cast("bigint")
    return (
        d.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"))
        .select("bucket", (F.col("bucket") * 128).alias("bucket_lo"),
                "n_docs", "total_chars")
        .orderBy("bucket")
    )


# b11.21 (r4 addendum) composed curation pipeline: the end-to-end corpus
# pass a training-data team actually ships — ingest (with planted dups) →
# exact dedup → quality gate → stratified sample → packing budget — as ONE
# Catalyst plan, with a per-language "data card" row reporting the corpus
# at every stage.  Each stage reuses the exact-integer rule of its
# standalone exhibit (sha256 min-id survivors = dedup_exact; cross-
# multiplied uniq-ratio gate; the arithmetic-hash per-mille quota of
# text_stratified_sample), so the whole card hash-matches the oracle.
# Composability is the point: stages chain as DataFrame transforms with no
# materialization barriers between them, and the per-stage aggregates are
# map-side-combinable counts joined on the tiny lang key.
# the pipeline composes the SAME sampler stage as the standalone
# exhibit — constants are aliases, never separate copies
_PIPE_QUOTA = _SAMPLE_QUOTA
_PIPE_DEFAULT = _SAMPLE_DEFAULT
_PIPE_BIN_TOKENS = 2048


@register(
    "pipeline_curation_summary",
    oracle=rf"""
WITH {_CORPUS_CTE_LANG}, deduped AS (
  SELECT min(doc_id) AS doc_id, any_value(lang) AS lang,
         any_value(text) AS text
  FROM corpus GROUP BY sha256(text)
), quality AS (
  SELECT doc_id, lang, n_tokens FROM (
    SELECT doc_id, lang, length(text) AS n_chars,
           len(regexp_split_to_array(lower(text), '\s+')) AS n_tokens,
           len(list_distinct(regexp_split_to_array(lower(text), '\s+')))
             AS n_distinct
    FROM deduped)
  WHERE n_chars >= 64 AND n_chars <= 100000
    AND n_tokens >= 10 AND 2 * n_distinct >= n_tokens
), sampled AS (
  SELECT doc_id, lang, n_tokens FROM quality
  WHERE ((doc_id * 2654435761) % 1000 + 1000) % 1000 < CASE lang
    {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _PIPE_QUOTA.items())}
    ELSE {_PIPE_DEFAULT} END
)
SELECT c.lang,
       count(*) AS n_ingested,
       (SELECT count(*) FROM deduped d WHERE d.lang = c.lang) AS n_after_dedup,
       (SELECT count(*) FROM quality q WHERE q.lang = c.lang) AS n_after_quality,
       (SELECT count(*) FROM sampled s WHERE s.lang = c.lang) AS n_sampled,
       (SELECT coalesce(CAST(sum(n_tokens) AS BIGINT), 0)
        FROM sampled s WHERE s.lang = c.lang) AS total_tokens,
       (SELECT CAST(ceil(coalesce(sum(n_tokens), 0)
                         / {_PIPE_BIN_TOKENS}.0) AS BIGINT)
        FROM sampled s WHERE s.lang = c.lang) AS min_bins_2048
FROM corpus c
GROUP BY c.lang
ORDER BY c.lang
""",
    tags=("b11.21", "b11.1", "b11.5", "b11.11", "b11.12"),
)
def pipeline_curation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _corpus_with_dups

    corpus = _corpus_with_dups(spark, sf_dir)
    deduped = (
        corpus.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"),
             F.any_value("lang").alias("lang"),
             F.any_value("text").alias("text")))
    toks = tokens(F.col("text"))
    scored = deduped.select(
        "doc_id", "lang",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"))
    quality = scored.filter(
        (F.col("n_chars") >= 64) & (F.col("n_chars") <= 100000)
        & (F.col("n_tokens") >= 10)
        & (2 * F.col("n_distinct") >= F.col("n_tokens")))
    h, quota = permille_keep(_PIPE_QUOTA, _PIPE_DEFAULT)
    sampled = quality.filter(h < quota)

    def per_lang(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy("lang").agg(F.count(F.lit(1)).alias(out))

    tok_stats = sampled.groupBy("lang").agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint")
         .alias("total_tokens"))
    card = (
        per_lang(corpus, "n_ingested")
        .join(per_lang(deduped, "n_after_dedup"), "lang", "left")
        .join(per_lang(quality, "n_after_quality"), "lang", "left")
        .join(per_lang(sampled, "n_sampled"), "lang", "left")
        .join(tok_stats, "lang", "left"))
    return (
        card.select(
            "lang", "n_ingested",
            F.coalesce("n_after_dedup", F.lit(0)).alias("n_after_dedup"),
            F.coalesce("n_after_quality", F.lit(0)).alias("n_after_quality"),
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("total_tokens", F.lit(0)).alias("total_tokens"),
            F.ceil(F.coalesce("total_tokens", F.lit(0))
                   / float(_PIPE_BIN_TOKENS)).cast("bigint")
             .alias("min_bins_2048"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# r5.6 — corpus-LM quality scoring (CCNet-style perplexity filtering shape):
# train a unigram language model on the corpus itself (one word-count agg),
# then score every document by its mean negative log-probability.  High
# scores = improbable token mixes = candidates for quality filtering.
#
# Vocabulary is CAPPED at the top-_LM_VOCAB terms by (count DESC, term ASC)
# — the CCNet move — and every out-of-vocabulary token falls back to count
# 1 (the rarest-possible-word probability).  This bounds the broadcast LM
# at _LM_VOCAB rows REGARDLESS of corpus vocabulary: the r5 version
# broadcast the full distinct-term table, which at web scale is billions of
# rows and OOMs the executors (r5 verdict "wrong" #2).  The cap is chosen
# below this corpus's 31-term vocabulary so the OOV path is exercised by
# the oracle, not just documented.
#
# Scale: LM train is one word-count agg + a TakeOrdered top-K (K rows to
# the driver-side broadcast, never the vocab); scoring is one broadcast
# LEFT join + one map-side-combinable per-doc sum.
#
# Cross-engine determinism: the per-token contribution is snapped to
# fixed-point (floor(ln(N/c)·1e6 + 0.5) — the functions/exact.py `cents`
# convention), per-doc sums are then exact BIGINT arithmetic, and the final
# division runs on identical operands.  ln() is transcendental, so its last
# ulp is NOT guaranteed identical between JVM Math.log and DuckDB's libm
# (ADVICE r5 item 5); the snap is safe because no distinct (N, c) operand
# pair lands near a floor boundary — the worst-case cross-engine ln
# difference is ~3e-9 in the ·1e6 domain while the corpus's closest
# boundary approach is ~6 orders of magnitude wider, a guard band pinned
# per-corpus by tests/test_llm.py::test_log_snap_guard_band.
# ---------------------------------------------------------------------------

_LM_VOCAB = 24  # top-K LM vocabulary cap (corpus vocab is 31 → 7 OOV terms)


def lm_token_scores(d: DataFrame) -> DataFrame:
    """(doc_id, qv): per-token q6 neg-log-prob under the capped unigram
    LM — THE one Spark-side definition of the scoring pipeline shared by
    text_unigram_logprob and sample_lm_quality_buckets (r10 review: the
    two exhibits restated it verbatim on both sides)."""
    w = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    lm = (w.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
          .orderBy(F.col("c").desc(), "term").limit(_LM_VOCAB))
    n = w.agg(F.count(F.lit(1)).cast("double").alias("n_words"))
    return (
        w.join(F.broadcast(lm), "term", "left")
        .crossJoin(F.broadcast(n))
        .select("doc_id",
                F.floor(F.log(F.col("n_words")
                              / F.coalesce(F.col("c"), F.lit(1))) * 1000000
                        + F.lit(0.5)).cast("bigint").alias("qv"))
    )


# the oracle twin: w/lm/n/q CTE chain ending with q(doc_id, qv)
_LM_Q_CTES = rf"""w AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
), lm AS (
  SELECT term, count(*) AS c FROM w GROUP BY term
  ORDER BY c DESC, term LIMIT {_LM_VOCAB}
), n AS (SELECT count(*) AS n_words FROM w),
q AS (
  SELECT w.doc_id,
         CAST(floor(ln(CAST(n.n_words AS DOUBLE) / coalesce(lm.c, 1))
                    * 1000000 + 0.5) AS BIGINT) AS qv
  FROM w LEFT JOIN lm USING (term) CROSS JOIN n
)"""


@register(
    "text_unigram_logprob",
    oracle=rf"""
WITH {_LM_Q_CTES}
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(qv) AS DOUBLE) / count(*) / 1000000.0 AS avg_neglogp
FROM q
GROUP BY doc_id
ORDER BY doc_id
""",
    tags=("r5.6", "b11.5"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    q = lm_token_scores(d)
    return (
        q.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             (F.sum("qv").cast("double") / F.count(F.lit(1)) / 1000000.0)
              .alias("avg_neglogp"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# r5.7 — deterministic per-domain downsampling (training-mixture balancing):
# bring every language's document count down to the smallest language's via
# engine-portable hash sampling.  keep ⟺ md5(doc_id)'s first 8 hex chars,
# compared LEXICOGRAPHICALLY, fall under the rate's hex threshold — md5 is
# bit-identical everywhere, so the sample is reproducible across engines,
# runs, partitionings, and cluster sizes (the property that makes a 100-TB
# curation run auditable, unlike rand()-based sampling).
#
# The per-domain rate derives from counts INSIDE the plan (broadcast 1-row
# min over a broadcast per-domain count) — no driver-side collect.
# ---------------------------------------------------------------------------

@register(
    "sample_domain_balance",
    oracle="""
WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
     t AS (SELECT min(cnt) AS target FROM c),
     r AS (SELECT lang, CAST(t.target AS DOUBLE) / cnt AS rate FROM c, t),
     k AS (
       SELECT d.lang, r.rate,
              CASE WHEN r.rate >= 1.0 THEN TRUE
                   ELSE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                        < lpad(lower(to_hex(CAST(floor(r.rate * 4294967296.0)
                                                 AS BIGINT))), 8, '0')
              END AS keep
       FROM documents d JOIN r USING (lang))
SELECT lang,
       count(*) AS n_total,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       min(rate) AS samp_rate
FROM k
GROUP BY lang
ORDER BY lang
""",
    tags=("r5.7", "b11.12"),
)
def sample_domain_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    target = counts.agg(F.min("cnt").alias("target"))
    rates = (counts.crossJoin(F.broadcast(target))
             .select("lang",
                     (F.col("target").cast("double") / F.col("cnt"))
                      .alias("rate")))
    thr = F.lpad(
        F.lower(F.hex(F.floor(F.col("rate") * F.lit(4294967296.0))
                      .cast("bigint"))), 8, "0")
    u = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8)
    keep = F.when(F.col("rate") >= 1.0, F.lit(True)).otherwise(u < thr)
    return (
        d.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_total"),
             F.sum(keep.cast("bigint")).alias("n_kept"),
             F.min("rate").alias("samp_rate"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# r5.8 — exact-k deterministic sample per stratum (the distributed reservoir
# equivalent): keep each language's k lowest-md5 documents.  Rate-based
# sampling (text_stratified_sample, sample_domain_balance) yields a
# BINOMIAL count per stratum; training-mixture specs are usually "exactly k
# per domain", and the hash-rank formulation delivers that with the same
# reproducibility guarantees (engine/partitioning/cluster-size invariant —
# md5 is bit-identical everywhere, ties impossible because doc_id is
# unique within the hash input).
#
# Scale: ONE shuffle keyed by lang for the per-stratum rank; Spark's
# WindowGroupLimit pushes the k-filter map-side (same partial-top-k
# machinery plan-asserted for window_top_n_per_group), so each executor
# forwards at most k rows per stratum it holds — a true distributed
# reservoir, not a global sort.
# ---------------------------------------------------------------------------

_FIXED_K = 50


@register(
    "sample_fixed_k_per_stratum",
    oracle=f"""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
SELECT doc_id, lang, rk
FROM r WHERE rk <= {_FIXED_K}
ORDER BY lang, rk
""",
    tags=("r5.8", "b11.12"),
)
def sample_fixed_k_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _FIXED_K)
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# r5.11 — term co-occurrence lift (association mining over the corpus):
# for pairs among the top-K document-frequency terms, how much more often
# they share documents than independence predicts:
#     lift(a,b) = P(a,b) / (P(a)·P(b)) = n_both · N / (df_a · df_b).
# The quality-filtering use: lift-heavy pairs expose boilerplate/template
# families (terms that always travel together), the same signal the
# repetition and bigram-novelty exhibits approach per-document.
#
# Scale: the top-K table comes from TakeOrderedAndProject (constant driver
# memory at any vocabulary size) and broadcasts everywhere; the pair stage
# self-joins the doc×top-term table on doc_id, so the quadratic term is
# bounded at K²/2 per document no matter how long the document is.  All
# counts exact integers; lift is one double division of exact operands.
# ---------------------------------------------------------------------------

_COOC_TOP = 20
_COOC_MIN = 5


@register(
    "text_term_cooccurrence",
    oracle=rf"""
WITH w AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
), dfc AS (
  SELECT term, count(*) AS df FROM w GROUP BY term
), top AS (
  SELECT term, df FROM dfc ORDER BY df DESC, term LIMIT {_COOC_TOP}
), n AS (SELECT count(*) AS n_docs FROM documents),
wt AS (
  SELECT w.doc_id, w.term FROM w JOIN top USING (term)
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_both
  FROM wt a JOIN wt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
)
SELECT p.term_a, p.term_b, p.n_both,
       CAST(p.n_both AS DOUBLE) * n.n_docs / (ta.df * tb.df) AS lift
FROM pairs p
JOIN top ta ON ta.term = p.term_a
JOIN top tb ON tb.term = p.term_b
CROSS JOIN n
WHERE p.n_both >= {_COOC_MIN}
ORDER BY term_a, term_b
""",
    tags=("r5.11", "b11.6"),
)
def text_term_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = (d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
         .distinct())
    dfc = w.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    top = dfc.orderBy(F.col("df").desc(), "term").limit(_COOC_TOP)
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    wt = w.join(F.broadcast(top.select("term")), "term")
    a = wt.select("doc_id", F.col("term").alias("term_a"))
    b = wt.select("doc_id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= _COOC_MIN)
    )
    ta = top.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    tb = top.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(ta), "term_a")
        .join(F.broadcast(tb), "term_b")
        .crossJoin(F.broadcast(n))
        .select("term_a", "term_b", "n_both",
                (F.col("n_both").cast("double") * F.col("n_docs")
                 / (F.col("df_a") * F.col("df_b"))).alias("lift"))
        .orderBy("term_a", "term_b")
    )


# ---------------------------------------------------------------------------
# r7.12 — LM-quality bucketing (the CCNet head/middle/tail split): every
# document scored by the capped unigram LM (the text_unigram_logprob
# machinery), then routed into quality buckets by FIXED perplexity
# thresholds — exactly how CCNet stratifies CommonCrawl (the thresholds
# come from a reference corpus, NOT from a per-run global sort, which is
# what makes the split reproducible across crawls and engines and keeps
# the plan free of any global-ordering step).  Downstream pipelines then
# sample head/middle heavily and tail lightly.
#
# Scale: identical shape to text_unigram_logprob (broadcast LM join +
# per-doc map-side-combinable sum) plus one (lang, bucket) short-key agg.
# Determinism: the per-doc score stays in the exact BIGINT q6 domain
# (floor-div average), so bucket edges are exact integer comparisons —
# no float boundary can flip a document between engines.
# ---------------------------------------------------------------------------

_LMQ_HEAD = 4_500_000   # avg neg-log-prob < 4.5 nats → head (most fluent)
_LMQ_MID = 4_900_000    # < 4.9 nats → middle; >= → tail


@register(
    "sample_lm_quality_buckets",
    oracle=rf"""
WITH {_LM_Q_CTES}, s AS (
  SELECT doc_id, CAST(sum(qv) // count(*) AS BIGINT) AS avg_q6 FROM q
  GROUP BY doc_id
), b AS (
  SELECT d.lang, s.avg_q6,
         CASE WHEN s.avg_q6 < {_LMQ_HEAD} THEN 'head'
              WHEN s.avg_q6 < {_LMQ_MID} THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM s JOIN documents d USING (doc_id))
SELECT lang, bucket,
       count(*) AS n_docs,
       CAST(sum(avg_q6) AS BIGINT) AS sum_q6
FROM b
GROUP BY lang, bucket
ORDER BY lang, bucket
""",
    tags=("r7.12", "b11.25"),
)
def sample_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    q = lm_token_scores(d)
    s = (q.groupBy("doc_id")
         .agg(F.expr("sum(qv) div count(*)").cast("bigint").alias("avg_q6")))
    b = (s.join(d.select("doc_id", "lang"), "doc_id")
         .select("lang", "avg_q6",
                 F.when(F.col("avg_q6") < _LMQ_HEAD, "head")
                  .when(F.col("avg_q6") < _LMQ_MID, "middle")
                  .otherwise("tail").alias("bucket")))
    return (
        b.groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("avg_q6").cast("bigint").alias("sum_q6"))
        .orderBy("lang", "bucket")
    )
