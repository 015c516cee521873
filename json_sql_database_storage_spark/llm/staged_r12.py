"""LLM-pipeline operators STAGED for round 12 (window-budgeting protocol
— see operators/staged_r12.py header; promoted next round by moving the
STAGED entry into a @register decorator).  Every entry runs
driver-identically against DuckDB at sf0.001 AND sf0.01 via
tests/test_staged_r12.py.

Per-operator 100-TB notes live in each section comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table, spread_small_scan
from .clustering import _K, _assign_sql, assign_cells
from .similarity import as_double
from .text_analysis import tokens

# ---------------------------------------------------------------------------
# text_hapax_ratio — per-source hapax-legomena share of the vocabulary
# (the classic lexical-sparsity monitor: a source whose vocab is mostly
# one-off terms is either genuinely diverse or OCR/mojibake garbage —
# either way it needs different tokenizer/filter treatment).  All counts
# are exact integers; the ratio rides as exact parts-per-million via
# BIGINT floor division (no double division to flap).
#
# 100-TB design: one explode + one (source, term) census + one per-source
# fold — all map-side-combinable, corpus touched once.  Output is
# O(|sources|).  No windows, no global step.
# ---------------------------------------------------------------------------


def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    tc = (load_table(spark, sf_dir, "documents")
          .select("source", F.explode(tokens(F.col("text"))).alias("w"))
          .groupBy("source", "w")
          .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    per = (tc.groupBy("source")
           .agg(F.count(F.lit(1)).cast("bigint").alias("vocab"),
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                .cast("bigint").alias("hapax")))
    return (per.select("source", "vocab", "hapax",
                       F.expr("CAST(hapax * 1000000 DIV vocab AS BIGINT)")
                       .alias("hapax_ppm"))
            .orderBy("source"))


_HAPAX_SQL = r"""
WITH tc AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents)
  GROUP BY source, w
), per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
  FROM tc GROUP BY source
)
SELECT source, vocab, hapax,
       CAST(hapax * 1000000 // vocab AS BIGINT) AS hapax_ppm
FROM per
ORDER BY source
"""

# ---------------------------------------------------------------------------
# sim_cell_balance — the IVF cell-occupancy census (the skew telemetry
# every partitioned ANN deployment watches: a hot cell turns the pruned
# probe back into a scan of that cell; the fix — splitting the cell or
# re-training the coarse quantizer — starts from exactly this table).
# One Lloyd assignment from the deterministic seed set (the sim_kmeans /
# sim_label_purity core), then a per-cell count with each cell's exact
# parts-per-million share (BIGINT floor division).
#
# 100-TB design: assignment is broadcast-centroid map-side argmin (no
# shuffle of scored pairs — min(struct) combine); the census collapses
# to k rows; the total is a 1-row scalar broadcast.  No windows.
# ---------------------------------------------------------------------------


def sim_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    a = assign_cells(v, _K)
    census = (a.groupBy("cluster")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs")))
    tot = census.agg(F.sum("n_vecs").cast("bigint").alias("t"))
    return (census.crossJoin(F.broadcast(tot))
            .select(F.col("cluster").cast("bigint").alias("cell"), "n_vecs",
                    F.expr("CAST(n_vecs * 1000000 DIV t AS BIGINT)")
                    .alias("share_ppm"))
            .orderBy("cell"))


_CELLBAL_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent0 AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < {_K}),
a AS ({_assign_sql("v", "cent0")}),
census AS (
  SELECT cluster AS cell, CAST(count(*) AS BIGINT) AS n_vecs
  FROM a GROUP BY 1
), tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS t FROM census)
SELECT CAST(cell AS BIGINT) AS cell, n_vecs,
       CAST(n_vecs * 1000000 // t AS BIGINT) AS share_ppm
FROM census, tot
ORDER BY cell
"""

# ---------------------------------------------------------------------------
# text_bigram_entropy_rate — the corpus's conditional token entropy
# H(wᵢ | wᵢ₋₁) ≈ H(bigram) − H(unigram), the compressibility /
# templatedness monitor one level above text_token_entropy's per-doc
# diversity: natural text sits near ~4-6 bits/token of conditional
# entropy, heavily templated or boilerplate corpora collapse toward 0.
# Both entropies use the exact q6 fixed-point recipe (floor(ln·10⁶+0.5)
# as BIGINT BEFORE the Σ c·q6(ln c) fold — an exact integer sum,
# ordering-free), so the doubles assemble identically in both engines.
#
# 100-TB design: one within-doc bigram explode (grams never leave their
# doc's partition until the census), two map-side-combinable censuses,
# two 1-row folds.  Output is one row.
# ---------------------------------------------------------------------------


def _q6_ln(col: F.Column) -> F.Column:
    return (F.floor(F.log(col.cast("double")) * 1000000 + F.lit(0.5))
            .cast("bigint"))


def text_bigram_entropy_rate(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", tokens(F.col("text")).alias("t")))
    uni = (docs.select(F.explode("t").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    big = (docs.filter(F.size("t") >= 2)     # sequence(1,0) is DESCENDING
           .select(F.explode(F.expr(
               "transform(sequence(1, size(t) - 1), "
               "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
               .alias("g"))
           .groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("c")))

    def _h(counts: DataFrame, n_name: str, h_name: str) -> DataFrame:
        m = counts.agg(F.sum("c").cast("bigint").alias("n"),
                       F.sum(F.col("c") * _q6_ln(F.col("c")))
                       .cast("bigint").alias("sq"))
        return m.select(
            F.col("n").alias(n_name),
            (_q6_ln(F.col("n")).cast("double") / 1000000.0
             - F.col("sq").cast("double") / F.col("n") / 1000000.0)
            .alias(h_name))

    h1 = _h(uni, "n_tokens", "h_unigram")
    h2 = _h(big, "n_bigrams", "h_bigram")
    return (h1.crossJoin(F.broadcast(h2))
            .select("n_tokens", "n_bigrams", "h_unigram", "h_bigram",
                    (F.col("h_bigram") - F.col("h_unigram"))
                    .alias("cond_entropy")))


_ENTRATE_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
  FROM documents
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
), big AS (
  SELECT g, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS g
        FROM toks WHERE len(t) >= 2)
  GROUP BY g
), h1 AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sq
  FROM uni
), h2 AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sq
  FROM big
)
SELECT h1.n AS n_tokens, h2.n AS n_bigrams,
       CAST(floor(ln(CAST(h1.n AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE)
         / 1000000.0 - CAST(h1.sq AS DOUBLE) / h1.n / 1000000.0
         AS h_unigram,
       CAST(floor(ln(CAST(h2.n AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE)
         / 1000000.0 - CAST(h2.sq AS DOUBLE) / h2.n / 1000000.0
         AS h_bigram,
       (CAST(floor(ln(CAST(h2.n AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE)
          / 1000000.0 - CAST(h2.sq AS DOUBLE) / h2.n / 1000000.0)
       - (CAST(floor(ln(CAST(h1.n AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE)
          / 1000000.0 - CAST(h1.sq AS DOUBLE) / h1.n / 1000000.0)
         AS cond_entropy
FROM h1, h2
"""

# ---------------------------------------------------------------------------
# sim_norm_histogram — the embedding-norm distribution (the first vector
# sanity check: un-normalized embeddings break cosine/IP interchange-
# ability, and a bimodal norm histogram usually means two models' vectors
# got mixed in one table).  norm² rides as the SAME left-to-right double
# fold both engines use for cosine (similarity.py:34), so the doubles —
# and therefore the floor() bucket — are bit-identical.
#
# 100-TB design: one map-side fold per vector + one census over a
# handful of integer buckets.  No joins, no windows, no global step.
# ---------------------------------------------------------------------------


def sim_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    n2 = (load_table(spark, sf_dir, "embeddings")
          .select(F.aggregate(as_double(F.col("embedding")), F.lit(0.0),
                              lambda acc, x: acc + x * x).alias("norm2")))
    return (n2.groupBy(F.floor(F.col("norm2")).cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
                 F.min("norm2").alias("min_norm2"),
                 F.max("norm2").alias("max_norm2"))
            .orderBy("bucket"))


_NORMHIST_SQL = """
WITH n2 AS (
  SELECT list_sum(list_transform(embedding::DOUBLE[], x -> x * x))
           AS norm2
  FROM embeddings
)
SELECT CAST(floor(norm2) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_vecs,
       min(norm2) AS min_norm2, max(norm2) AS max_norm2
FROM n2
GROUP BY 1
ORDER BY bucket
"""

# ---------------------------------------------------------------------------
# text_length_deciles — exact decile boundaries of the per-document token
# count (the packing/sharding planner's input: sequence-packing bin sizes
# and shard balance both come off this table).  Deciles use the exact
# cumulative-census recipe (q_ship_latency_p95): boundary(d) = the
# smallest length whose cumulative doc count reaches ceil(d·n/10) — pure
# integer arithmetic, no percentile interpolation float.
#
# 100-TB design: the census collapses the corpus to O(|distinct
# lengths|) rows map-side; the cumulative window runs over that bounded
# domain (the text_vocab_growth allowlisted shape — at truly unbounded
# length domains the two-pass bucketed ranking swaps in); the decile
# probe is a bounded×9 join.
# ---------------------------------------------------------------------------


def text_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    lens = (load_table(spark, sf_dir, "documents")
            .select(F.size(tokens(F.col("text"))).cast("bigint")
                    .alias("len"))
            .groupBy("len")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    tot = lens.agg(F.sum("c").cast("bigint").alias("n"))
    cum = (lens.crossJoin(F.broadcast(tot))
           .select("len", "n",
                   F.sum("c").over(W.orderBy("len")
                                   .rowsBetween(W.unboundedPreceding, 0))
                   .cast("bigint").alias("cum")))
    dec = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    # ceil(d·n/10) in PURE integer arithmetic ((d·n+9) DIV 10) — a double
    # division here would move the ≥ boundary off the integer it must sit on
    return (dec.join(cum,
                     F.col("cum") >= F.expr(
                         "CAST((decile * n + 9) DIV 10 AS BIGINT)"),
                     "inner")
            .groupBy("decile")
            .agg(F.min("n").alias("n_docs"),
                 F.min("len").alias("len_tokens"))
            .orderBy("decile"))


_LENDEC_SQL = r"""
WITH lens AS (
  SELECT CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
           AS len,
         CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM lens),
cum AS (
  SELECT len, n,
         CAST(sum(c) OVER (ORDER BY len ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum
  FROM lens, tot
)
SELECT d.decile, CAST(min(n) AS BIGINT) AS n_docs,
       CAST(min(len) AS BIGINT) AS len_tokens
FROM (SELECT unnest(range(1, 10)) AS decile) d
JOIN cum ON cum >= (d.decile * n + 9) // 10
GROUP BY d.decile
ORDER BY d.decile
"""

# ---------------------------------------------------------------------------
# text_quality_heuristic_buckets — the integer-feature quality router
# (the pre-LM curation pass every pipeline runs: stopword share and mean
# token length are the two cheapest signals that separate prose from
# keyword soup / code / mojibake).  Every feature is an exact integer
# (lengths, counts, parts-per-million via BIGINT DIV), the bucket is a
# CASE over integer thresholds, and the census is per (source, bucket) —
# nothing can flap cross-engine.  Complements sample_lm_quality_buckets
# (LM perplexity axis) with the feature-heuristic axis.
#
# 100-TB design: one tokenize pass per doc (no explode — size/filter on
# the array), one map-side census over a (sources × 4)-value domain.
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and")


def text_quality_heuristic_buckets(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    feat = (load_table(spark, sf_dir, "documents")
            .select("source", tokens(F.col("text")).alias("t"),
                    F.length("text").cast("bigint").alias("n_chars"))
            .select("source", "n_chars",
                    F.size("t").cast("bigint").alias("n_tok"),
                    F.size(F.filter(F.col("t"),
                                    lambda w: w.isin(*_STOPWORDS)))
                    .cast("bigint").alias("n_stop"))
            .filter(F.col("n_tok") > 0)
            .select("source", "n_tok",
                    F.expr("CAST(n_stop * 1000000 DIV n_tok AS BIGINT)")
                    .alias("stop_ppm"),
                    F.expr("CAST(n_chars * 1000 DIV n_tok AS BIGINT)")
                    .alias("milli_chars_per_tok")))
    bucket = (F.when(F.col("stop_ppm") == 0, 0)
              .when(F.col("stop_ppm") < 50000, 1)
              .when(F.col("stop_ppm") < 150000, 2)
              .otherwise(3)).cast("int")
    return (feat.groupBy("source", bucket.alias("quality_bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens"),
                 F.min("milli_chars_per_tok").alias("min_mcpt"),
                 F.max("milli_chars_per_tok").alias("max_mcpt"))
            .orderBy("source", "quality_bucket"))


_QUALBUCKET_SQL = rf"""
WITH feat AS (
  SELECT source,
         CAST(len(t) AS BIGINT) AS n_tok,
         CAST(len(list_filter(t, w -> w IN
              ({', '.join("'" + s + "'" for s in _STOPWORDS)})))
              AS BIGINT) AS n_stop,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM (SELECT source, text,
               regexp_split_to_array(lower(text), '\s+') AS t
        FROM documents)
), ppm AS (
  SELECT source, n_tok,
         CAST(n_stop * 1000000 // n_tok AS BIGINT) AS stop_ppm,
         CAST(n_chars * 1000 // n_tok AS BIGINT) AS mcpt
  FROM feat WHERE n_tok > 0
)
SELECT source,
       CAST(CASE WHEN stop_ppm = 0 THEN 0
                 WHEN stop_ppm < 50000 THEN 1
                 WHEN stop_ppm < 150000 THEN 2
                 ELSE 3 END AS INT) AS quality_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(mcpt) AS min_mcpt, max(mcpt) AS max_mcpt
FROM ppm
GROUP BY 1, 2
ORDER BY source, quality_bucket
"""

# ---------------------------------------------------------------------------
# sample_soft_dedup_weights — SOFT deduplication weighting (the modern
# alternative to hard survivor selection: keep every near-duplicate but
# downweight each member of a duplicate family by 1/|family|, so the
# family contributes ~one document's worth of gradient — the D4 /
# SlimPajama-style soft-dedup).  Families come from the registered
# minhash→verify→CC machinery (dup-injected corpus); singletons weigh
# 10⁶ ppm; the output censuses docs by family size with each size's
# exact per-doc weight (BIGINT DIV — no float).
#
# 100-TB design: inherits the LSH family's sub-quadratic contract; the
# weight assignment is one equi-join of labels against family sizes; the
# census collapses to O(|distinct sizes|) rows.
# ---------------------------------------------------------------------------


def sample_soft_dedup_weights(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    from .dedup import _corpus_with_dups, _minhash_verified_pairs, cc_labels

    corpus = _corpus_with_dups(spark, sf_dir).select("doc_id")
    labels = cc_labels(
        _minhash_verified_pairs(spark, sf_dir).select("id_a", "id_b"))
    sizes = (labels.groupBy("label")
             .agg(F.count(F.lit(1)).cast("bigint").alias("sz")))
    fam = (sizes.groupBy("sz")
           .agg((F.sum("sz")).cast("bigint").alias("n_docs")))
    singles = (corpus.join(labels.select(F.col("node").alias("doc_id")),
                           "doc_id", "left_anti")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    s_row = singles.select(F.lit(1).cast("bigint").alias("sz"),
                           F.col("n").alias("n_docs"))
    return (fam.unionByName(s_row)
            .groupBy("sz")
            .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
            .select(F.col("sz").alias("family_size"), "n_docs",
                    F.expr("CAST(1000000 DIV sz AS BIGINT)")
                    .alias("weight_ppm"),
                    F.expr("CAST(n_docs * (1000000 DIV sz) AS BIGINT)")
                    .alias("total_weight_ppm"))
            .orderBy("family_size"))


def _soft_dedup_sql() -> str:
    from .dedup import _CC_ORACLE_CTES

    return _CC_ORACLE_CTES + """
, sizes AS (SELECT comp, CAST(count(*) AS BIGINT) AS sz
            FROM comp GROUP BY comp),
fam AS (
  SELECT sz, CAST(sum(sz) AS BIGINT) AS n_docs FROM sizes GROUP BY sz
), singles AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM corpus
  WHERE doc_id NOT IN (SELECT n FROM nodes)
), merged AS (
  SELECT sz, CAST(sum(n_docs) AS BIGINT) AS n_docs
  FROM (SELECT * FROM fam
        UNION ALL SELECT CAST(1 AS BIGINT), n FROM singles)
  GROUP BY sz
)
SELECT sz AS family_size, n_docs,
       CAST(1000000 // sz AS BIGINT) AS weight_ppm,
       CAST(n_docs * (1000000 // sz) AS BIGINT) AS total_weight_ppm
FROM merged
ORDER BY family_size
"""

# ---------------------------------------------------------------------------
# text_char_trigram_profile — the top-5 character trigrams per language
# (the language-ID model's training census: b11.5c scores documents
# against per-language gram profiles — THIS is the op that derives such
# profiles from a labeled corpus).  Counts are exact integers; the
# per-language top-5 ranks by (count desc, gram) — a total order — via
# row_number, which Spark plans as WindowGroupLimit (rank pushed before
# the exchange: the shuffle carries O(langs·k) candidate rows per
# partition, not the full gram census).
#
# 100-TB design: the trigram explode is partition-local per doc; the
# census is map-side-combinable; the top-k per group is the
# window_top_n_per_group scale shape.
# ---------------------------------------------------------------------------

_TRIGRAM_K = 5


def text_char_trigram_profile(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    # the trigram explode (~n_chars rows per doc) and its partition-local
    # census partials are the whole cost: widen the single-row-group scan
    # first (guide §2.5; no-op at production scale)
    g = (spread_small_scan(
             spark,
             load_table(spark, sf_dir, "documents").select("lang", "text"),
             sf_dir, "documents")
         .select("lang", F.lower(F.col("text")).alias("lt"))
         .filter(F.length("lt") >= 3)       # sequence(1,<1) is DESCENDING
         .select("lang", F.explode(F.expr(
             "transform(sequence(1, length(lt) - 2), "
             "i -> substring(lt, i, 3))")).alias("g")))
    census = (g.groupBy("lang", "g")
              .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    wl = W.partitionBy("lang").orderBy(F.desc("c"), "g")
    return (census.withColumn("rk", F.row_number().over(wl))
            .filter(F.col("rk") <= _TRIGRAM_K)
            .select("lang", F.col("rk").cast("int").alias("rk"),
                    F.col("g").alias("trigram"), "c")
            .orderBy("lang", "rk"))


_TRIGRAM_SQL = f"""
WITH lt AS (
  SELECT lang, lower(text) AS lt FROM documents
), census AS (
  SELECT lang, g, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT lang,
               unnest(list_transform(range(1, length(lt) - 1),
                                     i -> substring(lt, i, 3))) AS g
        FROM lt WHERE length(lt) >= 3)
  GROUP BY lang, g
), ranked AS (
  SELECT lang, g, c,
         row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS rk
  FROM census
)
SELECT lang, CAST(rk AS INT) AS rk, g AS trigram, c
FROM ranked WHERE rk <= {_TRIGRAM_K}
ORDER BY lang, rk
"""

# ---------------------------------------------------------------------------
# text_pmi_collocations — the top-20 adjacent-token collocations by
# pointwise mutual information (the phrase-mining / tokenizer-merge
# signal: high-PMI pairs are the multiword units a BPE merge or a
# phrase index should treat as one).  PMI assembles ENTIRELY in the q6
# fixed point: score = q6(ln c_xy) + q6(ln N_big) − q6(ln c_x) −
# q6(ln c_y) — four exact BIGINT micro-nat terms, so ranking by
# (score desc, gram) is a total order both engines agree on (the
# unigram/bigram-LM discipline applied to association).  Pairs below a
# min-count floor are excluded (PMI of rare pairs is noise).
#
# 100-TB design: bigrams never leave their doc's partition until the
# census; the two unigram-count joins are equi-joins on the term; the
# global top-20 is TakeOrdered (per-partition heaps).  The 1-row bigram
# total broadcasts (map-side partials).
# ---------------------------------------------------------------------------

_PMI_K = 20
_PMI_MIN_COUNT = 5


def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (load_table(spark, sf_dir, "documents")
            .select(tokens(F.col("text")).alias("t")))
    uni = (docs.select(F.explode("t").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    big_all = (docs.filter(F.size("t") >= 2)
               .select(F.explode(F.expr(
                   "transform(sequence(1, size(t) - 1), "
                   "i -> struct(element_at(t, i) AS x, "
                   "element_at(t, i + 1) AS y))")).alias("p"))
               .select("p.x", "p.y")
               .groupBy("x", "y")
               .agg(F.count(F.lit(1)).cast("bigint").alias("cxy")))
    # the PMI normalizer is the TOTAL bigram count — summed BEFORE the
    # min-count filter (r11 review: a filtered total understates every
    # score by a filter-survival-dependent offset; the ranking survives
    # but absolute PMI semantics — thresholds, cross-corpus comparison —
    # do not)
    n_big = big_all.agg(F.sum("cxy").cast("bigint").alias("nb"))
    big = big_all.filter(F.col("cxy") >= _PMI_MIN_COUNT)
    scored = (big
              .join(uni.select(F.col("w").alias("x"),
                               F.col("c").alias("cx")), "x")
              .join(uni.select(F.col("w").alias("y"),
                               F.col("c").alias("cy")), "y")
              .crossJoin(F.broadcast(n_big))
              .select("x", "y", "cxy",
                      (_q6_ln(F.col("cxy")) + _q6_ln(F.col("nb"))
                       - _q6_ln(F.col("cx")) - _q6_ln(F.col("cy")))
                      .alias("pmi_micro_nats")))
    return scored.orderBy(F.desc("pmi_micro_nats"), "x", "y").limit(_PMI_K)


_PMI_SQL = rf"""
WITH toks AS (
  SELECT regexp_split_to_array(lower(text), '\s+') AS t FROM documents
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
), big_all AS (
  SELECT x, y, CAST(count(*) AS BIGINT) AS cxy
  FROM (SELECT unnest(list_transform(range(1, len(t)),
                                     i -> {{'x': t[i], 'y': t[i + 1]}}),
               recursive := true)
        FROM toks WHERE len(t) >= 2)
  GROUP BY x, y
), nb AS (SELECT CAST(sum(cxy) AS BIGINT) AS nb FROM big_all),
big AS (SELECT * FROM big_all WHERE cxy >= {_PMI_MIN_COUNT}),
q6 AS (
  SELECT x, y, cxy,
         CAST(floor(ln(CAST(cxy AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         + CAST(floor(ln(CAST(nb AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         - CAST(floor(ln(CAST(ux.c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         - CAST(floor(ln(CAST(uy.c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS pmi_micro_nats
  FROM big
  JOIN uni ux ON ux.w = big.x
  JOIN uni uy ON uy.w = big.y
  CROSS JOIN nb
)
SELECT x, y, cxy, pmi_micro_nats
FROM q6
ORDER BY pmi_micro_nats DESC, x, y
LIMIT {_PMI_K}
"""

# Promoted round 12 (r11 verdict next-round #2); empty STAGED kept so the
# staged-protocol tests can pin that nothing is both staged and registered.
from ..registry import register  # noqa: E402  (promotion epilogue)

for _name, (_fn, _sql) in {
    "text_hapax_ratio": (text_hapax_ratio, _HAPAX_SQL),
    "text_pmi_collocations": (text_pmi_collocations, _PMI_SQL),
    "sim_cell_balance": (sim_cell_balance, _CELLBAL_SQL),
    "text_bigram_entropy_rate": (text_bigram_entropy_rate, _ENTRATE_SQL),
    "sim_norm_histogram": (sim_norm_histogram, _NORMHIST_SQL),
    "text_length_deciles": (text_length_deciles, _LENDEC_SQL),
    "text_quality_heuristic_buckets": (text_quality_heuristic_buckets,
                                       _QUALBUCKET_SQL),
    "sample_soft_dedup_weights": (sample_soft_dedup_weights,
                                  _soft_dedup_sql()),
    "text_char_trigram_profile": (text_char_trigram_profile, _TRIGRAM_SQL),
}.items():
    register(_name, _sql)(_fn)

STAGED: dict = {}
