"""LLM-pipeline operators STAGED for round 14 (window-budgeting protocol
— see operators/staged_r14.py header; promoted next round by moving the
STAGED entry into a @register decorator).  Every entry runs
driver-identically against DuckDB at sf0.001 AND sf0.01 via
tests/test_staged_r14.py.

Per-operator 100-TB notes live in each section comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .similarity import as_double
from .staged_r12 import _q6_ln
from .text_analysis import tokens

# ---------------------------------------------------------------------------
# text_ttr_by_source — per-source type-token ratio in exact ppm (distinct
# terms per million tokens): the lexical-diversity lens PER CRAWL SOURCE
# (text_stats profiles per language; text_hapax_ratio counts the
# singleton tail — TTR is the headline diversity number quality routers
# threshold on: templated/boilerplate sources collapse toward 0).
#
# 100-TB design: one explode + a (source, term) DISTINCT collapse (the
# one real shuffle), then a per-source fold — all map-side-combinable.
# Output O(|sources|).
# ---------------------------------------------------------------------------


def text_ttr_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = (load_table(spark, sf_dir, "documents")
          .select("source", F.explode(tokens(F.col("text"))).alias("w")))
    return (st.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                 F.countDistinct("w").cast("bigint").alias("n_types"))
            .select("source", "n_tokens", "n_types",
                    F.expr("CAST(n_types * 1000000 DIV n_tokens AS BIGINT)")
                    .alias("ttr_ppm"))
            .orderBy("source"))


_TTR_SQL = r"""
WITH st AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT w) AS BIGINT) AS n_types,
       CAST(CAST(count(DISTINCT w) AS BIGINT) * 1000000 // count(*)
            AS BIGINT) AS ttr_ppm
FROM st
GROUP BY source
ORDER BY source
"""

# ---------------------------------------------------------------------------
# text_vocab_coverage_curve — the tokenizer-budget curve: rank the vocab
# by frequency (count desc, term tie-break) and report, per power-of-two
# rank bucket (ranks < 2, < 4, … — `length(bin(rank))`), the CUMULATIVE
# term count, cumulative token coverage and exact coverage ppm.  Answers
# "what vocab size covers 99% of the corpus" — the vocab-size sizing
# input next to text_vocab_growth's corpus-order curve and
# text_zipf_slope's power-law fit.
#
# 100-TB design: the rank window runs over the VOCAB (≪ corpus, Heaps'
# law — the text_zipf_slope allowlisted shape; two-pass bucketed ranking
# swaps in at extreme vocabularies), then everything is O(log vocab)
# buckets.  The corpus itself is touched once by the census.
# ---------------------------------------------------------------------------


def text_vocab_coverage_curve(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    vocab = (load_table(spark, sf_dir, "documents")
             .select(F.explode(tokens(F.col("text"))).alias("w"))
             .groupBy("w")
             .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    ranked = vocab.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("c"), F.asc("w"))))
    per_bucket = (ranked
                  .groupBy(F.length(F.bin("rnk")).cast("int")
                           .alias("bucket"))
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_terms"),
                       F.sum("c").cast("bigint").alias("tokens")))
    wc = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    wg = W.partitionBy()
    return (per_bucket
            .withColumn("cum_terms",
                        F.sum("n_terms").over(wc).cast("bigint"))
            .withColumn("cum_tokens",
                        F.sum("tokens").over(wc).cast("bigint"))
            .withColumn("total_tokens",
                        F.sum("tokens").over(wg).cast("bigint"))
            .select("bucket", "cum_terms", "cum_tokens",
                    F.expr("CAST(cum_tokens * 1000000 DIV total_tokens "
                           "AS BIGINT)").alias("coverage_ppm"))
            .orderBy("bucket"))


_COVERAGE_SQL = r"""
WITH vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents)
  GROUP BY w
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rnk
  FROM vocab
), per_bucket AS (
  SELECT CAST(length(bin(rnk)) AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(c) AS BIGINT) AS tokens
  FROM ranked GROUP BY 1
), cum AS (
  SELECT bucket,
         CAST(sum(n_terms) OVER (ORDER BY bucket) AS BIGINT) AS cum_terms,
         CAST(sum(tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens,
         CAST(sum(tokens) OVER () AS BIGINT) AS total_tokens
  FROM per_bucket
)
SELECT bucket, cum_terms, cum_tokens,
       CAST(cum_tokens * 1000000 // total_tokens AS BIGINT)
         AS coverage_ppm
FROM cum
ORDER BY bucket
"""

# ---------------------------------------------------------------------------
# text_doc_entropy_extremes — the 10 LOWEST-entropy documents (≥ 20
# tokens): per-doc unigram entropy in exact integer micro-nats —
# h_micro = q6(ln n) − (Σ c·q6(ln c)) DIV n, every term a BIGINT, the
# division integer floor — so the ranking is exact and the tie-break
# (h asc, doc_id asc) deterministic.  The gibberish/boilerplate detector
# at document granularity: near-zero entropy = one token repeated.
#
# 100-TB design: the (doc, token) census stays partition-local until the
# per-doc fold (map-side-combinable); TakeOrdered heaps bound the
# output at 10 rows.
# ---------------------------------------------------------------------------

_ENTROPY_MIN_TOKENS = 20


def text_doc_entropy_extremes(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    per = (load_table(spark, sf_dir, "documents")
           .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
           .groupBy("doc_id", "w")
           .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
           .groupBy("doc_id")
           .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                F.sum(F.col("c") * _q6_ln(F.col("c"))).cast("bigint")
                .alias("sq"))
           .filter(F.col("n_tokens") >= _ENTROPY_MIN_TOKENS))
    return (per.select("doc_id", "n_tokens",
                       F.expr("CAST(CAST(floor(ln(CAST(n_tokens AS DOUBLE))"
                              " * 1000000 + 0.5) AS BIGINT)"
                              " - sq DIV n_tokens AS BIGINT)")
                       .alias("h_micro"))
            .orderBy(F.asc("h_micro"), F.asc("doc_id"))
            .limit(10))


_DOCENT_SQL = rf"""
WITH per AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents)
  GROUP BY doc_id, w
), folds AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sq
  FROM per GROUP BY doc_id
  HAVING sum(c) >= {_ENTROPY_MIN_TOKENS}
)
SELECT doc_id, n_tokens,
       CAST(CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
                 AS BIGINT) - sq // n_tokens AS BIGINT) AS h_micro
FROM folds
ORDER BY h_micro ASC, doc_id ASC
LIMIT 10
"""

# ---------------------------------------------------------------------------
# sim_centroid_distance_matrix — the 45-pair label-centroid L2 distance
# matrix (the class-confusability map: two labels whose centroids nearly
# coincide are candidates for merging or for targeted hard-negative
# mining; the pairwise complement of sim_label_centroid_norms).
# Centroids come from the per-(label, dim) ordered fold (sum in vec_id
# order, then the dim-ordered difference-square fold) — bit-identical
# cross-engine, the sim_label_centroid_norms discipline.
#
# 100-TB design: the per-(label, dim) census is map-side-combinable;
# everything after it is O(|labels|² × dims) on catalog-bounded
# relations.  The ordered collect is per (label, dim) over the bounded
# label domain (the sim_dimension_profile note).
# ---------------------------------------------------------------------------


def sim_centroid_distance_matrix(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .select("label", "vec_id",
                 F.posexplode(as_double(F.col("embedding")))
                 .alias("dim", "x")))
    means = (v.groupBy("label", "dim")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                  F.aggregate(
                      F.array_sort(F.collect_list(
                          F.struct("vec_id", "x"))),
                      F.lit(0.0), lambda acc, s: acc + s["x"])
                  .alias("sx"))
             .select("label", "dim",
                     (F.col("sx") / F.col("n").cast("double")).alias("m")))
    a = means.select(F.col("label").alias("la"), F.col("dim").alias("da"),
                     F.col("m").alias("ma"))
    b = means.select(F.col("label").alias("lb"), F.col("dim").alias("db"),
                     F.col("m").alias("mb"))
    return (a.join(b, (F.col("da") == F.col("db"))
                   & (F.col("la") < F.col("lb")))
            .groupBy("la", "lb")
            .agg(F.sqrt(F.aggregate(
                F.array_sort(F.collect_list(
                    F.struct(F.col("da").alias("dim"),
                             (F.col("ma") - F.col("mb")).alias("d")))),
                F.lit(0.0), lambda acc, s: acc + s["d"] * s["d"]))
                .alias("centroid_dist"))
            .select(F.col("la").cast("int").alias("label_a"),
                    F.col("lb").cast("int").alias("label_b"),
                    "centroid_dist")
            .orderBy("label_a", "label_b"))


_CENTDIST_SQL = """
WITH v AS (
  SELECT label, vec_id, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
), means AS (
  SELECT label, dim,
         list_sum(list(x ORDER BY vec_id)) / CAST(count(*) AS DOUBLE) AS m
  FROM v GROUP BY label, dim
)
SELECT CAST(a.label AS INT) AS label_a, CAST(b.label AS INT) AS label_b,
       sqrt(list_sum(list((a.m - b.m) * (a.m - b.m) ORDER BY a.dim)))
         AS centroid_dist
FROM means a JOIN means b ON a.dim = b.dim AND a.label < b.label
GROUP BY a.label, b.label
ORDER BY label_a, label_b
"""

# ---------------------------------------------------------------------------
# sim_vector_sparsity — near-zero-dimension census: per vector the count
# of dimensions with |x| < 0.01, then the count-of-counts histogram.
# The quantization-readiness telemetry (a corpus whose vectors are
# mostly near-zero compresses losslessly under PQ/int8; one with no
# sparse vectors doesn't) beside sim_dimension_profile's PER-DIMENSION
# dead-dim view — this is the per-VECTOR marginal.  The threshold
# compare runs on raw parquet doubles (identical bits both engines).
#
# 100-TB design: one per-row lambda fold (JVM codegen, no explode), a
# map-side census over the bounded 0..64 domain.
# ---------------------------------------------------------------------------

_SPARSITY_EPS = 0.01


def sim_vector_sparsity(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .select(F.size(F.filter(
             as_double(F.col("embedding")),
             lambda x: F.abs(x) < F.lit(_SPARSITY_EPS)))
             .cast("int").alias("n_small_dims")))
    return (v.groupBy("n_small_dims")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
            .orderBy("n_small_dims"))


_SPARSITY_SQL = f"""
WITH v AS (
  SELECT CAST(len(list_filter(embedding::DOUBLE[],
                              x -> abs(x) < {_SPARSITY_EPS}))
              AS INT) AS n_small_dims
  FROM embeddings
)
SELECT n_small_dims, CAST(count(*) AS BIGINT) AS n_vectors
FROM v
GROUP BY n_small_dims
ORDER BY n_small_dims
"""

# ---------------------------------------------------------------------------
# text_positional_term_profile — WHERE do the top document-frequency
# terms sit inside documents?  For the top-20 df terms, the census of
# occurrences per position tercile (first/middle/last third of the
# token sequence, exact integer tercile = (3·pos0) DIV n).  Terms that
# pile into tercile 0 are openers/templates (the token-level refinement
# of text_first_token_census); uniform spread = ordinary content words.
#
# 100-TB design: the df census collapses map-side; the top-20 set is a
# TakeOrdered broadcast (k-bounded); the positional pass is one
# posexplode with the tercile computed per row (JVM codegen) and a
# census over the bounded (20 × 3) domain.
# ---------------------------------------------------------------------------

_POSPROF_K = 20


def text_positional_term_profile(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", tokens(F.col("text")).alias("t")))
    top = (docs.select(F.explode_outer(F.array_distinct("t")).alias("w"))
           .groupBy("w")
           .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
           .orderBy(F.desc("df"), F.asc("w"))
           .limit(_POSPROF_K)
           .select("w", "df"))
    pos = (docs.select(F.size("t").alias("n"),
                       F.posexplode("t").alias("i", "term"))
           .select("term",
                   F.expr("CAST(i * 3 DIV n AS INT)").alias("tercile")))
    return (pos.join(F.broadcast(top), pos.term == top.w)
            .groupBy("term", "tercile")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
                 F.max("df").cast("bigint").alias("df"))
            .orderBy("term", "tercile"))


_POSPROF_SQL = rf"""
WITH docs AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
  FROM documents
), top AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT unnest(list_distinct(t)) AS w FROM docs)
  GROUP BY w
  ORDER BY df DESC, w ASC
  LIMIT {_POSPROF_K}
), pos AS (
  SELECT t[i] AS term, CAST((i - 1) * 3 // len(t) AS INT) AS tercile
  FROM (SELECT t, unnest(range(1, len(t) + 1)) AS i FROM docs)
)
SELECT term, tercile, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(max(df) AS BIGINT) AS df
FROM pos JOIN top ON term = w
GROUP BY term, tercile
ORDER BY term, tercile
"""

# ---------------------------------------------------------------------------
# sim_dimension_covariance_topk — the 10 most-correlated dimension PAIRS
# by |covariance| over integer-quantized coordinates (q = floor(x·1000 +
# 0.5), deterministic from the parquet bits): cov_num(i,j) = n·Σqᵢqⱼ −
# Σqᵢ·Σqⱼ, exact BIGINTs end-to-end.  Redundant dimension pairs are what
# PQ subspace layouts and JL projections exploit — sim_dimension_profile
# sees each dimension alone; this is the pairwise redundancy map.
#
# 100-TB design: the pair explode is bounded by C(64,2) = 2016 rows per
# vector and collapses map-side to a 2016-row census; the per-dim sums
# (64 rows) and vector count (1 row) ride broadcast joins; per-row
# products ≤ 10⁷ keep the BIGINT moments exact to ~10¹¹ vectors (swap
# the census to DECIMAL(38) folds beyond that).  TakeOrdered bounds the
# output at 10.
# ---------------------------------------------------------------------------

_COV_K = 10


def sim_dimension_covariance_topk(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    q = (load_table(spark, sf_dir, "embeddings")
         .select(F.expr(
             "transform(CAST(embedding AS ARRAY<DOUBLE>), "
             "x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))").alias("q")))
    pairs = (q.select(F.explode(F.expr(
        "flatten(transform(sequence(1, size(q) - 1), "
        "i -> transform(sequence(i + 1, size(q)), "
        "j -> struct(i AS i, j AS j, "
        "element_at(q, i) * element_at(q, j) AS p))))")).alias("s"))
        .select("s.i", "s.j", "s.p")
        .groupBy("i", "j")
        .agg(F.sum("p").cast("bigint").alias("spp")))
    dims = (q.select(F.posexplode("q").alias("d0", "qx"))
            .select((F.col("d0") + 1).alias("d"), "qx")
            .groupBy("d")
            .agg(F.sum("qx").cast("bigint").alias("s")))
    n = q.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    si = dims.select(F.col("d").alias("di"), F.col("s").alias("s_i"))
    sj = dims.select(F.col("d").alias("dj"), F.col("s").alias("s_j"))
    return (pairs
            .join(F.broadcast(si), pairs.i == si.di)
            .join(F.broadcast(sj), pairs.j == sj.dj)
            .crossJoin(F.broadcast(n))
            .select(F.col("i").cast("int").alias("dim_i"),
                    F.col("j").cast("int").alias("dim_j"),
                    (F.col("n") * F.col("spp")
                     - F.col("s_i") * F.col("s_j")).cast("bigint")
                    .alias("cov_num"))
            .orderBy(F.abs(F.col("cov_num")).desc(), "dim_i", "dim_j")
            .limit(_COV_K))


_DIMCOV_SQL = f"""
WITH q AS (
  SELECT list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS q
  FROM embeddings
), pairs AS (
  SELECT i, j, CAST(sum(q[i] * q[j]) AS BIGINT) AS spp
  FROM q, range(1, 65) r1(i), range(1, 65) r2(j)
  WHERE i < j
  GROUP BY i, j
), dims AS (
  SELECT d, CAST(sum(qx) AS BIGINT) AS s
  FROM (SELECT unnest(q) AS qx,
               generate_subscripts(q, 1) AS d FROM q)
  GROUP BY d
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM q
)
SELECT CAST(i AS INT) AS dim_i, CAST(j AS INT) AS dim_j,
       CAST(n.n * spp - a.s * b.s AS BIGINT) AS cov_num
FROM pairs
JOIN dims a ON a.d = i
JOIN dims b ON b.d = j
CROSS JOIN n
ORDER BY abs(CAST(n.n * spp - a.s * b.s AS BIGINT)) DESC, dim_i, dim_j
LIMIT {_COV_K}
"""

# ---------------------------------------------------------------------------
# mm_wav_window_energy — windowed audio energy over REAL decoded WAVs
# (the VAD/energy-contour primitive: per 16-frame window, the exact
# Σ sample² as a BIGINT).  Rides mm_decode_wav's encode path (stdlib
# RIFF writer in an Arrow batch), then a second mapInPandas stage parses
# the container back and folds PCM windows — the oracle recomputes from
# the generating arithmetic, so the row only matches if the bytes
# round-tripped faithfully AND the windowing respected the fmt chunk's
# channel interleaving.
#
# 100-TB design: both stages are Arrow-batched mapInPandas (never
# per-row Python); output is O(assets × windows) with windows bounded by
# clip length.  Media stay opaque binary columns end-to-end (the
# multimodal contract).
# ---------------------------------------------------------------------------

_ENERGY_WINDOW_FRAMES = 16
_ENERGY_SCHEMA = ("doc_id BIGINT, window_idx INT, n_samples INT, "
                  "energy BIGINT")


def mm_wav_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from .multimodal import encode_wav_batch

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield encode_wav_batch(pdf["doc_id"])

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            ids, widx, nsamp, energy = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(b)), "rb") as wv:
                    ch, nframes = wv.getnchannels(), wv.getnframes()
                    raw = wv.readframes(nframes)
                samples = struct.unpack(f"<{nframes * ch}h", raw)
                for w0 in range(0, nframes, _ENERGY_WINDOW_FRAMES):
                    w1 = min(w0 + _ENERGY_WINDOW_FRAMES, nframes)
                    chunk = samples[w0 * ch:w1 * ch]
                    ids.append(int(doc_id))
                    widx.append(w0 // _ENERGY_WINDOW_FRAMES)
                    nsamp.append(len(chunk))
                    energy.append(sum(s * s for s in chunk))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "window_idx": pd.Series(widx, dtype="int32"),
                "n_samples": pd.Series(nsamp, dtype="int32"),
                "energy": pd.Series(energy, dtype="int64"),
            })

    media = d.mapInPandas(encode, "doc_id BIGINT, payload BINARY")
    return (media.mapInPandas(windows, _ENERGY_SCHEMA)
            .orderBy("doc_id", "window_idx"))


_WAVENERGY_SQL = f"""
WITH p AS (
  SELECT doc_id, 1 + doc_id % 2 AS ch, 50 + doc_id % 25 AS nframes
  FROM documents
), s AS (
  SELECT doc_id, ch, unnest(range(nframes * ch)) AS k
  FROM p
), w AS (
  SELECT doc_id,
         CAST((k // ch) // {_ENERGY_WINDOW_FRAMES} AS INT) AS window_idx,
         ((doc_id * 31 + k * 7) % 2003) - 1001 AS smp
  FROM s
)
SELECT doc_id, window_idx, CAST(count(*) AS INT) AS n_samples,
       CAST(sum(smp * smp) AS BIGINT) AS energy
FROM w
GROUP BY doc_id, window_idx
ORDER BY doc_id, window_idx
"""

# ---------------------------------------------------------------------------
# mm_ppm_decode — the IMAGE twin of mm_decode_wav's real-codec check:
# encode each doc id into a real binary P6 PPM container (the netpbm
# header + raw interleaved RGB bytes — a genuine image container with a
# text header, dimension fields and a binary payload, writable and
# parsable with the stdlib alone), then a second Arrow stage parses the
# container BACK — dimensions from the header, channel sums from the
# payload bytes — and the oracle recomputes from the generating
# arithmetic.  The hash only matches if the header grammar (whitespace-
# separated tokens, maxval line) and the RGB interleaving round-tripped
# faithfully.  This moves the image path beyond the PIL/cv2-gated stubs:
# the container plumbing (schema, batching, binary payloads, decode
# geometry) is real and tested even though rich codecs stay gated.
#
# 100-TB design: both stages are Arrow-batched mapInPandas; images ride
# as opaque binary columns with typed metadata (the multimodal
# contract); per-asset output is one fixed-width feature row.
# ---------------------------------------------------------------------------

_PPM_SCHEMA = ("doc_id BIGINT, width INT, height INT, "
               "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT")


def _ppm_dims(doc_id: int) -> tuple[int, int]:
    return 4 + doc_id % 5, 3 + doc_id % 4


def encode_ppm_batch(doc_ids) -> "pd.DataFrame":
    """Build a real P6 PPM per doc: ASCII header (magic, dims, maxval)
    + raw RGB bytes.  pixel(x, y, c) = (doc_id·7 + y·31 + x·13 + c·101)
    mod 256 — deterministic, all three planes distinct."""
    import pandas as pd

    payloads = []
    for doc_id in doc_ids:
        w, h = _ppm_dims(int(doc_id))
        header = f"P6\n{w} {h}\n255\n".encode()
        px = bytes((int(doc_id) * 7 + y * 31 + x * 13 + c * 101) % 256
                   for y in range(h) for x in range(w) for c in range(3))
        payloads.append(header + px)
    return pd.DataFrame({"doc_id": doc_ids.astype("int64"),
                         "payload": pd.Series(payloads,
                                              index=doc_ids.index)})


def decode_ppm_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """REAL decode: tokenize the netpbm header (magic, width, height,
    maxval — whitespace-separated), then fold the raw RGB payload into
    exact per-channel sums.  Nothing is inferred from doc_id here."""
    import pandas as pd

    ws, hs, srs, sgs, sbs = [], [], [], [], []
    for b in pdf["payload"]:
        raw = bytes(b)
        # header: 4 whitespace-separated tokens, then ONE whitespace
        # byte, then the binary payload
        tokens, i = [], 0
        while len(tokens) < 4:
            while raw[i:i + 1].isspace():
                i += 1
            j = i
            while not raw[j:j + 1].isspace():
                j += 1
            tokens.append(raw[i:j])
            i = j
        i += 1                      # the single post-maxval whitespace
        assert tokens[0] == b"P6" and tokens[3] == b"255"
        w, h = int(tokens[1]), int(tokens[2])
        px = raw[i:]
        assert len(px) == w * h * 3
        ws.append(w)
        hs.append(h)
        srs.append(sum(px[0::3]))
        sgs.append(sum(px[1::3]))
        sbs.append(sum(px[2::3]))
    idx = pdf.index
    return pd.DataFrame({
        "doc_id": pdf["doc_id"].astype("int64"),
        "width": pd.Series(ws, dtype="int32", index=idx),
        "height": pd.Series(hs, dtype="int32", index=idx),
        "sum_r": pd.Series(srs, dtype="int64", index=idx),
        "sum_g": pd.Series(sgs, dtype="int64", index=idx),
        "sum_b": pd.Series(sbs, dtype="int64", index=idx),
    })


def mm_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield encode_ppm_batch(pdf["doc_id"])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_ppm_batch(pdf)

    media = d.mapInPandas(encode, "doc_id BIGINT, payload BINARY")
    return media.mapInPandas(decode, _PPM_SCHEMA).orderBy("doc_id")


_PPM_SQL = """
WITH p AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h, x, y
  FROM p, LATERAL (SELECT unnest(range(w)) AS x),
          LATERAL (SELECT unnest(range(h)) AS y)
)
SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
       CAST(sum((doc_id * 7 + y * 31 + x * 13) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id * 7 + y * 31 + x * 13 + 101) % 256) AS BIGINT)
         AS sum_g,
       CAST(sum((doc_id * 7 + y * 31 + x * 13 + 202) % 256) AS BIGINT)
         AS sum_b
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""

STAGED: dict = {
    "text_ttr_by_source": (text_ttr_by_source, _TTR_SQL),
    "mm_ppm_decode": (mm_ppm_decode, _PPM_SQL),
    "text_vocab_coverage_curve": (text_vocab_coverage_curve,
                                  _COVERAGE_SQL),
    "text_doc_entropy_extremes": (text_doc_entropy_extremes,
                                  _DOCENT_SQL),
    "sim_centroid_distance_matrix": (sim_centroid_distance_matrix,
                                     _CENTDIST_SQL),
    "sim_vector_sparsity": (sim_vector_sparsity, _SPARSITY_SQL),
    "text_positional_term_profile": (text_positional_term_profile,
                                     _POSPROF_SQL),
    "sim_dimension_covariance_topk": (sim_dimension_covariance_topk,
                                      _DIMCOV_SQL),
    "mm_wav_window_energy": (mm_wav_window_energy, _WAVENERGY_SQL),
}
