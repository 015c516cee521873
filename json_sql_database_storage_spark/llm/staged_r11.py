"""LLM-pipeline operators STAGED for round 11 (window-budgeting protocol
of llm/staged_r10.py).  Each entry is a complete ``(callable, oracle)``
register() payload, driver-identically verified at sf0.001 AND sf0.01 by
tests/test_staged_r11.py; round 11 promotes them by moving the dict entry
into a @register decorator.

Reference parity note: the reference (DatabaseManager.java:280-381) has
no analytical surface; these are Part-B derived operators mandated by the
driver contract's LLM-pipeline families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .clustering import _assign_sql, assign_cells
from .similarity import _COSINE_SQL, as_double
from .text_analysis import tokens

# ---------------------------------------------------------------------------
# sample_reservoir_global — exact-k GLOBAL uniform sample (the one-table
# distributed reservoir; sample_fixed_k_per_stratum's global twin): rank
# every doc by (md5(doc_id), doc_id) — a deterministic pseudo-random
# total order both engines hash identically — and take the first k via
# TakeOrderedAndProject (per-partition heaps forward ≤k rows each; no
# global sort, no single-partition window).
#
# 100-TB design: the heap bound means shuffle bytes are O(k × partitions)
# regardless of corpus size; determinism makes the sample reproducible
# and join-stable across reruns (the property seeded RNG samples lose
# under repartitioning).
# ---------------------------------------------------------------------------

_RSV_K = 100


def sample_reservoir_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.md5(F.col("doc_id").cast("string")).alias("h")))
    return (docs.orderBy("h", "doc_id").limit(_RSV_K)
            .select("doc_id", "source")
            .orderBy("doc_id"))


_RSV_SQL = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
  LIMIT {_RSV_K}
)
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# sim_dimension_profile — per-dimension health statistics of the
# embedding space (the "dead dimension" / scale-imbalance monitor every
# vector pipeline runs before indexing: a dimension with ~zero variance
# wastes PQ codebook capacity; one with a huge range dominates L2).  One
# posexplode → per-(dim) census; the mean uses the ordered-fold
# convention (sum by vec_id order) so the double is bit-identical
# cross-engine; min/max are order-free.
#
# 100-TB design: the census is map-side-combinable on the dim key —
# D×partitions partial rows shuffle, never the vectors.  The ordered
# fold bounds: collect is per-dimension over the SAMPLE the profile
# targets (profiles are computed on bounded samples at scale; the census
# min/max/n path needs no collect at all).
# ---------------------------------------------------------------------------


def sim_dimension_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", F.posexplode(as_double(F.col("embedding")))
                 .alias("dim", "x")))
    per = (v.groupBy("dim")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("vec_id", "x"))),
                    F.lit(0.0), lambda acc, s: acc + s["x"]).alias("sx"),
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x")))
    return (per.select(F.col("dim").cast("int").alias("dim"), "n",
                       (F.col("sx") / F.col("n").cast("double"))
                       .alias("mean_x"),
                       "min_x", "max_x")
            .orderBy("dim"))


_DIMPROF_SQL = """
WITH v AS (
  SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
)
SELECT CAST(dim AS INT) AS dim, CAST(count(*) AS BIGINT) AS n,
       list_sum(list(x ORDER BY vec_id)) / CAST(count(*) AS DOUBLE)
         AS mean_x,
       min(x) AS min_x, max(x) AS max_x
FROM v
GROUP BY dim
ORDER BY dim
"""

# ---------------------------------------------------------------------------
# text_doc_length_gini — per-source Gini coefficient of document token
# lengths (the inequality monitor: a source whose token mass concentrates
# in a few giant docs needs different packing/sharding than a uniform
# one).  Lengths are exact integers; docs rank ascending by (len, doc_id)
# inside each source; Gini = (2·Σ(i·x_i) − (n+1)·Σx) / (n·Σx) — n and
# Σx are exact BIGINTs (Σx wraps only past ~10^18 tokens per source);
# the rank-weighted moment Σ(i·x_i) grows with n² so it runs in the
# 38-digit decimal domain (Spark) / HUGEINT (DuckDB) — int64 would wrap
# silently around 10^9 docs per source.  ONE double division at the end.
#
# 100-TB design: one source-key exchange for the rank window (sources are
# a catalog-sized domain, each partition holds one source's docs); the
# moment sums are map-side-combinable.  No global step.
# ---------------------------------------------------------------------------


def text_doc_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (load_table(spark, sf_dir, "documents")
            .select("source", "doc_id",
                    F.size(tokens(F.col("text"))).cast("bigint")
                    .alias("len")))
    ws = W.partitionBy("source").orderBy("len", "doc_id")
    ranked = docs.select("source", "len",
                         F.row_number().over(ws).cast("bigint").alias("i"))
    per = (ranked.groupBy("source")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("len").cast("bigint").alias("sx"),
                F.sum(F.col("i").cast("decimal(19,0)")
                      * F.col("len").cast("decimal(19,0)"))
                .alias("six")))
    d = lambda c: F.col(c).cast("double")    # noqa: E731
    # all-empty-source guard (Σlen = 0): Spark's 0.0/0.0 is NaN, DuckDB's
    # division by zero is NULL — when(sx>0) emits NULL on both
    gini = F.when(F.col("sx") > 0,
                  (2 * d("six") - (d("n") + 1) * d("sx"))
                  / (d("n") * d("sx")))
    return (per.select("source", "n", "sx", gini.alias("gini"))
            .orderBy("source"))


_GINI_SQL = r"""
WITH docs AS (
  SELECT source, doc_id,
         CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
           AS len
  FROM documents
), ranked AS (
  SELECT source, len,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY len, doc_id) AS BIGINT) AS i
  FROM docs
), per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(len) AS BIGINT) AS sx,
         sum(CAST(i AS HUGEINT) * len) AS six
  FROM ranked GROUP BY source
)
SELECT source, n, sx,
       (2 * CAST(six AS DOUBLE) - (CAST(n AS DOUBLE) + 1)
        * CAST(sx AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) AS gini
FROM per
ORDER BY source
"""

# ---------------------------------------------------------------------------
# sim_label_purity — cluster-vs-label agreement census (the cluster
# QUALITY probe: after any unsupervised cell assignment, how well do
# cells align with known labels — the embeddings table ships a label
# column for exactly this kind of evaluation).  One Lloyd assignment from
# the deterministic seed set (the sim_kmeans core), then a per-(cluster,
# label) integer census; majority label via min(struct(-cnt, label))
# (deterministic tie-break), purity = max count / cluster size — exact
# integers, one double division.
#
# 100-TB design: assignment broadcasts k centroids; the census is
# map-side-combinable on (cluster, label) — k×|labels| partial rows.
# ---------------------------------------------------------------------------

_PURITY_K = 8


def sim_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("e"),
                 F.col("label").cast("bigint").alias("label")))
    a = assign_cells(v.select("vec_id", "e"), _PURITY_K)
    cl = (a.join(v.select("vec_id", "label"), "vec_id")
          .groupBy("cluster", "label")
          .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    return (cl.groupBy("cluster")
            .agg(F.sum("cnt").cast("bigint").alias("n_members"),
                 F.min(F.struct((-F.col("cnt")).alias("neg"),
                                F.col("label").alias("l")))
                 .alias("m"),
                 F.max("cnt").cast("bigint").alias("max_cnt"))
            .select(F.col("cluster").cast("bigint").alias("cluster"),
                    "n_members",
                    F.col("m.l").alias("majority_label"),
                    (F.col("max_cnt").cast("double")
                     / F.col("n_members").cast("double")).alias("purity"))
            .orderBy("cluster"))


_PURITY_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent0 AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < {_PURITY_K}),
a1 AS ({_assign_sql("v", "cent0")}),
cl AS (
  SELECT a1.cluster, CAST(emb.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS cnt
  FROM a1 JOIN embeddings emb ON emb.vec_id = a1.vec_id
  GROUP BY 1, 2
), per AS (
  SELECT cluster, label, cnt,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY cnt DESC, label) AS rk,
         sum(cnt) OVER (PARTITION BY cluster) AS total,
         max(cnt) OVER (PARTITION BY cluster) AS mx
  FROM cl
)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(total AS BIGINT) AS n_members,
       label AS majority_label,
       CAST(mx AS DOUBLE) / CAST(total AS DOUBLE) AS purity
FROM per WHERE rk = 1
ORDER BY cluster
"""

# ---------------------------------------------------------------------------
# text_zipf_slope — the rank-frequency power-law fit over the term
# distribution (the Zipf monitor: natural corpora fit slope ≈ −1;
# boilerplate-heavy or templated crawls flatten it).  Term frequencies
# are exact integers; ranks come from one ordered window over the VOCAB
# (≪ corpus, Heaps' law — at extreme vocabularies the two-pass bucketed
# ranking of operators/scale.py swaps in with the same output); ln(rank)
# and ln(freq) snap to q6 fixed-point BIGINTs (the BM25 idf_q6
# discipline) so the least-squares moments are exact integers and the
# slope/intercept are single double expressions — bit-identical
# cross-engine (the graph_degree_assortativity moment recipe: per-row
# products BIGINT, cross-moment products in the double domain).
# ---------------------------------------------------------------------------


def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    freq = (load_table(spark, sf_dir, "documents")
            .select(F.explode(tokens(F.col("text"))).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("f")))
    wv = W.orderBy(F.col("f").desc(), "term")
    q6 = lambda c: F.floor(F.log(c.cast("double")) * 1000000 + 0.5) \
        .cast("bigint")                                     # noqa: E731
    pts = freq.select(
        q6(F.row_number().over(wv).cast("bigint")).alias("x"),
        q6(F.col("f")).alias("y"))
    # per-row products x·y / x·x fit int64 (each factor ≤ ~3.5e7 at any
    # corpus size — it's ln(count)·1e6), but their SUMS grow with vocab
    # size and wrap int64 at only ~1e5 terms — the quadratic moments run
    # in the 38-digit decimal domain (DuckDB twin: HUGEINT).  sx/sy stay
    # BIGINT-exact to ~2.6e11 vocabulary terms (beyond Heaps'-law reach).
    mom = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                  F.sum("x").cast("bigint").alias("sx"),
                  F.sum("y").cast("bigint").alias("sy"),
                  F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)"))
                  .alias("sxy"),
                  F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
                  .alias("sxx"))
    d = lambda c: F.col(c).cast("double")    # noqa: E731
    den = d("n") * d("sxx") - d("sx") * d("sx")
    # single-term-vocabulary guard (n=1 → zero rank variance): Spark's
    # 0.0/0.0 is NaN, DuckDB's division by zero is NULL — when(den>0)
    # emits NULL on both (a one-point fit has no slope)
    slope = F.when(den > 0,
                   (d("n") * d("sxy") - d("sx") * d("sy")) / den)
    return mom.select(
        F.col("n").alias("n_terms"), slope.alias("slope"),
        ((d("sy") - slope * d("sx")) / (d("n") * 1000000.0))
        .alias("intercept_ln"))


_ZIPF_SQL = r"""
WITH freq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term
        FROM documents)
  WHERE term <> ''
  GROUP BY term
), pts AS (
  SELECT CAST(floor(ln(CAST(row_number()
                OVER (ORDER BY f DESC, term) AS DOUBLE))
              * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(f AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
  FROM freq
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(x * y) AS sxy,
         sum(x * x) AS sxx
  FROM pts
)
SELECT n AS n_terms,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
       (CAST(sy AS DOUBLE)
        - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
          * CAST(sx AS DOUBLE))
       / (CAST(n AS DOUBLE) * 1000000.0) AS intercept_ln
FROM mom
"""

# ---------------------------------------------------------------------------
# dedup_cluster_size_histogram — the near-duplicate FAMILY-SIZE
# distribution (the curation telemetry behind dedup policy: a corpus
# whose duplicate mass sits in a few giant families needs different
# survivorship rules than one with many pairs).  Components come from
# the registered minhash→verify→CC machinery (dup-injected corpus, the
# dedup_cc_survivors core); singleton docs (in no verified pair) enter
# as size-1 families; the census buckets family sizes by power-of-two
# (`length(bin(sz))`, the graph_degree_histogram integer recipe).
#
# 100-TB design: inherits the LSH family's sub-quadratic contract
# (bucketed banding, capped hot buckets, checkpointed CC rounds); the
# histogram itself is two map-side-combinable censuses plus one 1-row
# singleton count.
# ---------------------------------------------------------------------------


def dedup_cluster_size_histogram(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from .dedup import _corpus_with_dups, _minhash_verified_pairs, cc_labels

    corpus = _corpus_with_dups(spark, sf_dir).select("doc_id")
    labels = cc_labels(
        _minhash_verified_pairs(spark, sf_dir).select("id_a", "id_b"))
    sizes = (labels.groupBy("label")
             .agg(F.count(F.lit(1)).cast("bigint").alias("sz")))
    hist = (sizes.groupBy(F.length(F.bin("sz")).cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
                 F.sum("sz").cast("bigint").alias("n_docs")))
    singles = (corpus.join(labels.select(F.col("node").alias("doc_id")),
                           "doc_id", "left_anti")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    s_row = singles.select(F.lit(1).cast("int").alias("bucket"),
                           F.col("n").alias("n_clusters"),
                           F.col("n").alias("n_docs"))
    return (hist.unionByName(s_row)
            .groupBy("bucket")
            .agg(F.sum("n_clusters").cast("bigint").alias("n_clusters"),
                 F.sum("n_docs").cast("bigint").alias("n_docs"))
            .orderBy("bucket"))


def _cluster_hist_sql() -> str:
    from .dedup import _CC_ORACLE_CTES

    return _CC_ORACLE_CTES + """
, sizes AS (SELECT comp, CAST(count(*) AS BIGINT) AS sz
            FROM comp GROUP BY comp),
hist AS (
  SELECT CAST(length(bin(sz)) AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_clusters,
         CAST(sum(sz) AS BIGINT) AS n_docs
  FROM sizes GROUP BY 1
), singles AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM corpus
  WHERE doc_id NOT IN (SELECT n FROM nodes)
)
SELECT bucket, CAST(sum(n_clusters) AS BIGINT) AS n_clusters,
       CAST(sum(n_docs) AS BIGINT) AS n_docs
FROM (SELECT * FROM hist
      UNION ALL SELECT 1, n, n FROM singles)
GROUP BY bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# stream_index_maintenance — the STREAMING twin of the registered
# text_index_maintenance exhibit (r9 verdict next-round #7, surfaced as a
# driver row): build BM25 over the corpus, then feed TWO document-CDF
# micro-batches (update+insert, then delete+update) through
# bm25_stream_maintain — the foreachBatch sink whose exactly-once
# guarantee is the index's OWN CAS manifest tag — and probe.  The oracle
# scores the post-change corpus with the registered BM25 recipe (snapped
# fixed-point idf, integer-cleared tf-norm, ordered per-term sum), so a
# dropped batch, a double-applied batch, a stale posting, or an unfixed
# df count all hash-mismatch.
#
# 100-TB design: per-batch cost is bm25_apply_changes' O(delta +
# tombstone join) contract — the stream never re-reads or re-tokenizes
# the base corpus; the replay/idempotence path (re-delivered batches
# no-op on the manifest-recorded tag) is pinned at
# tests/test_llm.py::test_bm25_stream_maintain_replay_is_exactly_once.
# ---------------------------------------------------------------------------

_SIM_UPD_A = 7          # updated in batch 0 (text now matches the terms)
_SIM_UPD_B = 3          # updated in batch 1
_SIM_DEL_ID = 11        # deleted in batch 1
_SIM_TXT_A = "join vector stream fresh"
_SIM_TXT_B = "vector benchmark stream update"
_SIM_TXT_NEW = "join vector crawl stream"


def stream_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..streaming.runner import stage_chunk_file
    from .search import (_BM25_TERMS, _BM25_TOPK, bm25_build, bm25_probe,
                         bm25_stream_maintain)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = bm25_build(spark, docs, "bm25_stream_exhibit")
    new_id = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1

    cdf = "doc_id bigint, text string, op string"
    chunks = [
        spark.createDataFrame([(_SIM_UPD_A, _SIM_TXT_A, "u"),
                               (new_id, _SIM_TXT_NEW, "u")], cdf),
        spark.createDataFrame([(_SIM_DEL_ID, None, "d"),
                               (_SIM_UPD_B, _SIM_TXT_B, "u")], cdf),
    ]
    # stage each chunk as ONE parquet file with strictly increasing
    # mtimes (the tag↔file stability contract in bm25_stream_maintain's
    # docstring; maxFilesPerTrigger=1 → one micro-batch per file).  The
    # dir is fresh per invocation, so re-running the exhibit replays the
    # SAME batch ids against a freshly rebuilt manifest — deterministic.
    staged = tempfile.mkdtemp(prefix="bm25_stream_exhibit_")
    try:
        for seq, df in enumerate(chunks):
            stage_chunk_file(df, staged, seq)
        bm25_stream_maintain(spark, paths, staged)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK)


def _stream_maint_oracle() -> str:
    # the registered BM25 scoring SQL (search.py::bm25_score_sql — ONE
    # definition of the exactness discipline), scored over the
    # post-stream corpus (both batches applied exactly once)
    from .search import bm25_score_sql

    return bm25_score_sql(
        corpus_sql="documents_m",
        prologue=f"""documents_m AS (
  SELECT doc_id,
         CASE WHEN doc_id = {_SIM_UPD_A} THEN '{_SIM_TXT_A}'
              WHEN doc_id = {_SIM_UPD_B} THEN '{_SIM_TXT_B}'
              ELSE text END AS text
  FROM documents WHERE doc_id <> {_SIM_DEL_ID}
  UNION ALL
  SELECT (SELECT max(doc_id) + 1 FROM documents), '{_SIM_TXT_NEW}'
), """)

# ---------------------------------------------------------------------------
# sample_weighted_no_replacement — exact-k weighted sampling WITHOUT
# replacement (Efraimidis–Spirakis A-ES, the token-weighted corpus
# sampler: long documents proportionally likelier, no doc twice).  Each
# doc draws a deterministic uniform u ∈ (0,1] from its md5 prefix (the
# arithmetic-hash discipline — no rand(), so task retries and both
# engines agree exactly), and its exponential key -ln(u)/w (w = token
# count) snaps to q6 fixed-point (the BM25 idf_q6 discipline, so the
# cross-engine float comparison is on snapped BIGINTs); the k smallest
# keys win.
#
# 100-TB design: key assignment is a pure projection; the top-k is
# TakeOrderedAndProject (per-partition heaps forward ≤k rows each), so
# shuffle bytes are O(k × partitions) at any corpus size — the
# sample_reservoir_global shape with weights.
# ---------------------------------------------------------------------------

_WNR_K = 60


def sample_weighted_no_replacement(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.size(tokens(F.col("text"))).cast("bigint")
                    .alias("w"))
            .filter(F.col("w") > 0))
    h = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("bigint"))
    u = (h + 1).cast("double") / F.lit(4294967296.0)
    key_q6 = F.floor((-F.log(u) / F.col("w").cast("double")) * 1000000
                     + 0.5).cast("bigint")
    return (docs.select("doc_id", "source", "w", key_q6.alias("key_q6"))
            .orderBy("key_q6", "doc_id").limit(_WNR_K)
            .select("doc_id", "source", "w")
            .orderBy("doc_id"))


_WNR_SQL = f"""
WITH docs AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT)
           AS w
  FROM documents
), keyed AS (
  SELECT doc_id, source, w,
         CAST(floor((-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                1, 8)) AS UBIGINT) + 1)
                          / 4294967296.0)
                     / CAST(w AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS key_q6
  FROM docs WHERE w > 0
)
SELECT doc_id, source, w FROM (
  SELECT doc_id, source, w FROM keyed
  ORDER BY key_q6, doc_id
  LIMIT {_WNR_K}
)
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# sim_ann_recall_curve — the IVF QUALITY curve: recall@5 of the
# registered IVF probe at nprobe ∈ {1,2,3} against the exact
# brute-force top-5 (the evaluation every ANN deployment runs before
# picking its probe budget; sim_ivf_topk fixes nprobe=3 — this measures
# what each probe step buys).  Cells/assignment/probe ranking are the
# sim_ivf_topk machinery verbatim; the exact side is the sim_cosine_topk
# shape; hits are one equi-join on (query, neighbor); recall divides two
# exact BIGINTs.
#
# 100-TB design: centroids broadcast (k rows); candidate scoring touches
# only probed cells; the exact side is the EVALUATION harness — it runs
# over the bounded query sample (10 queries × corpus, a broadcast-side
# linear scan), which is how recall is measured at any scale.  The curve
# table itself is 3 rows.
# ---------------------------------------------------------------------------

_RECALL_TOPK = 5
_RECALL_NQ = 10


def sim_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import (cell_similarities, cosine, label_centroids)

    from ..registry import scoped_persist

    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", "label", as_double(F.col("embedding"))
                 .alias("e")))
    # sims feeds BOTH the assignment groupBy and the probe window —
    # persist it once (the sim_ivf_topk discipline) instead of cosine-
    # scoring every vector against every centroid twice
    sims = scoped_persist(cell_similarities(v, label_centroids(v)))
    assigned = (sims.groupBy("vec_id")
                .agg(F.max_by("c_label", F.col("cs")).alias("cell"),
                     F.first("e").alias("e")))
    wq = W.partitionBy("vec_id").orderBy(F.col("cs").desc(), "c_label")
    probes = (sims.filter(F.col("vec_id") < _RECALL_NQ)
              .withColumn("prk", F.row_number().over(wq))
              .filter(F.col("prk") <= 3)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("c_label").alias("qcell"),
                      F.col("prk").alias("prk"), F.col("e").alias("qe")))
    # candidates once (nprobe=3 superset), scored once; the per-nprobe
    # rank filters on the carried prk
    cand = (assigned.join(F.broadcast(probes),
                          (F.col("cell") == F.col("qcell"))
                          & (F.col("vec_id") != F.col("query_id")))
            .select("query_id", "prk",
                    F.col("vec_id").alias("neighbor_id"),
                    cosine(F.col("qe"), F.col("e")).alias("cos_sim")))
    np_df = spark.range(1, 4).select(F.col("id").cast("int")
                                     .alias("nprobe"))
    per = cand.join(F.broadcast(np_df), F.col("prk") <= F.col("nprobe"))
    wr = (W.partitionBy("nprobe", "query_id")
          .orderBy(F.col("cos_sim").desc(), "neighbor_id"))
    ivf_top = (per.withColumn("rk", F.row_number().over(wr))
               .filter(F.col("rk") <= _RECALL_TOPK)
               .select("nprobe", "query_id", "neighbor_id"))
    # exact top-5 per query: bounded query sample × corpus
    q = (v.filter(F.col("vec_id") < _RECALL_NQ)
         .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe")))
    ex = (v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
          .select("query_id", F.col("vec_id").alias("neighbor_id"),
                  cosine(F.col("qe"), F.col("e")).alias("cos_sim")))
    we = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                           "neighbor_id")
    exact_top = (ex.withColumn("rk", F.row_number().over(we))
                 .filter(F.col("rk") <= _RECALL_TOPK)
                 .select("query_id", "neighbor_id"))
    hits = (ivf_top.join(exact_top, ["query_id", "neighbor_id"])
            .groupBy("nprobe")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits")))
    # LEFT join from the 3-row nprobe grid: a probe budget that scores
    # ZERO hits must still appear as recall 0.0 — dropping the worst
    # point is exactly what a recall curve must never do
    return (np_df.join(hits, "nprobe", "left")
            .select(
        "nprobe",
        F.lit(_RECALL_NQ * _RECALL_TOPK).cast("bigint").alias("n_truth"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint")
        .alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
         / F.lit(float(_RECALL_NQ * _RECALL_TOPK))).alias("recall_at_5"))
        .orderBy("nprobe"))


_RECALL_SQL = f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
     flat AS (
  SELECT label, unnest(range(len(e))) AS pos, unnest(e) AS val FROM v
), cent AS (
  SELECT label AS c_label, list(avg_val ORDER BY pos) AS ce
  FROM (SELECT label, pos, sum(val) / count(*) AS avg_val
        FROM flat GROUP BY label, pos)
  GROUP BY label
), sims AS (
  SELECT v.vec_id, v.e, c.c_label,
         {_COSINE_SQL.format(a="v.e", b="c.ce")} AS cs
  FROM v CROSS JOIN cent c
), assigned AS (
  SELECT vec_id, arg_max(c_label, cs) AS cell, any_value(e) AS e
  FROM sims GROUP BY vec_id
), probes AS (
  SELECT vec_id AS query_id, c_label AS qcell, prk, e AS qe
  FROM (SELECT vec_id, c_label, e,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cs DESC, c_label) AS prk
        FROM sims WHERE vec_id < {_RECALL_NQ})
  WHERE prk <= 3
), cand AS (
  SELECT p.query_id, p.prk, a.vec_id AS neighbor_id,
         {_COSINE_SQL.format(a="p.qe", b="a.e")} AS cos_sim
  FROM assigned a JOIN probes p
    ON a.cell = p.qcell AND a.vec_id != p.query_id
), np AS (SELECT unnest([1, 2, 3]) AS nprobe),
ivf_top AS (
  SELECT nprobe, query_id, neighbor_id FROM (
    SELECT np.nprobe, c.query_id, c.neighbor_id,
           row_number() OVER (PARTITION BY np.nprobe, c.query_id
                              ORDER BY c.cos_sim DESC, c.neighbor_id)
             AS rk
    FROM cand c JOIN np ON c.prk <= np.nprobe
  ) WHERE rk <= {_RECALL_TOPK}
), q AS (
  SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {_RECALL_NQ}
), ex AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         {_COSINE_SQL.format(a="q.qe", b="v.e")} AS cos_sim
  FROM q JOIN v ON v.vec_id != q.query_id
), exact_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rk
    FROM ex
  ) WHERE rk <= {_RECALL_TOPK}
), hits AS (
  SELECT i.nprobe, CAST(count(*) AS BIGINT) AS n_hits
  FROM ivf_top i
  JOIN exact_top e USING (query_id, neighbor_id)
  GROUP BY 1
)
SELECT CAST(np.nprobe AS INT) AS nprobe,
       CAST({_RECALL_NQ * _RECALL_TOPK} AS BIGINT) AS n_truth,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) AS DOUBLE)
         / {float(_RECALL_NQ * _RECALL_TOPK)} AS recall_at_5
FROM np LEFT JOIN hits h ON h.nprobe = np.nprobe
ORDER BY nprobe
"""


# ---------------------------------------------------------------------------
# text_source_overlap — pairwise 5-gram Jaccard between SOURCES (the
# cross-source contamination matrix: text_decontamination asks "is the
# benchmark in the corpus"; this asks which corpus sources copy from
# each other — mirror crawls and syndicated content show up as
# off-diagonal mass long before doc-level dedup finds the pairs).
# Grams ride as DISTINCT (source, gram) rows (the text_ngram_novelty
# recipe, source-keyed); the pair census is a gram-keyed self-join whose
# per-gram fan-out is ≤ C(|sources|, 2) — catalog-bounded, never
# corpus-bounded; Jaccard divides exact BIGINTs.
#
# 100-TB design: the distinct collapse happens BEFORE the self-join, so
# join input is hashed-gram-sized; per-source totals are one map-side-
# combinable census; output is |sources|² rows.  The hot-gram fan-out
# cap is structural (a gram contributes at most 190 pairs at 20
# sources), unlike a doc-level self-join.
# ---------------------------------------------------------------------------

_OVL_N = 5


def text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..registry import scoped_persist

    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("source", tokens(F.col("text")).alias("t"))
            .filter(F.size("t") >= _OVL_N))
    # the distinct gram relation (the dominant cost: tokenize + explode +
    # dedup the corpus) feeds the totals census AND both self-join sides
    # — persist it once, never re-derive it
    grams = scoped_persist(toks.select(
        "source",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size("t") - F.lit(_OVL_N)),
            lambda i: F.concat_ws(" ", *[F.get(F.col("t"), i + k)
                                         for k in range(_OVL_N)])))
        .alias("g"))
        .distinct())
    totals = (grams.groupBy("source")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    pairs = (grams.alias("a")
             .join(grams.select(F.col("source").alias("source_b"),
                                F.col("g")).alias("b"), ["g"])
             .filter(F.col("a.source") < F.col("source_b"))
             .groupBy(F.col("a.source").alias("source_a"), "source_b")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_common")))
    ta = totals.select(F.col("source").alias("source_a"),
                       F.col("n").alias("n_a"))
    tb = totals.select(F.col("source").alias("source_b"),
                       F.col("n").alias("n_b"))
    return (pairs.join(F.broadcast(ta), "source_a")
            .join(F.broadcast(tb), "source_b")
            .select("source_a", "source_b", "n_common",
                    (F.col("n_common").cast("double")
                     / (F.col("n_a") + F.col("n_b")
                        - F.col("n_common")).cast("double"))
                    .alias("jaccard"))
            .orderBy("source_a", "source_b"))


_OVERLAP_SQL = rf"""
WITH toks AS (
  SELECT source, regexp_split_to_array(lower(text), '\s+') AS t
  FROM documents
), grams AS (
  SELECT DISTINCT source,
         {" || ' ' || ".join(f"t[i + {k}]" for k in range(_OVL_N))} AS g
  FROM (SELECT source, t,
               unnest(generate_series(1, len(t) - {_OVL_N - 1})) AS i
        FROM toks WHERE len(t) >= {_OVL_N})
), totals AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY source
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM grams a JOIN grams b USING (g)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_common,
       CAST(n_common AS DOUBLE)
         / CAST(ta.n + tb.n - n_common AS DOUBLE) AS jaccard
FROM pairs
JOIN totals ta ON ta.source = source_a
JOIN totals tb ON tb.source = source_b
ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# stream_vector_index_maintenance — the VECTOR twin of
# stream_index_maintenance: build IVFPQ over the embeddings, feed two
# vector-CDF micro-batches (update-moves-vector + insert, then delete)
# through ivfpq_stream_maintain (exactly-once at the index's own CAS
# manifest tag), probe with the post-change query set.  The oracle is
# the registered IVFPQ serve recipe with TRAINING pinned to the
# ORIGINAL corpus and SERVING on the post-change one — exactly the
# frozen-codebook maintenance contract (ivfpq_apply_changes re-encodes
# deltas against build-time centroids/codebook; probe ≡ frozen-codebook
# rebuild is pinned at tests/test_llm.py).
#
# 100-TB design: per-batch cost is the O(delta) re-encode + tombstone
# write — the base corpus is never re-read; the probe's tombstone
# filter is one O(changed vectors) equi-join.  Vector shifts are exact
# binary fractions (+0.25 / +0.125), so both engines run identical IEEE
# adds.
# ---------------------------------------------------------------------------

_VIM_UPD = 7      # updated in batch 0 (vector shifts — may change cell)
_VIM_SRC = 13     # source vector for the inserted new id
_VIM_DEL = 11     # deleted in batch 1


def stream_vector_index_maintenance(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..streaming.runner import stage_chunk_file
    from .pq import _IPQ_NQ, ivfpq_build, ivfpq_probe, ivfpq_stream_maintain

    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    paths = ivfpq_build(spark, v, "ivfpq_stream_exhibit")
    new_id = int(v.agg(F.max("vec_id")).collect()[0][0]) + 1

    def bump(delta: float):
        return F.transform(F.col("e"), lambda x: x + F.lit(delta))

    upd = (v.filter(F.col("vec_id") == _VIM_UPD)
           .select("vec_id", bump(0.25).alias("e"),
                   F.lit("u").alias("op")))
    ins = (v.filter(F.col("vec_id") == _VIM_SRC)
           .select(F.lit(new_id).cast("bigint").alias("vec_id"),
                   bump(0.125).alias("e"), F.lit("u").alias("op")))
    delr = spark.createDataFrame(
        [(_VIM_DEL, None, "d")], "vec_id bigint, e array<double>, op string")

    staged = tempfile.mkdtemp(prefix="ivfpq_stream_exhibit_")
    try:
        stage_chunk_file(upd.unionByName(ins), staged, 0)
        stage_chunk_file(delr, staged, 1)
        ivfpq_stream_maintain(spark, paths, staged)
    finally:
        shutil.rmtree(staged, ignore_errors=True)

    final = (v.filter(~F.col("vec_id").isin(_VIM_UPD, _VIM_DEL))
             .unionByName(v.filter(F.col("vec_id") == _VIM_UPD)
                          .select("vec_id", bump(0.25).alias("e")))
             .unionByName(v.filter(F.col("vec_id") == _VIM_SRC)
                          .select(F.lit(new_id).cast("bigint")
                                  .alias("vec_id"),
                                  bump(0.125).alias("e"))))
    queries = (final.filter(F.col("vec_id") < _IPQ_NQ)
               .select(F.col("vec_id").alias("query_id"), "e"))
    return ivfpq_probe(spark, paths, queries, final)


def _stream_vim_oracle() -> str:
    from .pq import ivfpq_score_sql

    return ivfpq_score_sql(
        serve="vm",
        serve_prologue=f"""vm AS (
  SELECT vec_id,
         CASE WHEN vec_id = {_VIM_UPD}
              THEN list_transform(e, x -> x + 0.25)
              ELSE e END AS e
  FROM v WHERE vec_id <> {_VIM_DEL}
  UNION ALL
  SELECT (SELECT max(vec_id) + 1 FROM v),
         list_transform(e, x -> x + 0.125)
  FROM v WHERE vec_id = {_VIM_SRC}
), """)


# Promoted round 11 (r10 verdict next-round #1); empty STAGED kept so the
# staged-protocol tests can pin that nothing is both staged and registered.
from ..registry import register  # noqa: E402  (promotion epilogue)

for _name, (_fn, _sql) in {
    "dedup_cluster_size_histogram": (dedup_cluster_size_histogram,
                                     _cluster_hist_sql()),
    "sample_reservoir_global": (sample_reservoir_global, _RSV_SQL),
    "sim_dimension_profile": (sim_dimension_profile, _DIMPROF_SQL),
    "text_doc_length_gini": (text_doc_length_gini, _GINI_SQL),
    "sim_label_purity": (sim_label_purity, _PURITY_SQL),
    "text_zipf_slope": (text_zipf_slope, _ZIPF_SQL),
    "stream_index_maintenance": (stream_index_maintenance,
                                 _stream_maint_oracle()),
    "sample_weighted_no_replacement": (sample_weighted_no_replacement,
                                       _WNR_SQL),
    "sim_ann_recall_curve": (sim_ann_recall_curve, _RECALL_SQL),
    "text_source_overlap": (text_source_overlap, _OVERLAP_SQL),
    "stream_vector_index_maintenance": (stream_vector_index_maintenance,
                                        _stream_vim_oracle()),
}.items():
    register(_name, _sql)(_fn)

STAGED: dict = {}
