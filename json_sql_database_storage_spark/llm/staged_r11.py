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
from .similarity import as_double
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
# inside each source; Gini = (2·Σ(i·x_i) − (n+1)·Σx) / (n·Σx) — every
# moment an exact BIGINT, ONE double division at the end.
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
                F.sum(F.col("i") * F.col("len")).cast("bigint")
                .alias("six")))
    d = lambda c: F.col(c).cast("double")    # noqa: E731
    return (per.select("source", "n", "sx",
                       ((2 * d("six") - (d("n") + 1) * d("sx"))
                        / (d("n") * d("sx"))).alias("gini"))
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
         CAST(sum(i * len) AS BIGINT) AS six
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
    mom = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                  F.sum("x").cast("bigint").alias("sx"),
                  F.sum("y").cast("bigint").alias("sy"),
                  F.sum(F.col("x") * F.col("y")).cast("bigint")
                  .alias("sxy"),
                  F.sum(F.col("x") * F.col("x")).cast("bigint")
                  .alias("sxx"))
    d = lambda c: F.col(c).cast("double")    # noqa: E731
    slope = ((d("n") * d("sxy") - d("sx") * d("sy"))
             / (d("n") * d("sxx") - d("sx") * d("sx")))
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
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
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


STAGED: dict = {
    "dedup_cluster_size_histogram": (dedup_cluster_size_histogram,
                                     _cluster_hist_sql()),
    "sample_reservoir_global": (sample_reservoir_global, _RSV_SQL),
    "sim_dimension_profile": (sim_dimension_profile, _DIMPROF_SQL),
    "text_doc_length_gini": (text_doc_length_gini, _GINI_SQL),
    "sim_label_purity": (sim_label_purity, _PURITY_SQL),
    "text_zipf_slope": (text_zipf_slope, _ZIPF_SQL),
}
