"""Product-quantization ANN (SURVEY.md §2 b11.28, r5 addendum).

The third leg of the similarity-search family (Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search"): split each 64-dim vector into
M=4 subspaces of 16 dims, quantize every subvector to one of K=16 codebook
entries per subspace, and answer queries by Asymmetric Distance Computation
(ADC) — the query precomputes an M×K table of subspace distances and every
corpus vector's approximate distance is just M table lookups summed.

Why it matters at 100 TB: the corpus compresses from 64 float64s (512 B)
per vector to M bytes of codes (4 B here — 128× smaller), so the scan side
of a query reads codes, not vectors; the flops per candidate drop from
O(dim) to O(M).  IVF (similarity.py:493) prunes WHICH vectors to score;
PQ shrinks the COST of scoring each one — production ANN engines (FAISS
IVFPQ) compose exactly these two, and this module's encode output joins the
IVF layout's cell partitioning unchanged.

Codebook: the deterministic vec_id < K prefix per subspace (sample init,
the same seeding contract as k-means/SemDeDup in clustering.py — no Lloyd
refinement here, so the oracle stays one CTE chain; clustering.py:118 shows
the refinement recipe if a production build wants trained codebooks).

Determinism: every L2² is the identical left-to-right zip/sum both engines
evaluate (similarity.py:34 convention); argmin code assignment tie-breaks
on centroid id via row_number; the M-term ADC sum is an ORDERED aggregate
(sorted by subspace index) in both engines, so doubles match to the
comparator's 9 significant digits.

Scale notes:
- encode = corpus × broadcast codebook (M·K·subdim doubles — bytes): one
  ArrowEval-free JVM expression pipeline, embarrassingly parallel, no
  shuffle until the per-(vector,subspace) argmin (keyed by vec_id — one
  exchange).
- ADC = codes × broadcast distance table (Q·M·K rows): map-side join, one
  (query, neighbor) aggregation keyed by the pair, one top-k window over Q
  partitions.  No all-pairs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .similarity import as_double

_PQ_M = 4        # subspaces
_PQ_SUB = 16     # dims per subspace (M * SUB = 64)
_PQ_K = 16       # codebook entries per subspace
_PQ_NQ = 5       # query vectors
_PQ_TOPK = 5

_L2SQ_SQL = ("list_sum(list_transform(list_zip({a}, {b}),"
             " p -> (p[1] - p[2]) * (p[1] - p[2])))")


def l2sq(a: F.Column, b: F.Column) -> F.Column:
    """Left-to-right squared-L2 — the oracle's list_sum order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def subvectors(v: DataFrame) -> DataFrame:
    """(vec_id, m, sub): each vector split into M contiguous subspaces."""
    return (
        v.select("vec_id",
                 F.explode(F.array(*[F.lit(m) for m in range(_PQ_M)]))
                  .alias("m"), "e")
        .select("vec_id", "m",
                F.slice("e", F.col("m") * _PQ_SUB + 1, _PQ_SUB).alias("sub"))
    )


def pq_encode(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, m, code): nearest codebook entry per subspace, ties to the
    lowest centroid id."""
    wenc = W.partitionBy("vec_id", "m").orderBy("d", "c_id")
    return (
        subs.join(F.broadcast(cb), "m")
        .select("vec_id", "m", "c_id",
                l2sq(F.col("sub"), F.col("csub")).alias("d"))
        .withColumn("rk", F.row_number().over(wenc))
        .filter(F.col("rk") == 1)
        .select("vec_id", "m", F.col("c_id").alias("code"))
    )


@register(
    "sim_pq_adc_topk",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
subs AS (
  SELECT vec_id, m, list_slice(e, m * {_PQ_SUB} + 1, m * {_PQ_SUB} + {_PQ_SUB}) AS sub
  FROM v CROSS JOIN (SELECT unnest(range({_PQ_M})) AS m)
), cb AS (
  SELECT vec_id AS c_id, m, sub AS csub FROM subs WHERE vec_id < {_PQ_K}
), scored AS (
  SELECT s.vec_id, s.m, cb.c_id,
         {_L2SQ_SQL.format(a="s.sub", b="cb.csub")} AS d
  FROM subs s JOIN cb USING (m)
), enc AS (
  SELECT vec_id, m, c_id AS code
  FROM (SELECT vec_id, m, c_id,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, c_id) AS rk
        FROM scored)
  WHERE rk = 1
), dtab AS (
  SELECT s.vec_id AS query_id, s.m, cb.c_id,
         {_L2SQ_SQL.format(a="s.sub", b="cb.csub")} AS d
  FROM subs s JOIN cb USING (m)
  WHERE s.vec_id < {_PQ_NQ}
), adc AS (
  SELECT d.query_id, e.vec_id AS neighbor_id,
         list_sum(list(d.d ORDER BY d.m)) AS adc_dist
  FROM enc e JOIN dtab d ON d.m = e.m AND d.c_id = e.code
  WHERE e.vec_id != d.query_id
  GROUP BY d.query_id, e.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rk
  FROM adc
)
SELECT query_id, neighbor_id, adc_dist, rk
FROM ranked WHERE rk <= {_PQ_TOPK}
ORDER BY query_id, rk
""",
    tags=("b11.28",),
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed top-k: encode the corpus to M codes per vector, then
    answer each query with M table lookups per candidate (ADC)."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    subs = subvectors(v)
    cb = (subs.filter(F.col("vec_id") < _PQ_K)
          .select(F.col("vec_id").alias("c_id"), "m",
                  F.col("sub").alias("csub")))
    enc = pq_encode(subs, cb)
    dtab = (subs.filter(F.col("vec_id") < _PQ_NQ)
            .join(F.broadcast(cb), "m")
            .select(F.col("vec_id").alias("query_id"),
                    F.col("m").alias("qm"), "c_id",
                    l2sq(F.col("sub"), F.col("csub")).alias("d")))
    adc = (
        enc.join(F.broadcast(dtab),
                 (F.col("m") == F.col("qm")) & (F.col("code") == F.col("c_id")))
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        # ORDERED M-term sum (sorted by subspace index) — float-identical
        # to the oracle's list_sum(list(d ORDER BY m))
        .agg(F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("m").alias("m"),
                                                 F.col("d").alias("d")))),
            F.lit(0.0), lambda acc, s: acc + s["d"]).alias("adc_dist"))
    )
    wq = W.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        adc.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= _PQ_TOPK)
        .select("query_id", "neighbor_id", "adc_dist", "rk")
        .orderBy("query_id", "rk")
    )
