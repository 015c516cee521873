"""LLM-pipeline operators registered round 8 (built + driver-identically
verified as STAGED payloads in round 7 — same protocol as
operators/tpch_staged.py — then promoted per the r7 verdict's next-round
item 1).

1. sim_random_projection_topk — Johnson-Lindenstrauss random projection:
   embeddings are projected 64 → 16 dims through a deterministic ±1/4
   sign matrix and neighbors are ranked in the PROJECTED space.  This is
   the standard cheap-ANN preconditioner (4× smaller vectors → 4× less
   scan/shuffle per distance pass; Achlioptas 2003 shows ±1 entries
   suffice), complementing the IVF/PQ family: at 100 TB you project once
   at ingest and every downstream similarity pass pays a quarter of the
   bytes.  The distance-preservation contract is pinned empirically in
   tests (recall vs exact top-k + distortion band), exactly like the
   IVFPQ recall contract.

2. dedup_quality_survivor — near-dup clusters keep their BEST document,
   not their lowest id: minhash-LSH verified pairs → connected
   components (the shared cc_labels loop) → per-component argmax of a
   deterministic quality metric (distinct-token count, ties to the
   lowest doc_id).  This is the curation rule real pipelines want — of N
   crawls of the same page, keep the fullest one — and on the
   dup-injected corpus it provably diverges from min-id survivorship
   (the ' zzzz'-appended near-copies score one distinct token higher, so
   the test asserts at least one component elects a non-minimal id).

Exactness notes: the projection matrix entries are ±0.25 (exactly
representable), the projection/distance folds are the shared
left-to-right list_sum shape (similarity.py:34), and the quality metric
is an integer — every ranking decision compares identical values in both
engines, so no guard band is needed anywhere.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .dedup import _corpus_with_dups, _minhash_verified_pairs, _tokens, cc_labels
from .similarity import as_double

_JL_IN, _JL_OUT = 64, 16
_JL_NQ, _JL_TOPK = 5, 3
# ±1/sqrt(_JL_OUT) = ±0.25 exactly — both engines parse the literal to the
# identical double, so projections are bit-equal by construction.
_JL_SCALE = 0.25


def jl_matrix() -> list[list[float]]:
    """The deterministic sign matrix, column-major: _JL_OUT lists of
    _JL_IN coefficients.  Signs derive from md5 of the coordinate pair —
    seedable, reproducible, and independent of any RNG state."""
    return [[(_JL_SCALE if hashlib.md5(f"jl:{pos}:{j}".encode()).digest()[0]
              % 2 == 0 else -_JL_SCALE)
             for pos in range(_JL_IN)]
            for j in range(_JL_OUT)]


def jl_project(e: F.Column) -> F.Column:
    """Project a 64-dim vector column to _JL_OUT dims: per output dim,
    the shared left-to-right fold of e · column_j (whole-stage-codegen
    arithmetic, no UDF)."""
    comps = []
    for col_j in jl_matrix():
        lits = F.array(*[F.lit(c) for c in col_j])
        comps.append(F.aggregate(F.zip_with(e, lits, lambda x, y: x * y),
                                 F.lit(0.0), lambda acc, x: acc + x))
    return F.array(*comps)


def _jl_project_sql(e: str) -> str:
    cols = jl_matrix()
    comps = ", ".join(
        f"list_sum(list_transform(list_zip({e}, "
        f"[{', '.join(repr(c) for c in col_j)}]), p -> p[1] * p[2]))"
        for col_j in cols)
    return f"[{comps}]"


_L2SQ = ("list_sum(list_transform(list_zip({a}, {b}), "
         "p -> (p[1] - p[2]) * (p[1] - p[2])))")


def sim_random_projection_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} neighbors of the first {q} vectors by squared L2 in the
    16-dim PROJECTED space.  At scale the projection happens once at
    ingest (a stored column); here it is inlined so the exhibit is
    self-contained.  The corpus-side distance pass reads 4× fewer vector
    bytes than raw 64-dim scans — the entire point of the operator."""
    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", jl_project(as_double(F.col("embedding")))
                 .alias("pe")))
    q = (v.filter(F.col("vec_id") < _JL_NQ)
         .select(F.col("vec_id").alias("query_id"), F.col("pe").alias("qe")))
    d2 = F.aggregate(F.zip_with(F.col("qe"), F.col("pe"),
                                lambda x, y: (x - y) * (x - y)),
                     F.lit(0.0), lambda acc, x: acc + x)
    scored = (v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      d2.alias("d2")))
    w = W.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _JL_TOPK)
            .select("query_id", "neighbor_id", "d2", "rk")
            .orderBy("query_id", "rk"))


_JL_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
     p AS (SELECT vec_id, {_jl_project_sql("e")} AS pe FROM v),
     q AS (SELECT vec_id AS query_id, pe AS qe FROM p
           WHERE vec_id < {_JL_NQ}),
     scored AS (
  SELECT q.query_id, p.vec_id AS neighbor_id,
         {_L2SQ.format(a="q.qe", b="p.pe")} AS d2
  FROM q JOIN p ON p.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, d2, rk
FROM ranked WHERE rk <= {_JL_TOPK}
ORDER BY query_id, rk
"""


def dedup_quality_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted near-dup survivorship: per connected component of
    minhash-verified pairs, keep the document with the MOST distinct
    tokens (ties to the lowest doc_id).  The argmax is a map-side
    max(struct(quality, -doc_id)) — same combiner-friendly shape as the
    ANN assignment argmins — so no per-component sort or window runs."""
    corpus = _corpus_with_dups(spark, sf_dir)
    pairs = _minhash_verified_pairs(spark, sf_dir).select("id_a", "id_b")
    labels = cc_labels(pairs)
    qual = corpus.select(
        F.col("doc_id").alias("node"),
        F.size(F.array_distinct(_tokens(F.col("text")))).cast("bigint")
        .alias("q"))
    best = F.max(F.struct(F.col("q").alias("q"),
                          (-F.col("node")).alias("negid")))
    return (labels.join(qual, "node")
            .groupBy(F.col("label").alias("component_id"))
            .agg((-best.getField("negid")).cast("bigint").alias("survivor_id"),
                 best.getField("q").alias("best_quality"),
                 F.count(F.lit(1)).cast("bigint").alias("n_members"),
                 F.to_json(F.array_sort(F.collect_list("node")))
                 .alias("members"))
            .orderBy("component_id"))


def _quality_survivor_sql() -> str:
    from .dedup import _CC_ORACLE_CTES

    return _CC_ORACLE_CTES + r""",
qual AS (
  SELECT doc_id AS node,
         CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+')))
              AS BIGINT) AS q
  FROM corpus
)
SELECT comp AS component_id,
       CAST(-max(struct_pack(q := q, negid := -node)).negid AS BIGINT)
         AS survivor_id,
       max(struct_pack(q := q, negid := -node)).q AS best_quality,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(to_json(list(node ORDER BY node)) AS VARCHAR) AS members
FROM comp JOIN qual ON n = node
GROUP BY comp
ORDER BY component_id
"""


# Promoted round 8 (r7 verdict next-round #1); empty STAGED kept so the
# staged-protocol tests can pin that nothing is both staged and registered.
register("sim_random_projection_topk", _JL_SQL)(sim_random_projection_topk)
register("dedup_quality_survivor",
         _quality_survivor_sql())(dedup_quality_survivor)

STAGED: dict = {}
