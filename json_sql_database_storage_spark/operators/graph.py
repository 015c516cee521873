"""Iterative graph processing as unrolled Catalyst plans (SURVEY.md §2 r6
addenda): PageRank over the customer↔supplier trade graph.

Why it belongs here: the LLM-curation family already runs two iterative
algorithms — pointer-jumping connected components (llm/dedup.py, for dup
clusters) and unrolled Lloyd k-means (llm/clustering.py).  PageRank adds
WEIGHTED propagation, the third classic shape (Pregel's hello-world), and
the same engine discipline applies: iterations are unrolled statically into
ONE plan — no driver loop, no .collect() between steps — so Catalyst sees
the whole lineage and AQE re-plans every superstep from runtime stats.

Graph: (customer, supplier) trade pairs from orders ⨝ lineitem — kept as a
MULTIGRAPH (one edge per lineitem, so rank propagation is trade-volume
weighted, and the pre-aggregation `distinct` shuffle of the fact table is
simply gone; deduping removed only ~2% of pairs at the cost of a full
extra exchange).  Symmetrized (both directions), supplier node ids offset
by 1e6; symmetric edges ⇒ no dangling nodes ⇒ no leaked-mass correction.

Scale shape per iteration: one edges ⨝ ranks equi-join (shuffle keyed by
src), one groupBy(dst) with map-side partial sums — exactly a Pregel
superstep expressed relationally.  At 100 TB the edge list is the fact
table; ranks are O(nodes) and co-partition with it after the first
exchange.  A production run checkpoints every few supersteps to truncate
lineage; at 3 unrolled iterations the plan is comfortably compact.

Determinism (cross-engine EXACT, not float-tolerant): ranks live in BIGINT
micro-units.  r0 = 1e6 per node; each step is
    r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div outdeg(u))) div 100
— integer division and BIGINT sums only, so the result is bit-identical in
any engine and under any partitioning/summation order (the same reason the
fingerprint/zscore ops run in integer domains).  Quantization drift vs
float PageRank is ≤ outdeg in micro-units per step — irrelevant for
ranking, priceless for the oracle.  (Beyond ~1e12-node·rank products,
widen the sums to DECIMAL(38,0) — same plan.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

_PR_ITERS = 3
_PR_OFFSET = 1000000  # supplier node id offset


def _pr_iter_sql(prev: str) -> str:
    return f"""
  SELECT e.dst AS node,
         150000 + (85 * sum(r.r // d.d)) // 100 AS r
  FROM edges e
  JOIN {prev} r ON r.node = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
"""


@register(
    "graph_pagerank",
    oracle=f"""
WITH e0 AS (
  SELECT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s + {_PR_OFFSET} AS dst FROM e0
  UNION ALL
  SELECT s + {_PR_OFFSET} AS src, c AS dst FROM e0
),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
r1 AS ({_pr_iter_sql("r0")}),
r2 AS ({_pr_iter_sql("r1")}),
r3 AS ({_pr_iter_sql("r2")})
SELECT node, CAST(r AS BIGINT) AS rank_q6 FROM r3 ORDER BY node
""",
    tags=("r6.9",),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 unrolled PageRank supersteps in fixed-point arithmetic over the
    symmetrized customer↔supplier trade graph.  The superstep shape —
    rank/outdeg folded into an O(nodes) contribution BEFORE touching the
    edge table, one edges ⨝ contrib equi-join, one map-side-combinable
    groupBy(dst), no forced broadcast hint (AQE decides; ranks grow with
    the graph) — lives in pagerank_ranks, shared with the checkpointed
    deep variant below."""
    ranks = pagerank_ranks(spark, sf_dir, _PR_ITERS)
    return ranks.select("node", F.col("r").alias("rank_q6")).orderBy("node")


# ---------------------------------------------------------------------------
# r7.5 — BOUNDED-DEPTH iteration: the production path past the unrolled
# plan's depth ceiling (r6 verdict "wrong" #2).  Catalyst plan size grows
# linearly with unrolled supersteps and analysis time superlinearly, so
# real BPE (~30k merges) and real PageRank (~20+ supersteps) need a DRIVER
# LOOP that truncates lineage every k iterations — localCheckpoint(eager)
# materializes the rank table (O(nodes), the only state) and cuts the plan
# back to a leaf, exactly GraphX/Pregel's periodic checkpoint.  No row data
# crosses the driver; the loop only schedules.
#
# tests/test_scale.py::test_pagerank_checkpoint_keeps_superstep_time_flat
# pins the property that matters: per-4-superstep segment time stays flat
# across 16 supersteps at sf0.1 (recorded in SCALE.md) — without the
# checkpoint the segment time grows with the accumulated lineage.
# The same recipe applies verbatim to llm/bpe.py's merge loop (see its
# module docstring).
# ---------------------------------------------------------------------------

_PR_DEEP_ITERS = 12
_PR_CHECKPOINT_EVERY = 4


def pagerank_ranks(spark: SparkSession, sf_dir: str, iters: int,
                   checkpoint_every: int | None = None) -> DataFrame:
    """`iters` fixed-point supersteps over the symmetrized trade graph;
    with `checkpoint_every`, lineage is truncated by an eager
    localCheckpoint of the O(nodes) rank table every k supersteps."""
    from ..registry import scoped_persist
    from ..sources import load_table as _lt

    o = _lt(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _lt(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
          .transform(scoped_persist))
    edges = (e0.select(F.col("c").alias("src"),
                       (F.col("s") + _PR_OFFSET).alias("dst"))
             .unionByName(
                 e0.select((F.col("s") + _PR_OFFSET).alias("src"),
                           F.col("c").alias("dst"))))
    deg = (edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
           .transform(scoped_persist))
    ranks = deg.select(F.col("src").alias("node"),
                       F.lit(1000000).cast("bigint").alias("r"))
    for i in range(1, iters + 1):
        contrib = (ranks.join(deg, ranks["node"] == deg["src"])
                   .select("src", F.expr("r div d").alias("contrib")))
        ranks = (
            edges.join(contrib, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .select(F.col("dst").alias("node"),
                    (F.lit(150000)
                     + F.expr("(85 * s) div 100")).cast("bigint").alias("r"))
        )
        if checkpoint_every and i % checkpoint_every == 0 and i < iters:
            # LAZY (r14, guide §1.2): the checkpoint still truncates the
            # logical plan to a leaf immediately — the depth bound this
            # loop exists for — but materializes inside the consumer's
            # one action instead of its own driver-paced job per segment.
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


@register(
    "graph_pagerank_deep",
    oracle=f"""
WITH e0 AS (
  SELECT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s + {_PR_OFFSET} AS dst FROM e0
  UNION ALL
  SELECT s + {_PR_OFFSET} AS src, c AS dst FROM e0
),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
{", ".join(f"r{i} AS ({_pr_iter_sql(f'r{i-1}')})"
           for i in range(1, _PR_DEEP_ITERS + 1))}
SELECT node, CAST(r AS BIGINT) AS rank_q6 FROM r{_PR_DEEP_ITERS}
ORDER BY node
""",
    tags=("r7.5",),
)
def graph_pagerank_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-superstep PageRank through the checkpointed driver loop —
    bit-identical to the fully-unrolled form (integer fixed-point is
    partitioning-invariant, and a checkpoint only truncates lineage, never
    changes values), at O(checkpoint_every) plan depth."""
    ranks = pagerank_ranks(spark, sf_dir, _PR_DEEP_ITERS,
                           checkpoint_every=_PR_CHECKPOINT_EVERY)
    return ranks.select("node", F.col("r").alias("rank_q6")).orderBy("node")
