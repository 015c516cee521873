"""Similarity search over embedding vectors (SURVEY.md §2 B11.3-11.4).

The embedding column is a 64-dim float array (FIXTURES.md).  All math is
done JVM-side with higher-order functions (zip_with/aggregate) on doubles —
no UDFs — and both engines evaluate the identical left-to-right summation,
so cosine scores hash-match the oracle bit-for-bit.

Scale design:
- brute-force top-k broadcasts the (small) query set and streams the corpus
  once: cost O(|corpus|·|queries|·dim) flops, one shuffle for the per-query
  top-k window — the right baseline ≤ a few hundred queries;
- the scale path is random-hyperplane LSH bucketing (sim_lsh_buckets):
  12-bit signatures from arithmetic pseudo-random hyperplanes restrict
  comparisons to same-bucket pairs (vs all-pairs O(n²)) —
  dedup_embedding_lsh is that bucketed near-dup end-to-end; the same shape
  extends to IVF by swapping bucket-id for nearest-centroid-id
  (sim_nearest_centroid is the assignment step, sim_ivf_topk the
  multi-probe search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register, scoped_persist
from ..sources import load_table


def as_double(vec: F.Column) -> F.Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: F.Column, b: F.Column) -> F.Column:
    """Left-to-right summation — matches the oracle's list_sum order.
    DuckDB twin: list_sum(list_transform(list_zip(a,b), p -> p[1]*p[2]))"""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: F.Column) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


_COSINE_SQL = """
list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))
/ (sqrt(list_sum(list_transform(list_zip({a}, {a}), p -> p[1] * p[2])))
 * sqrt(list_sum(list_transform(list_zip({b}, {b}), p -> p[1] * p[2]))))
""".strip()

def mean_vectors(df, key: str, out_key: str, vec_col: str = "e",
                 out_vec: str = "ce"):
    """Per-key mean vectors: posexplode + (key, pos) mean + re-collect in
    pos order.  One k·dim-partial-sum shuffle; map-side combine does the
    heavy lifting.  The ONE declaration of the centroid arithmetic behind
    sim_nearest_centroid / sim_ivf_topk / sim_ivf_partitioned (key =
    label) AND k-means recentering (key = cluster, clustering.py) — the
    five oracles restating it can never diverge from each other."""
    flat = df.select(key, F.posexplode(vec_col).alias("pos", "val"))
    return (
        flat.groupBy(key, "pos")
        .agg((F.sum("val") / F.count(F.lit(1))).alias("avg_val"))
        .groupBy(F.col(key).alias(out_key))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "avg_val"))).alias("t"))
        .select(out_key, F.transform("t", lambda s: s["avg_val"]).alias(out_vec)))


def label_centroids(v):
    """Per-label mean vectors (c_label, ce) — the cell/centroid table."""
    return mean_vectors(v, "label", "c_label")


def cell_similarities(v, cent):
    """(vec_id, e, c_label, cs): cosine of every vector against every
    (broadcast) centroid — the assignment/probe input for the IVF pair."""
    return (
        v.crossJoin(F.broadcast(cent))
        .select("vec_id", "e", "c_label",
                cosine(F.col("e"), F.col("ce")).alias("cs")))



# ---------------------------------------------------------------------------
# b11.3 brute-force cosine top-k: 10 query vectors × full corpus, top-5 each.
# ---------------------------------------------------------------------------

@register(
    "sim_cosine_topk",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
     q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
     scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         {_COSINE_SQL.format(a="q.qe", b="v.e")} AS cos_sim
  FROM q JOIN v ON v.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rk
FROM ranked WHERE rk <= 5
ORDER BY query_id, rk
""",
    tags=("b11.3",),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    q = (v.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe")))
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cosine(F.col("qe"), F.col("e")).alias("cos_sim")))
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
        .orderBy("query_id", "rk")
    )


# ---------------------------------------------------------------------------
# b11.4 nearest-centroid assignment + label purity (the IVF assignment step).
# Centroids = per-label mean vectors; each vector is assigned to the nearest
# centroid by cosine; output = assignment counts (robust to last-ulp float
# noise: distances differ at O(1e-2), engine noise is O(1e-12)).
# ---------------------------------------------------------------------------

@register(
    "sim_nearest_centroid",
    oracle=f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
     flat AS (
  SELECT label, unnest(range(len(e))) AS pos, unnest(e) AS val FROM v
), cent AS (
  SELECT label AS c_label,
         list(avg_val ORDER BY pos) AS ce
  FROM (SELECT label, pos, sum(val) / count(*) AS avg_val
        FROM flat GROUP BY label, pos)
  GROUP BY label
), assigned AS (
  SELECT v.vec_id, v.label,
         arg_max(c.c_label, {_COSINE_SQL.format(a="v.e", b="c.ce")}) AS assigned_label
  FROM v CROSS JOIN cent c
  GROUP BY v.vec_id, v.label
)
SELECT assigned_label, count(*) AS n_vectors,
       count(*) FILTER (WHERE label = assigned_label) AS n_matching_label
FROM assigned
GROUP BY assigned_label
ORDER BY assigned_label
""",
    tags=("b11.4",),
)
def sim_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e"))
    # centroids: posexplode + (label,pos) mean + re-collect ordered by pos.
    # Float-sum caveat: sum order differs between engines, but centroid
    # coordinates only steer an argmax whose margins dwarf the noise.
    cent = label_centroids(v)
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .select("vec_id", "label", "c_label",
                cosine(F.col("e"), F.col("ce")).alias("cs"))
        .groupBy("vec_id", "label")
        .agg(F.max_by("c_label", F.col("cs")).alias("assigned_label")))
    return (
        assigned.groupBy("assigned_label")
        .agg(F.count(F.lit(1)).alias("n_vectors"),
             F.count(F.when(F.col("label") == F.col("assigned_label"), 1))
              .alias("n_matching_label"))
        .orderBy("assigned_label")
    )


# ---------------------------------------------------------------------------
# b11.3b scale path: random-hyperplane LSH bucketing.  Hyperplane h_i[pos] is
# a deterministic pseudo-random ±1 from a multiplicative-mod-prime sequence —
# pure int64 arithmetic both engines evaluate identically (unlike xxhash64),
# so bucket assignment and everything built on it is oracle-checkable;
# reproducible across runs/cluster sizes, no driver-side randomness.
# ---------------------------------------------------------------------------

_LSH_BITS = 12
_LSH_MULT = 2654435761           # Knuth's 2^32 golden-ratio multiplier
_LSH_PRIME = 4294967291          # largest prime < 2^32


def _hyperplane_bit(vec: F.Column, i: int) -> F.Column:
    signs = F.transform(
        F.sequence(F.lit(0), F.size(vec) - 1),
        lambda pos: F.when(
            F.pmod((F.lit(i * 64 + 1) + pos) * F.lit(_LSH_MULT),
                   F.lit(_LSH_PRIME)).bitwiseAND(F.lit(1)) == 1,
            F.lit(1.0)).otherwise(F.lit(-1.0)))
    return F.when(dot(vec, signs) >= 0, F.lit(1)).otherwise(F.lit(0))


def _bucket_sql(vec: str) -> str:
    """DuckDB twin of the 12-bit bucket id over column `vec` (DOUBLE[])."""
    bits = []
    for i in range(_LSH_BITS):
        signs = (f"list_transform(range(0, len({vec})), pos -> "
                 f"CASE WHEN (({i * 64 + 1} + pos) * {_LSH_MULT}) "
                 f"% {_LSH_PRIME} % 2 = 1 THEN 1.0 ELSE -1.0 END)")
        d = (f"list_sum(list_transform(list_zip({vec}, {signs}), "
             f"p -> p[1] * p[2]))")
        bits.append(f"(CASE WHEN {d} >= 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


@register(
    "sim_lsh_buckets",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
), b AS (
  SELECT vec_id, label, {_bucket_sql("e")}::BIGINT AS bucket FROM v
)
SELECT bucket, count(*) AS n_vectors,
       count(DISTINCT label) AS n_labels,
       CAST(to_json(list(vec_id ORDER BY vec_id)) AS VARCHAR) AS members
FROM b GROUP BY bucket
HAVING count(*) >= 2
ORDER BY bucket
""",
    tags=("b11.3",),
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e"))
    sig = v.withColumn(
        "bucket",
        sum((_hyperplane_bit(F.col("e"), i) * F.lit(1 << i))
            for i in range(_LSH_BITS)).cast("long"))
    return (
        sig.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"),
             F.countDistinct("label").alias("n_labels"),
             F.to_json(F.array_sort(F.collect_list("vec_id"))).alias("members"))
        .filter(F.col("n_vectors") >= 2)
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# b11.3b2 scale-path embedding near-dup: compare ONLY within an LSH bucket
# (vs dedup_embedding_cosine's bounded all-pairs) — the sub-quadratic
# formulation that survives a 100-TB corpus, oracle-checked end-to-end
# because the bucket family above is plain arithmetic.
# ---------------------------------------------------------------------------

@register(
    "dedup_embedding_lsh",
    oracle=f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), b AS (
  SELECT vec_id, e, {_bucket_sql("e")}::BIGINT AS bucket FROM v
)
SELECT a.vec_id AS id_a, x.vec_id AS id_b,
       {_COSINE_SQL.format(a="a.e", b="x.e")} AS cos_sim
FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id
WHERE {_COSINE_SQL.format(a="a.e", b="x.e")} >= 0.35
ORDER BY id_a, id_b
""",
    tags=("b11.2", "b11.3"),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    assigned = v.withColumn(
        "bucket",
        sum((_hyperplane_bit(F.col("e"), i) * F.lit(1 << i))
            for i in range(_LSH_BITS)).cast("long")).transform(scoped_persist)
    a = assigned.select(F.col("vec_id").alias("id_a"),
                        F.col("e").alias("ea"), "bucket")
    b = assigned.select(F.col("vec_id").alias("id_b"),
                        F.col("e").alias("eb"),
                        F.col("bucket").alias("bucket_b"))
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b"))
               & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos_sim", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos_sim") >= 0.35)
        .select("id_a", "id_b", "cos_sim")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# b11.2d embedding-cosine near-duplicate pairs (the vector-space member of
# the dedup family): all pairs above a cosine threshold on a bounded id
# range — oracle-checked with the identical summation order.
# ---------------------------------------------------------------------------

@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 200)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_COSINE_SQL.format(a="a.e", b="b.e")} AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {_COSINE_SQL.format(a="a.e", b="b.e")} >= 0.35
ORDER BY id_a, id_b
""",
    tags=("b11.2", "b11.3"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200) \
        .select("vec_id", as_double(F.col("embedding")).alias("e"))
    a = v.select(F.col("vec_id").alias("id_a"), F.col("e").alias("ea"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("e").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos_sim") >= 0.35)
        .select("id_a", "id_b", "cos_sim")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# b11.3c IVF-style ANN: multi-probe (nprobe=3) over per-label centroid cells
# (the scale path: cells shrink the candidate set; recall vs the brute-force
# baseline is measured in tests/test_llm.py).
# ---------------------------------------------------------------------------

_IVF_NPROBE = 3


# Full SQL twin of the IVF pipeline: every step is deterministic arithmetic
# (per-label mean centroids, argmax cell assignment, top-NPROBE probes,
# same-cell cosine ranking), so DuckDB can recompute it end-to-end.  Float
# robustness: centroid cosines carry ~1e-15 engine noise but cell-assignment
# and probe-ranking gaps are O(1e-2) (same argument as sim_nearest_centroid);
# the output cos_sim is computed from raw embedding values with the identical
# left-to-right fold in both engines → bit-identical (sim_cosine_topk
# precedent).
# THE IVF serve oracle + probe/score/rank plan — shared verbatim by
# sim_ivf_topk (in-memory assignment) and sim_ivf_partitioned (the same
# assignment written as a cell-partitioned index and probed via DPP):
# the "same cells, same probes, same math" contract holds because both
# registrations render the SAME string and call the SAME helpers
# (r10 review: they were two byte-identical 37-line copies).
_IVF_ORACLE = f"""
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
  SELECT vec_id AS query_id, c_label AS qcell, e AS qe
  FROM (SELECT vec_id, c_label, e,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cs DESC, c_label) AS prk
        FROM sims WHERE vec_id < 10)
  WHERE prk <= 3
), scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_COSINE_SQL.format(a="p.qe", b="a.e")} AS cos_sim
  FROM assigned a JOIN probes p
    ON a.cell = p.qcell AND a.vec_id != p.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rk
FROM ranked WHERE rk <= 5
ORDER BY query_id, rk
"""


def _ivf_probes(sims):
    """nprobe nearest cells per query vector (vec_id < 10)."""
    wq = W.partitionBy("vec_id").orderBy(F.col("cs").desc(), "c_label")
    return (
        sims.filter(F.col("vec_id") < 10)
        .withColumn("prk", F.row_number().over(wq))
        .filter(F.col("prk") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("query_id"),
                F.col("c_label").alias("qcell"), F.col("e").alias("qe")))


def _ivf_score_rank(index_df, probes):
    """Probe-cell join + cosine + per-query top-5 — identical for the
    in-memory and the partitioned-index serve paths."""
    scored = (
        index_df.join(F.broadcast(probes),
                      (index_df["cell"] == probes["qcell"])
                      & (index_df["vec_id"] != probes["query_id"]))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                cosine(F.col("qe"), F.col("e")).alias("cos_sim")))
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                          "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        # raw double, not rounded: both engines fold the identical raw
        # vectors left-to-right, so cos_sim is bit-identical (and round()
        # itself disagrees between engines on half boundaries)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
        .orderBy("query_id", "rk")
    )


@register(
    "sim_ivf_topk",
    oracle=_IVF_ORACLE,
    tags=("b11.3",),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e"))
    # build cells = per-label centroids (same construction as
    # sim_nearest_centroid); assign every vector to its nearest cell
    cent = label_centroids(v)
    sims = cell_similarities(v, cent)
    assigned = (
        sims.groupBy("vec_id")
        .agg(F.max_by("c_label", F.col("cs")).alias("cell"),
             F.first("e").alias("e"))
        .transform(scoped_persist))
    # query vectors (vec_id < 10) probe their NPROBE nearest cells —
    # multi-probe is the standard recall lever when a cell boundary cuts
    # through a query's true-neighbor set.
    return _ivf_score_rank(assigned, _ivf_probes(sims))


# ---------------------------------------------------------------------------
# b11.3 int8 embedding quantization (ANN index prep): per-vector symmetric
# scale = 127 / max|x|, quantized values via floor(x*scale + 0.5) — the same
# IEEE ops in both engines (fn_array precedent), so the int arrays are
# bit-identical and render as JSON strings.  Quantization is a pure
# projection: no shuffle, columnar-friendly, exactly the shape a 100 TB
# index build wants.
# ---------------------------------------------------------------------------

@register(
    "sim_quantize_int8",
    oracle="""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), s AS (
  SELECT vec_id, e,
         127.0 / list_max(list_transform(e, x -> abs(x))) AS scale
  FROM v
)
SELECT vec_id, scale,
       CAST(to_json(list_transform(e,
            x -> CAST(floor(x * scale + 0.5) AS BIGINT))) AS VARCHAR) AS q8,
       CAST(len(list_filter(e,
            x -> abs(floor(x * scale + 0.5)) > 127)) AS BIGINT) AS n_clipped
FROM s
ORDER BY vec_id
""",
    tags=("b11.3",),
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"))
    # persist barrier: e and scale are each referenced by two HOFs below
    # (Catalyst re-inlines per reference — see the minhash lesson)
    s = v.select(
        "vec_id", "e",
        (F.lit(127.0) / F.array_max(F.transform("e", F.abs))).alias("scale"),
    ).transform(scoped_persist)
    q = F.transform("e", lambda x: F.floor(x * F.col("scale") + 0.5)
                    .cast("bigint"))
    return (
        s.select(
            "vec_id", "scale",
            F.to_json(q).alias("q8"),
            F.size(F.filter(q, lambda qx: F.abs(qx) > 127))
             .cast("bigint").alias("n_clipped"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# b11.3d IVF index AS STORAGE LAYOUT: the assignment step's output persisted
# as a cell-partitioned parquet table, probed through dynamic partition
# pruning.  sim_ivf_topk shows the in-flight pipeline; THIS is how ANN
# serves at 100 TB — the index is a directory layout, a probe query reads
# ONLY its nprobe cell directories (DPP injects the probe subquery into the
# scan's PartitionFilters at runtime; asserted in tests/test_plans.py), and
# everything else never leaves disk.  Same cells, same probes, same math as
# sim_ivf_topk, so the oracle is the identical deterministic-arithmetic SQL.
# ---------------------------------------------------------------------------

@register(
    "sim_ivf_partitioned",
    oracle=_IVF_ORACLE,
    tags=("b11.3", "b11.19"),
)
def sim_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e"))
    cent = label_centroids(v)
    sims = cell_similarities(v, cent).transform(scoped_persist)
    # 1) BUILD: cell assignment written as the index layout — one
    #    directory per cell (at 100 TB: one directory per cell per shard)
    assigned = (
        sims.groupBy("vec_id")
        .agg(F.max_by("c_label", F.col("cs")).alias("cell"),
             F.first("e").alias("e")))
    # applicationId-scoped sink path (shared helper): two concurrent
    # sessions (pytest + bench) must not overwrite / half-read one
    # another's index mid-probe.
    from ..operators.scans import _sink
    index_path = _sink("ivf_index", spark)
    (assigned.write.mode("overwrite").partitionBy("cell").parquet(index_path))
    # 2) PROBE: the selective vec_id<10 filter on the probe side is what
    #    lets DPP inject the probed-cell subquery into the index scan
    index = spark.read.parquet(index_path)
    return _ivf_score_rank(index, _ivf_probes(sims))
