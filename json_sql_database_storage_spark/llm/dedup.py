"""Deduplication operators (SURVEY.md §2 B11.1-11.2 + BASELINE.json mandate).

The driver's documents table has no duplicate texts, so each query *builds*
a corpus with known duplicates (base ∪ mutated copies of a slice) and then
removes/finds them — the assertions exercise real dedup work instead of
trivially passing on clean data.

Scale design:
- exact dedup shuffles 32-byte digests, not documents (group on sha256,
  keep min id via min_by);
- MinHash-LSH: per-doc signature is a fixed 32×8-byte vector computed in one
  projection (no shuffle); banding explodes to 8 rows/doc; candidate
  generation groups by (band, band-hash) so only colliding docs meet —
  the classic sub-quadratic near-dup pipeline (vs all-pairs O(n²));
- SimHash: 64-bit signature per doc via one aggregate over token hashes;
  candidates via 16-bit chunk banding (hamming ≤ 3 within a chunk match);
- all hashes seeded/deterministic (xxhash64 with literal seeds) so reruns
  and resumed jobs agree.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register, scoped_persist
from ..sources import load_table

# MinHash parameters: 32 permutations in 8 bands × 4 rows.
_NUM_HASHES = 32
_BANDS = 8
_ROWS_PER_BAND = _NUM_HASHES // _BANDS

# THE whitespace-split pattern for Spark-side tokenization (r10 review):
# Java's \s includes vertical tab (\x0B) while RE2's — the DuckDB
# oracles' \s+ — does not, so a raw \s+ here silently diverges from
# every text oracle on any document containing \x0B (scraped web/PDF
# text has them).  This explicit class is exactly RE2's \s, so both
# engines split identically on any input; oracles keep their \s+.
WS_RE = "[ \t\n\f\r]+"


# Conditional post-scan widening for CPU-heavy pipelines (tokenize /
# shingle / signature): ONE definition of the byte-parsing and the
# fail-closed `input_bytes < cores × maxPartitionBytes` gate, shared with
# every text/gram consumer (r13 advice: the gate existed verbatim here and
# in sources/tables.py — a fix to one copy could silently miss the other).
from ..sources.tables import spread_small_scan as _spread_small_scan  # noqa: E402


def _corpus_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies (doc_id<30, offset ids) ∪ near copies
    (30<=doc_id<60, one appended token)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    exact = (d.filter(F.col("doc_id") < 30)
             .withColumn("doc_id", F.col("doc_id") + 100000))
    near = (d.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 60))
            .withColumn("doc_id", F.col("doc_id") + 200000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" zzzz"))))
    return d.unionByName(exact).unionByName(near)


# ORACLE twins of _corpus_with_dups and the shingle stage — ONE SQL
# definition of the dup-injected corpus and the 3-token shingle sets
# (r10 review: five verbatim restatements had to agree with
# _corpus_with_dups and each other by hand).  dedup_exact uses the
# lang-carrying variant; every other dedup oracle composes these.
_CORPUS_CTE = """corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 30
  UNION ALL
  SELECT doc_id + 200000, text || ' zzzz' FROM documents
  WHERE doc_id >= 30 AND doc_id < 60
)"""

_CORPUS_CTE_LANG = """corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id < 30
  UNION ALL
  SELECT doc_id + 200000, text || ' zzzz', lang FROM documents
  WHERE doc_id >= 30 AND doc_id < 60
)"""

_SHINGLE_CTES = """raw AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS r FROM corpus
), sh AS (
  SELECT doc_id,
         CASE WHEN len(r) >= 3
              THEN list_distinct(list_transform(range(1, len(r)-1),
                     i -> r[i] || ' ' || r[i+1] || ' ' || r[i+2]))
              ELSE [array_to_string(r, ' ')] END AS s
  FROM raw
)"""


# ---------------------------------------------------------------------------
# b11.1 exact dedup: content-hash groupBy, deterministic survivor (min id).
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle=f"""
WITH {_CORPUS_CTE_LANG}
SELECT min(doc_id) AS doc_id, sha256(text) AS content_hash,
       count(*) AS n_copies
FROM corpus
GROUP BY sha256(text)
ORDER BY doc_id
""",
    tags=("b11.1",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus_with_dups(spark, sf_dir)
    return (
        corpus.groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"),
             F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "content_hash", "n_copies")
    )


# ---------------------------------------------------------------------------
# b11.2 MinHash + LSH near-dup: shingle → 32 minhashes → 8 bands →
# band-collision candidates → exact-Jaccard verification.
# ---------------------------------------------------------------------------

def _tokens(col: F.Column) -> F.Column:
    return F.array_distinct(F.split(F.lower(col), WS_RE))


def _hashed_shingles_of(toks: F.Column, k: int = 3) -> F.Column:
    """Distinct k-shingles as 64-bit hashes, built WITHOUT materializing
    shingle strings: ``xxhash64(t_i, …, t_{i+k-1})`` per position.
    Tokens contain no whitespace (they come from a \\s+ split), so the
    tuple→string map underlying a string-shingle form is injective and the
    two forms induce the same shingle-set partition modulo xxhash64
    collisions (none on this corpus — the exact string-based oracle would
    flag one as a jaccard mismatch).

    Performance (measured, sf0.1 corpus of 5060 docs): dropping the
    concat_ws string build + string array_distinct + per-string re-hash
    and carrying array<long> through banding AND verification cut the cold
    minhash pipeline from 7.3 s to ~4 s; the persisted per-doc state
    shrinks from (string shingle array + sig) to (long array + sig)."""
    n = F.size(toks)
    return F.array_distinct(F.when(
        n >= k,
        F.transform(F.sequence(F.lit(0), n - k),
                    lambda i: F.xxhash64(*[toks[i + j] for j in range(k)]))
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks)))))


def _to_long(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


# xor masks for the rotate-xor permutation family (splitmix64-style
# constants) — deterministic across runs/engines
_MH_MASK = [_to_long(0x9E3779B97F4A7C15 * (2 * i + 1)) for i in range(_NUM_HASHES)]
_MH_ROT = [(13 * i + 7) % 63 + 1 for i in range(_NUM_HASHES)]


_ROTS_NP = np.array(_MH_ROT, dtype=np.uint64)
_MASKS_NP = np.array(_MH_MASK, dtype=np.int64).view(np.uint64)


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash_signature_udf(hashes: pd.Series) -> pd.Series:
    """Arrow-vectorized twin of minhash_signature: identical rotate-xor
    permutation family over the same pre-hashed shingles.

    This is the pipeline's production path: the 32-way unrolled JVM
    expression form generates very large codegen methods whose JIT
    compilation dominated (and destabilized) the query's runtime at small
    scale — measured 2.1 s (UDF) vs 2.9-20 s (expressions, load-dependent)
    for the full sf0.1 pipeline.  Values are bit-identical to the
    expression form, so candidates and the oracle check are unchanged.

    Evaluation is flat, not per-row: all documents in the Arrow batch are
    concatenated into one value vector and each permutation is one
    vectorized pass + ``np.minimum.reduceat`` over the row offsets — 32
    whole-batch numpy ops instead of n_rows small-array broadcasts (the
    per-row loop's numpy dispatch overhead dominated at ~5k docs/batch).
    Safe because every doc has ≥1 shingle (empty text still yields the
    whole-doc fallback shingle), so no reduceat segment is empty."""
    # NULL shingle arrays (a NULL text row upstream) propagate as null
    # signatures — the expression twin's and the oracles' behavior — not
    # a len(None) TypeError that aborts the whole query (r10 review)
    null_mask = np.fromiter((h is None for h in hashes), dtype=bool,
                            count=len(hashes))
    if null_mask.any():
        out = pd.Series([None] * len(hashes), dtype=object)
        live = ~null_mask
        if live.any():
            out[live] = _minhash_core(
                hashes[live].reset_index(drop=True)).values
        return out
    return _minhash_core(hashes)


def _minhash_core(hashes: pd.Series) -> pd.Series:
    lens = np.fromiter((len(h) for h in hashes), dtype=np.int64,
                       count=len(hashes))
    if len(lens) == 0:
        return pd.Series([], dtype=object)
    flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in hashes])
    hu = flat.view(np.uint64)
    offsets = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    sigs = np.empty((len(lens), _NUM_HASHES), dtype=np.int64)
    for i in range(_NUM_HASHES):
        rot = _ROTS_NP[i]
        perm = ((hu << rot) | (hu >> (np.uint64(64) - rot))) ^ _MASKS_NP[i]
        sigs[:, i] = np.minimum.reduceat(perm, offsets).view(np.int64)
    return pd.Series(list(sigs))


_SIGN_BIT = -(2 ** 63)


def minhash_signature(hashes: F.Column,
                      num_hashes: int = _NUM_HASHES) -> F.Column:
    """num_hashes min-hashes over pre-hashed shingles, using cheap
    bijective rotate-xor permutations — no further string hashing and no
    multiplications (Spark 4 ANSI mode throws on long overflow, so a*h+b
    universal hashing is off the table).  One projection, no shuffle,
    deterministic.  Pure-JVM expression form; see minhash_signature_udf
    for the production path and the codegen-size rationale.

    Minimum is taken in UNSIGNED 64-bit order to match the UDF's uint64
    reduceat (r10 review: a plain array_min over signed longs disagreed
    with the UDF on essentially every document — the two documented twins
    were NOT bit-identical).  unsigned-min(S) = flip(signed-min(flip(x)))
    with flip = XOR of the sign bit; pinned bit-equal to the UDF in
    tests/test_llm.py::test_minhash_expression_twin_matches_udf."""
    def perm_min(i: int) -> F.Column:
        rot, mask = _MH_ROT[i], F.lit(_MH_MASK[i])

        def perm(h: F.Column) -> F.Column:
            rotated = F.shiftleft(h, rot).bitwiseOR(
                F.shiftrightunsigned(h, 64 - rot))
            return rotated.bitwiseXOR(mask)

        return F.array_min(
            F.transform(hashes,
                        lambda h: perm(h).bitwiseXOR(F.lit(_SIGN_BIT)))
        ).bitwiseXOR(F.lit(_SIGN_BIT))

    return F.array(*[perm_min(i) for i in range(num_hashes)])


# Buckets above this size switch from full intra-bucket pair explosion
# (quadratic in bucket size) to star pairs against the bucket minimum
# (linear) — the standard hot-bucket cap every production LSH applies.
# HONEST CONTRACT (r10 review): star pairs preserve connected components
# of the CANDIDATE graph, but the downstream jaccard≥τ VERIFICATION can
# prune star edges (x,y both near-dups of each other yet neither
# τ-similar to the bucket-min doc), so past the cap components MAY split
# vs the all-pairs ground truth — bounded-recall, not exact.  At every
# tested scale no bucket comes near the cap (asserted in tests), so the
# registered oracles stay exact; at template-heavy production scale the
# cap trades a recall tail for the quadratic blow-up, the same trade
# spark.ml's MinHashLSH and every banding dedup at scale makes.
_BUCKET_CAP = 1024


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id",
                        sig_col: str = "sig") -> DataFrame:
    """Band the signatures and emit distinct id pairs that collide in ≥1
    band.  ONE shuffle: groupBy (band_idx, band_hash) → sorted member
    list → intra-bucket pair explosion.  Unlike the bands⋈bands self-join
    this never materializes the band table twice, and a hot band (template
    corpora put thousands of docs in one bucket, where a self-join's output
    is quadratic *within the key* — AQE splits partitions, not join output)
    is bounded by _BUCKET_CAP via the star-pair fallback."""
    bands = band_rows(docs, id_col, sig_col)
    buckets = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    ids = F.col("ids")

    def pair(x: F.Column, y: F.Column) -> F.Column:
        return F.struct(x.alias("id_a"), y.alias("id_b"))

    full_pairs = F.flatten(F.transform(
        ids,
        lambda x, i: F.transform(F.slice(ids, i + 2, F.size(ids)),
                                 lambda y: pair(x, y))))
    star_pairs = F.transform(F.slice(ids, 2, F.size(ids)),
                             lambda y: pair(ids[0], y))
    pairs = F.when(F.size(ids) <= _BUCKET_CAP, full_pairs) \
             .otherwise(star_pairs)
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {_CORPUS_CTE}, {_SHINGLE_CTES}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / len(list_distinct(flatten([a.s, b.s]))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  -- size-ratio prefilter: jaccard <= min(|A|,|B|)/max(|A|,|B|), so pairs
  -- failing the 4/5 ratio cannot reach 0.8 — prunes most of the O(n^2)
  -- list work without changing the result set
  AND len(a.s) * 5 >= len(b.s) * 4 AND len(b.s) * 5 >= len(a.s) * 4
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(flatten([a.s, b.s]))) >= 0.8
ORDER BY id_a, id_b
""",
    tags=("b11.2",),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup, verified by EXACT shingle-Jaccard on the
    candidate pairs — candidates and verification use the same unit
    (3-shingle sets), so the output equals the all-pairs exact answer
    whenever LSH recall is 1.0.  The oracle IS that all-pairs answer
    (O(n²), fine at the sf0.01 correctness scale): a hash-miss of any
    true pair shows up as a row-count mismatch, so the driver check also
    measures recall — on this corpus the nearest organic pair below the
    0.8 threshold sits at ≈0.75 and true pairs sit ≥0.85, where the
    8-band × 4-row deterministic miss set is empty.

    Jaccard is computed over HASHED shingle sets (_hashed_shingles_of);
    it equals the oracle's string-set jaccard unless xxhash64 collides
    within a pair's shingle union — the string-based oracle hash-compare
    is exactly the test that no such collision exists on this corpus.

    No final sort (r14, extending the r13 sort-drop mechanism): the
    output is row-per-verified-pair and the driver's oracle check is
    row-canonicalized, so a global orderBy here bought presentation only
    at the cost of a rangepartitioning Exchange + range-sampling pass
    over the result — quadratically worse at 100 TB pair volumes."""
    return _minhash_verified_pairs(spark, sf_dir)


def _minhash_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, id_b, jaccard) near-dup pairs: LSH candidates verified by
    exact shingle-Jaccard ≥ 0.8.  Shared by dedup_minhash_lsh (emits the
    pairs) and dedup_cc_survivors (clusters them)."""
    # corpus input ≈ 3 scans over documents.parquet (union branches)
    corpus = _spread_small_scan(spark, _corpus_with_dups(spark, sf_dir),
                                sf_dir, "documents", factor=3)
    # The UDF is an opaque expression boundary, so projection collapse
    # cannot re-inline tokenize/shingle work into 32 permutation copies —
    # one persist (docs, reused by banding + both verification sides)
    # replaces the 3-stage barrier chain the expression form needed.
    # ``sh`` is the HASHED shingle set (array<long>, _hashed_shingles_of):
    # both the signature input and the exact-jaccard verification run on
    # longs; shingle strings are never materialized.
    tokenized = corpus.select(
        "doc_id", F.split(F.lower("text"), WS_RE).alias("raw"))
    staged = tokenized.select(
        "doc_id", _hashed_shingles_of(F.col("raw")).alias("sh"))
    docs = staged.select(
        "doc_id", "sh",
        minhash_signature_udf(F.col("sh")).alias("sig")
    ).transform(scoped_persist)
    pairs = lsh_candidate_pairs(docs)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard",
                    F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                    / F.size(F.array_union("sh_a", "sh_b")))
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# b11.2b SimHash near-dup: 64-bit signature; candidates share one of four
# 16-bit chunks; verified by hamming distance ≤ 3.  The threshold and the
# banding are coupled by pigeonhole: ≤3 bit flips over 4 chunks leave at
# least one chunk untouched, so chunk-collision candidate generation has
# recall 1.0 at this radius (at ≤6 it would not — 6 flips can touch all 4
# chunks — and on this template-heavy corpus radius 6 also explodes to
# ~1M pairs from 5k docs, a quadratic blow-up no banding can absorb).
# ---------------------------------------------------------------------------

def simhash64(tokens: F.Column) -> F.Column:
    """Weighted bit-vote simhash over token hashes, one aggregate per row.
    The token hash is hoisted into a pre-computed array so each hash is
    evaluated once (as a lambda-bound VALUE), not re-inlined per bit — the
    64-reference expression form cost 64 hashes/token.
    (shift amounts must be Python ints, hence the unrolled 64-bit loops)"""
    token_hashes = F.transform(tokens, lambda t: F.xxhash64(F.lit(7), t))
    votes = F.aggregate(
        token_hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.shiftright(h, b).bitwiseAND(F.lit(1))
                      for b in range(64)]),
            lambda a, bit: a + bit * 2 - 1))
    # disjoint bit weights, so sum == bitwise OR; bit 63 is the sign bit
    weights = [F.when(votes[i] > 0,
                      F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"))
               .otherwise(F.lit(0).cast("long")) for i in range(64)]
    out = weights[0]
    for w in weights[1:]:
        out = out + w
    return out


_BIT_IDX = np.arange(64, dtype=np.uint64)


@F.pandas_udf(T.LongType())
def simhash64_udf(token_hashes: pd.Series) -> pd.Series:
    """Arrow-vectorized twin of simhash64 (bit-identical values) — the
    production path, for the same codegen-size reason as
    minhash_signature_udf: the 64-way unrolled expression form spends more
    time in JIT than in data at small scale."""
    out = np.empty(len(token_hashes), dtype=np.int64)
    for i, h in enumerate(token_hashes):
        hu = np.asarray(h, dtype=np.int64).view(np.uint64)
        bits = (hu[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)   # (n, 64)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out[i] = ((votes > 0).astype(np.uint64)
                  << _BIT_IDX).sum(dtype=np.uint64).astype(np.int64)
    return pd.Series(out)


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All near-dup pairs within hamming radius 3 — the full simhash exhibit;
    pytest asserts planted-dup coverage over this (tests/test_llm.py)."""
    corpus = _corpus_with_dups(spark, sf_dir)
    # persist: sig is referenced 4× by the chunk explode and twice by the
    # self-join — the barrier stops each reference re-running the UDF
    docs = (corpus.select("doc_id", _tokens(F.col("text")).alias("toks"))
            .withColumn("sig", simhash64_udf(
                F.transform("toks", lambda t: F.xxhash64(F.lit(7), t))))
            .transform(scoped_persist))
    # 4 chunks of 16 bits as LSH keys
    chunks = docs.select(
        "doc_id", "sig",
        F.posexplode(F.array(*[
            F.shiftright("sig", 16 * i).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ])).alias("chunk_idx", "chunk_val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
               & (F.col("a.chunk_val") == F.col("b.chunk_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("a.sig").alias("sig_a"),
                F.col("b.doc_id").alias("id_b"), F.col("b.sig").alias("sig_b"))
        .distinct())
    return (
        cands.withColumn("hamming",
                         F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


# Registered output = the oracle-computable slice of the pair set: the
# planted exact copies (doc_id d < 30 duplicated as d+100000).  Identical
# text ⇒ identical token hashes ⇒ identical signature ⇒ all 4 chunks match ⇒
# the pair MUST surface with hamming 0 — so DuckDB can enumerate the expected
# rows without knowing xxhash64.  A bug anywhere in the pipeline (tokenize,
# signature UDF, chunk banding, join, hamming) loses rows or breaks
# hamming=0.  The unrestricted pair set stays asserted in pytest.
@register(
    "dedup_simhash",
    oracle="""
SELECT doc_id AS id_a, doc_id + 100000 AS id_b, CAST(0 AS BIGINT) AS hamming
FROM documents WHERE doc_id < 30
ORDER BY id_a
""",
    tags=("b11.2",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = simhash_pairs(spark, sf_dir)
    return (
        pairs.filter((F.col("id_a") < 30)
                     & (F.col("id_b") == F.col("id_a") + 100000))
        .select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))
        .orderBy("id_a")
    )


# ---------------------------------------------------------------------------
# b11.2e dedup survivors: connected components over the verified near-dup
# pairs — the step a real pipeline runs after pair generation (keep ONE doc
# per duplicate cluster).  Spark side: iterative min-label propagation
# (O(diameter) rounds, each one equi-join + partial-agg groupBy;
# localCheckpoint truncates lineage per round — the standard distributed CC
# at any scale).  Oracle: DuckDB recursive-CTE transitive closure over the
# same edge set (identical by the dedup_minhash_lsh recall argument).
# ---------------------------------------------------------------------------

_CC_MAX_ITERS = 25


def cc_labels(pairs: DataFrame) -> DataFrame:
    """Connected-component labels (node, label=min reachable id) from an
    undirected (id_a, id_b) edge list — the pointer-jumping loop shared by
    dedup_cc_survivors and the staged quality-weighted survivor
    (llm/staged.py)."""
    sym = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")) \
        .unionByName(pairs.select(F.col("id_b").alias("a"),
                                  F.col("id_a").alias("b"))).transform(scoped_persist)
    # LAZY localCheckpoints throughout the loop (guide §1.2 — fewer
    # driver-paced jobs): each round's convergence aggregate right below
    # computes every partition of the staged round, so it materializes
    # the checkpoint in the SAME job; the eager form paid one extra job
    # per round (and one here for the seed) purely to materialize earlier.
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=False))
    # Convergence by exact label-sum (r14, guide §2.4): labels only ever
    # DECREASE (every update is a min including the node's own label), so
    # a round changed nothing iff the label sum is unchanged.  Tracking
    # the sum removes the old-label column from the loop state and with
    # it the per-round `labels ⟕ neigh` join — message-passing phase 1 is
    # now join→union→groupBy, one exchange where two operators were.
    # DECIMAL(38,0) keeps the sum exact at any node-count × id-range.
    prev_sum = None
    for _ in range(_CC_MAX_ITERS):
        # phase 1: min over self ∪ direct neighbours — the node's own
        # label rides the union instead of a separate left join
        msgs = (sym.join(labels, sym.b == labels.node)
                .select(F.col("a").alias("node"), F.col("label")))
        prop = (msgs.unionByName(labels)
                .groupBy("node").agg(F.min("label").alias("mid")))
        # phase 2: pointer jumping (label := label of my label) — halves
        # component diameter per round, so convergence is O(log d) rounds
        # instead of O(d) on chain-shaped clusters
        lut = prop.select(F.col("node").alias("hn"),
                          F.col("mid").alias("hl"))
        staged = (prop.join(lut, prop.mid == lut.hn, "left")
                  .select(prop.node,
                          F.least(F.col("mid"),
                                  F.coalesce(F.col("hl"), F.col("mid")))
                          .alias("label"))
                  .localCheckpoint(eager=False))
        new_sum = staged.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        labels = staged
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


# CTE chain shared by the dedup_cc_survivors oracle and the staged
# quality-weighted-survivor oracle (llm/staged.py): dup-injected corpus →
# shingles → verified pairs → recursive transitive closure → components.
_CC_ORACLE_CTES = f"""
WITH RECURSIVE {_CORPUS_CTE}, {_SHINGLE_CTES}, pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / len(list_distinct(flatten([a.s, b.s]))) AS jacc
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    -- same size-ratio prefilter as the dedup_minhash_lsh oracle
    AND len(a.s) * 5 >= len(b.s) * 4 AND len(b.s) * 5 >= len(a.s) * 4
), edges AS MATERIALIZED (
  -- MATERIALIZED (here and on sym): edges feeds two sym branches and sym
  -- is re-scanned every recursion round; without the hints DuckDB inlines
  -- the whole all-pairs jaccard join into each reference (measured
  -- 40-60 s; materialized, ~5 s)
  SELECT id_a, id_b FROM pairs WHERE jacc >= 0.8
), sym AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM edges
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM edges
), nodes AS (
  SELECT DISTINCT a AS n FROM sym
), reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a
), comp AS (
  SELECT n, min(m) AS comp FROM reach GROUP BY n
)"""


@register(
    "dedup_cc_survivors",
    oracle=_CC_ORACLE_CTES + """
SELECT comp AS survivor_id, count(*) AS n_members,
       CAST(to_json(list(n ORDER BY n)) AS VARCHAR) AS members
FROM comp GROUP BY comp
ORDER BY survivor_id
""",
    tags=("b11.2",),
)
def dedup_cc_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _minhash_verified_pairs(spark, sf_dir).select("id_a", "id_b")
    labels = cc_labels(pairs)
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_members"),
             F.to_json(F.array_sort(F.collect_list("node"))).alias("members"))
        .select(F.col("label").alias("survivor_id"), "n_members", "members")
    )


# ---------------------------------------------------------------------------
# b11.2c n-gram Jaccard similarity on a bounded pair set — oracle-checkable
# (integer set sizes; division identical both engines).
# ---------------------------------------------------------------------------

@register(
    "dedup_ngram_jaccard",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(lower(text), '\s+')) AS t
  FROM documents WHERE doc_id < 40
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
         / len(list_distinct(flatten([a.t, b.t]))) AS jaccard
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.t, b.t)) * 1.0
      / len(list_distinct(flatten([a.t, b.t]))) >= 0.30
ORDER BY id_a, id_b
""",
    tags=("b11.2",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    toks = d.select("doc_id", _tokens(F.col("text")).alias("t"))
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("t").alias("ta"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("t").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size(F.array_union("ta", "tb"))
    jac = inter.cast("double") / union
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.30)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# b11.2e URL canonicalization + dedup — the web-crawl member of the dedup
# family.  Crawl corpora carry the same page under scheme/case/www/query-
# param/trailing-slash variants; canonicalize then hash-group is the
# standard first pass (before any content hashing) because it needs only
# the URL column: a pure projection + one exact groupBy on the canonical
# string — the dedup_exact shape, shuffling short keys only, linear at
# 100 TB.
#
# The documents table has no URL column, so the query synthesizes one
# deterministic URL per doc (scheme-case / www / query-string / trailing-
# slash noise keyed off doc_id, host off source) with the IDENTICAL
# expression in both engines — the canonicalizer then has real variants to
# collapse.  The path modulus (140) is a multiple of the 20-way source
# cycle, so ids 140 apart share BOTH host and path: the corpus contains
# genuine cross-doc duplicates (~n/140 groups), not just formatting noise.
# url_canon: url_canon(u) = lowercase → strip scheme → strip leading www.
# → strip query string → strip trailing slash.
# ---------------------------------------------------------------------------

_URL_SQL = """
  'htt' || CASE WHEN doc_id % 2 = 0 THEN 'ps://' ELSE 'PS://' END
  || CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END
  || source || '.example.com/page/' || CAST(doc_id % 140 AS VARCHAR)
  || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
  || CASE WHEN doc_id % 3 = 0
          THEN '?utm_source=feed&utm_id=' || CAST(doc_id AS VARCHAR)
          ELSE '' END
"""


@register(
    "dedup_url",
    oracle=f"""
WITH u AS (
  SELECT doc_id, {_URL_SQL} AS url FROM documents
), canon AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(lower(url), '^https?://', ''),
               '^www\\.', ''),
             '\\?.*$', ''),
           '/$', '') AS canon_url
  FROM u
)
SELECT canon_url, count(*) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS survivor_id
FROM canon
GROUP BY canon_url
HAVING count(*) >= 2
ORDER BY canon_url
""",
    tags=("b11.2", "b11.16"),
)
def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("htt"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("ps://")).otherwise(F.lit("PS://")),
        F.when(F.col("doc_id") % 4 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"), F.lit(".example.com/page/"),
        (F.col("doc_id") % 140).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("?utm_source=feed&utm_id="),
                        F.col("doc_id").cast("string"))).otherwise(F.lit("")),
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(url), r"^https?://", ""),
                r"^www\.", ""),
            r"\?.*$", ""),
        r"/$", "")
    return (
        d.select("doc_id", canon.alias("canon_url"))
        .groupBy("canon_url")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("doc_id").cast("bigint").alias("survivor_id"))
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# b11.2f exact-substring (span-level) dedup — the member of the dedup
# family that finds REPEATED PASSAGES, not near-identical whole documents
# (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better": verbatim spans repeated across a corpus are what LMs memorize).
# The reference implementation builds a monolithic suffix array; the
# distributed formulation is fixed-length token grams: explode each doc
# into its k-grams, count gram occurrences corpus-wide, and score each doc
# by the fraction of its grams that appear elsewhere.  Same shapes as
# text_top_terms/text_decontaminate — explode → map-side-combinable count
# → equi-join back — every stage linear and shuffle-keyed on the gram.
#
# Oracle exactness: grams stay STRINGS end-to-end (10 tokens joined by a
# space), so DuckDB recomputes the identical gram multiset; the planted
# exact/near copies (_corpus_with_dups) guarantee the corpus actually
# contains repeated spans.  At 100 TB the gram column would be
# xxhash64(gram) — 8 bytes instead of ~60 through both shuffles — the
# same swap text_decontaminate documents.
# ---------------------------------------------------------------------------

_SUBSTR_K = 10


@register(
    "dedup_exact_substring",
    oracle=f"""
WITH {_CORPUS_CTE}, toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM corpus
), grams AS (
  SELECT doc_id, g, count(*) AS n_in_doc
  FROM (SELECT doc_id,
               unnest(list_transform(range(0, len(t) - {_SUBSTR_K} + 1),
                      i -> array_to_string(t[i + 1 : i + {_SUBSTR_K}], ' ')))
                 AS g
        FROM toks WHERE len(t) >= {_SUBSTR_K})
  GROUP BY doc_id, g
), global_cnt AS (
  SELECT g, count(*) AS n_docs_with FROM grams GROUP BY g
)
SELECT gr.doc_id,
       CAST(sum(gr.n_in_doc) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN gc.n_docs_with >= 2 THEN gr.n_in_doc ELSE 0 END)
            AS BIGINT) AS n_dup_grams,
       CAST(sum(CASE WHEN gc.n_docs_with >= 2 THEN gr.n_in_doc ELSE 0 END)
            AS DOUBLE) / sum(gr.n_in_doc) AS dup_frac
FROM grams gr JOIN global_cnt gc USING (g)
GROUP BY gr.doc_id
HAVING sum(CASE WHEN gc.n_docs_with >= 2 THEN gr.n_in_doc ELSE 0 END) > 0
ORDER BY doc_id
""",
    tags=("b11.2", "b11.18"),
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus_with_dups(spark, sf_dir)
    t = F.split(F.lower("text"), WS_RE)
    k = _SUBSTR_K
    gram = F.transform(
        F.sequence(F.lit(0), F.size("t") - k),
        lambda i: F.concat_ws(
            " ", *[F.col("t")[i + j] for j in range(k)]))
    grams = (
        corpus.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= k)
        .select("doc_id", F.explode(gram).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("n_in_doc")))
    global_cnt = (grams.groupBy("g")
                  .agg(F.count(F.lit(1)).alias("n_docs_with")))
    dup_in_doc = F.when(F.col("n_docs_with") >= 2, F.col("n_in_doc")) \
                  .otherwise(F.lit(0))
    return (
        grams.join(global_cnt, "g")
        .groupBy("doc_id")
        .agg(F.sum("n_in_doc").cast("bigint").alias("n_grams"),
             F.sum(dup_in_doc).cast("bigint").alias("n_dup_grams"),
             (F.sum(dup_in_doc).cast("double") / F.sum("n_in_doc"))
              .alias("dup_frac"))
        .filter(F.col("n_dup_grams") > 0)
    )


# ---------------------------------------------------------------------------
# r5.5 — fuzzy near-dup detection via blocked edit distance.  Classic record
# -linkage shape: a cheap deterministic BLOCKING key (here: the first 16
# chars of the normalized text) restricts candidate pairs, then Levenshtein
# over a bounded prefix scores each candidate.  Complements minhash/simhash:
# edit distance catches single-character typo dups that shingle-set methods
# can under-score on short texts.
#
# Scale: the pairwise term is quadratic ONLY within a block (same argument
# as LSH buckets / SemDeDup cells — the block key is the join key, so 1000
# executors each own a slice of blocks; AQE skew-split covers hot blocks).
# levenshtein() runs on a fixed 48-char prefix, so per-pair cost is bounded
# O(48²) regardless of document length.  Blocking tradeoff (documented, as
# in every record-linkage system): pairs that differ inside the first 16
# chars are not candidates; the oracle replicates the exact same blocking,
# so the check is over the operator's declared semantics.
#
# Both engines implement unit-cost Levenshtein identically; the threshold
# comparison is on exact ints.
# ---------------------------------------------------------------------------

_FUZZY_BLOCK = 16   # blocking-key prefix length
_FUZZY_PREFIX = 48  # scored prefix length
_FUZZY_MAX_D = 2    # max edit distance


@register(
    "dedup_fuzzy_levenshtein",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lower(text) AS lt FROM documents
), pairs AS (
  SELECT a.doc_id, b.doc_id AS b_id,
         levenshtein(substr(a.lt, 1, {_FUZZY_PREFIX}),
                     substr(b.lt, 1, {_FUZZY_PREFIX})) AS dist
  FROM d a JOIN d b
    ON substr(a.lt, 1, {_FUZZY_BLOCK}) = substr(b.lt, 1, {_FUZZY_BLOCK})
   AND b.doc_id < a.doc_id
)
SELECT doc_id,
       count(*) AS n_fuzzy_dups,
       min(b_id) AS earliest_partner,
       CAST(min(dist) AS BIGINT) AS min_dist
FROM pairs
WHERE dist <= {_FUZZY_MAX_D}
GROUP BY doc_id
ORDER BY doc_id
""",
    tags=("r5.5", "b11.2"),
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs with at least one earlier doc within edit distance ≤2 on the
    normalized 48-char prefix, candidates restricted to equal 16-char
    blocking keys.  The block equi-join shuffles on the block key — no
    cartesian anywhere (pinned by the registry-wide plan sweep)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("lt"))
    a = d.select(F.col("doc_id"),
                 F.substring("lt", 1, _FUZZY_BLOCK).alias("blk"),
                 F.substring("lt", 1, _FUZZY_PREFIX).alias("pfx"))
    b = a.select(F.col("doc_id").alias("b_id"), "blk",
                 F.col("pfx").alias("b_pfx"))
    pairs = (
        a.join(b, "blk")
        .filter(F.col("b_id") < F.col("doc_id"))
        .select("doc_id", "b_id",
                F.levenshtein("pfx", "b_pfx").alias("dist"))
        .filter(F.col("dist") <= _FUZZY_MAX_D)
    )
    return (
        pairs.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_fuzzy_dups"),
             F.min("b_id").alias("earliest_partner"),
             F.min("dist").cast("bigint").alias("min_dist"))
    )


# ---------------------------------------------------------------------------
# b11.31 (r5 addendum) INCREMENTAL MinHash dedup — the production ingestion
# shape: the existing corpus's signature/band index is computed ONCE and
# persisted; each new crawl batch computes only ITS OWN signatures and
# joins them against the index.  Per-batch cost is O(delta) signature work
# + a band equi-join, instead of the O(corpus) recompute the one-shot
# dedup_minhash_lsh form would pay — at 100 TB the difference between
# re-shingling the whole lake per crawl and touching only the new files.
#
# Candidate generation differs from the one-shot form deliberately: the
# delta's band rows equi-join the persisted band table (plus the delta's
# own bands for intra-batch dups), so pair output is bounded by
# |delta bands| × bucket occupancy — linear in the batch size even for a
# hot template bucket (the delta side of the join is the small side; no
# _BUCKET_CAP heuristic needed on this path).  Verification is the same
# exact hashed-shingle Jaccard ≥ 0.8 as the one-shot form, shingle sets
# for base docs coming from the persisted index, so recall/precision
# semantics are identical — which is exactly what the oracle checks (the
# all-pairs spec restricted to pairs touching the delta).
# ---------------------------------------------------------------------------

_INC_DELTA_MIN = 100000  # planted-copy ids: the "new crawl" slice
# session-scoped memo of built base-index sink paths (per sf tag — the
# sink itself is applicationId-scoped, so a fresh session rebuilds)
_INC_INDEX_BUILT: set = set()


def band_rows(docs: DataFrame, id_col: str = "doc_id",
              sig_col: str = "sig") -> DataFrame:
    """(doc_id, band_idx, band_hash) rows — the persistable LSH index."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.array(*[
            F.xxhash64(*[F.col(sig_col)[b * _ROWS_PER_BAND + r]
                         for r in range(_ROWS_PER_BAND)])
            for b in range(_BANDS)
        ])).alias("band_idx", "band_hash"))


def _staged_sig(df: DataFrame) -> DataFrame:
    """(doc_id, sh, sig) from (doc_id, text) — the shared signature stage."""
    return (df.select("doc_id", F.split(F.lower("text"), WS_RE).alias("raw"))
            .select("doc_id", _hashed_shingles_of(F.col("raw")).alias("sh"))
            .select("doc_id", "sh",
                    minhash_signature_udf(F.col("sh")).alias("sig")))


@register(
    "dedup_minhash_incremental",
    oracle=f"""
WITH {_CORPUS_CTE}, {_SHINGLE_CTES}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / len(list_distinct(flatten([a.s, b.s]))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  AND (a.doc_id >= 100000 OR b.doc_id >= 100000)
  AND len(a.s) * 5 >= len(b.s) * 4 AND len(b.s) * 5 >= len(a.s) * 4
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(flatten([a.s, b.s]))) >= 0.8
ORDER BY id_a, id_b
""",
    tags=("b11.31",),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs touching the new batch, found via the persisted base
    index + delta-only signature computation."""
    from ..operators.scans import _sink

    corpus = _corpus_with_dups(spark, sf_dir)
    base = corpus.filter(F.col("doc_id") < _INC_DELTA_MIN)
    delta = corpus.filter(F.col("doc_id") >= _INC_DELTA_MIN)

    # ---- one-time index build, ACTUALLY once per (session, sf): the
    # base corpus is a pure function of sf_dir, so rebuilding it per
    # invocation (bench reruns, repeated driver calls) would bill the
    # O(corpus) signature pipeline to every "per-batch" run — the exact
    # cost model this query exists to demonstrate (r10 review).  Keyed by
    # applicationId + sf_dir; the sink dirs are session-scoped.
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    idx_path = _sink(f"mh_index_{tag}", spark)
    bands_path = _sink(f"mh_bands_{tag}", spark)
    if idx_path not in _INC_INDEX_BUILT:
        base_sig = _staged_sig(base)
        base_sig.write.mode("overwrite").parquet(idx_path)
        band_rows(spark.read.parquet(idx_path)) \
            .write.mode("overwrite").parquet(bands_path)
        _INC_INDEX_BUILT.add(idx_path)
    base_idx = spark.read.parquet(idx_path)
    base_bands = spark.read.parquet(bands_path)

    # ---- per-batch work: delta signatures + band join against the index
    delta_sig = _staged_sig(delta).transform(scoped_persist)
    delta_bands = band_rows(delta_sig)
    all_bands = base_bands.unionByName(delta_bands)
    cands = (
        delta_bands.select(F.col("doc_id").alias("d_id"),
                           "band_idx", "band_hash")
        .join(all_bands, ["band_idx", "band_hash"])
        .filter(F.col("doc_id") != F.col("d_id"))
        .select(F.least("d_id", "doc_id").alias("id_a"),
                F.greatest("d_id", "doc_id").alias("id_b"))
        .distinct()
    )
    sh_lookup = base_idx.select("doc_id", "sh") \
        .unionByName(delta_sig.select("doc_id", "sh"))
    a = sh_lookup.select(F.col("doc_id").alias("id_a"),
                         F.col("sh").alias("sh_a"))
    b = sh_lookup.select(F.col("doc_id").alias("id_b"),
                         F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard",
                    F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                    / F.size(F.array_union("sh_a", "sh_b")))
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# r8.5 (b11.36) — benchmark DECONTAMINATION: the n-gram-collision test every
# serious training pipeline runs before training (the GPT-3/PaLM recipe:
# flag a training document if it shares >= a few high-order n-grams with any
# evaluation-benchmark document).  Here the "benchmark" is the deterministic
# doc_id % 17 == 0 slice of the corpus and the training side is the rest;
# a training doc is contaminated when >= 3 of its distinct 5-gram shingles
# appear anywhere in the benchmark shingle set.
#
# Scale: the benchmark shingle set is built with one distinct-aggregation
# shuffle and the collision test is a plain equi-join on the 64-bit shingle
# hash — NO broadcast (the benchmark grows with the corpus; AQE may still
# choose broadcast while it fits) and no per-pair work: cost is
# O(corpus shingles + benchmark shingles) through one hash join, the same
# access pattern at 100 TB.  Shingles ride as xxhash64 longs end to end
# (_hashed_shingles_of) — shingle strings are never materialized; the
# DuckDB oracle builds string shingles, which induce the same collision
# set modulo xxhash64 collisions (none on this corpus).
# ---------------------------------------------------------------------------

_DECON_K = 5        # shingle order (5-grams)
_DECON_MIN_HITS = 3  # contamination threshold
_DECON_MOD = 17     # doc_id % _DECON_MOD == 0 -> benchmark side


@register(
    "text_decontamination",
    oracle=rf"""
WITH raw AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS r
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(r) >= {_DECON_K}
              THEN list_distinct(list_transform(range(1, len(r)-{_DECON_K - 2}),
                     i -> {" || ' ' || ".join(f"r[i+{j}]" for j in range(_DECON_K))}))
              ELSE [array_to_string(r, ' ')] END AS s
  FROM raw
), bench AS (
  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % {_DECON_MOD} = 0
), cor AS (
  SELECT doc_id, len(s) AS n_shingles, unnest(s) AS g
  FROM sh WHERE doc_id % {_DECON_MOD} != 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
       CAST(max(n_shingles) AS BIGINT) AS n_shingles
FROM cor JOIN bench USING (g)
GROUP BY doc_id
HAVING count(*) >= {_DECON_MIN_HITS}
ORDER BY doc_id
""",
    tags=("r8.5", "b11.36"),
)
def text_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # persist the per-doc shingle arrays: (a) BOTH branches (benchmark +
    # training side) read them, and (b) the persist is an optimization
    # barrier, so projection collapse cannot re-inline the split into the
    # shingle lambda's ~7 array references (size + k accesses + fallback —
    # measured 13 s -> ~1 s for the shingle pass at sf0.1 without it)
    sh = scoped_persist(
        d.select("doc_id", F.split(F.lower("text"), WS_RE).alias("raw"))
        .select("doc_id",
                _hashed_shingles_of(F.col("raw"), k=_DECON_K).alias("s")))
    bench = (sh.filter(F.col("doc_id") % _DECON_MOD == 0)
             .select(F.explode("s").alias("g")).distinct())
    cor = (sh.filter(F.col("doc_id") % _DECON_MOD != 0)
           .select("doc_id", F.size("s").cast("bigint").alias("n_shingles"),
                   F.explode("s").alias("g")))
    return (cor.join(bench, "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"),
                 F.max("n_shingles").alias("n_shingles"))
            .filter(F.col("n_hits") >= _DECON_MIN_HITS))


# ---------------------------------------------------------------------------
# r8.6 (b11.37) — LEAKAGE-SAFE train/validation split: the assignment rule
# every careful pipeline needs after near-dup detection — a VAL document
# whose near-duplicate sits in TRAIN leaks the answer, so the split must be
# by DUP-CLUSTER, not by document.  Docs get their connected-component
# label (singletons label themselves), the cluster label alone decides the
# split (label % 7 == 0 -> val, ~14%), and the leakage count — clusters
# seen in BOTH splits — is computed relationally in both engines (0 by
# construction; the check would catch a broken label join, not just
# document the intent).
#
# Scale: reuses the bucketed minhash pipeline + pointer-jumping CC
# (no all-pairs anywhere); the split itself is a map-side expression on
# the label; the leakage audit is one label-keyed agg + a 1-row global
# count broadcast back onto the 2-row summary.
# ---------------------------------------------------------------------------

_SPLIT_MOD = 7   # cluster % 7 == 0 -> val (~14%); engine-portable arithmetic


@register(
    "sample_split_no_leakage",
    oracle=_CC_ORACLE_CTES + f"""
, labeled AS (
  SELECT c.doc_id, coalesce(p.comp, c.doc_id) AS cluster
  FROM corpus c LEFT JOIN comp p ON p.n = c.doc_id
), sp AS (
  SELECT doc_id, cluster,
         CASE WHEN cluster % {_SPLIT_MOD} = 0 THEN 'val' ELSE 'train' END
           AS split
  FROM labeled
), leak AS (
  SELECT count(*) AS n FROM (
    SELECT cluster FROM sp GROUP BY cluster
    HAVING count(DISTINCT split) > 1)
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
       CAST((SELECT n FROM leak) AS BIGINT) AS n_leaked_clusters
FROM sp GROUP BY split ORDER BY split
""",
    tags=("r8.6", "b11.37"),
)
def sample_split_no_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus_with_dups(spark, sf_dir).select("doc_id")
    labels = cc_labels(
        _minhash_verified_pairs(spark, sf_dir).select("id_a", "id_b"))
    labeled = (corpus.join(labels, corpus.doc_id == labels.node, "left")
               .select("doc_id",
                       F.coalesce("label", "doc_id").alias("cluster")))
    sp = labeled.withColumn(
        "split", F.when(F.pmod(F.col("cluster"), F.lit(_SPLIT_MOD)) == 0,
                        "val").otherwise("train"))
    leak = (sp.groupBy("cluster")
            .agg(F.count_distinct("split").alias("ns"))
            .filter(F.col("ns") > 1)
            .agg(F.count(F.lit(1)).cast("bigint")
                 .alias("n_leaked_clusters")))
    return (sp.groupBy("split")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.count_distinct("cluster").cast("bigint")
                 .alias("n_clusters"))
            .crossJoin(F.broadcast(leak))
            .select("split", "n_docs", "n_clusters", "n_leaked_clusters")
            .orderBy("split"))
