"""LLM-pipeline operators STAGED for round 9 (window budgeting — the
driver's ~50-row correctness window is already full of round-8's 15 new
registrations plus the stalest green rows; same protocol as round 7's
operators/tpch_staged.py / llm/staged.py staging).  Each entry below is a
complete ``(callable, oracle SQL)`` register() payload, driver-identically
verified against DuckDB at sf0.001 AND sf0.01 by tests/test_staged_r9.py
every round; round 9 promotes them by moving the dict entry into a
@register decorator.

Reference parity note (SURVEY.md §2 docstring convention): the reference
(DatabaseManager.java:280-381) has no analytical surface; these rows are
Part-B derived operators mandated by the driver contract's LLM-pipeline
families (dedup / similarity / text analysis / curation sampling).
Beyond the four documented below, later round-8 batches added (each with
its own section comment): the bigram LM, MMR re-ranking, asymmetric
containment dedup, DSIR importance weights, token entropy, and per-doc
TF-IDF keyword extraction.

1. text_repetition_filter — the Gopher repetition rules (Rae et al. 2021
   §A1.1): documents dominated by repeated n-grams are boilerplate or
   spam.  Per doc: top-bigram share and duplicate-5-gram share, flagged
   on count-ratio thresholds adapted to whole-gram counts (Gopher's are
   character-fraction variants): top_bigram_n/n_bigrams > 0.20 or
   dup_5gram_n/n_5grams > 0.30 — both tested as INTEGER cross products
   (a*5 > b, a*10 > 3*b), so the decision is exact in both engines.
   100-TB design: grams never leave their doc's partition as strings —
   the per-(doc, gram) count is a map-side-combinable groupBy, stats fold
   per doc, and the corpus is touched once.

2. sample_domain_mixture — temperature-flattened domain sampling weights
   (the multinomial mixture every multi-corpus pre-training run tunes;
   α = 0.5 as sqrt keeps the transcendental correctly-rounded, so
   cross-engine bit-equality needs no guard band): w_i =
   sqrt(tokens_i) / Σ_j sqrt(tokens_j), denominator folded in
   source-name order in BOTH engines (the ordered-float-sum convention,
   functions/exact.py precedent).  The per-source token census is one
   map-side-combinable pass; the denominator is a 1-row broadcast.

3. sim_kcenter_coreset — greedy k-center (farthest-point traversal,
   Gonzalez 1985; the coreset/diversity-selection primitive behind
   facility-location data pruning): seed at the lowest vec_id, then
   k−1 rounds of "pick the point farthest from the chosen set"
   (max-min squared L2, ties to the lowest id).  Every round is one
   broadcast of the just-chosen center + one map-side
   max(struct(min_d2, −vec_id)) aggregation — the checkpointed-loop
   recipe's shape with a 1-row bounded collect per round (the deep-BPE
   argmax precedent).  The oracle unrolls the identical recurrence as a
   k-step CTE chain; distances use the shared left-to-right fold
   (similarity.py:34), so every argmax decision compares bit-identical
   doubles and the selection sequence is deterministic cross-engine.

4. sample_cluster_balanced — cluster-proportional sampling at sqrt
   temperature (the diversity-preserving alternative to uniform
   sampling: rare clusters keep representation, huge clusters are
   down-weighted): one Lloyd assignment from the deterministic seed set
   (clustering.py::assign_cells — the sim_kmeans core), per-cluster
   quota = max(1, floor(N · sqrt(sz_c) / Σ sqrt(sz))), members ranked
   inside each cluster by md5(vec_id) (identical hex in both engines —
   a seedable, order-free shuffle) and the top quota kept.  Quotas are
   a k-row broadcast; the rank is one window per cluster partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import scoped_persist
from ..sources import load_table, spread_small_scan
from .clustering import _L2SQ_SQL, _assign_sql, _l2sq, assign_cells
from .similarity import as_double

# ---------------------------------------------------------------------------
# 1. text_repetition_filter
# ---------------------------------------------------------------------------

# Gopher-adapted thresholds on whole-gram counts, tested as integer cross
# products so both engines decide identically with no float in sight.
_TOP_BIGRAM_NUM, _TOP_BIGRAM_DEN = 1, 5      # top-bigram share > 1/5
_DUP_5GRAM_NUM, _DUP_5GRAM_DEN = 3, 10       # duplicate-5-gram share > 3/10


def _gram_run_stats(grams: F.Column) -> F.Column:
    """Per-doc gram-repetition stats WITHOUT a shuffle (r10 rewrite; the
    r9 form exploded every gram and paid two corpus-wide (doc_id, gram)
    exchanges — measured 7.4 s at sf0.1 for what is per-row arithmetic):
    sort the doc's gram array, then ONE linear fold over equal-runs gives
    the top gram count (longest run) and the duplicated-gram mass (sum of
    runs > 1).  struct(top, dup) — exact integers, identical to the
    grouped counts.  100-TB: cost is per-doc O(L log L) inside the scan
    stage; gram rows never leave their document, nothing shuffles."""
    z = F.lit(0).cast("long")
    init = F.struct(F.lit("").alias("prev"), z.alias("run"),
                    z.alias("top"), z.alias("dup"))

    def step(acc, g):
        run = (F.when(acc["prev"] == g, acc["run"] + 1)
               .otherwise(F.lit(1).cast("long")))
        dup = (F.when(acc["prev"] == g, acc["dup"])
               .otherwise(acc["dup"] + F.when(acc["run"] > 1, acc["run"])
                          .otherwise(z)))
        return F.struct(g.alias("prev"), run.alias("run"),
                        F.greatest(acc["top"], run).alias("top"),
                        dup.alias("dup"))

    def finish(acc):
        return F.struct(
            acc["top"].alias("top"),
            (acc["dup"] + F.when(acc["run"] > 1, acc["run"]).otherwise(z))
            .alias("dup"))

    return F.aggregate(F.array_sort(grams), init, step, finish)


def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the gram transforms + per-row run stats are the whole cost and they
    # run partition-local: widen the single-row-group scan first (guide
    # §2.5 input skew; no-op at production scale) — measured 1 task/2.5 s
    # serial → 32-way
    d = spread_small_scan(
        spark,
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        sf_dir, "documents").select(
            "doc_id", F.split("text", " ").alias("t"))
    bg = F.expr("transform(sequence(0, size(t) - 2), "
                "i -> concat(t[i], ' ', t[i + 1]))")
    fg = F.expr("transform(sequence(0, size(t) - 5), "
                "i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))")
    bs = _gram_run_stats(bg)
    fs = _gram_run_stats(fg)
    # every doc has ≥10 tokens (TESTDATA), so both gram arrays are
    # non-empty and the stats are total
    out = d.select("doc_id",
                   F.size(bg).cast("long").alias("n_bigrams"),
                   bs["top"].alias("top_bigram_n"),
                   F.size(fg).cast("long").alias("n_5grams"),
                   fs["dup"].alias("dup_5gram_n"))
    return out.select(
        "doc_id", "n_bigrams", "top_bigram_n", "n_5grams", "dup_5gram_n",
        F.when((F.col("top_bigram_n") * _TOP_BIGRAM_DEN
                > F.col("n_bigrams") * _TOP_BIGRAM_NUM)
               | (F.col("dup_5gram_n") * _DUP_5GRAM_DEN
                  > F.col("n_5grams") * _DUP_5GRAM_NUM),
               F.lit(1)).otherwise(F.lit(0)).alias("flagged"))


_REPETITION_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bidx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
         FROM toks),
bg AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS g, count(*) AS c
       FROM bidx GROUP BY 1, 2),
bstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                  CAST(max(c) AS BIGINT) AS top_bigram_n
           FROM bg GROUP BY 1),
fidx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
         FROM toks),
fg AS (SELECT doc_id,
              t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                   || ' ' || t[i+4] AS g,
              count(*) AS c
       FROM fidx GROUP BY 1, 2),
fstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_5grams,
                  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                      AS dup_5gram_n
           FROM fg GROUP BY 1)
SELECT b.doc_id, b.n_bigrams, b.top_bigram_n, f.n_5grams, f.dup_5gram_n,
       CASE WHEN b.top_bigram_n * {_TOP_BIGRAM_DEN}
                 > b.n_bigrams * {_TOP_BIGRAM_NUM}
              OR f.dup_5gram_n * {_DUP_5GRAM_DEN}
                 > f.n_5grams * {_DUP_5GRAM_NUM}
            THEN 1 ELSE 0 END AS flagged
FROM bstats b JOIN fstats f USING (doc_id)
"""

# ---------------------------------------------------------------------------
# 2. sample_domain_mixture
# ---------------------------------------------------------------------------


def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (load_table(spark, sf_dir, "documents")
           .select("source",
                   F.size(F.split("text", " ")).cast("long").alias("ntok"))
           .groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("ntok").alias("n_tokens"))
           .withColumn("s", F.sqrt(F.col("n_tokens").cast("double"))))
    # denominator: the ordered float fold (source-name order) — identical
    # addition sequence in both engines, so the double is bit-equal
    denom = per.agg(F.aggregate(
        F.array_sort(F.collect_list(F.struct("source", "s"))),
        F.lit(0.0), lambda acc, x: acc + x["s"]).alias("denom"))
    return (per.crossJoin(F.broadcast(denom))
            .select("source", "n_docs", "n_tokens",
                    (F.col("s") / F.col("denom")).alias("weight")))


_DOMAIN_MIXTURE_SQL = """
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
w AS (SELECT source, n_docs, n_tokens,
             sqrt(CAST(n_tokens AS DOUBLE)) AS s FROM per),
d AS (SELECT list_sum(list(s ORDER BY source)) AS denom FROM w)
SELECT source, n_docs, n_tokens, s / denom AS weight FROM w, d
"""

# ---------------------------------------------------------------------------
# 3. sim_kcenter_coreset
# ---------------------------------------------------------------------------

_KCENTER_K = 8
# _L2SQ_SQL / _l2sq both import from clustering.py — ONE definition of
# the squared-L2 fold on each side of the bit-identity contract


def sim_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    v = scoped_persist(v)

    def lit_vec(vals: list[float]) -> F.Column:
        return F.array(*[F.lit(float(x)) for x in vals])

    seed = v.orderBy("vec_id").select("vec_id", "e").head()
    picks = [(1, int(seed["vec_id"]), 0.0)]
    # per-round min-distance state is PERSISTED and rolled (r10: the lazy
    # least()-chain made round r's argmax recompute all r prior distance
    # expressions — O(k²) distance folds total; caching each round's m and
    # releasing the predecessor after the next action makes it O(k), one
    # distance fold per round, with at most TWO corpus-sized cached copies
    # alive at any moment — measured 6.1 s → see BASELINE r10)
    cur = v.select("vec_id", "e",
                   _l2sq(F.col("e"), lit_vec(seed["e"])).alias("m"))
    cur.persist()
    prev = None
    # try/finally (r10 review): an exception mid-round (executor OOM, task
    # failure past retries) must not strand up to two corpus-sized
    # persisted round states — these use raw persist() (rolled eagerly,
    # released within the loop), so the registry's release_caches() could
    # never free them
    try:
        for rank in range(2, _KCENTER_K + 1):
            # 1-row bounded collect per round (the deep-BPE argmax
            # precedent): max(struct(m, -vec_id, e)) = farthest point,
            # ties to lowest id; e rides along un-compared because
            # (m, -vec_id) is already unique
            sel = cur.agg(F.max(F.struct(
                F.col("m"), (-F.col("vec_id")).alias("nid"),
                F.col("e"))).alias("s")).head()["s"]
            if prev is not None:    # cur is materialized now; prev can go
                prev.unpersist()
                prev = None
            picks.append((rank, int(-sel["nid"]), float(sel["m"])))
            if rank < _KCENTER_K:
                nxt = cur.select(
                    "vec_id", "e",
                    F.least(F.col("m"),
                            _l2sq(F.col("e"), lit_vec(sel["e"]))).alias("m"))
                nxt.persist()
                prev, cur = cur, nxt
    finally:
        for df in (prev, cur):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
    return spark.createDataFrame(
        [(r, i, d) for r, i, d in picks],
        "pick_rank INT, vec_id BIGINT, d2 DOUBLE")


def _kcenter_sql() -> str:
    """The identical recurrence unrolled as a k-step CTE chain."""
    parts = ["WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e "
             "FROM embeddings)",
             "c1 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 1)",
             "m1 AS (SELECT v.vec_id, v.e, "
             + _L2SQ_SQL.format(a="v.e", b="c1.e") + " AS m FROM v, c1)"]
    selects = ["SELECT 1 AS pick_rank, vec_id, 0.0 AS d2 FROM c1"]
    for r in range(2, _KCENTER_K + 1):
        prev = f"m{r - 1}"
        parts.append(
            f"s{r} AS (SELECT vec_id, e, m FROM {prev} "
            f"ORDER BY m DESC, vec_id LIMIT 1)")
        if r < _KCENTER_K:
            parts.append(
                f"m{r} AS (SELECT {prev}.vec_id, {prev}.e, "
                f"least({prev}.m, "
                + _L2SQ_SQL.format(a=f"{prev}.e", b=f"s{r}.e")
                + f") AS m FROM {prev}, s{r})")
        selects.append(f"SELECT {r} AS pick_rank, vec_id, m AS d2 FROM s{r}")
    return (",\n".join([parts[0]] + parts[1:])
            + "\n" + "\nUNION ALL ".join(selects))


# ---------------------------------------------------------------------------
# 4. sample_cluster_balanced
# ---------------------------------------------------------------------------

_CB_K = 8          # clusters (the sim_kmeans seed-set convention)
_CB_N = 100        # target sample size


def sample_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    a = assign_cells(v, _CB_K).transform(scoped_persist)
    sizes = (a.groupBy("cluster").agg(F.count("*").alias("sz"))
             .withColumn("s", F.sqrt(F.col("sz").cast("double"))))
    denom = sizes.agg(F.aggregate(
        F.array_sort(F.collect_list(F.struct("cluster", "s"))),
        F.lit(0.0), lambda acc, x: acc + x["s"]).alias("denom"))
    quota = (sizes.crossJoin(F.broadcast(denom))
             .select("cluster", "sz",
                     F.greatest(
                         F.lit(1),
                         F.floor(F.lit(float(_CB_N)) * F.col("s")
                                 / F.col("denom"))).cast("long")
                     .alias("quota")))
    ranked = (a.select("vec_id", "cluster",
                       F.md5(F.col("vec_id").cast("string")).alias("h"))
              .withColumn("rn", F.row_number().over(
                  W.partitionBy("cluster").orderBy("h", "vec_id"))))
    return (ranked.join(F.broadcast(quota), "cluster")
            .filter(F.col("rn") <= F.col("quota"))
            .select("cluster", "sz", "quota", "vec_id"))


def _cluster_balanced_sql() -> str:
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent0 AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < {_CB_K}),
a1 AS ({_assign_sql("v", "cent0")}),
sizes AS (SELECT cluster, count(*) AS sz,
                 sqrt(CAST(count(*) AS DOUBLE)) AS s
          FROM a1 GROUP BY 1),
d AS (SELECT list_sum(list(s ORDER BY cluster)) AS denom FROM sizes),
quota AS (SELECT cluster, sz,
                 CAST(greatest(1, floor({float(_CB_N)} * s / denom))
                      AS BIGINT) AS quota
          FROM sizes, d),
ranked AS (SELECT vec_id, cluster,
                  row_number() OVER (
                    PARTITION BY cluster
                    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
           FROM a1)
SELECT q.cluster, q.sz, q.quota, r.vec_id
FROM ranked r JOIN quota q USING (cluster)
WHERE r.rn <= q.quota
"""


# ---------------------------------------------------------------------------
# 5. sim_mmr_rerank — maximal marginal relevance (Carbonell & Goldstein
# 1998): re-rank each query's cosine top-20 shortlist by picking 5 results
# that balance relevance against redundancy, score = λ·rel − (1−λ)·max
# similarity to the already-picked set.  The retrieval-diversity verb every
# RAG stack wants after ANN.  Unlike sim_kcenter_coreset there is NO
# driver collect at all: per round, the per-query argmax is a map-side
# max(struct(score, −cand_id, e)) groupBy and the picked vectors rejoin as
# a Q-row broadcast — k rounds, all work keyed by query_id.  At 100 TB the
# candidate lists are ANN output (O(Q·k) rows), so every round is
# broadcast-sized regardless of corpus size.  The oracle unrolls the same
# recurrence as a CTE chain; scores multiply/subtract identical doubles
# (shared cosine fold), so every pick decision is bit-identical.
# ---------------------------------------------------------------------------

_MMR_NQ, _MMR_CAND, _MMR_K = 5, 20, 5
_MMR_LAM = 0.7


def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import cosine

    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    q = (v.filter(F.col("vec_id") < _MMR_NQ)
         .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe")))
    scored = (v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
              .select("query_id", F.col("vec_id").alias("cand_id"), "e",
                      cosine(F.col("qe"), F.col("e")).alias("rel")))
    cand = (scored
            .withColumn("rk", F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("rel").desc(),
                                                  "cand_id")))
            .filter(F.col("rk") <= _MMR_CAND)
            .select("query_id", "cand_id", "e", "rel"))
    # The K greedy rounds run INSIDE one grouped-pandas pass (guide §4.2 /
    # §4.5): each query's candidate state is ≤ _MMR_CAND rows BY
    # CONSTRUCTION at any corpus size (it is ANN output, not corpus), so
    # the round-r argmax and maxsim updates are in-worker loops over a
    # bounded batch.  The previous form paid K localCheckpoint barriers +
    # K broadcast joins — 2 driver-paced jobs per pick (measured 21 jobs /
    # 2.5 s at sf0.1; this form is 1 grouped stage on the window's
    # existing query_id partitioning, no new exchange).  Float discipline:
    # every dot/norm below is the same left-to-right IEEE fold the
    # aggregate()/zip_with expressions performed and lam/mu are the same
    # Python-evaluated literals, so scores are bit-identical and the
    # selection sequence (max by (score, -cand_id)) is unchanged.
    lam, mu = _MMR_LAM, 1 - _MMR_LAM
    k, out_schema = _MMR_K, "query_id bigint, pick_rank int, " \
                            "cand_id bigint, mmr_score double"

    def _greedy(pdf):
        import math

        import pandas as pd

        def dot(a, b):
            s = 0.0
            for x, y in zip(a, b):
                s = s + x * y
            return s

        rows = [[int(c), list(e), float(r), 0.0]
                for c, e, r in zip(pdf["cand_id"], pdf["e"], pdf["rel"])]
        qid = int(pdf["query_id"].iloc[0])
        out = []
        for rank in range(1, k + 1):
            if not rows:
                break
            best = max(rows, key=lambda t: (lam * t[2] - mu * t[3], -t[0]))
            out.append((qid, rank, best[0], lam * best[2] - mu * best[3]))
            if rank < k:
                be = best[1]
                nb = math.sqrt(dot(be, be))
                # zero-norm guard (r13 advice): the expression form's
                # divide-by-zero yielded NULL and greatest() skipped it —
                # mirror that by skipping the maxsim update when either
                # norm is 0 (or the quotient is NaN) instead of raising
                # ZeroDivisionError and failing the whole query.  The
                # normal path is the identical IEEE fold and update rule.
                nxt = []
                for c, e, r, m in rows:
                    if c == best[0]:
                        continue
                    ne = math.sqrt(dot(e, e))
                    if nb > 0.0 and ne > 0.0:
                        s = dot(e, be) / (ne * nb)
                        m = max(m, s)
                    nxt.append([c, e, r, m])
                rows = nxt
        return pd.DataFrame(out, columns=["query_id", "pick_rank",
                                          "cand_id", "mmr_score"])

    return cand.groupBy("query_id").applyInPandas(_greedy, out_schema)


def _mmr_sql() -> str:
    from .similarity import _COSINE_SQL

    lam, mu = repr(_MMR_LAM), repr(1 - _MMR_LAM)
    parts = [
        "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e "
        "FROM embeddings)",
        f"q AS (SELECT vec_id AS query_id, e AS qe FROM v "
        f"WHERE vec_id < {_MMR_NQ})",
        "scored AS (SELECT q.query_id, v.vec_id AS cand_id, v.e, "
        + _COSINE_SQL.format(a="q.qe", b="v.e")
        + " AS rel FROM q JOIN v ON v.vec_id != q.query_id)",
        "cand AS (SELECT query_id, cand_id, e, rel FROM "
        "(SELECT *, row_number() OVER (PARTITION BY query_id "
        "ORDER BY rel DESC, cand_id) AS rk FROM scored) "
        f"WHERE rk <= {_MMR_CAND})",
        "cur1 AS (SELECT query_id, cand_id, e, rel, 0.0 AS maxsim "
        "FROM cand)",
    ]
    selects = []
    for r in range(1, _MMR_K + 1):
        parts.append(
            f"sc{r} AS (SELECT query_id, cand_id, e, rel, maxsim, "
            f"{lam} * rel - {mu} * maxsim AS score FROM cur{r})")
        parts.append(
            f"sel{r} AS (SELECT query_id, cand_id, e, score FROM "
            f"(SELECT *, row_number() OVER (PARTITION BY query_id "
            f"ORDER BY score DESC, cand_id) AS rk FROM sc{r}) "
            f"WHERE rk = 1)")
        if r < _MMR_K:
            parts.append(
                f"cur{r + 1} AS (SELECT c.query_id, c.cand_id, c.e, c.rel, "
                f"greatest(c.maxsim, "
                + _COSINE_SQL.format(a="c.e", b="s.e")
                + f") AS maxsim FROM sc{r} c JOIN sel{r} s "
                f"USING (query_id) WHERE c.cand_id != s.cand_id)")
        selects.append(
            f"SELECT query_id, {r} AS pick_rank, cand_id, "
            f"score AS mmr_score FROM sel{r}")
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


# ---------------------------------------------------------------------------
# 6. text_bigram_logprob — per-doc fluency under a corpus bigram LM with
# add-one smoothing (the CCNet/KenLM-style scorer one order up from the
# registered unigram LM): −ln p(w_i | w_{i−1}) averaged over the doc,
# p = (c(w1,w2) + 1) / (c(w1) + V).  Bigram-count and unigram-count tables
# join on their term keys (shuffle equi-joins — the bigram table grows
# with the corpus, so unlike the capped unigram vocab it must NOT be
# broadcast); only V (1 row) broadcasts.  Determinism: counts and V are
# exact integers, the ratio divides identical doubles, and ln lands in
# the q6 fixed point (floor(ln·1e6 + 0.5)) — the text_unigram_logprob
# recipe; test_log_snap_guard_band already sweeps this query's
# (c1+V, cb+1) ratios on every sf dir the driver touches.
# ---------------------------------------------------------------------------


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_analysis import tokens

    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", tokens(F.col("text")).alias("t")))
    d = scoped_persist(d)
    big = d.select("doc_id", F.explode(F.expr(
        "transform(sequence(0, size(t) - 2), "
        "i -> struct(t[i] AS w1, t[i + 1] AS w2))")).alias("b")) \
        .select("doc_id", "b.w1", "b.w2")
    big = scoped_persist(big)
    uni = (d.select(F.explode("t").alias("w1"))
           .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    vocab = uni.agg(F.count(F.lit(1)).cast("long").alias("v"))
    bi = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    q = (big.join(bi, ["w1", "w2"]).join(uni, "w1")
         .crossJoin(F.broadcast(vocab))
         .select("doc_id", F.floor(
             F.log((F.col("c1") + F.col("v")).cast("double")
                   / (F.col("cb") + 1).cast("double")) * 1000000
             + F.lit(0.5)).cast("bigint").alias("qv")))
    return (q.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 (F.sum("qv").cast("double") / F.count(F.lit(1)) / 1000000.0)
                 .alias("avg_neglogp")))


_BIGRAM_LM_SQL = r"""
WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
              FROM documents),
bidx AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
         FROM toks),
big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM bidx),
uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
        FROM (SELECT unnest(t) AS w1 FROM toks) GROUP BY 1),
vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
       FROM big GROUP BY 1, 2),
q AS (SELECT big.doc_id,
             CAST(floor(ln(CAST(uni.c1 + vocab.v AS DOUBLE)
                           / CAST(bi.cb + 1 AS DOUBLE)) * 1000000 + 0.5)
                  AS BIGINT) AS qv
      FROM big JOIN bi USING (w1, w2) JOIN uni USING (w1)
      CROSS JOIN vocab)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(qv) AS DOUBLE) / count(*) / 1000000.0 AS avg_neglogp
FROM q GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# 7. dedup_containment — ASYMMETRIC near-dup detection: containment
# C(A,B) = |shingles(A) ∩ shingles(B)| / |shingles(A)| for the smaller
# side A.  Jaccard misses the quote/excerpt case (a short doc fully
# inside a long one has tiny |∩|/|∪| but containment ≈ 1) — this is the
# CC-style "is this page a fragment of that page" member of the dedup
# family (Broder 1997 distinguishes resemblance from containment).  The
# corpus synthesizes genuine fragments cross-engine: for doc_id < 25 a
# derived doc (id + 300000) keeps the first ⌈2n/5⌉ tokens — a contiguous
# token-prefix, so its 3-gram shingle set is a strict subset of its
# parent's and true containment is exactly 1.0.
#
# 100-TB design: candidate generation is the inverted-index recipe —
# explode DISTINCT 3-gram shingles, equi-join doc lists per shingle —
# with a document-frequency cap (df ≤ 64) killing the hub-shingle
# quadratic exactly as _BUCKET_CAP does for MinHash bands: pair fan-out
# is bounded by |shingles|·C², never corpus².  Dropping high-df shingles
# from BOTH sides leaves a true fragment's containment at 1.0 (its
# retained shingles remain a subset of its parent's).  The ≥ 0.8
# threshold is tested as the integer cross-product inter·5 ≥ small·4, so
# the keep/drop decision is exact in both engines; pairs need ≥ 10
# retained shingles on the small side (too-short docs prove nothing).
# ---------------------------------------------------------------------------

_CONTAIN_DF_CAP = 64
_CONTAIN_MIN_SHINGLES = 10


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_analysis import tokens

    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", tokens(F.col("text")).alias("t")))
    frag = (d.filter(F.col("doc_id") < 25)
            .select((F.col("doc_id") + 300000).alias("doc_id"),
                    F.expr("slice(t, 1, greatest(1, (size(t) * 2) div 5))")
                    .alias("t")))
    corpus = d.unionByName(frag)
    sh = (corpus
          .select("doc_id", F.explode(F.when(
              F.size("t") >= 3,
              F.expr("transform(sequence(0, size(t) - 3), "
                     "i -> concat_ws(' ', t[i], t[i + 1], t[i + 2]))"))
              .otherwise(F.expr("array()"))).alias("sh"))
          .distinct())
    sh = scoped_persist(sh)
    rare = (sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= _CONTAIN_DF_CAP).select("sh"))
    kept = scoped_persist(sh.join(rare, "sh"))
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (kept.select(F.col("doc_id").alias("id_a"), "sh")
             .join(kept.select(F.col("doc_id").alias("id_b"), "sh"), "sh")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_common")))
    j = (inter
         .join(sizes.select(F.col("doc_id").alias("id_a"),
                            F.col("sz").alias("sz_a")), "id_a")
         .join(sizes.select(F.col("doc_id").alias("id_b"),
                            F.col("sz").alias("sz_b")), "id_b")
         .withColumn("small", F.least("sz_a", "sz_b")))
    return (j.filter((F.col("small") >= _CONTAIN_MIN_SHINGLES)
                     & (F.col("n_common") * 5 >= F.col("small") * 4))
            .select("id_a", "id_b", "n_common",
                    (F.col("n_common").cast("double")
                     / F.col("small").cast("double")).alias("containment"))
            .orderBy("id_a", "id_b"))


_CONTAINMENT_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
  FROM documents),
corpus AS (
  SELECT doc_id, t FROM toks
  UNION ALL
  SELECT doc_id + 300000, t[1 : greatest(1, (len(t) * 2) // 5)]
  FROM toks WHERE doc_id < 25),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS sh
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM corpus)),
rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
         WHERE df <= {_CONTAIN_DF_CAP}),
kept AS (SELECT doc_id, sh.sh FROM sh JOIN rare USING (sh)),
sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM kept a JOIN kept b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, n_common,
       CAST(n_common AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE)
         AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE least(sa.sz, sb.sz) >= {_CONTAIN_MIN_SHINGLES}
  AND n_common * 5 >= least(sa.sz, sb.sz) * 4
ORDER BY id_a, id_b
"""

# ---------------------------------------------------------------------------
# 8. sample_importance_weights — DSIR-style data selection (Xie et al.
# 2023, "Data Selection for Language Models via Importance Resampling"):
# score every document by how much more likely its tokens are under a
# TARGET distribution (here the lang='en' slice — the high-resource
# corpus a run wants more of) than under the RAW crawl, using hashed
# n-gram features so the feature space is fixed at any corpus size.
# weight(doc) = mean over tokens of ln p_target(bucket) − ln p_raw(bucket)
# with add-one smoothing; the downstream resampler keeps docs ∝ exp(w).
#
# 100-TB design: features are the first two hex chars of md5(token) —
# 256 buckets, a FIXED feature table regardless of vocabulary (the DSIR
# hashing trick), identical hex in both engines so bucketing needs no
# cross-engine integer hash.  Both count passes are map-side-combinable
# groupBys on the 256-key domain; the per-bucket LLR table is a 256-row
# broadcast (audited — constant size at any scale) and scoring the corpus
# is one broadcast-join pass, no shuffle of raw tokens.  Determinism:
# counts are exact BIGINTs, the two smoothed products stay < 2^53 (exact
# doubles), and the single ln lands in the q6 fixed point (the
# unigram/bigram-LM precedent), so the per-doc mean divides identical
# integers cross-engine.
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TARGET_LANG = "en"


def sample_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_analysis import tokens

    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "lang",
                    F.explode(tokens(F.col("text"))).alias("w"))
            .select("doc_id", "lang",
                    F.substring(F.md5(F.col("w")), 1, 2).alias("b")))
    toks = scoped_persist(toks)
    raw = toks.groupBy("b").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (toks.filter(F.col("lang") == _DSIR_TARGET_LANG)
           .groupBy("b").agg(F.count(F.lit(1)).alias("c_tgt")))
    totals = (toks.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0))
        .alias("n_tgt")))
    llr = (raw.join(tgt, "b", "left")
           .na.fill({"c_tgt": 0})
           .crossJoin(totals)
           .select("b", F.floor(F.log(
               ((F.col("c_tgt") + 1) * (F.col("n_raw") + _DSIR_BUCKETS))
               .cast("double")
               / ((F.col("c_raw") + 1) * (F.col("n_tgt") + _DSIR_BUCKETS))
               .cast("double")) * 1000000 + F.lit(0.5))
               .cast("bigint").alias("qv")))
    return (toks.join(F.broadcast(llr), "b")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 (F.sum("qv").cast("double") / F.count(F.lit(1)) / 1000000.0)
                 .alias("dsir_logweight")))


_DSIR_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         substring(md5(unnest(regexp_split_to_array(lower(text), '\s+'))),
                   1, 2) AS b
  FROM documents),
raw AS (SELECT b, CAST(count(*) AS BIGINT) AS c_raw FROM toks GROUP BY b),
tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS c_tgt FROM toks
        WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_raw,
         CAST(sum(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_tgt
  FROM toks),
llr AS (
  SELECT b, CAST(floor(ln(
           CAST((coalesce(c_tgt, 0) + 1) * (n_raw + {_DSIR_BUCKETS})
                AS DOUBLE)
           / CAST((c_raw + 1) * (n_tgt + {_DSIR_BUCKETS}) AS DOUBLE))
           * 1000000 + 0.5) AS BIGINT) AS qv
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN totals)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(qv) AS DOUBLE) / count(*) / 1000000.0 AS dsir_logweight
FROM toks JOIN llr USING (b)
GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# 9. text_token_entropy — per-document Shannon entropy of the token
# distribution (lexical diversity): H = ln n − (1/n)·Σ_types c·ln c.
# Low-entropy docs are boilerplate/keyword-stuffed (the MassiveText /
# RefinedWeb diversity filters use exactly this signal); unlike the
# repetition rules it is threshold-free, so it composes with the
# LM-quality bucketing as a second curation axis.
#
# 100-TB design: one explode + one (doc, token) count + one per-doc fold
# — every aggregation map-side-combinable, no cross-doc state, corpus
# touched once.  Determinism: c and n are exact integers, ln c lands in
# the q6 fixed point BEFORE the Σ c·q6(ln c) fold (an exact BIGINT sum,
# ordering-free), and the final H assembles from those integers with
# one division — the unigram/bigram-LM discipline applied to entropy.
# ---------------------------------------------------------------------------


def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_analysis import tokens

    tc = (load_table(spark, sf_dir, "documents")
          .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
          .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c")))
    per = (tc.groupBy("doc_id")
           .agg(F.sum("c").alias("n"),
                F.count(F.lit(1)).alias("n_types"),
                F.sum(F.col("c")
                      * F.floor(F.log(F.col("c").cast("double")) * 1000000
                                + F.lit(0.5)).cast("bigint"))
                .alias("sq")))
    return per.select(
        "doc_id", F.col("n").alias("n_tokens"), "n_types",
        (F.floor(F.log(F.col("n").cast("double")) * 1000000 + F.lit(0.5))
         .cast("double") / 1000000.0
         - F.col("sq").cast("double") / F.col("n") / 1000000.0)
        .alias("entropy_nats"))


_ENTROPY_SQL = r"""
WITH tc AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents)
  GROUP BY doc_id, w),
per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sq
  FROM tc GROUP BY doc_id)
SELECT doc_id, n AS n_tokens, n_types,
       CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS DOUBLE)
         / 1000000.0
       - CAST(sq AS DOUBLE) / n / 1000000.0 AS entropy_nats
FROM per
"""

# ---------------------------------------------------------------------------
# 10. text_keyword_topk — per-document keyword extraction: the top-3
# TF-IDF terms of every doc (the labeling/faceting primitive behind
# search snippets and topic tagging).  Differs from the registered
# text_tfidf (a corpus-level score table) by the per-doc RANKED
# selection, which is exactly the plan shape that matters at scale:
# top-N per group runs as WindowGroupLimit (rank pushed BEFORE the
# exchange, so the shuffle carries O(docs·k) rows, not every (doc,term)
# score — the window_top_n_per_group scale story applied to text).
#
# Determinism: score = tf · q6(ln(N/df)) is an exact BIGINT (tf, N, df
# integers; ln in the q6 fixed point BEFORE the multiply), so ranking by
# (score desc, term) is a total order over exact values and both engines
# select identical keyword sets.
# ---------------------------------------------------------------------------

_KEYWORD_K = 3


def text_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_analysis import tokens

    # tokenize + explode dominate and run partition-local before the
    # (doc_id, w) partial agg: widen the single-row-group scan first
    # (guide §2.5; no-op at production scale)
    tc = (spread_small_scan(
              spark,
              load_table(spark, sf_dir, "documents")
              .select("doc_id", "text"),
              sf_dir, "documents")
          .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
          .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf")))
    tc = scoped_persist(tc)
    n_docs = (tc.select("doc_id").distinct()
              .agg(F.count(F.lit(1)).alias("n_docs")))
    df_tbl = tc.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    scored = (tc.join(df_tbl, "w").crossJoin(F.broadcast(n_docs))
              .select("doc_id", "w",
                      (F.col("tf") * F.floor(
                          F.log(F.col("n_docs").cast("double")
                                / F.col("df").cast("double")) * 1000000
                          + F.lit(0.5)).cast("bigint")).alias("score_q6")))
    ranked = scored.withColumn(
        "rk", F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.col("score_q6").desc(), "w")))
    return (ranked.filter(F.col("rk") <= _KEYWORD_K)
            .select("doc_id", "rk", F.col("w").alias("keyword"), "score_q6"))


_KEYWORD_SQL = rf"""
WITH tc AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        FROM documents)
  GROUP BY doc_id, w),
n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tc),
dft AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tc GROUP BY w),
scored AS (
  SELECT doc_id, w,
         tf * CAST(floor(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
                         * 1000000 + 0.5) AS BIGINT) AS score_q6
  FROM tc JOIN dft USING (w) CROSS JOIN n),
ranked AS (
  SELECT doc_id, w, score_q6,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_q6 DESC, w) AS rk
  FROM scored)
SELECT doc_id, rk, w AS keyword, score_q6
FROM ranked WHERE rk <= {_KEYWORD_K}
"""


# ---------------------------------------------------------------------------
# 11. sim_embedding_drift — distribution-drift monitor over the embedding
# space (the ML-ops check every continuously-crawled corpus needs: "did
# the new crawl land in different regions than the old one?").  The
# corpus splits at the midpoint id into OLD and NEW halves; both halves
# assign to the SAME deterministic k=8 cells (the sim_kmeans seed set),
# and the per-cell population shares are compared — share drift per cell
# is the standard PSI-style signal, here in exact form.
#
# 100-TB design: one broadcast-centroid assignment pass (the clustering
# family's pinned shape) + one map-side (cell, half) census; the split
# point and the two half totals are 1-row broadcast scalars (audited).
# Shares and drift divide exact BIGINTs in the same operand order in
# both engines, so the doubles are bit-identical.
# ---------------------------------------------------------------------------

_DRIFT_K = 8


def sim_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    a = assign_cells(v, _DRIFT_K)
    split = v.agg(F.floor(F.max("vec_id") / 2).cast("bigint").alias("mid"))
    cnt = (a.crossJoin(F.broadcast(split))
           .groupBy("cluster")
           .agg(F.sum(F.when(F.col("vec_id") <= F.col("mid"), 1)
                      .otherwise(0)).cast("bigint").alias("n_old"),
                F.sum(F.when(F.col("vec_id") > F.col("mid"), 1)
                      .otherwise(0)).cast("bigint").alias("n_new")))
    tot = cnt.agg(F.sum("n_old").cast("bigint").alias("t_old"),
                  F.sum("n_new").cast("bigint").alias("t_new"))
    share_old = F.col("n_old").cast("double") / F.col("t_old").cast("double")
    share_new = F.col("n_new").cast("double") / F.col("t_new").cast("double")
    return (cnt.crossJoin(F.broadcast(tot))
            .select("cluster", "n_old", "n_new",
                    share_old.alias("share_old"),
                    share_new.alias("share_new"),
                    (share_new - share_old).alias("drift"))
            .orderBy("cluster"))


def _drift_sql() -> str:
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent0 AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id < {_DRIFT_K}),
a1 AS ({_assign_sql("v", "cent0")}),
split AS (SELECT CAST(floor(max(vec_id) / 2) AS BIGINT) AS mid FROM v),
cnt AS (
  SELECT cluster,
         CAST(sum(CASE WHEN vec_id <= mid THEN 1 ELSE 0 END) AS BIGINT)
           AS n_old,
         CAST(sum(CASE WHEN vec_id > mid THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new
  FROM a1 CROSS JOIN split GROUP BY cluster),
tot AS (SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
               CAST(sum(n_new) AS BIGINT) AS t_new FROM cnt)
SELECT cluster, n_old, n_new,
       CAST(n_old AS DOUBLE) / CAST(t_old AS DOUBLE) AS share_old,
       CAST(n_new AS DOUBLE) / CAST(t_new AS DOUBLE) AS share_new,
       CAST(n_new AS DOUBLE) / CAST(t_new AS DOUBLE)
       - CAST(n_old AS DOUBLE) / CAST(t_old AS DOUBLE) AS drift
FROM cnt CROSS JOIN tot
ORDER BY cluster
"""


# ---------------------------------------------------------------------------
# 12. text_vocab_growth — Heaps-law type-growth census: how many NEW
# 3-gram types each tenth of the corpus contributes (the curve data
# engineers read to decide whether more crawl still buys coverage; the
# synthetic corpus's WORD vocabulary saturates in the first few docs, so
# the measured unit is the 3-gram type space, which keeps growing).
# Each type's first appearance is min(doc_id) — one map-side-combinable
# aggregation over the exploded corpus; the decile is an exact integer
# expression floor(first·10 / n_docs) (capped at 9), and the cumulative
# type count is a running sum over the TEN decile rows (an O(1) window,
# allowlisted).  Everything is exact integers — no floats anywhere.
# ---------------------------------------------------------------------------


def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_analysis import tokens

    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", tokens(F.col("text")).alias("t")))
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    first = (d.select("doc_id", F.explode(F.expr(
                "transform(sequence(0, size(t) - 3), "
                "i -> concat_ws(' ', t[i], t[i + 1], t[i + 2]))"))
                .alias("w"))
             .groupBy("w").agg(F.min("doc_id").alias("f")))
    per = (first.crossJoin(F.broadcast(n_docs))
           .select(F.least(F.lit(9), F.expr("(f * 10) div n_docs"))
                   .cast("int").alias("decile"))
           .groupBy("decile")
           .agg(F.count(F.lit(1)).cast("bigint").alias("new_types")))
    cum = (W.orderBy("decile")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (per.select("decile", "new_types",
                       F.sum("new_types").over(cum).cast("bigint")
                       .alias("cum_types"))
            .orderBy("decile"))


_VOCAB_GROWTH_SQL = r"""
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
         FROM documents),
first AS (
  SELECT w, min(doc_id) AS f
  FROM (SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS w
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks))
  GROUP BY w),
per AS (
  SELECT CAST(least(9, (f * 10) // n_docs) AS INT) AS decile,
         CAST(count(*) AS BIGINT) AS new_types
  FROM first CROSS JOIN n GROUP BY 1)
SELECT decile, new_types,
       CAST(sum(new_types) OVER (ORDER BY decile
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cum_types
FROM per
ORDER BY decile
"""

# Promoted round 9 (r8 verdict next-round #1); empty STAGED kept so the
# staged-protocol tests can pin that nothing is both staged and registered.
from ..registry import register  # noqa: E402  (promotion epilogue)

for _name, (_fn, _sql) in {
    "text_repetition_filter": (text_repetition_filter, _REPETITION_SQL),
    "sample_domain_mixture": (sample_domain_mixture, _DOMAIN_MIXTURE_SQL),
    "sim_kcenter_coreset": (sim_kcenter_coreset, _kcenter_sql()),
    "sample_cluster_balanced": (sample_cluster_balanced,
                                _cluster_balanced_sql()),
    "sim_mmr_rerank": (sim_mmr_rerank, _mmr_sql()),
    "text_bigram_logprob": (text_bigram_logprob, _BIGRAM_LM_SQL),
    "dedup_containment": (dedup_containment, _CONTAINMENT_SQL),
    "sample_importance_weights": (sample_importance_weights, _DSIR_SQL),
    "text_token_entropy": (text_token_entropy, _ENTROPY_SQL),
    "text_keyword_topk": (text_keyword_topk, _KEYWORD_SQL),
    "sim_embedding_drift": (sim_embedding_drift, _drift_sql()),
    "text_vocab_growth": (text_vocab_growth, _VOCAB_GROWTH_SQL),
}.items():
    register(_name, _sql)(_fn)

STAGED: dict = {}
