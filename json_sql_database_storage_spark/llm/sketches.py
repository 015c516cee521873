"""Frequent-items (heavy-hitter) detection via a Misra-Gries sketch with an
exact verification pass (SURVEY.md §2 r5 addenda).

Why a sketch at all: exact term frequency over 100 TB of text shuffles the
full (term, 1) stream — fine when you need every term (text_top_terms), but
heavy-hitter queries only need terms above a support threshold.  The classic
two-pass scheme makes that cheap AND exact:

  pass 1  per-partition Misra-Gries summaries (capacity k-1, pure map-side,
          NO shuffle of raw terms — each partition emits ≤ k-1 candidate
          terms regardless of partition size);
  pass 2  exact counts for the candidate set only, via a broadcast semi
          join (candidates ≤ (k-1) × n_partitions — trivially broadcastable)
          and one map-side-combinable count.

Correctness is the Misra-Gries guarantee, not a heuristic: a term with
partition frequency > n_p/k survives that partition's summary, and a term
with GLOBAL frequency > n/k must exceed n_p/k in at least one partition
(pigeonhole over the partition sums) — so pass-1 candidates are a superset
of every true heavy hitter and pass 2 prunes the false positives with exact
counts.  The final answer is therefore IDENTICAL to the brute-force SQL,
which is exactly what the oracle runs.

(Misra & Gries 1982; merge reduction per Agarwal et al. 2013, "Mergeable
Summaries": after merging a batch, subtract the (k)-th largest counter from
all and drop non-positives — total decrement stays ≤ n_p/k.)
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .text_analysis import tokens

_HH_K = 35  # support threshold denominator: report terms with freq > n/35


def _mg_reduce(counters: Counter, cap: int) -> None:
    """In-place Misra-Gries reduction to ≤ cap entries: subtract the
    (cap+1)-th largest count from everything, drop non-positive."""
    if len(counters) <= cap:
        return
    m = sorted(counters.values(), reverse=True)[cap]
    for t in list(counters):
        c = counters[t] - m
        if c > 0:
            counters[t] = c
        else:
            del counters[t]


def mg_candidates(words: DataFrame, k: int) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries of capacity k-1.
    mapInPandas sees each partition as an iterator of Arrow batches, so one
    Counter spans the whole partition; Counter.update does the per-batch
    counting in C."""
    cap = k - 1

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        for pdf in batches:
            counters.update(pdf["term"])
            _mg_reduce(counters, cap)
        yield pd.DataFrame({"term": pd.Series(sorted(counters), dtype=object)})

    return words.mapInPandas(summarize, "term STRING").distinct()


@register(
    "text_heavy_hitters",
    oracle=rf"""
WITH w AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term
           FROM documents),
     n AS (SELECT count(*) AS n_words FROM w)
SELECT term, count(*) AS freq
FROM w, n
GROUP BY term, n.n_words
HAVING count(*) > n.n_words / {_HH_K}.0
ORDER BY freq DESC, term
""",
    tags=("r5.4", "b11.6"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms with corpus frequency > n/{k}: Misra-Gries candidates, then an
    exact verification count restricted to the candidate set.  The oracle
    is the brute-force GROUP BY ... HAVING — equality holds by the sketch's
    superset guarantee plus the exact second pass."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(tokens(F.col("text"))).alias("term"))
    cands = mg_candidates(words, _HH_K)
    n = words.agg(F.count(F.lit(1)).cast("double").alias("n_words"))
    return (
        words.join(F.broadcast(cands), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("freq") > F.col("n_words") / _HH_K)
        .select("term", "freq")
        .orderBy(F.col("freq").desc(), "term")
    )


# ---------------------------------------------------------------------------
# r6.8 — count-min sketch (Cormode & Muthukrishnan 2005): the point-query
# frequency sketch that completes the mergeable-summary family (HLL =
# distinct counts, quantile sketch = distributions, Misra-Gries = top-k,
# CMS = arbitrary-term frequency lookups).  d=4 hash rows × w=256 counters
# = a 1 KB-scale table that answers "how often does term t occur?" in O(d)
# regardless of corpus size, with one-sided error: est ≥ exact always, and
# est − exact ≤ 2N/w with probability 1 − (1/2)^d.
#
# Cross-engine determinism: hash_i(t) = first 2 hex chars of
# md5(i || ':' || t) — md5 is bit-identical everywhere (the
# sample_domain_balance precedent), and the bucket KEY stays the hex
# substring itself, so no engine-specific hex→int conversion exists
# anywhere.  Counters, estimates, exact counts: all BIGINT.
#
# Scale: the build is one groupBy over (i, bucket) — d·w = 1024 groups,
# map-side combinable, shuffle bytes O(d·w · partitions) independent of
# corpus; per-language sketches MERGE by plain counter addition into
# exactly the global sketch (pinned in tests/test_llm.py — the property
# that lets 1000 executors sketch shards independently).
# ---------------------------------------------------------------------------

_CMS_D = 4    # hash rows
# w = 256 buckets, implied by the 2-hex-char key


def _cms_hashes(term):
    """(i, bkt) struct array for one term — the d bucket coordinates."""
    return F.array(*[
        F.struct(F.lit(i).alias("i"),
                 F.substring(F.md5(F.concat(F.lit(f"{i}:"), term)
                                   .cast("binary")), 1, 2).alias("bkt"))
        for i in range(_CMS_D)])


@register(
    "text_count_min_sketch",
    oracle=rf"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
), h AS (
  SELECT term, i, substr(md5(CAST(i AS VARCHAR) || ':' || term), 1, 2) AS bkt
  FROM w CROSS JOIN (SELECT unnest(range({_CMS_D})) AS i)
), counters AS (
  SELECT i, bkt, count(*) AS c FROM h GROUP BY i, bkt
), exact AS (
  SELECT term, count(*) AS exact_c FROM w GROUP BY term
), probe AS (
  SELECT DISTINCT term, i, bkt FROM h
)
SELECT e.term, CAST(e.exact_c AS BIGINT) AS exact_c,
       CAST(min(c.c) AS BIGINT) AS cms_est
FROM probe p
JOIN counters c USING (i, bkt)
JOIN exact e ON e.term = p.term
GROUP BY e.term, e.exact_c
ORDER BY e.term
""",
    tags=("r6.8", "b11.23"),
)
def text_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the d×w counter table from the corpus, then answer a point
    query per distinct corpus term alongside its exact count — the oracle
    doubles as the one-sided-error check (cms_est ≥ exact_c row by row)."""
    from ..registry import scoped_persist

    d = load_table(spark, sf_dir, "documents")
    # h feeds BOTH counters and the probe (and toks a third consumer) —
    # persist the hashed-token frame once so the corpus explode + d md5
    # hashes per occurrence are computed once, not per consumer (r10
    # review)
    toks = d.select(F.explode(tokens(F.col("text"))).alias("term"))
    h = scoped_persist(
        toks.select("term", F.explode(_cms_hashes(F.col("term"))).alias("e"))
        .select("term", F.col("e.i").alias("i"), F.col("e.bkt").alias("bkt")))
    counters = h.groupBy("i", "bkt").agg(F.count(F.lit(1)).alias("c"))
    # exact counts ride the SAME persisted frame (row i==0 appears once
    # per token occurrence) — no third corpus scan
    exact = (h.filter(F.col("i") == 0)
             .groupBy("term").agg(F.count(F.lit(1)).cast("bigint")
                                  .alias("exact_c")))
    probe = h.select("term", "i", "bkt").distinct()
    return (
        probe.join(counters, ["i", "bkt"])
        .groupBy("term")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
        .join(exact, "term")
        .select("term", "exact_c", "cms_est")
        .orderBy("term")
    )


def cms_counters(toks: DataFrame, extra_keys: list[str] = []) -> DataFrame:
    """(extra_keys…, i, bkt, c) counter table — the mergeable unit.  With
    extra_keys=['lang'], per-language sketches; merging = summing c over
    the extra keys, which equals the directly-built global sketch exactly
    (addition commutes with the per-cell counts)."""
    h = (toks.select(*extra_keys, F.explode(_cms_hashes(F.col("term")))
                     .alias("e"))
         .select(*extra_keys, F.col("e.i").alias("i"),
                 F.col("e.bkt").alias("bkt")))
    return h.groupBy(*extra_keys, "i", "bkt") \
            .agg(F.count(F.lit(1)).alias("c"))
