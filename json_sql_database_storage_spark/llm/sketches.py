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
