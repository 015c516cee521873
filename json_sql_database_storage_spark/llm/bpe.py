"""BPE merge training as unrolled Catalyst plans (SURVEY.md §2 r6 addenda).

Byte-pair-encoding tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") is the canonical
tokenizer-construction step of an LLM data pipeline — and its training
loop fits the engine's unrolled-iteration discipline exactly:

  once      word-TYPE frequency table (the only corpus-sized aggregation —
            everything after runs on the vocabulary, which is ≪ corpus,
            weighted by freq; this is how production BPE trainers scale:
            HuggingFace tokenizers also trains on word counts, not tokens)
  per merge (1) count adjacent symbol pairs weighted by word freq,
            (2) take the GLOBAL argmax pair — a TakeOrdered 1-row table,
            cross-joined back (broadcast, 1 row — never a driver collect),
            (3) rewrite every word's symbol sequence with a greedy
            left-to-right fold that merges non-overlapping (a,b)
            occurrences — a pure higher-order `aggregate` over the symbol
            array, no Python.

Determinism: pair counts are BIGINT; the argmax tie-breaks on
(count DESC, a, b); the rewrite fold is the identical greedy
left-to-right recurrence in both engines (verified on runs like "aaa",
where greedy merging is order-sensitive) — so merges, counts, and the
post-merge symbol census all hash-match exactly.

Scale: after the word-count groupBy, per-iteration work is
O(vocab · word_len) map-side plus a (pair → count) aggregation whose key
space is the symbol-pair alphabet; the 1-row argmax is the only global
step.  Unrolled iterations keep the whole training run ONE plan.

Depth ceiling (r6 verdict "wrong" #2): Catalyst plan size grows linearly
with unrolled merges and analysis time superlinearly, so the _BPE_MERGES=3
exhibit's one-plan form does NOT extend to a production merge count
(~30k).  The production path is the checkpointed driver loop demonstrated
by operators/graph.py::pagerank_ranks — localCheckpoint(eager) the
O(vocab) word-type table every k merges to truncate lineage; per-segment
time stays flat (measured in SCALE.md, pinned by
tests/test_scale.py::test_pagerank_checkpoint_keeps_superstep_time_flat).
The same recipe drops into _train_word_types's loop unchanged: `s` is the
only loop-carried state — and train_merges_deep below IS that drop-in,
pinned equal to the Python reference trainer at 10 merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .text_analysis import tokens

_BPE_MERGES = 3


def pair_structs(syms: F.Column) -> F.Column:
    """Adjacent symbol pairs as (a, b) structs; empty for 1-symbol words."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.zip_with(F.slice(syms, 1, n - 1), F.slice(syms, 2, n - 1),
                   lambda x, y: F.struct(x.alias("a"), y.alias("b")))
    ).otherwise(F.array())


def merge_fold(syms: F.Column, a: F.Column, b: F.Column) -> F.Column:
    """Greedy left-to-right non-overlapping merge of (a,b) → a||b."""
    ab = F.concat(a, b)
    return F.when(F.size(syms) <= 1, syms).otherwise(
        F.aggregate(
            F.slice(syms, 2, F.size(syms) - 1),
            F.array(F.element_at(syms, 1)),
            lambda acc, x:
                F.when((F.element_at(acc, -1) == a) & (x == b),
                       F.when(F.size(acc) == 1, F.array(ab))
                        .otherwise(F.concat(
                            F.slice(acc, 1, F.size(acc) - 1), F.array(ab))))
                 .otherwise(F.concat(acc, F.array(x)))))


def _sql_iter(i: int) -> str:
    prev = f"s{i-1}"
    return f"""
p{i} AS (
  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq,
               unnest(list_slice(syms, 1, len(syms) - 1)) AS a,
               unnest(list_slice(syms, 2, len(syms))) AS b
        FROM {prev})
  GROUP BY a, b
), t{i} AS (
  SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1
), s{i} AS (
  SELECT term, freq,
         CASE WHEN len(syms) <= 1 THEN syms ELSE
           reduce(list_transform(syms, c -> [c]),
                  (acc, x) -> CASE
                    WHEN acc[-1] = t{i}.a AND x[1] = t{i}.b THEN
                      CASE WHEN len(acc) = 1 THEN [t{i}.a || t{i}.b]
                           ELSE list_append(list_slice(acc, 1, len(acc) - 1),
                                            t{i}.a || t{i}.b) END
                    ELSE list_append(acc, x[1]) END)
         END AS syms
  FROM {prev} CROSS JOIN t{i}
), m{i} AS (
  SELECT {i} AS it, t{i}.a, t{i}.b, t{i}.cnt,
         (SELECT CAST(sum(freq * len(syms)) AS BIGINT) FROM s{i})
           AS n_symbols_after
  FROM t{i}
)"""


# Shared oracle prelude: word table (with doc_id, for the encode join),
# word-type frequencies, and the unrolled merge iterations s1..sN.
_SQL_TRAIN_PREFIX = rf"""
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
), wt AS (
  SELECT term, count(*) AS freq FROM w GROUP BY term
), s0 AS (
  SELECT term, freq, regexp_split_to_array(term, '') AS syms FROM wt
), {", ".join(_sql_iter(i).strip() for i in range(1, _BPE_MERGES + 1))}
"""


@register(
    "text_bpe_train",
    oracle=_SQL_TRAIN_PREFIX + f"""
SELECT it, a, b, cnt, n_symbols_after
FROM ({" UNION ALL ".join(f"SELECT * FROM m{i}"
                          for i in range(1, _BPE_MERGES + 1))})
ORDER BY it
""",
    tags=("r6.13", "b11.33"),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train _BPE_MERGES merges on the corpus word-frequency table; emit
    one row per merge: the chosen pair, its weighted count, and the total
    symbol census after applying it."""
    _, out = _train_word_types(spark, sf_dir)
    return out.orderBy("it")


def _train_word_types(spark: SparkSession,
                      sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Shared training loop: returns (encoded word types after all merges
    — (term, freq, syms), per-merge summary rows — (it, a, b, cnt,
    n_symbols_after)).  The final word-type table IS the trained
    tokenizer's application to the vocabulary: encode of the corpus is
    then just an equi-join of corpus tokens against it (text_bpe_encode)."""
    d = load_table(spark, sf_dir, "documents")
    wt = (d.select(F.explode(tokens(F.col("text"))).alias("term"))
          .groupBy("term").agg(F.count(F.lit(1)).alias("freq")))
    s = wt.select("term", "freq", F.split(F.col("term"), "").alias("syms"))
    out = None
    for i in range(1, _BPE_MERGES + 1):
        pc = (s.select("freq", F.explode(pair_structs(F.col("syms")))
                       .alias("p"))
              .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
              .agg(F.sum("freq").cast("bigint").alias("cnt")))
        top = pc.orderBy(F.col("cnt").desc(), "a", "b").limit(1)
        s = (s.crossJoin(F.broadcast(top))
             .select("term", "freq",
                     merge_fold(F.col("syms"), F.col("a"), F.col("b"))
                      .alias("syms")))
        row = (s.agg(F.sum(F.col("freq") * F.size(F.col("syms")))
                     .cast("bigint").alias("n_symbols_after"))
               .crossJoin(F.broadcast(top))
               .select(F.lit(i).alias("it"), "a", "b", "cnt",
                       "n_symbols_after"))
        out = row if out is None else out.unionByName(row)
    return s, out


# ---------------------------------------------------------------------------
# r7.1 — BPE corpus ENCODE (r6 verdict next-round #1): apply the trained
# merge list to tokenize the corpus — the pipeline step every LLM data run
# executes over 100% of its data (training is the cheap half).
#
# The scaling trick is the same one training uses: the corpus is never
# tokenized row-by-row.  The final word-TYPE table from training already
# holds every vocabulary word's encoded symbol sequence (the greedy
# merge_fold chained once per learned merge — each merge a broadcast 1-row
# cross join, so the whole merge list is applied in ONE Catalyst plan with
# no driver collect).  Encoding the corpus is then:
#
#   pass 1  the word-type freq aggregation training already runs;
#   pass 2  explode corpus tokens → equi-join on term against the encoded
#           word types (shuffle keyed by term, map-side combinable) →
#           per-doc aggregation.
#
# O(1) corpus passes total; per-word encode cost is paid once per word
# TYPE, not per occurrence — the HuggingFace fast-tokenizer cache idea,
# expressed relationally.  At a production merge count (~30k) the chained
# fold would be a driver loop with checkpoints (see module docstring);
# the join-side shape here is unchanged.
# ---------------------------------------------------------------------------

_SN = f"s{_BPE_MERGES}"


@register(
    "text_bpe_encode",
    oracle=_SQL_TRAIN_PREFIX + f"""
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(s.syms)) AS BIGINT) AS n_bpe_tokens
FROM w JOIN {_SN} s USING (term)
GROUP BY w.doc_id
ORDER BY w.doc_id
""",
    tags=("r7.1", "b11.33"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the trained merges: per document, the word
    count and the BPE token count (sum of each word's encoded symbol-
    sequence length).  Corpus pass 2 is one explode + one term equi-join
    against the encoded word-type table."""
    d = load_table(spark, sf_dir, "documents")
    enc, _ = _train_word_types(spark, sf_dir)
    word_len = enc.select("term", F.size("syms").alias("n_bpe"))
    wd = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    return (
        wd.join(word_len, "term")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_words"),
             F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"))
        .orderBy("doc_id")
    )


@register(
    "text_bpe_token_census",
    oracle=_SQL_TRAIN_PREFIX + f"""
SELECT sym AS token, CAST(sum(freq) AS BIGINT) AS n_occurrences
FROM (SELECT freq, unnest(syms) AS sym FROM {_SN})
GROUP BY sym
ORDER BY token
""",
    tags=("r7.1", "b11.33"),
)
def text_bpe_token_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token census under the trained tokenizer: every BPE token
    with its total occurrence count (word-type freq–weighted), the
    vocabulary-health table a tokenizer run reports.  Runs on the word-TYPE
    table — the corpus is never re-scanned."""
    enc, _ = _train_word_types(spark, sf_dir)
    return (
        enc.select("freq", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").cast("bigint").alias("n_occurrences"))
        .orderBy("token")
    )


def train_merges_deep(spark: SparkSession, sf_dir: str, n_merges: int,
                      checkpoint_every: int = 4) -> tuple[DataFrame, list]:
    """BPE training PAST the unrolled-plan depth ceiling: the checkpointed
    driver loop the module docstring names (operators/graph.py's
    pagerank_ranks recipe applied here).  `s` — the O(vocab) word-type
    table, the only loop-carried state — is eagerly localCheckpoint'ed
    every `checkpoint_every` merges, holding plan depth at O(k) while the
    merge count grows to production scale.  Each merge's argmax row is a
    2-row driver fetch (the merge LIST is the trainer's output artifact —
    collecting it is the point, unlike row data); the corpus is still
    touched exactly once.  Returns (encoded word types, merge list).

    Values are bit-identical to the unrolled form: the per-merge
    recurrence is unchanged and a checkpoint only truncates lineage
    (pinned vs the Python reference tokenizer at 10 merges in
    tests/test_llm.py::test_bpe_deep_training_matches_reference)."""
    d = load_table(spark, sf_dir, "documents")
    wt = (d.select(F.explode(tokens(F.col("text"))).alias("term"))
          .groupBy("term").agg(F.count(F.lit(1)).alias("freq")))
    s = (wt.select("term", "freq", F.split(F.col("term"), "").alias("syms"))
         .localCheckpoint(eager=True))
    merges = []
    for i in range(1, n_merges + 1):
        pc = (s.select("freq", F.explode(pair_structs(F.col("syms")))
                       .alias("p"))
              .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
              .agg(F.sum("freq").cast("bigint").alias("cnt")))
        top_rows = pc.orderBy(F.col("cnt").desc(), "a", "b").limit(1).collect()
        if not top_rows:           # vocabulary fully merged — stop early
            break
        a, b, cnt = top_rows[0]["a"], top_rows[0]["b"], top_rows[0]["cnt"]
        merges.append((a, b, cnt))
        s = s.select("term", "freq",
                     merge_fold(F.col("syms"), F.lit(a), F.lit(b))
                     .alias("syms"))
        if i % checkpoint_every == 0 and i < n_merges:
            s = s.localCheckpoint(eager=True)
    return s, merges
