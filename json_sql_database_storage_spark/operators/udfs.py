"""UDF / UDAF / UDTF surface (SURVEY.md §2 B10).

These exist to prove the extension surface, not to compute things built-ins
already do (the hot path everywhere else in this engine is JVM expressions).
Preference order when extending the engine for real: built-in composition →
Arrow-vectorized pandas UDF → applyInPandas/mapInPandas → row-at-a-time UDF
(last resort; kept here only as the b10.1 exhibit).

Oracle parity: every UDF does its float math in an order both engines
reproduce exactly — integer token counts, decimal-domain cents (events.value
is exactly 2-decimal, FIXTURES.md), sequential `np.cumsum` sums (DuckDB's
list_sum is the same left-to-right fold — the invariant the cosine oracles
in llm/similarity.py already rely on), and single IEEE ops (x*x, /, sqrt)
on identical inputs.  All intermediate integer sums stay < 2^53 (max 99
events/user × 49_002 max cents), so BIGINT/HUGEINT↔float64 conversions are
exact.  tests/test_udfs.py additionally asserts each UDF equals its
built-in equivalent.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources import load_table


# b10.1 scalar row-at-a-time Python UDF (the slow path, deliberately)
@register(
    "udf_scalar_python",
    oracle="""
SELECT doc_id,
       coalesce(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x != '')), 0) AS n_tokens
FROM documents
ORDER BY doc_id
""",
    tags=("b10.1",),
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(T.IntegerType())
    def token_count(text: str) -> int:
        return len(text.split()) if text else 0

    d = load_table(spark, sf_dir, "documents")
    return (d.select("doc_id", token_count("text").alias("n_tokens"))
            .orderBy("doc_id"))


# b10.2 Arrow-vectorized scalar pandas UDF: embedding L2 norm via numpy.
# np.cumsum is a strict left-to-right fold — the same summation order as
# DuckDB's list_sum — so the norms agree bit-for-bit.
@register(
    "udf_pandas_vectorized",
    oracle="""
SELECT vec_id,
       sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
         AS norm
FROM embeddings
ORDER BY vec_id
""",
    tags=("b10.2",),
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def l2_norm(vecs: pd.Series) -> pd.Series:
        return vecs.map(lambda v: float(math.sqrt(
            np.cumsum(np.square(np.asarray(v, dtype=np.float64)))[-1])))

    e = load_table(spark, sf_dir, "embeddings")
    return (e.select("vec_id", l2_norm("embedding").alias("norm"))
            .orderBy("vec_id"))


# b10.3 grouped-aggregate pandas UDF (UDAF): trimmed mean per user.
# trimmed mean of sorted[1:-1] == (sum - min - max) / (n - 2); computed in
# exact integer cents so both engines divide the same two exact numbers.
@register(
    "udf_grouped_agg",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c FROM events
)
SELECT user_id,
       CASE WHEN count(*) < 3
            THEN sum(c) / (100.0 * count(*))
            ELSE (sum(c) - min(c) - max(c)) / (100.0 * (count(*) - 2))
       END AS trimmed_mean_value
FROM e GROUP BY user_id
ORDER BY user_id
""",
    tags=("b10.3",),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        c = np.rint(v.to_numpy(dtype=np.float64) * 100).astype(np.int64)
        n = len(c)
        if n < 3:
            return float(int(c.sum()) / (100.0 * n))
        return float(int(c.sum() - c.min() - c.max()) / (100.0 * (n - 2)))

    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(trimmed_mean("value").alias("trimmed_mean_value"))
            .orderBy("user_id"))


# b10.4 grouped-map applyInPandas (UDTF-like): per-user z-score normalize.
# Deviations are kept as exact integers (d_i = c_i*n - S in cents·n), so
# z_i = d_i / sqrt(SS/n) is the same op sequence in both engines.
@register(
    "udf_apply_in_pandas",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, value,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), g AS (
  SELECT user_id, count(*) AS n, sum(c) AS s FROM e GROUP BY user_id
), d AS (
  SELECT e.event_id, e.user_id, e.value, e.c * g.n - g.s AS dd, g.n
  FROM e JOIN g USING (user_id)
), ss AS (
  SELECT user_id, sum(dd * dd) AS ss FROM d GROUP BY user_id
)
SELECT d.user_id, d.event_id, d.value,
       CASE WHEN ss.ss = 0 THEN 0.0
            ELSE d.dd / sqrt(ss.ss / d.n) END AS value_z
FROM d JOIN ss USING (user_id)
ORDER BY event_id
""",
    tags=("b10.4",),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(pdf["value"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        n = len(c)
        s = int(c.sum())
        d = c * n - s
        ss = int((d * d).sum())
        pdf["value_z"] = 0.0 if ss == 0 else d / math.sqrt(ss / n)
        return pdf[["user_id", "event_id", "value", "value_z"]]

    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .applyInPandas(zscore,
                           "user_id BIGINT, event_id BIGINT, "
                           "value DOUBLE, value_z DOUBLE")
            .orderBy("event_id"))


# b10.5 mapInPandas (table function over Arrow batches): running flags +
# derived columns without a shuffle
@register(
    "udf_map_in_pandas",
    oracle="""
SELECT event_id, value, value * value AS value_sq,
       CAST(value > 100.0 AS BIGINT) AS is_high
FROM events
ORDER BY event_id
""",
    tags=("b10.5",),
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["event_id", "value"]].copy()
            out["value_sq"] = pdf["value"] ** 2
            out["is_high"] = (pdf["value"] > 100.0).astype("int64")
            yield out

    ev = load_table(spark, sf_dir, "events")
    return (ev.mapInPandas(enrich,
                           "event_id BIGINT, value DOUBLE, "
                           "value_sq DOUBLE, is_high BIGINT")
            .orderBy("event_id"))


# b10.6 (r5 addendum) Python UDTF — the table-valued UDF surface (one input
# row → many output rows with their own schema), lateral-joined per
# document.  Sentence segmentation is the canonical shape: each doc yields
# (sent_idx, n_words) rows.  Arrow-batched (useArrow) like every other
# Python surface here; the UDTF runs embarrassingly parallel per input
# partition — no shuffle until the caller aggregates.  Semantics contract
# with the oracle: segments = split on '.', a segment counts when it has
# any non-whitespace, n_words = whitespace-token count of the trimmed
# segment (DuckDB's parallel unnests zip positionally, giving the same
# (segment, index) pairs).  The oracle trims the same character set
# str.strip() does (space, \t, \n, \r, \v, \f) — bare DuckDB trim() strips
# only spaces, which would diverge on tab/newline-led segments (ADVICE r5).
@register(
    "udf_table_function",
    oracle=r"""
WITH segs AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(text, '\.')) AS seg,
         unnest(range(len(regexp_split_to_array(text, '\.')))) AS sent_idx
  FROM documents
  WHERE doc_id < 500
)
SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx,
       CAST(len(regexp_split_to_array(trim(seg, ' ' || chr(9) || chr(10)
                                               || chr(13) || chr(11)
                                               || chr(12)), '\s+'))
            AS INT) AS n_words
FROM segs
WHERE len(trim(seg, ' ' || chr(9) || chr(10) || chr(13) || chr(11)
                    || chr(12))) > 0
ORDER BY doc_id, sent_idx
""",
    tags=("b10.6",),
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, n_words int", useArrow=True)
    class SplitSentences:
        def eval(self, text: str):
            for i, seg in enumerate((text or "").split(".")):
                seg = seg.strip()
                if seg:
                    yield i, len(seg.split())

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    spark.udtf.register("split_sentences", SplitSentences)
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, s.sent_idx, s.n_words
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.sent_idx
    """)
