"""Inverted text index as a partitioned layout (SURVEY.md §2 b11.27, r5).

The text-retrieval sibling of the IVF vector index (similarity.py:493 —
same build/probe contract): BUILD writes posting rows (term, doc_id, tf)
partitioned by a term hash-bucket; PROBE joins the query's terms against
the index on the partition column, so a query touches only its terms'
bucket directories — at 100 TB the index is thousands of bucket dirs and a
2-term query reads ≤ 2 of them (the literal terms' buckets constant-fold
into a static PartitionFilter on the scan, plan-asserted in
tests/test_plans.py).  Conjunctive (AND) semantics: a doc matches when
every query term's posting list contains it.

Scale notes:
- The posting build is one explode + one (term, doc_id) groupBy — the same
  shuffle text_top_terms already runs; the bucket column adds no shuffle
  (hash of the key already in hand).
- Bucketing by xxhash64(term) % B bounds directory count at B regardless of
  vocabulary size; skew (a stop-word bucket) is bounded per-bucket and the
  probe's residual `term =` equi-join discards non-query terms at the scan.
- The probe side is a literal handful of rows — broadcast, never shuffled.

The oracle recomputes the same conjunctive match by brute-force token scan;
tf counts are exact integers, so the comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .text_analysis import tokens

_QUERY_TERMS = ("join", "vector")
_IDX_BUCKETS = 64


def build_inverted_index(docs: DataFrame) -> DataFrame:
    """Posting rows (bkt, term, doc_id, tf) ready for a
    partitionBy('bkt') write.

    tf is computed MAP-SIDE inside the row (distinct terms × an array
    count — O(u·n) per document, all JVM higher-order functions), so the
    build's only shuffle is the caller's repartition-by-bucket for the
    write; a groupBy(term, doc_id) formulation would shuffle every posting
    twice."""
    toks = tokens(F.col("text"))
    entry = F.explode(F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            t.alias("term"),
            F.size(F.filter(toks, lambda x: x == t)).cast("bigint")
             .alias("tf"))))
    return (
        docs.select("doc_id", entry.alias("e"))
        .select("doc_id", F.col("e.term").alias("term"),
                F.col("e.tf").alias("tf"))
        .withColumn("bkt", F.pmod(F.xxhash64("term"), F.lit(_IDX_BUCKETS))
                    .cast("int"))
    )


@register(
    "text_inverted_index_search",
    oracle=rf"""
WITH w AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
  FROM documents
), hits AS (
  SELECT doc_id, term, count(*) AS tf
  FROM w WHERE term IN ('{_QUERY_TERMS[0]}', '{_QUERY_TERMS[1]}')
  GROUP BY doc_id, term
)
SELECT doc_id,
       count(*) AS n_terms_matched,
       CAST(sum(tf) AS BIGINT) AS total_tf
FROM hits
GROUP BY doc_id
HAVING count(*) = {len(_QUERY_TERMS)}
ORDER BY doc_id
""",
    tags=("b11.27",),
)
def text_inverted_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing ALL query terms, found through the bucket-partitioned
    inverted index: build → partitioned write → pruned probe join."""
    from ..operators.scans import _sink

    docs = load_table(spark, sf_dir, "documents")
    index_path = _sink("inv_index", spark)
    # one task per bucket before the partitioned write — otherwise every
    # task writes a sliver of every bucket directory (tasks × B small
    # files; the classic partitionBy file explosion)
    (build_inverted_index(docs)
     .repartition(_IDX_BUCKETS, "bkt")
     .write.mode("overwrite").partitionBy("bkt").parquet(index_path))

    idx = spark.read.parquet(index_path)
    # the query terms are literals, so their buckets constant-fold at plan
    # time: the scan carries a STATIC PartitionFilter on bkt (plan-asserted
    # in tests/test_plans.py) — only the query terms' directories are read,
    # no runtime subquery needed
    bkt_pred = None
    for t in _QUERY_TERMS:
        e = (F.col("bkt")
             == F.pmod(F.xxhash64(F.lit(t)), F.lit(_IDX_BUCKETS)).cast("int"))
        bkt_pred = e if bkt_pred is None else (bkt_pred | e)
    qterms = spark.createDataFrame([(t,) for t in _QUERY_TERMS], "term string")
    # residual exact-term equi-join discards same-bucket non-query terms
    hits = idx.filter(bkt_pred).join(F.broadcast(qterms), "term")
    return (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms_matched"),
             F.sum("tf").cast("bigint").alias("total_tf"))
        .filter(F.col("n_terms_matched") == len(_QUERY_TERMS))
        .orderBy("doc_id")
    )
