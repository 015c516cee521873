"""Multimodal column support (SURVEY.md §2 B11.8 + BASELINE.json mandate).

Design: image/audio/video payloads are opaque BinaryType columns with a
typed metadata struct beside them — the lakehouse-standard layout (payload
bytes stay columnar; metadata is filterable/prunable without touching the
bytes).  Decode/feature-extraction runs as Arrow-batched pandas iterators
(mapInPandas): one Python worker per partition, whole Arrow batches in
memory, no per-row serialization.

The container has no image/audio libraries (by design), so the actual codec
step is STUBBED: `decode_image_batch` raises NotImplementedError when a real
decoder is requested, and the default pipeline uses a deterministic fake
decoder (header parse of the synthetic payload) so the Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and tested.

The synthetic payloads are derived deterministically from documents.text
(sha256-seeded bytes), so every engine/run sees identical binaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# feature schema produced by the (fake) decoder
_FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes INT, "
    "width INT, height INT, checksum BIGINT"
)


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload BINARY, meta STRUCT) — payload is 64
    deterministic pseudo-random bytes; meta mimics an image header."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.unhex(F.concat(F.sha2(F.col("text"), 256),
                               F.sha2(F.concat(F.col("text"), F.lit("2")), 256)))
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("content_type"),
            (F.pmod(F.col("doc_id"), F.lit(4)) * 64 + 64).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(3)) * 64 + 64).cast("int").alias("height"),
            F.col("lang").alias("source_lang"),
        ).alias("meta"),
    )


def decode_image_batch(payloads: pd.Series, *, real: bool = False) -> pd.DataFrame:
    """STUB decode step.  real=True is the integration point for an actual
    codec (PIL/libvips) — not available in this container."""
    if real:
        raise NotImplementedError(
            "real image decoding requires an image library not present in "
            "this environment; wire PIL/libvips here on a full cluster")
    # deterministic fake: length + first-8-bytes checksum
    return pd.DataFrame({
        "n_bytes": payloads.str.len().astype("int32"),
        "checksum": payloads.map(
            lambda b: int.from_bytes(b[:8], "big", signed=True)),
    })


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows out."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_image_batch(pdf["payload"])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["meta"].map(lambda m: m["content_type"]),
                "n_bytes": feats["n_bytes"],
                "width": pdf["meta"].map(lambda m: m["width"]),
                "height": pdf["meta"].map(lambda m: m["height"]),
                "checksum": feats["checksum"],
            })
    return df.mapInPandas(run, _FEATURE_SCHEMA)


# b11.8 — binary payload + typed metadata + Arrow-batched feature extraction.
# The fake decoder is sha256-derived, so DuckDB can recompute every feature:
# checksum = first 8 payload bytes = first 16 hex chars of sha256(text),
# reinterpreted as signed big-endian int64.
@register(
    "mm_feature_extract",
    oracle="""
WITH h AS (
  SELECT doc_id, ('0x' || substr(sha256(text), 1, 16))::UBIGINT AS u
  FROM documents
)
SELECT doc_id,
       'image/fake' AS media_type,
       64 AS n_bytes,
       CAST((doc_id % 4) * 64 + 64 AS INT) AS width,
       CAST((doc_id % 3) * 64 + 64 AS INT) AS height,
       CASE WHEN u >= 9223372036854775808
            THEN CAST(u::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
            ELSE CAST(u AS BIGINT) END AS checksum
FROM h
ORDER BY doc_id
""",
    tags=("b11.8", "b10.5"),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, sf_dir)
    return extract_features(media).orderBy("doc_id")


# b11.8b — metadata-only analytics: filter/aggregate on the meta struct must
# prune the payload column entirely (nested-schema pruning; the scan reads
# bytes=0 of payload).  Oracle-checkable because payload is untouched.
@register(
    "mm_metadata_pruning",
    oracle="""
SELECT lang AS source_lang,
       count(*) AS n_assets,
       sum(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END) AS n_wide
FROM documents
GROUP BY lang
ORDER BY source_lang
""",
    tags=("b11.8",),
)
def mm_metadata_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, sf_dir)
    return (
        media.groupBy(F.col("meta.source_lang").alias("source_lang"))
        .agg(F.count(F.lit(1)).alias("n_assets"),
             F.sum(F.when(F.col("meta.width") == 256, 1).otherwise(0))
              .alias("n_wide"))
        .orderBy("source_lang")
    )
