"""Degenerate-input robustness: the library primitives must return empty
results (correct schema, no exceptions) on empty inputs — the state every
incremental/partitioned 100-TB run hits on its first batch, an empty
partition, or a filter that matches nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_sql_database_storage_spark.llm.clustering import (
    assign_cells, semdedup_pairs)
from json_sql_database_storage_spark.llm.dedup import lsh_candidate_pairs
from json_sql_database_storage_spark.llm.multimodal import extract_features
from json_sql_database_storage_spark.llm.similarity import as_double
from json_sql_database_storage_spark.sources import load_table


def test_clustering_on_empty_embedding_set(spark, sf_dir):
    v = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("vec_id") < 0)
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    assigned = assign_cells(v, 8)
    assert assigned.count() == 0
    assert assigned.columns == ["vec_id", "e", "cluster"]
    assert semdedup_pairs(assigned).count() == 0


def test_lsh_banding_on_empty_corpus(spark, sf_dir):
    docs = spark.createDataFrame(
        [], "doc_id BIGINT, sig ARRAY<BIGINT>")
    pairs = lsh_candidate_pairs(docs)
    assert pairs.count() == 0
    assert pairs.columns == ["id_a", "id_b"]


def test_feature_extraction_on_empty_media(spark, sf_dir):
    from json_sql_database_storage_spark.llm.multimodal import synthetic_media

    media = synthetic_media(spark, sf_dir).filter(F.col("doc_id") < 0)
    out = extract_features(media)
    assert out.count() == 0
    assert "checksum" in out.columns
