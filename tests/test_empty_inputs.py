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


def test_r5_primitives_on_empty_inputs(spark, sf_dir):
    """Round-5 library primitives: empty in → empty out with the right
    schema, no exceptions."""
    from json_sql_database_storage_spark.llm.pq import pq_encode, subvectors
    from json_sql_database_storage_spark.llm.search import (
        build_inverted_index)
    from json_sql_database_storage_spark.llm.sketches import mg_candidates
    from json_sql_database_storage_spark.operators.analytics import (
        fingerprint_orders)
    from json_sql_database_storage_spark.operators.snapshots import merge_cow

    empty_docs = (load_table(spark, sf_dir, "documents")
                  .filter(F.col("doc_id") < 0))
    idx = build_inverted_index(empty_docs)
    assert idx.count() == 0
    assert set(idx.columns) == {"term", "doc_id", "tf", "bkt"}

    empty_words = empty_docs.select(F.lit("x").alias("term")).filter("1=0")
    assert mg_candidates(empty_words, 10).count() == 0

    empty_vecs = (load_table(spark, sf_dir, "embeddings")
                  .filter(F.col("vec_id") < 0)
                  .select("vec_id", as_double(F.col("embedding")).alias("e")))
    subs = subvectors(empty_vecs)
    assert subs.count() == 0
    cb = subs.select(F.col("vec_id").alias("c_id"), "m",
                     F.col("sub").alias("csub"))
    assert pq_encode(subs, cb).count() == 0

    empty_orders = (load_table(spark, sf_dir, "orders")
                    .filter(F.col("o_orderkey") < 0))
    assert fingerprint_orders(empty_orders).count() == 0

    ed = empty_orders.select("o_orderkey",
                             F.lit(0).cast("int").alias("o_year"),
                             F.lit(0).cast("bigint").alias("cents"))
    assert merge_cow(ed, ed).count() == 0


def test_r6_primitives_on_empty_inputs(spark, sf_dir):
    """Round-6 library primitives: empty in → empty out with the right
    schema, no exceptions — codebook training, positional postings, CMS
    counters."""
    from json_sql_database_storage_spark.llm.pq import (
        _pq_assign, subvectors, train_codebooks)
    from json_sql_database_storage_spark.llm.search import (
        build_positional_index)
    from json_sql_database_storage_spark.llm.similarity import as_double
    from json_sql_database_storage_spark.llm.sketches import cms_counters

    v = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("vec_id") < 0)
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    subs = subvectors(v)
    cb = train_codebooks(subs, 16)
    assert cb.count() == 0
    assert cb.columns == ["m", "c_id", "csub"]
    assert _pq_assign(subs, cb).count() == 0

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 0))
    pos = build_positional_index(docs)
    assert pos.count() == 0
    assert set(pos.columns) == {"doc_id", "term", "pos", "bkt"}

    toks = docs.select(F.lit("x").alias("term")).filter(F.lit(False))
    assert cms_counters(toks).count() == 0


def test_expire_keep_last_exceeding_versions_deletes_nothing(spark, sf_dir):
    """expire(keep_last >= #versions) must be a no-op: nothing deleted,
    every version still resolvable through the rewritten log."""
    import os

    from json_sql_database_storage_spark.operators.scans import _sink
    from json_sql_database_storage_spark.operators.snapshots import (
        expire_snapshots, load_manifests, snapshot_commit)

    name = "snapshot_noop_exp"
    root = _sink(name, spark)
    manifests = snapshot_commit(spark, sf_dir, name=name)
    info = expire_snapshots(root, manifests, keep_last=5)
    assert info["deleted_dirs"] == []
    assert sorted(load_manifests(root)) == sorted(manifests)
    assert all(os.path.exists(p) for m in manifests.values()
               for p in m.values())


def test_r7_primitives_on_empty_inputs(spark, sf_dir, tmp_path):
    """Round-7 primitives: empty in → empty out, no exceptions — BPE
    train/encode over an empty corpus, deep PageRank over an empty graph,
    residual codebook training (iters=2) over no vectors; and the expiry
    root-confinement guard refuses a poisoned manifest path."""
    import pytest as _pytest

    from json_sql_database_storage_spark.llm.bpe import _train_word_types
    from json_sql_database_storage_spark.llm.pq import (subvectors,
                                                        train_codebooks)
    from json_sql_database_storage_spark.llm.similarity import as_double
    from json_sql_database_storage_spark.operators.graph import pagerank_ranks
    from json_sql_database_storage_spark.operators.snapshots import (
        expire_snapshots)

    # BPE on an empty corpus: both returned frames are empty, not errors.
    # (monkeypatch-free: _train_word_types reads `documents` itself, so
    # drive it through an empty VIEW of the same shape instead)
    empty_docs = (load_table(spark, sf_dir, "documents")
                  .filter(F.col("doc_id") < 0))
    import json_sql_database_storage_spark.llm.bpe as bpe_mod
    orig = bpe_mod.load_table
    bpe_mod.load_table = lambda s, d, n: empty_docs
    try:
        enc, merges = _train_word_types(spark, sf_dir)
        assert enc.count() == 0
        assert merges.count() == 0
    finally:
        bpe_mod.load_table = orig

    # residual-depth codebook training over no vectors
    v = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("vec_id") < 0)
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    cb = train_codebooks(subvectors(v), 16, iters=2)
    assert cb.count() == 0

    # deep PageRank over an empty graph: zero rank rows, loop still runs
    # (pagerank_ranks resolves load_table from the sources package at call
    # time, so patching the package attribute is enough)
    import json_sql_database_storage_spark.sources as src_pkg
    real_lt = src_pkg.load_table
    src_pkg.load_table = lambda s, d, n: real_lt(s, d, n).limit(0)
    try:
        ranks = pagerank_ranks(spark, sf_dir, 3, checkpoint_every=2)
        assert ranks.count() == 0
    finally:
        src_pkg.load_table = real_lt

    # expiry confinement: a manifest pointing outside root must raise
    # BEFORE anything is deleted
    outside = tmp_path / "outside"
    outside.mkdir()
    with _pytest.raises(ValueError):
        expire_snapshots(str(tmp_path / "root"),
                         {0: {1995: str(outside)}, 1: {}}, keep_last=1)
    assert outside.exists()


def test_store_constraints_and_clone_on_empty_states(spark, tmp_path):
    """r8 verbs at the degenerate states a first crawl hits: an EMPTY
    delta passes constraint validation and commits cleanly (no touched
    buckets — the manifest just re-references every prior dir), and a
    table whose current version is fully emptied still shallow-clones
    (the clone reads as a typed empty DataFrame via the manifest-recorded
    schema)."""
    from json_sql_database_storage_spark.documents.fixtures import docs_df
    from json_sql_database_storage_spark.documents.store import DocumentStore

    store = DocumentStore(spark, str(tmp_path / "collections"), n_buckets=2)
    base = docs_df(spark, [{"rowNum": k, "name": f"n{k}", "v": k}
                           for k in (1, 2, 3)])
    store.upsert(base, "things")                                       # v0
    store.add_constraint("things", "pos", "v >= 0")                    # v1
    empty = base.filter("rowNum < 0")
    store.append(empty, "things")                                      # v2
    store.upsert(empty, "things")                                      # v3
    assert store.version("things") == 3
    assert store.read("things").count() == 3
    # empty the table, then clone the empty version
    store.delete(base.select("rowNum"), "things")                      # v4
    assert store.read("things").count() == 0
    store.clone("things", "things_empty")
    out = store.read("things_empty")
    assert out.count() == 0 and "name" in out.columns


def test_index_apply_changes_on_empty_cdf_is_noop(spark, sf_dir):
    """r9: the incremental-maintenance verbs must no-op cleanly on an
    empty change feed (the first crawl of an unchanged corpus): no
    tombstones written, stats unchanged, probe identical."""
    from json_sql_database_storage_spark.llm.pq import (
        _IPQ_NQ, ivfpq_apply_changes, ivfpq_build, ivfpq_probe)
    from json_sql_database_storage_spark.llm.search import (
        _BM25_TERMS, _BM25_TOPK, bm25_apply_changes, bm25_build, bm25_probe)
    from json_sql_database_storage_spark.llm.similarity import as_double

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = bm25_build(spark, docs, "bm25_empty_cdf")
    from json_sql_database_storage_spark.llm.search import (
        _bm25_manifest, _bm25_tomb, bm25_stats)

    want = [tuple(r) for r in
            bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()]
    s0 = bm25_stats(spark, paths)
    bm25_apply_changes(spark, paths, docs.limit(0),
                       docs.select("doc_id").limit(0))
    assert [tuple(r) for r in
            bm25_probe(spark, paths, _BM25_TERMS, _BM25_TOPK).collect()] \
        == want
    assert bm25_stats(spark, paths) == s0
    assert _bm25_tomb(spark, paths, _bm25_manifest(paths)).count() == 0

    v = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("e")))
    q = (v.filter(F.col("vec_id") < _IPQ_NQ)
         .select(F.col("vec_id").alias("query_id"), "e"))
    vpaths = ivfpq_build(spark, v, "ivfpq_empty_cdf")
    vwant = [tuple(r) for r in ivfpq_probe(spark, vpaths, q, v).collect()]
    ivfpq_apply_changes(spark, vpaths, v.limit(0),
                        v.select("vec_id").limit(0))
    assert [tuple(r) for r in
            ivfpq_probe(spark, vpaths, q, v).collect()] == vwant
    from json_sql_database_storage_spark.llm.pq import (_ivfpq_manifest,
                                                        _ivfpq_tomb)

    assert _ivfpq_tomb(spark, vpaths, _ivfpq_manifest(vpaths)).count() == 0
