"""Differential tests for the round-10-staged operators
(llm/staged_r10.py + operators/staged_r10.py): every STAGED entry runs its
Spark plan against its DuckDB oracle through the SAME compare machinery
the driver uses — at sf0.001 on every suite run via the session fixtures,
and at sf0.01 in the slow marker — so registering them next round is a
dict-entry move, not new verification."""

from __future__ import annotations

import os

import duckdb
import pytest

from json_sql_database_storage_spark.llm.staged_r10 import (
    STAGED as LLM_STAGED,
)
from json_sql_database_storage_spark.operators.staged_r10 import (
    STAGED as OPS_STAGED,
)

from .compare import assert_frames_match

ALL_STAGED = {**LLM_STAGED, **OPS_STAGED}


def test_no_name_collisions():
    assert not set(LLM_STAGED) & set(OPS_STAGED)


def test_staged_names_do_not_collide_with_registry():
    from json_sql_database_storage_spark import registry

    registry.load_all()
    overlap = set(ALL_STAGED) & set(registry.specs())
    assert not overlap, (
        f"staged queries already registered: {sorted(overlap)} — drop the "
        f"STAGED entry after promoting one")


@pytest.mark.parametrize("name", sorted(ALL_STAGED))
def test_staged_matches_oracle(spark, duck, sf_dir, name):
    fn, oracle = ALL_STAGED[name]
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(oracle).df()
    assert len(spark_pdf) > 0, f"{name}: empty result proves nothing"
    assert_frames_match(spark_pdf, oracle_pdf, name=name)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(ALL_STAGED))
def test_staged_matches_oracle_sf0_01(spark, name):
    """The driver checks at sf0.01 — run the identical compare there too
    (the staging protocol's 'verified at sf0.001 AND sf0.01' claim, made
    literal)."""
    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        from json_sql_database_storage_spark.sources import TABLES

        for t in TABLES:
            path = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * "
                            f"FROM read_parquet('{path}')")
        fn, oracle = ALL_STAGED[name]
        spark_pdf = fn(spark, sf).toPandas()
        oracle_pdf = con.execute(oracle).df()
        assert len(spark_pdf) > 0
        assert_frames_match(spark_pdf, oracle_pdf, name=name)
    finally:
        con.close()


def test_staged_no_unintended_scale_flags(spark, sf_dir):
    """The registry plan sweep only sees registered queries — run the same
    sweep over the STAGED payloads NOW so promotion is a dict move, not a
    plan-shape surprise.  Allowlist mirrors the registered conventions:
    1-row scalar-aggregate exchanges (map-side partials) and bounded
    fixture inputs."""
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    allow = {
        "CartesianProduct": set(),
        "BatchEvalPython": set(),
        "SinglePartition": {
            # 1-row six-moment census (map-side partials — one row per
            # input partition, constant bytes at any graph size)
            "graph_degree_assortativity",
            # 1-row corpus doc-count scalar (the text_vocab_growth shape)
            "text_ngram_novelty",
            # ordered-fold denominator scalar (the sample_domain_mixture
            # shape)
            "sample_token_budget_epochs",
            # the O(1) ten-decile cumulative window (text_vocab_growth's
            # allowlisted shape) — the RANKING itself is two-pass bucketed,
            # never single-partition
            "q_customer_pareto",
            # fixture-literal family docs (the scan_in_memory precedent)
            "doc_family_read",
            # the probe's ≤k-row final rank window + 1-row stats broadcast
            # (the registered text_bm25_topk's allowlisted shape)
            "text_index_maintenance",
        },
    }
    bad = []
    for name, (fn, _) in sorted(ALL_STAGED.items()):
        if name.startswith("stream_"):
            continue    # streaming replays execute eagerly; skip explain
        plan = explain_formatted(fn(spark, sf_dir))
        for label in allow:
            if label in plan and name not in allow[label]:
                bad.append((name, label))
    assert not bad, bad


def test_staged_zscore_runs_in_one_window_operator(spark, sf_dir):
    """All three frame aggregates (n, Σx, Σx²) evaluate inside ONE Window
    operator — single user_id exchange + one sort, the
    window_ewma_smoothing contract."""
    from json_sql_database_storage_spark.operators.staged_r10 import (
        window_rolling_zscore,
    )

    plan = (window_rolling_zscore(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Window ") == 1


def test_staged_family_read_consistent_after_partial_failure(
        spark, sf_dir, tmp_path, monkeypatch):
    """The exhibit's claim under fire: if a later save_docs crashes
    between child commits, doc_family_read's pinned-version reads still
    return exactly the committed families (the store-level crash test,
    re-run through the query's own read path)."""
    from json_sql_database_storage_spark.documents.fixtures import docs_df
    from json_sql_database_storage_spark.documents.store import DocumentStore
    from json_sql_database_storage_spark.operators.staged_r10 import (
        _FAMX_V0, doc_family_read,
    )

    before = [tuple(r) for r in doc_family_read(spark, sf_dir).collect()]

    orig = DocumentStore.upsert
    calls = {"n": 0}

    def boom(self, df, table):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected crash between child commits")
        return orig(self, df, table)

    monkeypatch.setattr(DocumentStore, "upsert", boom)
    from json_sql_database_storage_spark.operators.scans import _sink

    store = DocumentStore(spark, _sink("doc_family_store", spark))
    with pytest.raises(RuntimeError, match="injected crash"):
        store.save_docs(docs_df(spark, _FAMX_V0), "famx")
    monkeypatch.setattr(DocumentStore, "upsert", orig)

    after = [tuple(r) for r in doc_family_read(spark, sf_dir).collect()]
    assert after == before
