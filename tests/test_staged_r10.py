"""Staged-protocol pins for the round-10 promotions
(llm/staged_r10.py + operators/staged_r10.py).

Round 9 built these 14 shapes as STAGED (callable, oracle) payloads with
driver-identical differential tests here; round 10 promoted every entry
into the live registry (r9 verdict next-round #1 and #5).  The
differential coverage now runs through tests/test_oracle.py like every
other registered query (and the whole-registry plan sweep in
tests/test_plans.py absorbed the staged allowlist), so what remains here
is the protocol invariant — nothing may be both staged and registered,
and the promotion must actually have landed — plus the plan-shape and
crash-consistency contracts that SQL equivalence alone can't express.
"""

from __future__ import annotations

import pytest

from json_sql_database_storage_spark.llm.staged_r10 import (
    STAGED as LLM_STAGED,
)
from json_sql_database_storage_spark.operators.staged_r10 import (
    STAGED as OPS_STAGED,
)

_PROMOTED = (
    # operators/staged_r10.py
    "graph_degree_assortativity", "graph_degree_histogram",
    "events_anomaly_mad", "window_rolling_zscore", "sql_lateral_unnest",
    "stream_scd2_enrichment", "doc_family_read", "doc_quarantine",
    "q_customer_pareto", "window_streak_detection",
    # llm/staged_r10.py
    "text_index_maintenance", "text_ngram_novelty", "text_code_detection",
    "sample_token_budget_epochs",
)


def test_round10_promotion_landed():
    from json_sql_database_storage_spark import registry

    registry.load_all()
    specs = registry.specs()
    missing = [n for n in _PROMOTED if n not in specs]
    assert not missing, f"staged queries never registered: {missing}"
    without_oracle = [n for n in _PROMOTED if specs[n].oracle is None]
    assert not without_oracle, without_oracle


def test_staged_names_do_not_collide_with_registry():
    from json_sql_database_storage_spark import registry

    registry.load_all()
    overlap = (set(LLM_STAGED) | set(OPS_STAGED)) & set(registry.specs())
    assert not overlap, (
        f"staged queries already registered: {sorted(overlap)} — drop the "
        f"STAGED entry after promoting one")


def test_staged_dicts_emptied_after_promotion():
    assert not LLM_STAGED and not OPS_STAGED


def test_zscore_runs_in_one_window_operator(spark, sf_dir):
    """All three frame aggregates (n, Σx, Σx²) evaluate inside ONE Window
    operator — single user_id exchange + one sort, the
    window_ewma_smoothing contract."""
    from json_sql_database_storage_spark.operators.staged_r10 import (
        window_rolling_zscore,
    )

    plan = (window_rolling_zscore(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Window ") == 1


def test_family_read_consistent_after_partial_failure(
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
