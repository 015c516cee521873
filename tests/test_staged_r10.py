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
from pyspark.sql import functions as F

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


def test_zero_variance_frame_matches_oracle(spark, tmp_path):
    """r10 review: the divide-by-zero divergence class AT ITS TRIGGER —
    a user with 7+ equal-cent events makes the rolling frame's variance
    0; unguarded, Spark's 0.0/0.0 = NaN PASSES the z*z > 4 filter (NaN
    compares greater than everything) while DuckDB's NULL division drops
    the row.  Both engines must drop it."""
    import duckdb

    from json_sql_database_storage_spark.operators.staged_r10 import (
        _ZSCORE_SQL, window_rolling_zscore,
    )

    rows = (
        # user 1: 10 constant-value events → zero-variance frames only
        [(i, f"2024-01-01 00:{i:02d}:00", 1, "view", 5.0, "{}")
         for i in range(10)]
        # user 2: a genuine outlier so the result is non-empty
        + [(100 + i, f"2024-01-01 01:{i:02d}:00", 2, "view",
            1.0 if i < 9 else 500.0, "{}") for i in range(10)]
    )
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
              "event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)

    spark_pdf = window_rolling_zscore(spark, str(tmp_path)).toPandas()
    assert (spark_pdf["user_id"] == 1).sum() == 0, (
        "zero-variance frames must not emit rows")
    assert len(spark_pdf) > 0, "the genuine outlier must survive"

    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * "
                    f"FROM read_parquet('{path}/*.parquet')")
        oracle_pdf = con.execute(_ZSCORE_SQL).df()
    finally:
        con.close()
    from .compare import assert_frames_match
    assert_frames_match(spark_pdf, oracle_pdf,
                        name="window_rolling_zscore/zero-variance")


def test_regular_graph_assortativity_matches_oracle(spark, tmp_path):
    """r10 review: the degenerate twin — a REGULAR co-purchase graph
    (every order the same two parts → all degrees equal) zeroes the
    correlation denominator; Spark must emit NULL like DuckDB, not NaN."""
    import duckdb

    from json_sql_database_storage_spark.operators.staged_r10 import (
        _ASSORT_SQL, graph_degree_assortativity,
    )

    rows = [(o, p) for o in range(1, 6) for p in (10, 20)]
    df = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    path = str(tmp_path / "lineitem.parquet")
    df.write.mode("overwrite").parquet(path)

    spark_pdf = graph_degree_assortativity(spark, str(tmp_path)).toPandas()
    assert len(spark_pdf) == 1
    assert spark_pdf["assortativity"].isna().all(), (
        "regular graph: assortativity undefined → NULL, never NaN-row")

    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW lineitem AS SELECT * "
                    f"FROM read_parquet('{path}/*.parquet')")
        oracle_pdf = con.execute(_ASSORT_SQL).df()
    finally:
        con.close()
    from .compare import assert_frames_match
    assert_frames_match(spark_pdf, oracle_pdf,
                        name="graph_degree_assortativity/regular-graph")
