"""Staged-protocol pins for the round-9 promotions
(llm/staged_r9.py + operators/staged_r9.py).

Round 8 built these 29 shapes as STAGED (callable, oracle) payloads with
driver-identical differential tests here; round 9 promoted every entry
into the live registry (r8 verdict next-round #1).  The differential
coverage now runs through tests/test_oracle.py like every other
registered query (and the whole-registry plan sweep in tests/test_plans.py
absorbed the staged allowlist), so what remains here is the protocol
invariant — nothing may be both staged and registered, and the promotion
must actually have landed — plus the three plan-shape contracts that SQL
equivalence alone can't express.
"""

from __future__ import annotations

from json_sql_database_storage_spark.llm.staged_r9 import STAGED as LLM_STAGED
from json_sql_database_storage_spark.operators.staged_r9 import (
    STAGED as OPS_STAGED,
)

_PROMOTED = (
    # operators/staged_r9.py
    "q_copurchase_pairs", "graph_triangle_count", "snapshot_rollback",
    "events_transition_matrix", "graph_kcore", "window_cumulative_distinct",
    "graph_label_propagation", "window_ewma_smoothing", "q_basket_lift",
    "graph_connected_components", "stream_distinct_running",
    "scan_python_datasource", "stream_heavy_hitters",
    "window_rolling_median", "events_rfm_scores", "q_yearly_growth",
    "doc_merge",
    # llm/staged_r9.py
    "text_repetition_filter", "sample_domain_mixture", "sim_kcenter_coreset",
    "sample_cluster_balanced", "sim_mmr_rerank", "text_bigram_logprob",
    "dedup_containment", "sample_importance_weights", "text_token_entropy",
    "text_keyword_topk", "sim_embedding_drift", "text_vocab_growth",
)


def test_round9_promotion_landed():
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
    assert LLM_STAGED == {} and OPS_STAGED == {}


def test_keyword_topk_uses_window_group_limit(spark, sf_dir):
    """The COVERAGE claim made literal: the per-doc top-3 rank runs as
    WindowGroupLimit (rank limit pushed before the exchange), so the
    shuffle carries O(docs·k) rows — the top-N-per-group scale story."""
    from json_sql_database_storage_spark.llm.staged_r9 import (
        text_keyword_topk,
    )
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    plan = explain_formatted(text_keyword_topk(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_ewma_runs_in_one_window_operator(spark, sf_dir):
    """The EWMA kernel's scale claim made literal: all eight lag() reads
    evaluate inside ONE Window operator (single user_id exchange + one
    sort), not one window per lag."""
    from json_sql_database_storage_spark.operators.staged_r9 import (
        window_ewma_smoothing,
    )

    plan = (window_ewma_smoothing(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Window ") == 1


def test_pyds_scan_parallelism_equals_file_count(spark, sf_dir):
    """The custom Python data source's scale claim made literal: the scan
    produces one partition per chunk file, so a 1000-file layout reads
    1000-wide — exactly like the built-in file sources."""
    import os

    from json_sql_database_storage_spark.operators.scans import _sink
    from json_sql_database_storage_spark.sources import load_table
    from json_sql_database_storage_spark.sources.pyds import (
        register_jsondocs,
    )

    out = _sink("pyds_parallel", spark)
    (load_table(spark, sf_dir, "documents")
     .select("doc_id", "lang", "n_chars")
     .repartition(4).write.mode("overwrite").json(out))
    n_files = len([e for e in os.scandir(out)
                   if e.name.endswith(".json") and not e.name.startswith(".")])
    assert n_files == 4
    register_jsondocs(spark)
    df = spark.read.format("jsondocs").option("path", out).load()
    assert df.rdd.getNumPartitions() == n_files
    assert df.count() == load_table(spark, sf_dir, "documents").count()
