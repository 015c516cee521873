"""Staged-protocol pins for the round-11 promotions
(llm/staged_r11.py + operators/staged_r11.py).

Round 10 built these 23 shapes as STAGED (callable, oracle) payloads with
driver-identical differential tests here; round 11 promoted every entry
into the live registry (r10 verdict next-round #1).  The differential
coverage now runs through tests/test_oracle.py like every other
registered query (and the whole-registry plan sweep in tests/test_plans.py
absorbed the staged allowlist), so what remains here is the protocol
invariant — nothing may be both staged and registered, and the promotion
must actually have landed — plus the invocation-stability and store-level
contracts that SQL equivalence alone can't express.
"""

from __future__ import annotations

from json_sql_database_storage_spark.llm.staged_r11 import (
    STAGED as LLM_STAGED,
)
from json_sql_database_storage_spark.operators.staged_r11 import (
    STAGED as OPS_STAGED,
)

_PROMOTED = (
    # operators/staged_r11.py
    "q2_min_cost_supplier", "q11_important_stock", "q_supplier_churn",
    "window_inter_event_gap", "doc_vacuum_family", "q_nation_trade_balance",
    "q_brand_monthly_movers", "q9_product_type_profit",
    "events_weekday_profile", "q_order_size_histogram",
    "q_discount_quantity_corr", "q_ship_latency_p95",
    # llm/staged_r11.py
    "dedup_cluster_size_histogram", "sample_reservoir_global",
    "sim_dimension_profile", "text_doc_length_gini", "sim_label_purity",
    "text_zipf_slope", "stream_index_maintenance",
    "sample_weighted_no_replacement", "sim_ann_recall_curve",
    "text_source_overlap", "stream_vector_index_maintenance",
)


def test_round11_promotion_landed():
    from json_sql_database_storage_spark import registry

    registry.load_all()
    specs = registry.specs()
    missing = [n for n in _PROMOTED if n not in specs]
    assert not missing, f"promotion incomplete: {missing}"
    # every promoted query kept its oracle (full hash-check, not rows-only)
    no_oracle = [n for n in _PROMOTED if specs[n].oracle is None]
    assert not no_oracle, no_oracle


def test_nothing_both_staged_and_registered():
    assert LLM_STAGED == {} and OPS_STAGED == {}, (
        "drop the STAGED entry after promoting it")


def test_staged_movers_uses_take_ordered(spark, sf_dir):
    """The global top-k is TakeOrderedAndProject (per-partition heaps),
    never a global sort — the property that bounds shuffle bytes to
    O(k × partitions) at any fact-table size."""
    from json_sql_database_storage_spark.operators.staged_r11 import (
        q_brand_monthly_movers,
    )
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    plan = explain_formatted(q_brand_monthly_movers(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_stream_index_maintenance_invocation_stable(spark, sf_dir):
    """The streaming exhibit rebuilds its index and replays the SAME two
    CDF batches from a fresh staged dir on every call — so a second
    invocation (bench reruns, the driver after pytest) must return the
    identical frame, not a doubly-applied one."""
    from json_sql_database_storage_spark.llm.staged_r11 import (
        stream_index_maintenance,
    )

    first = [tuple(r) for r in
             stream_index_maintenance(spark, sf_dir).collect()]
    assert first
    second = [tuple(r) for r in
              stream_index_maintenance(spark, sf_dir).collect()]
    assert second == first


def test_stream_vector_index_maintenance_invocation_stable(
        spark, sf_dir):
    """The vector twin's stability pin: rebuild + same-batch replay from
    a fresh staged dir must return the identical frame."""
    from json_sql_database_storage_spark.llm.staged_r11 import (
        stream_vector_index_maintenance,
    )

    first = [tuple(r) for r in
             stream_vector_index_maintenance(spark, sf_dir).collect()]
    assert first
    second = [tuple(r) for r in
              stream_vector_index_maintenance(spark, sf_dir).collect()]
    assert second == first


def test_vacuum_family_expired_the_floor(spark, sf_dir, tmp_path):
    """The exhibit's GC claim, asserted at the store level: after the
    exhibit's save/save/save/vacuum_family sequence, family v0 is expired
    (ValueError) while the retained versions read end-to-end — the vacuum
    actually happened.  The exhibit itself is invocation-stable (fresh
    store per call), pinned by the double collect."""
    import pytest as _p

    from json_sql_database_storage_spark.documents.fixtures import docs_df
    from json_sql_database_storage_spark.documents.store import DocumentStore
    from json_sql_database_storage_spark.operators.staged_r11 import (
        _VFAM_DOCS, doc_vacuum_family,
    )

    rows = [tuple(r) for r in doc_vacuum_family(spark, sf_dir).collect()]
    assert [r[0] for r in rows] == [1, 2, 2]     # retained versions only
    # invocation-stable: a second run returns the identical frame
    assert [tuple(r) for r in
            doc_vacuum_family(spark, sf_dir).collect()] == rows

    store = DocumentStore(spark, str(tmp_path / "vfam_store"))
    for batch in _VFAM_DOCS:
        store.save_docs(docs_df(spark, batch), "vfam")
    store.vacuum_family("vfam", keep_last=2, min_age_seconds=0)
    assert store.read_family("vfam", "pay", 2).count() > 0
    with _p.raises(ValueError):
        store.family_tables("vfam", 0)
