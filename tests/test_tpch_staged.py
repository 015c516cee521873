"""Staged-protocol pins for operators/tpch_staged.py.

Round 7 built these ten TPC-H shapes as STAGED (callable, oracle) payloads
with driver-identical differential tests here; round 8 promoted every
entry into the live registry (r7 verdict next-round #1).  The differential
coverage now runs through tests/test_oracle.py like every other registered
query, so what remains here is the protocol invariant: nothing may be both
staged and registered, and the promotion must actually have landed.
"""

from __future__ import annotations

from json_sql_database_storage_spark.operators.tpch_staged import STAGED

_PROMOTED = (
    "q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_parts_supplier", "q17_small_quantity_revenue",
    "q22_global_sales_opportunity",
)


def test_round8_promotion_landed():
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
    overlap = set(STAGED) & set(registry.specs())
    assert not overlap, (
        f"staged queries already registered: {sorted(overlap)} — drop the "
        f"STAGED entry after promoting one")
