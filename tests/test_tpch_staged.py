"""Differential tests for the round-8-staged TPC-H shapes
(operators/tpch_staged.py): every STAGED entry runs its Spark plan against
its DuckDB oracle through the SAME compare machinery the driver uses, so
registering them next round is a dict-entry move, not new verification."""

from __future__ import annotations

import pytest

from json_sql_database_storage_spark.operators.tpch_staged import STAGED

from .compare import assert_frames_match


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_matches_oracle(spark, duck, sf_dir, name):
    fn, oracle = STAGED[name]
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(oracle).df()
    assert len(spark_pdf) > 0, f"{name}: empty result proves nothing"
    assert_frames_match(spark_pdf, oracle_pdf, name=name)


def test_staged_names_do_not_collide_with_registry():
    from json_sql_database_storage_spark import registry

    registry.load_all()
    overlap = set(STAGED) & set(registry.specs())
    assert not overlap, (
        f"staged queries already registered: {sorted(overlap)} — drop the "
        f"STAGED entry after promoting one")
