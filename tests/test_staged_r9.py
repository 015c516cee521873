"""Differential tests for the round-9-staged operators
(llm/staged_r9.py + operators/staged_r9.py): every STAGED entry runs its
Spark plan against its DuckDB oracle through the SAME compare machinery
the driver uses — at sf0.001 on every suite run via the session fixtures,
and at sf0.01 in the slow marker — so registering them next round is a
dict-entry move, not new verification."""

from __future__ import annotations

import os

import duckdb
import pytest

from json_sql_database_storage_spark.llm.staged_r9 import STAGED as LLM_STAGED
from json_sql_database_storage_spark.operators.staged_r9 import (
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
def test_staged_matches_oracle_sf001(spark, name):
    """The driver checks at sf0.01 — run the identical compare there too
    (the round-7 staging protocol's 'verified at sf0.001 AND sf0.01'
    claim, made literal)."""
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
