"""Differential tests for the round-13-staged operators
(llm/staged_r13.py + operators/staged_r13.py): every STAGED entry runs its
Spark plan against its DuckDB oracle through the SAME compare machinery
the driver uses — at sf0.001 on every suite run via the session fixtures,
and at sf0.01 in the slow marker — so registering them next round is a
dict-entry move, not new verification."""

from __future__ import annotations

import os

import duckdb
import pytest

from json_sql_database_storage_spark.llm.staged_r13 import (
    STAGED as LLM_STAGED,
)
from json_sql_database_storage_spark.operators.staged_r13 import (
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
    TakeOrdered samples."""
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    allow = {
        "CartesianProduct": set(),
        "BatchEvalPython": set(),
        "SinglePartition": {
            # k-row deterministic-hash sample (TakeOrdered heaps) feeding
            # the broadcast pair grid — ≤48 rows by construction
            "sim_inner_product_stats",
            # per-version 1-row scalar summaries over AS-OF reads
            # (the doc_restore / snapshot_* allowlisted shape)
            "doc_check_constraints",
            # 1-row corpus doc-count scalar + TakeOrdered top-k
            "text_first_token_census",
        },
    }
    bad = []
    for name, (fn, _) in sorted(ALL_STAGED.items()):
        plan = explain_formatted(fn(spark, sf_dir))
        for label in allow:
            if label in plan and name not in allow[label]:
                bad.append((name, label))
    assert not bad, bad


def test_staged_burstiness_uses_take_ordered(spark, sf_dir):
    """The global top-k is TakeOrderedAndProject (per-partition heaps),
    never a global sort."""
    from json_sql_database_storage_spark.llm.staged_r13 import (
        text_burstiness_topk,
    )
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    plan = explain_formatted(text_burstiness_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_staged_props_topk_uses_window_group_limit(spark, sf_dir):
    """Per-type top-k plans as WindowGroupLimit — rank pushed before the
    exchange, so the shuffle carries O(types·k) candidates."""
    from json_sql_database_storage_spark.operators.staged_r13 import (
        events_props_topk,
    )
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    plan = explain_formatted(events_props_topk(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_staged_hhi_broadcasts_both_dims(spark, sf_dir):
    """The supplier and nation dims ride broadcast joins — the fact-table
    census must be the only real shuffle."""
    from json_sql_database_storage_spark.operators.staged_r13 import (
        q_supplier_nation_herfindahl,
    )
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    plan = explain_formatted(q_supplier_nation_herfindahl(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2


def test_staged_inner_product_sample_is_deterministic(spark, sf_dir):
    """The md5-rank sample must be invariant to partitioning: rerun the
    query with the parquet scan split into many small input partitions
    (maxPartitionBytes floor) — a partition-order-dependent sample (e.g.
    a bare limit without the hash ordering) would draw different vectors
    and different buckets."""
    from json_sql_database_storage_spark.llm.staged_r13 import (
        sim_inner_product_stats,
    )

    a = sorted(tuple(r) for r in
               sim_inner_product_stats(spark, sf_dir).collect())
    key = "spark.sql.files.maxPartitionBytes"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "4096")
        b = sorted(tuple(r) for r in
                   sim_inner_product_stats(spark, sf_dir).collect())
    finally:
        spark.conf.set(key, prev)
    assert a == b
