"""Differential tests for the round-12-staged operators
(llm/staged_r12.py + operators/staged_r12.py): every STAGED entry runs its
Spark plan against its DuckDB oracle through the SAME compare machinery
the driver uses — at sf0.001 on every suite run via the session fixtures,
and at sf0.01 in the slow marker — so registering them next round is a
dict-entry move, not new verification."""

from __future__ import annotations

import os

import duckdb
import pytest

from json_sql_database_storage_spark.llm.staged_r12 import (
    STAGED as LLM_STAGED,
)
from json_sql_database_storage_spark.operators.staged_r12 import (
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
    1-row scalar-aggregate exchanges (map-side partials), bounded-domain
    ordered windows, and fixture-scalar store-exhibit summaries."""
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    allow = {
        "CartesianProduct": set(),
        "BatchEvalPython": set(),
        "SinglePartition": {
            # per-version 1-row scalar summaries over AS-OF reads
            # (the snapshot_* / doc_family_read allowlisted shape)
            "doc_restore", "doc_compact", "doc_rebucket", "doc_clone",
            # manifest-metadata version log: a ≤3-row local relation
            "doc_history",
            # 1-row max-orderdate anchor broadcast (map-side max partial)
            "q_orders_open_aging",
            # 1-row book-total broadcast + TakeOrdered top-k
            "q_supplier_lineload",
            # 1-row revenue-total broadcast (the q15/q22 threshold shape)
            "q_price_band_share",
            # two 1-row q6 entropy folds (map-side partials)
            "text_bigram_entropy_rate",
            # 1-row corpus-total broadcast onto the k-row cell census
            "sim_cell_balance",
            # bounded-domain cumulative window (distinct token lengths ≪
            # corpus — the text_vocab_growth allowlisted shape) + 1-row n
            "text_length_deciles",
            # 1-row singleton-count scalar + the CC loop's bounded tables
            "sample_soft_dedup_weights",
            # 1-row bigram-total scalar + TakeOrdered top-k
            "text_pmi_collocations",
        },
    }
    bad = []
    for name, (fn, _) in sorted(ALL_STAGED.items()):
        plan = explain_formatted(fn(spark, sf_dir))
        for label in allow:
            if label in plan and name not in allow[label]:
                bad.append((name, label))
    assert not bad, bad


def test_staged_lineload_uses_take_ordered(spark, sf_dir):
    """The global top-k is TakeOrderedAndProject (per-partition heaps),
    never a global sort."""
    from json_sql_database_storage_spark.operators.staged_r12 import (
        q_supplier_lineload,
    )
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    plan = explain_formatted(q_supplier_lineload(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_staged_trigram_profile_uses_window_group_limit(spark, sf_dir):
    """Per-language top-k plans as WindowGroupLimit — rank pushed before
    the exchange, so the shuffle carries O(langs·k) candidates."""
    from json_sql_database_storage_spark.llm.staged_r12 import (
        text_char_trigram_profile,
    )
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    plan = explain_formatted(text_char_trigram_profile(spark, sf_dir))
    assert "WindowGroupLimit" in plan


@pytest.mark.parametrize("name", ["doc_restore", "doc_compact",
                                  "doc_rebucket", "doc_clone",
                                  "doc_history", "doc_diff_cdf"])
def test_staged_store_exhibits_invocation_stable(spark, sf_dir, name):
    """Each store exhibit re-runs its whole commit sequence from the same
    session sink on every call — a second invocation (bench reruns, the
    driver after pytest) must return the identical frame, not one with
    doubled versions or re-applied deltas."""
    fn, _ = OPS_STAGED[name]
    first = [tuple(r) for r in fn(spark, sf_dir).collect()]
    assert first
    second = [tuple(r) for r in fn(spark, sf_dir).collect()]
    assert second == first


def test_staged_restore_is_metadata_only(spark, sf_dir, tmp_path):
    """The restore commit must re-reference v0's bucket dirs VERBATIM —
    no data copied (the store-level claim the driver row's aggregate
    can't see)."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.documents.store import DocumentStore
    from json_sql_database_storage_spark.operators.staged_r12 import (
        _orders_kv,
    )

    store = DocumentStore(spark, str(tmp_path / "rst"))
    t = _orders_kv(spark, sf_dir)
    store.upsert(t, "o")
    store.upsert(t.limit(50).withColumn("cents", F.col("cents") + 1), "o")
    store.restore("o", 0)
    m0, m2 = store._manifest("o", 0), store._manifest("o", 2)
    # every BUCKET slot re-references v0's dirs verbatim; only the commit
    # timestamp slot (negative reserved key, feeds read_asof_timestamp)
    # legitimately re-stamps
    assert {k: v for k, v in m0.items() if k >= 0} \
        == {k: v for k, v in m2.items() if k >= 0}
    diff = {k for k in set(m0) | set(m2)
            if m0.get(k) != m2.get(k)}
    assert all(k < 0 for k in diff), diff
