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
def test_staged_matches_oracle_sf0_01(spark, name):
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


def test_staged_no_unintended_scale_flags(spark, sf_dir):
    """The registry sweep (tests/test_plans.py::
    test_no_unintended_scale_flags) only sees registered queries — run the
    same sweep over the STAGED payloads NOW so promotion is a dict move,
    not a plan-shape surprise.  Allowlist mirrors the registered
    conventions: 1-row scalar-aggregate exchanges (map-side partials, one
    row per input partition) and bounded-input global steps."""
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    allow = {
        "CartesianProduct": set(),
        "BatchEvalPython": set(),
        "SinglePartition": {
            # ordered-fold denominators / 1-row vocab or census scalars —
            # map-side partials, constant bytes at any corpus size
            "sample_domain_mixture", "sample_cluster_balanced",
            "text_bigram_logprob",
            # per-round 1-row global argmax (the deep-BPE recipe)
            "sim_kcenter_coreset",
            # final 1-row triangle/node/edge census
            "graph_triangle_count",
            # per-version scalar summary (count + sum over a snapshot
            # read), as the registered snapshot_* queries
            "snapshot_rollback",
            # per-peel-round 1-row node/edge counts (6 rounds, fixed)
            "graph_kcore",
            # 1-row corpus/target token totals feeding the 256-row LLR
            # broadcast
            "sample_importance_weights",
            # 1-row global order / doc counts (broadcast scalars)
            "q_basket_lift", "text_keyword_topk",
            # 1-row corpus word count (the text_heavy_hitters threshold
            # scalar, same as the registered query's allowlisted shape)
            "stream_heavy_hitters",
            # 1-row split point + two half totals over the 8-cell census
            "sim_embedding_drift",
            # 1-row doc count + the O(1) ten-decile cumulative window
            "text_vocab_growth",
        },
    }
    bad = []
    for name, (fn, _) in sorted(ALL_STAGED.items()):
        plan = explain_formatted(fn(spark, sf_dir))
        for label in allow:
            if label in plan and name not in allow[label]:
                bad.append((name, label))
    assert not bad, bad


def test_staged_keyword_topk_uses_window_group_limit(spark, sf_dir):
    """The COVERAGE claim made literal: the per-doc top-3 rank runs as
    WindowGroupLimit (rank limit pushed before the exchange), so the
    shuffle carries O(docs·k) rows — the top-N-per-group scale story."""
    from json_sql_database_storage_spark.llm.staged_r9 import STAGED
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    plan = explain_formatted(STAGED["text_keyword_topk"][0](spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_staged_ewma_runs_in_one_window_operator(spark, sf_dir):
    """The EWMA kernel's scale claim made literal: all eight lag() reads
    evaluate inside ONE Window operator (single user_id exchange + one
    sort), not one window per lag."""
    from json_sql_database_storage_spark.operators.staged_r9 import STAGED

    plan = (STAGED["window_ewma_smoothing"][0](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Window ") == 1


def test_staged_pyds_scan_parallelism_equals_file_count(spark, sf_dir):
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
