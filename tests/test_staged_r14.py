"""Differential tests for the round-14-staged operators
(llm/staged_r14.py + operators/staged_r14.py): every STAGED entry runs its
Spark plan against its DuckDB oracle through the SAME compare machinery
the driver uses — at sf0.001 on every suite run via the session fixtures,
and at sf0.01 in the slow marker — so registering them next round is a
dict-entry move, not new verification."""

from __future__ import annotations

import os

import duckdb
import pytest

from json_sql_database_storage_spark.llm.staged_r14 import (
    STAGED as LLM_STAGED,
)
from json_sql_database_storage_spark.operators.staged_r14 import (
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
    1-row scalar-aggregate exchanges (map-side partials), bounded-census
    windows, and vocab-sized rank windows."""
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    allow = {
        "CartesianProduct": set(),
        "BatchEvalPython": set(),
        "SinglePartition": {
            # windows over the ≤|regions×brands| (≤125-row) cell census —
            # the single partition carries a bounded relation
            "q_region_brand_affinity",
            # 1-row five-moment global scalar aggregate
            "q_order_linecount_value_corr",
            # B × 1-row per-bucket scalar aggregates (B = 8, catalog-bound)
            "doc_bucket_stats",
            # 1-row part-count scalar + TakeOrdered top-k
            "q_part_name_terms",
            # vocab-sized rank window (the text_zipf_slope allowlisted
            # shape) + the O(log vocab) cumulative window
            "text_vocab_coverage_curve",
            # 1-row vector-count scalar feeding the broadcast
            "sim_dimension_covariance_topk",
            # top-k df TakeOrdered feeding the broadcast join side
            "text_positional_term_profile",
        },
    }
    bad = []
    for name, (fn, _) in sorted(ALL_STAGED.items()):
        plan = explain_formatted(fn(spark, sf_dir))
        for label in allow:
            if label in plan and name not in allow[label]:
                bad.append((name, label))
    assert not bad, bad


def test_staged_revacc_single_brand_exchange(spark, sf_dir):
    """Both lags of the second difference ride ONE brand-key window over
    the (brand × month) census — never two exchanges."""
    import re

    from json_sql_database_storage_spark.operators.staged_r14 import (
        window_revenue_acceleration,
    )

    df = window_revenue_acceleration(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    kinds = re.findall(r"Exchange (\w+)", plan)
    # one shuffle for the join/census path keys plus ONE for the window —
    # the lag-of-lag must not add a second window exchange
    assert plan.count("Window") == 1, plan[:2000]


def test_staged_peak_hour_uses_bounded_census(spark, sf_dir):
    """The windows run over the (type × 24) census, never the event log:
    the census aggregate must appear BELOW the window in the plan."""
    from json_sql_database_storage_spark.operators.staged_r14 import (
        events_peak_hour_share,
    )
    from json_sql_database_storage_spark.plans.inspect import (
        explain_formatted,
    )

    plan = explain_formatted(events_peak_hour_share(spark, sf_dir))
    assert "HashAggregate" in plan and "Window" in plan


def test_staged_bucket_stats_matches_full_read(spark, sf_dir):
    """The per-bucket physical reads must partition the table exactly:
    their union equals the full head read (no row lost to a dir-list
    mistake, none double-counted)."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.operators.staged_r12 import (
        _orders_kv,
    )
    from json_sql_database_storage_spark.operators.staged_r14 import (
        doc_bucket_stats,
    )

    got = doc_bucket_stats(spark, sf_dir).agg(
        F.sum("n_rows").cast("bigint").alias("n"),
        F.sum("sum_cents").cast("bigint").alias("s")).collect()[0]
    exp = _orders_kv(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s")).collect()[0]
    assert (got["n"], got["s"]) == (exp["n"], exp["s"])


def test_staged_wav_energy_consistent_with_decode(spark, sf_dir):
    """Window energies must ride the same decoded PCM as mm_decode_wav:
    per doc, the window count and total sample count agree with the
    decoded frame geometry (ch × frames)."""
    from pyspark.sql import functions as F

    from json_sql_database_storage_spark.llm.multimodal import (
        mm_decode_wav,
    )
    from json_sql_database_storage_spark.llm.staged_r14 import (
        mm_wav_window_energy,
    )

    e = (mm_wav_window_energy(spark, sf_dir)
         .groupBy("doc_id")
         .agg(F.sum("n_samples").cast("bigint").alias("n_samples")))
    d = (mm_decode_wav(spark, sf_dir)
         .select("doc_id",
                 (F.col("n_frames") * F.col("n_channels"))
                 .cast("bigint").alias("expected")))
    bad = (e.join(d, "doc_id")
           .filter(F.col("n_samples") != F.col("expected"))
           .count())
    assert bad == 0
