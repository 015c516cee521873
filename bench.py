#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries from the registry at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  Each query is forced to
full execution with a noop sink (no collect — rows never hit the driver,
mirroring how a cluster job ends in a distributed sink).
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from json_sql_database_storage_spark import registry
from json_sql_database_storage_spark.session import build_session

# Extra exhibits timed AFTER the two headline passes and reported under
# "queries_extra": per-query perf evidence for the round-4/5 operator
# families without changing the headline total that round-over-round
# comparisons key on.
EXTRA = [
    "window_funnel_steps",
    "cdc_latest_by_key",
    "agg_hll_sketch_rollup",
    "join_asof_tolerance",
    "agg_incremental_refresh",
    "join_interval_binned",
    "sim_kmeans",
    "sim_semdedup",
    # production-shaped twin (k ≈ n/40): the side-by-side number that
    # attributes sim_semdedup's time to the k=8 oracle pinning, not the plan
    "sim_semdedup_prod",
    "dedup_simhash",
    # round-5 families
    "q3_shipping_priority",
    "q18_large_volume_customer",
    "events_retention_cohort",
    "text_heavy_hitters",
    "dedup_fuzzy_levenshtein",
    "text_unigram_logprob",
    "sample_domain_balance",
    "agg_quantile_sketch_rollup",
    "snapshot_time_travel",
    "text_inverted_index_search",
    "sim_pq_adc_topk",
    "events_zscore_outliers",
    "text_term_cooccurrence",
    "table_fingerprint",
    "sample_fixed_k_per_stratum",
    "udf_table_function",
    "scan_federated_join",
    "dedup_minhash_incremental",
    # round-6 families
    "text_bm25_topk",
    "text_phrase_search",
    "sim_ivfpq_topk",
    "snapshot_expire",
    "q5_local_supplier_volume",
    "doc_lookup_api",
    "text_count_min_sketch",
    "graph_pagerank",
    "join_scd2_point_in_time",
    "window_range_interval_frame",
    "join_null_safe",
    "text_bpe_train",
    # round-7 families
    "text_bpe_encode",
    "sim_ivfpq_residual_topk",
    "doc_lookup_asof",
    "snapshot_schema_evolution",
    "graph_pagerank_deep",
    "q10_returned_items",
    "q12_shipping_delay_priority",
    "q19_disjunctive_revenue",
    "snapshot_delete",
    "sample_lm_quality_buckets",
    # round-8 families (the 12 promoted staged queries + Q21)
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier",
    "q17_small_quantity_revenue",
    "q21_suppliers_who_kept_waiting",
    "q22_global_sales_opportunity",
    "sim_random_projection_topk",
    "dedup_quality_survivor",
    "text_decontamination",
    "sample_split_no_leakage",
    # round-9 families (the 29 promoted staged queries; the two stream_*
    # promotions are excluded per the standing replay-latency note below)
    "q_copurchase_pairs",
    "q_basket_lift",
    "q_yearly_growth",
    "graph_triangle_count",
    "graph_kcore",
    "graph_label_propagation",
    "graph_connected_components",
    "events_transition_matrix",
    "events_rfm_scores",
    "window_cumulative_distinct",
    "window_ewma_smoothing",
    "window_rolling_median",
    "snapshot_rollback",
    "doc_merge",
    "scan_python_datasource",
    "text_repetition_filter",
    "sample_domain_mixture",
    "sim_kcenter_coreset",
    "sample_cluster_balanced",
    "sim_mmr_rerank",
    "text_bigram_logprob",
    "dedup_containment",
    "sample_importance_weights",
    "text_token_entropy",
    "text_keyword_topk",
    "sim_embedding_drift",
    "text_vocab_growth",
    # round-10 families (the 14 promoted staged queries + the Q20 analog;
    # stream_scd2_enrichment is excluded per the standing replay-latency
    # note below)
    "graph_degree_assortativity",
    "graph_degree_histogram",
    "events_anomaly_mad",
    "window_rolling_zscore",
    "sql_lateral_unnest",
    "doc_family_read",
    "doc_quarantine",
    "q_customer_pareto",
    "window_streak_detection",
    "text_index_maintenance",
    "text_ngram_novelty",
    "text_code_detection",
    "sample_token_budget_epochs",
    "q20_excess_supply_share",
    # round-11 families (the 23 promoted staged queries; the two
    # stream_*_index_maintenance exhibits are excluded per the standing
    # replay-latency note below)
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q_supplier_churn",
    "window_inter_event_gap",
    "doc_vacuum_family",
    "q_nation_trade_balance",
    "q_brand_monthly_movers",
    "q9_product_type_profit",
    "events_weekday_profile",
    "q_order_size_histogram",
    "q_discount_quantity_corr",
    "q_ship_latency_p95",
    "dedup_cluster_size_histogram",
    "sample_reservoir_global",
    "sim_dimension_profile",
    "text_doc_length_gini",
    "sim_label_purity",
    "text_zipf_slope",
    "sample_weighted_no_replacement",
    "sim_ann_recall_curve",
    "text_source_overlap",
    # round-12 families (the 22 promoted staged queries)
    "doc_restore",
    "doc_compact",
    "doc_rebucket",
    "doc_clone",
    "doc_history",
    "doc_diff_cdf",
    "q_orders_open_aging",
    "q_supplier_lineload",
    "window_reorder_interval",
    "window_user_value_trend",
    "q_price_band_share",
    "events_session_length_histogram",
    "q_returned_share_by_brand",
    "text_hapax_ratio",
    "text_pmi_collocations",
    "sim_cell_balance",
    "text_bigram_entropy_rate",
    "sim_norm_histogram",
    "text_length_deciles",
    "text_quality_heuristic_buckets",
    "sample_soft_dedup_weights",
    "text_char_trigram_profile",
    # round-13 families (the 22 promoted staged queries)
    "doc_check_constraints",
    "events_type_cooccurrence",
    "q_order_value_band_by_segment",
    "q_priority_escalation_matrix",
    "q_quarter_revenue_share",
    "q_part_type_size_profile",
    "q_customer_repeat_share",
    "q_first_order_cohort_value",
    "q_supplier_nation_herfindahl",
    "q_brand_discount_profile",
    "events_user_lifecycle",
    "events_props_value_histogram",
    "events_props_topk",
    "q_nation_acctbal_profile",
    "text_first_token_census",
    "text_stopword_profile",
    "text_char_class_profile",
    "text_burstiness_topk",
    "text_prefix_dup_census",
    "text_word_length_by_lang",
    "sim_inner_product_stats",
    "sim_label_centroid_norms",
    # the stream-stream replays are excluded here: their wall time is
    # micro-batch scheduling of a 4-chunk replay (a latency regime the
    # batch bench's throughput number does not represent); their
    # correctness runs in the oracle/smoke suites every round
]

# Previous round's canonical idle warm-pass total (BASELINE.md), emitted in
# the JSON so a single line gives the cross-round comparison without
# cross-referencing files (r11 verdict next-round #8).  Update each round
# when BASELINE.md records the new canonical figure.
PREV_ROUND_IDLE_WARM_SEC = 11.30    # round 12 canonical (BASELINE.md)

# Headline set: one representative per operator family, weighted toward the
# scan/join/agg/window/LLM paths that dominate at 100 TB.
HEADLINE = [
    "q1_pricing_summary",
    "agg_count_distinct",
    "agg_median_percentile",
    "filter_comparisons",
    "join_star_revenue",
    "join_orders_lineitem",
    "join_asof",
    "window_top_n_per_group",
    "window_running_total",
    "setop_union_distinct",
    "stream_sessionize_batch",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "text_stats",
    "text_tfidf",
    "doc_tojson_lines",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = build_session("bench")
    specs = registry.specs()
    names = [n for n in HEADLINE if n in specs] or sorted(specs)

    timings: dict[str, float] = {}
    # warm the JVM/scan path once so timings measure the engine, not JIT
    specs[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # ...and the Python/Arrow worker pool (first pandas UDF otherwise pays
    # a one-time worker fork inside whichever query hits it first).  The
    # warm UDF imports numpy INSIDE the worker: daemon-forked workers are
    # reused across queries, so this front-loads the ~150 ms/worker numpy
    # import the minhash signature UDF would otherwise pay on its first
    # Arrow batch (part of the r3 cold-vs-warm gap on dedup_minhash_lsh).
    from pyspark.sql import functions as F

    def _warm_fn(x):
        import numpy as _np  # noqa: PLC0415
        import pandas as _pd  # noqa: PLC0415
        return _pd.Series(_np.asarray(x, dtype=_np.int64))

    _warm = F.pandas_udf(_warm_fn, "long")
    # one row per core × 4: enough tasks that every daemon worker forks and
    # runs the import at least once
    spark.range(128).repartition(128).select(_warm("id")) \
        .write.format("noop").mode("overwrite").save()

    # Plan warmup: run every headline query once at sf0.001 (1/100 the
    # data).  Whole-stage codegen source depends on the plan, not the data,
    # so this populates Janino's generated-class cache and JITs the hot
    # loops for ~free — the r3 profile showed one-time compile/JIT was ~60%
    # of the minhash "cold" number at sf0.1 and swings ±40% with load.
    # After this, the first timed pass measures the data-proportional work
    # that actually extrapolates to a 1000-executor cluster (where per-plan
    # compile amortizes to zero), and the second pass isolates any residual
    # warmth.  Skipped silently if the small SF dir is absent.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in names + [n for n in EXTRA if n in specs]:
            try:
                specs[name].fn(spark, warm_dir).write.format("noop") \
                    .mode("overwrite").save()
            except Exception:
                pass  # warmup must never fail the bench

    # Per-pass machine-load sampling (r12 verdict next-round #4: the r12
    # driver recording's warm pass ran while the machine was still busy
    # and read +29% vs r11 — a single at-exit loadavg can't show WHICH
    # pass was loaded).  Sampled at every pass boundary so the one JSON
    # line is self-adjudicating: a consumer comparing value_warm checks
    # loadavg_passes["before_warm"/"after_warm"] before calling it a
    # regression.
    def _load_1m():
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return None

    loadavg_passes: dict[str, float | None] = {}

    loadavg_passes["before_first"] = _load_1m()
    total = 0.0
    for name in names:
        gc.collect()   # drop py refs so ContextCleaner can free the
        # previous query's localCheckpoint/persist blocks BEFORE timing —
        # without this, storage fills over the 127-extra run and
        # late-position queries measure cache eviction, not plan cost
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    # Second (warm) pass: first-pass numbers include one-time whole-stage
    # codegen + JIT per query, which at this scale is most of the wall time
    # and swings ±40% with machine load.  The warm pass measures steady-state
    # engine throughput — the number that actually extrapolates to a
    # long-running cluster — so round-over-round regressions are
    # attributable to plan changes rather than JIT noise.
    warm: dict[str, float] = {}
    warm_total = 0.0
    loadavg_passes["before_warm"] = _load_1m()
    for name in names:
        gc.collect()
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        warm[name] = round(dt, 3)
        warm_total += dt
    loadavg_passes["after_warm"] = _load_1m()

    # Second-chance re-timing (r13 verdict next-round #10): on this host a
    # first-pass reading >2× its own warm value is almost always a machine
    # slow-window, not a plan cost (the r13 PERF table's 0.576 geomean was
    # exactly such a window).  Re-run ONLY those queries once and report
    # the results as ADDITIONS — `queries` / `value` / `queries_warm` /
    # `value_warm` stay byte-compatible with every prior round — so a
    # first-pass-based comparison carries its own refutation:
    # queries_first_min[name] = min(first, retry).
    retry: dict[str, float] = {}
    loadavg_passes["before_retry"] = _load_1m()
    for name in names:
        if warm.get(name) and timings[name] > 2.0 * warm[name]:
            gc.collect()
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            retry[name] = round(time.perf_counter() - t0, 3)
    first_min = {n: min(timings[n], retry[n]) if n in retry else timings[n]
                 for n in names}

    # Shared co-purchase edge artifact: built ONCE here, on its own timed
    # line, BEFORE the extras loop (r11 verdict §wrong #2: the first
    # registered graph consumer in the extras loop was paying the whole
    # edges_for build inside its own timing — reading as a per-query
    # regression — and the probe block then force-rebuilt a SECOND
    # artifact).  The four registered graph rows below reuse this artifact
    # via edges_for (same session, same source → manifest hit), and the
    # probe block further down reuses the same paths, so every per-query
    # graph time is probe-shaped and cross-round comparable.
    graph_probe: dict[str, float] = {}
    gpaths = None
    try:
        from json_sql_database_storage_spark.operators import (
            graph_edges as _ge,
        )

        gc.collect()
        t0 = time.perf_counter()
        gpaths = _ge.edges_for(spark, sf_dir)
        graph_probe["graph_edges_build"] = round(time.perf_counter() - t0, 3)
    except Exception as e:  # build failure is evidence, never a bench abort
        graph_probe["error"] = repr(e)
        # the registered graph rows below will then rebuild inside their
        # own timings — mark them so a reader doesn't misread the inflated
        # first row as a per-query regression
        graph_probe["extras_note"] = ("pre-extras build failed: the first "
                                      "registered graph row's timing "
                                      "includes an in-query rebuild")

    # Build/probe split for the graph family (r10 verdict next-round #3):
    # time the four probe forms against the artifact built above — the
    # cost profile a build-once/probe-many deployment actually sees.
    # Runs HERE, immediately after the build and BEFORE the 149-extra
    # loop (r12 verdict next-round #5: at the end of the run the probe
    # twins read ~2× their extras-row siblings purely from late-run
    # position — storage pressure and residual load, not plan), so the
    # probe-block and extras-row graph timings are measured under the
    # same conditions and should agree within noise.
    try:
        from json_sql_database_storage_spark.operators import (
            graph_edges as _ge,
        )

        probes = (
            ("graph_triangle_count_probe", _ge.triangle_count_probe),
            ("graph_kcore_probe", _ge.kcore_probe),
            ("graph_degree_assortativity_probe",
             _ge.degree_assortativity_probe),
            ("graph_degree_histogram_probe", _ge.degree_histogram_probe))
        # plan-warm the probe shapes at sf0.001 (same discipline as the
        # headline pass — the r11 first run showed cold codegen swamping
        # the probe numbers: triangle probe read 18 s cold vs 7 s warmed)
        if os.path.isdir(warm_dir) \
                and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
            wpaths = _ge.edges_build(spark, warm_dir,
                                     "copurchase_edges_benchwarm")
            for _, gfn in probes:
                gfn(spark, wpaths).write.format("noop") \
                    .mode("overwrite").save()
                registry.release_caches()
        if gpaths is None:    # the pre-extras build failed: one retry here
            gpaths = _ge.edges_for(spark, sf_dir)
        for gname, gfn in probes:
            registry.release_caches()
            gc.collect()
            t0 = time.perf_counter()
            gfn(spark, gpaths).write.format("noop").mode("overwrite").save()
            graph_probe[gname] = round(time.perf_counter() - t0, 3)
        registry.release_caches()
    except Exception as e:  # record, don't drop: a silent miss would read
        # as "probe evidence intentionally absent" (r11 advice)
        graph_probe["probe_error"] = repr(e)

    extra: dict[str, float] = {}
    loadavg_passes["before_extras"] = _load_1m()
    for name in EXTRA:
        if name not in specs:
            continue
        gc.collect()
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        extra[name] = round(time.perf_counter() - t0, 3)

    # DuckDB single-node reference on the same queries' oracle SQL — the
    # honest comparison point for absolute overhead at this scale.
    duck_total = None
    try:
        import duckdb

        con = duckdb.connect()
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"):
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        # dedup_minhash_lsh's oracle is the O(n²) all-pairs jaccard SPEC,
        # not an equivalent algorithm (512 s at sf0.1) — timing it would
        # misattribute a correctness artifact as an engine comparison.
        skip = {"dedup_minhash_lsh"}
        t0 = time.perf_counter()
        for name in names:
            if name not in skip and specs[name].oracle is not None:
                con.execute(specs[name].oracle).fetchall()
        duck_total = round(time.perf_counter() - t0, 3)
    except Exception:
        pass

    # Machine-load tag (r10 verdict §wrong #2: the r10 driver tail was
    # recorded under a concurrent 262-query simulation and read as a
    # regression) — 1-minute loadavg at finish, so a loaded recording is
    # self-labelling instead of needing a post-hoc footnote in BASELINE.md.
    load_1m = _load_1m()
    loadavg_passes["at_exit"] = load_1m

    # The per-query extras (106+ entries) overflowed the driver's stdout
    # capture window in r10 (BENCH_r10.json "parsed": null) — they live in
    # a sidecar now so the ONE stdout line stays compact and parseable.
    extra_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_EXTRA.json")
    try:
        with open(extra_path, "w") as f:
            json.dump({"sf": sf, "loadavg_1m": load_1m,
                       "loadavg_passes": loadavg_passes,
                       "queries_extra": extra,
                       "graph_build_probe": graph_probe},
                      f, indent=1, sort_keys=True)
    except OSError:
        extra_path = None

    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "queries_warm": warm,
        "value_warm": round(warm_total, 3),
        "queries_retry": retry,
        "queries_first_min": first_min,
        "value_first_min": round(sum(first_min.values()), 3),
        "duckdb_oracle_total_sec": duck_total,
        "loadavg_1m": load_1m,
        "loadavg_passes": loadavg_passes,
        "prev_round_idle_warm_sec": PREV_ROUND_IDLE_WARM_SEC,
        "extras_sidecar": extra_path,
        "extras_count": len(extra),
        "first_pass_label": "plan-warmed",
        "note": ("first pass runs after an sf0.001 plan prewarm (codegen "
                 "compiled, data-proportional work timed); not comparable "
                 "to the genuinely-cold r1-r3 first-pass figures"),
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
