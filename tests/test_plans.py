"""Plan-shape assertions: the properties that make queries scale —
pushdown, column pruning, broadcast joins, codegen — pinned as tests so a
refactor that silently loses one fails CI (SURVEY.md §4.3)."""

from __future__ import annotations

import re

from json_sql_database_storage_spark import registry
from json_sql_database_storage_spark.plans import (
    explain_formatted, pushed_filters, read_schema_columns,
    uses_broadcast_hash_join, wholestage_codegen_spans)

registry.load_all()
_SPECS = registry.specs()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = _SPECS["filter_comparisons"].fn(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed and "l_returnflag" in pushed


def test_point_lookup_pushdown(spark, sf_dir):
    df = _SPECS["filter_point_lookup"].fn(spark, sf_dir)
    assert any("o_orderkey" in p and "EqualTo" in p
               for p in pushed_filters(df))


def test_q1_column_pruning(spark, sf_dir):
    df = _SPECS["q1_pricing_summary"].fn(spark, sf_dir)
    schemas = read_schema_columns(df)
    assert schemas, "no parquet scan found"
    cols = set(schemas[0])
    # only the 7 needed columns of lineitem's 11 are decoded
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_tax",
                    "l_returnflag", "l_linestatus", "l_shipdate"}


def test_projection_pruning(spark, sf_dir):
    df = _SPECS["filter_projection"].fn(spark, sf_dir)
    for cols in read_schema_columns(df):
        assert "l_extendedprice" not in cols  # unused columns never decoded


def test_dim_join_broadcasts(spark, sf_dir):
    assert uses_broadcast_hash_join(_SPECS["join_broadcast_dim"].fn(spark, sf_dir))
    assert uses_broadcast_hash_join(_SPECS["join_star_revenue"].fn(spark, sf_dir))


def test_semi_join_pushes_filter(spark, sf_dir):
    df = _SPECS["join_left_semi"].fn(spark, sf_dir)
    assert any("o_orderpriority" in p for p in pushed_filters(df))


def test_q1_wholestage_codegen(spark, sf_dir):
    # AQE defers physical compilation, hiding codegen subtrees from the
    # unexecuted plan — inspect the static plan instead
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = _SPECS["q1_pricing_summary"].fn(spark, sf_dir)
        assert wholestage_codegen_spans(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_topk_uses_take_ordered(spark, sf_dir):
    df = _SPECS["sort_global_top_k"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_formatted(df)


def test_mm_metadata_prunes_payload_derivation(spark, sf_dir):
    """Metadata-only analytics must never compute the payload: the scan
    reads only the columns the meta struct needs — at 100 TB this is the
    difference between touching bytes of binary blobs or none."""
    df = _SPECS["mm_metadata_pruning"].fn(spark, sf_dir)
    for cols in read_schema_columns(df):
        assert "text" not in cols  # payload = f(text); pruned with it


def test_lsh_candidate_join_is_equi(spark, sf_dir):
    """Banding exists to turn near-dup search into an equi-join on
    (band, hash) — a plan regression to a nested-loop/cartesian join is
    the O(n²) failure banding is supposed to prevent."""
    for name in ("dedup_minhash_lsh", "dedup_simhash"):
        plan = explain_formatted(_SPECS[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_pandas_udfs_use_arrow_eval(spark, sf_dir):
    """Vectorized exhibits must stay on the Arrow path; the deliberate
    row-at-a-time exhibit must be the only BatchEvalPython user."""
    assert "ArrowEvalPython" in explain_formatted(
        _SPECS["udf_pandas_vectorized"].fn(spark, sf_dir))
    assert "BatchEvalPython" in explain_formatted(
        _SPECS["udf_scalar_python"].fn(spark, sf_dir))
    assert "ArrowEvalPython" in explain_formatted(
        _SPECS["dedup_minhash_lsh"].fn(spark, sf_dir))


def test_scale_windows_have_no_single_partition_exchange(spark, sf_dir):
    """The two-pass global-window twins must never serialize on one task:
    their windows are partitioned by the range-bucket id, and offsets come
    back as literal maps, so no SinglePartition exchange may appear (the
    global-window forms each have exactly one — that is the thing the
    rewrite removes)."""
    for name in ("scale_running_total", "scale_percent_rank"):
        plan = explain_formatted(_SPECS[name].fn(spark, sf_dir))
        assert "SinglePartition" not in plan, f"{name}:\n{plan}"
    # sanity: the global forms DO have it (else this test checks nothing)
    plan = explain_formatted(_SPECS["window_running_total"].fn(spark, sf_dir))
    assert "SinglePartition" in plan


def test_partitioned_sink_read_prunes_partitions(spark, sf_dir):
    """b1.7: the read side of the partitioned sink must prune at the
    directory level — the l_returnflag='R' predicate appears as a
    PartitionFilter on the scan, not a post-scan Filter over all
    partitions (at 100 TB, reading 1/3 of the directories instead of
    all of them)."""
    plan = explain_formatted(_SPECS["sink_partitioned"].fn(spark, sf_dir))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan
    assert "l_returnflag" in m.group(1), plan


def test_range_sorted_read_pushes_date_filter(spark, sf_dir):
    """b1.14: the whole point of the range-sorted layout is that the
    read-back date filter reaches the parquet scan (min/max row-group
    skipping) — a post-scan Filter over decoded rows would make the
    rewrite pointless at 100 TB."""
    df = _SPECS["sink_range_sorted_skipping"].fn(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed, pushed


def test_zorder_read_pushes_both_dims(spark, sf_dir):
    """b1.15: the Morton layout exists so BOTH box-predicate dimensions
    reach the parquet scan's min/max skipping — each must appear in
    PushedFilters on the read-back."""
    df = _SPECS["sink_zorder_skipping"].fn(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_partkey" in pushed and "l_suppkey" in pushed, pushed


def test_inverted_index_probe_static_partition_pruning(spark, sf_dir):
    """b11.27: the literal query terms' hash buckets must constant-fold
    into a STATIC PartitionFilter on the index scan — a probe reads only
    its terms' bucket directories, never the whole index."""
    df = _SPECS["text_inverted_index_search"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf_lines = [ln for ln in plan.splitlines()
                if "inv_index" in ln and "PartitionFilters" in ln]
    assert pf_lines, plan[:2000]
    assert any("bkt" in ln.split("PartitionFilters", 1)[1].split("]", 1)[0]
               for ln in pf_lines), pf_lines


def test_bm25_probe_static_partition_pruning(spark, sf_dir):
    """r6.1: the BM25 probe inherits the inverted index's access path —
    the literal query terms' buckets must constant-fold into a STATIC
    PartitionFilter on the index scan (<= |terms| of the 64 bucket dirs
    read), and the dl join must stay an equi-join (no all-pairs)."""
    df = _SPECS["text_bm25_topk"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf_lines = [ln for ln in plan.splitlines()
                if "inv_index_bm25" in ln and "PartitionFilters" in ln]
    assert pf_lines, plan[:2000]
    assert any("bkt" in ln.split("PartitionFilters", 1)[1].split("]", 1)[0]
               for ln in pf_lines), pf_lines
    assert "CartesianProduct" not in plan
    # r7.2: the probe must read ONLY index-build artifacts (pruned postings
    # + persisted dl side table + 1-row stats) — a `documents` scan in the
    # probe plan means doc lengths are being recomputed at query time,
    # which defeats index pruning in a build-once/probe-many deployment.
    doc_scans = [ln for ln in plan.splitlines()
                 if "documents.parquet" in ln]
    assert not doc_scans, doc_scans


def test_ivf_partitioned_probe_uses_dynamic_partition_pruning(spark, sf_dir):
    """b11.19: the persisted IVF index is a cell-partitioned table and the
    probe join runs on the partition column with a selective probe side —
    DPP must inject the probed-cell subquery into the index scan, so a
    probe reads only its nprobe cell directories (the ANN-serving access
    path at 100 TB)."""
    df = _SPECS["sim_ivf_partitioned"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_ivfpq_probe_uses_dynamic_partition_pruning(spark, sf_dir):
    """r6.2: the IVFPQ code layout is cell-partitioned and the probe joins
    on the partition column with a broadcast probe side — DPP must inject
    the probed-cell subquery so a query reads only its nprobe of the KC
    cell directories (codes, M bytes/vector — never raw vectors)."""
    df = _SPECS["sim_ivfpq_topk"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_ivfpq_residual_probe_uses_dynamic_partition_pruning(spark, sf_dir):
    """r7.4: the residual variant inherits the cell-partitioned serving
    path — its probe must also DPP-prune to nprobe of the KC cell
    directories."""
    df = _SPECS["sim_ivfpq_residual_topk"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_no_unintended_scale_flags(spark, sf_dir):
    """Whole-registry plan sweep: no CartesianProduct, row-at-a-time Python
    eval, or single-partition exchange outside the queries where it is the
    documented design (cross-join/BNLJ exhibits, the deliberate b10.1
    Python-UDF exhibit, global aggregates over already-tiny inputs, the
    SURVEY-mandated global-window forms).  BroadcastNestedLoopJoin is NOT
    flagged: every occurrence is a deliberate tiny-side broadcast
    (centroids, salt tables, 10-row query sets, bounded exact baselines)."""
    allow = {
        "CartesianProduct": {"join_cross", "join_bnlj_price_bands"},
        "BatchEvalPython": {"udf_scalar_python"},
        "SinglePartition": {
            "window_running_total", "window_percent_rank",
            "sort_global_top_k", "agg_global", "agg_approx_count_distinct",
            "agg_profile_table", "fn_hash_spark_native", "doc_typing_rules",
            "scan_in_memory",
            # global one-row invariant aggregates over already-filtered input
            "sink_compaction", "sink_zorder_skipping",
            # final funnel totals: global aggregate over the ~|users| rows
            # the one real user_id shuffle already reduced to
            "window_funnel_steps",
            # 1-row scalar-aggregate exchanges feeding a broadcast join
            # (corpus size / min-domain-count / k=ceil(n/40)): the partial
            # aggregate is map-side, so the single partition receives ONE
            # row per input partition — constant bytes at any corpus size
            "text_tfidf", "text_unigram_logprob", "text_heavy_hitters",
            "sample_domain_balance", "sim_semdedup_prod",
            "text_term_cooccurrence",
            # same 1-row corpus-count exchange as the LM scorer it reuses
            "sample_lm_quality_buckets",
            # 1-row corpus stats (T, N) + the rank window AFTER TakeOrdered
            # top-k — the single partition holds <= k rows by construction
            "text_bm25_topk",
            # three 1-row argmax tables + three 1-row census aggregates —
            # the only global steps of the merge loop, O(1) rows each
            "text_bpe_train",
            # per-version scalar summary (count + sum over a snapshot read):
            # map-side partials, ONE row per input partition reaches the
            # single partition — constant bytes at any table size
            "snapshot_time_travel", "snapshot_expire",
            "snapshot_schema_evolution", "snapshot_delete",
            # single-row global revenue aggregate AFTER the selective
            # disjunctive filter — map-side partials, one row per input
            # partition reaches the single partition
            "q19_disjunctive_revenue",
            # r8 promotions with the same 1-row global-aggregate shape:
            # Q6's forecast revenue (global agg after pushed filters),
            # Q14's promo ratio (both sums share one map-side pass),
            # Q15's max-revenue threshold, Q17's avg-quantity threshold
            # (1-row per part-group feeds a broadcast join; the global
            # step is the final scalar), Q22's avg-balance threshold —
            # each exchanges one row per input partition, constant bytes
            # at any SF
            "q6_forecast_revenue", "q14_promo_revenue", "q15_top_supplier",
            "q17_small_quantity_revenue", "q22_global_sales_opportunity",
            # 1-row global leaked-cluster count broadcast onto the 2-row
            # split summary (plus the CC loop's bounded label tables)
            "sample_split_no_leakage",
            # r9 promotions (allowlist carried over verbatim from the
            # staged-era sweep, tests/test_staged_r9.py pre-promotion):
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
            # r10 promotions (allowlist carried over verbatim from the
            # staged-era sweep, tests/test_staged_r10.py pre-promotion):
            # 1-row six-moment census (map-side partials — one row per
            # input partition, constant bytes at any graph size)
            "graph_degree_assortativity",
            # 1-row corpus doc-count scalar (the text_vocab_growth shape)
            "text_ngram_novelty",
            # ordered-fold denominator scalar (the sample_domain_mixture
            # shape)
            "sample_token_budget_epochs",
            # the O(1) ten-decile cumulative window (text_vocab_growth's
            # allowlisted shape) — the RANKING itself is two-pass bucketed,
            # never single-partition
            "q_customer_pareto",
            # fixture-literal family docs (the scan_in_memory precedent)
            "doc_family_read",
            # the probe's ≤k-row final rank window + 1-row stats broadcast
            # (the registered text_bm25_topk's allowlisted shape)
            "text_index_maintenance",
            # r11 promotions (allowlist carried over verbatim from the
            # staged-era sweep, tests/test_staged_r11.py pre-promotion):
            # 1-row last-data-year scalar broadcast (map-side max partial)
            "q_supplier_churn",
            # global top-k movers: TakeOrderedAndProject (per-partition
            # heaps), never a global sort — the sort_global_top_k shape
            "q_brand_monthly_movers",
            # fixture-literal family docs (the doc_family_read precedent)
            "doc_vacuum_family",
            # k-row heap for the deterministic hash-rank reservoir
            "sample_reservoir_global",
            # vocab-sized rank window + 1-row least-squares moments (the
            # text_vocab_growth / assortativity allowlisted shapes)
            "text_zipf_slope",
            # TakeOrdered top-k (per-partition heaps, the Q2 output bound)
            "q2_min_cost_supplier",
            # 1-row singleton-count scalar (map-side partials) + the CC
            # loop's bounded tables
            "dedup_cluster_size_histogram",
            # 1-row group-total threshold broadcast (the q15/q22 shape)
            "q11_important_stock",
            # k-row heap for the A-ES weighted reservoir
            "sample_weighted_no_replacement",
            # 1-row histogram-total share broadcast (map-side partials)
            "q_order_size_histogram",
            # r12 promotions (allowlist carried over verbatim from the
            # staged-era sweep, tests/test_staged_r12.py pre-promotion):
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
            # r13 promotions (allowlist carried over verbatim from the
            # staged-era sweep, tests/test_staged_r13.py pre-promotion):
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
    for name, spec in sorted(_SPECS.items()):
        if name.startswith("stream_") and not name.endswith("_batch"):
            continue    # streaming replays execute eagerly; skip explain
        plan = explain_formatted(spec.fn(spark, sf_dir))
        for label in allow:
            if label in plan and name not in allow[label]:
                bad.append((name, label))
    assert not bad, bad


def test_q20_semi_join_of_aggregates(spark, sf_dir):
    """Q20's defining shape survives the adaptation: the supplier
    dimension is confined by a LEFT SEMI join against the
    aggregate-derived excess-supply set (never a row-multiplying inner
    join), and the part-name prefix + nation cut reach the scans as
    pushed filters."""
    df = _SPECS["q20_excess_supply_share"].fn(spark, sf_dir)
    plan = explain_formatted(df)
    assert "LeftSemi" in plan, plan[:2000]
    pushed = " ".join(pushed_filters(df))
    assert "s_nationkey" in pushed and "p_name" in pushed


def test_funnel_single_data_shuffle(spark, sf_dir):
    """window_funnel_steps stacks its three dependent window minima over
    ONE user_id exchange (plus the trivial final single-partition
    aggregate) — the property that keeps the funnel from re-shuffling a
    100-TB event log once per step."""
    import re

    df = _SPECS["window_funnel_steps"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    kinds = re.findall(r"Exchange (\w+)", plan)
    assert kinds.count("hashpartitioning") == 1, kinds


def test_cdc_latest_uses_partial_aggregation(spark, sf_dir):
    """cdc_latest_by_key must compact via an aggregate with map-side
    partial combine (partial_max_by before the exchange) and never a
    partition-wide window sort — the property that makes shuffle bytes
    O(distinct keys) instead of O(changelog) at 100 TB."""
    df = _SPECS["cdc_latest_by_key"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan, plan[:2000]
    assert "Window" not in plan


def test_interval_binned_join_is_equi(spark, sf_dir):
    """b3.14: the bucket rewrite must produce a shuffled EQUI-join — a
    regression to BroadcastNestedLoopJoin/CartesianProduct is the O(n·m)
    blow-up the binning exists to prevent (with no equi key, Spark plans
    a raw inequality join as BNLJ regardless of side sizes)."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = explain_formatted(_SPECS["join_interval_binned"].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan[:1500]
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_top_n_per_group_uses_window_group_limit(spark, sf_dir):
    """b5.6: the rank<=k filter must trigger Spark's WindowGroupLimit
    pushdown — a PARTIAL group-limit before the shuffle keeps only k rows
    per group per input partition, so the exchange carries O(groups·k)
    rows instead of the whole table (the difference between sorting 100 TB
    and sorting top-3s at scale)."""
    df = _SPECS["window_top_n_per_group"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "Partial" in plan.split("WindowGroupLimit")[-1] or \
        plan.count("WindowGroupLimit") >= 2, plan[:2000]


def test_hll_rollup_builds_sketches_map_side(spark, sf_dir):
    """b4.14: the per-nation sketch build must run as a PARTIAL aggregate —
    each scan task reduces its slice to fixed-size sketch buffers before
    the shuffle, which is the whole point of a mergeable sketch."""
    df = _SPECS["agg_hll_sketch_rollup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_hll_sketch_agg" in plan, plan[:2000]


def test_incremental_refresh_pushes_split_filters(spark, sf_dir):
    """b4.15: both the base and delta branches must push their date
    predicate into the parquet scan — the delta branch reading O(delta)
    bytes is what makes incremental refresh incremental."""
    df = _SPECS["agg_incremental_refresh"].fn(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "LessThan(o_orderdate" in pushed
    assert "GreaterThanOrEqual(o_orderdate" in pushed


def test_r5_decision_support_top_n_is_take_ordered(spark, sf_dir):
    """b12.1/b12.2: the final top-N runs as TakeOrderedAndProject
    (per-partition heaps, constant driver memory) — never a global sort."""
    for name in ("q3_shipping_priority", "q18_large_volume_customer"):
        plan = _SPECS[name].fn(spark, sf_dir) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, (name, plan[:1500])


def test_quantile_rollup_builds_summaries_map_side(spark, sf_dir):
    """b4.16: the per-nation equi-depth summary must build as a PARTIAL
    percentile_approx (map-side GK) — the shuffle carries B-point
    summaries, not raw rows."""
    plan = _SPECS["agg_quantile_sketch_rollup"].fn(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "partial_percentile_approx" in plan, plan[:2000]


def test_pq_adc_joins_are_broadcast_only(spark, sf_dir):
    """b11.28: every PQ join side is bytes-sized (codebook M·K·subdim,
    ADC table Q·M·K) — the plan must use only broadcast hash joins, no
    sort-merge shuffle of the corpus against them."""
    plan = _SPECS["sim_pq_adc_topk"].fn(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_q19_disjunction_pushes_part_side_predicates(spark, sf_dir):
    """r7.10: the point of the Q19 shape — Catalyst must extract the
    part-only disjunction (brand/size arms) from the mixed OR and push it
    into the part scan's PushedFilters, so the join never sees parts no
    arm could match.  A naive engine evaluates the whole OR post-join and
    ships every part row."""
    df = _SPECS["q19_disjunctive_revenue"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    part_scans = [ln for ln in plan.splitlines()
                  if "part.parquet" in ln and "PushedFilters" in ln]
    assert part_scans, plan[:2000]
    pushed = part_scans[0].split("PushedFilters:", 1)[1]
    assert "p_brand" in pushed and "Or" in pushed, pushed


def test_q21_witnesses_plan_as_semi_and_anti_joins(spark, sf_dir):
    """r8.4: Q21's EXISTS/NOT EXISTS witnesses must plan as LeftSemi and
    LeftAnti joins — never an inner self-join + dedup, which would
    materialize the quadratic per-order supplier pairs at scale."""
    plan = explain_formatted(
        _SPECS["q21_suppliers_who_kept_waiting"].fn(spark, sf_dir))
    assert "LeftSemi" in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_quadratic_moment_sums_run_in_decimal_domain(spark, sf_dir):
    """r10 review hardening: per-row products of corpus-scale moment
    recipes fit int64, but their SUMS (Σx², Σxy, Σ i·len, global cents²
    totals) overflow int64 (ANSI throws, non-ANSI wraps) well inside
    the 100-TB design point — every quadratic/global moment must
    aggregate as DecimalType(38,0), never long.  Guards against a
    'simplifying' regression back to .cast('bigint') sums."""
    from pyspark.sql.types import DecimalType, LongType

    from json_sql_database_storage_spark.llm.staged_r11 import (
        text_doc_length_gini, text_zipf_slope,
    )

    def field_types(df):
        return {f.name: f.dataType for f in df.schema.fields}

    # registered: degree-moment sums (schema inspected on the lazy frame)
    assort = _SPECS["graph_degree_assortativity"].fn(spark, sf_dir)
    plan = explain_formatted(assort)
    assert "decimal(38,0)" in plan, plan[:3000]

    # registered: per-type census sums feeding the outlier inequality
    zs = _SPECS["events_zscore_outliers"].fn(spark, sf_dir)
    zplan = explain_formatted(zs)
    assert "decimal(38,0)" in zplan, zplan[:3000]

    # staged: rank-weighted gini moment and zipf quadratic moments
    zipf = text_zipf_slope(spark, sf_dir)
    assert "decimal(38,0)" in explain_formatted(zipf), "zipf moments"
    # gini widens the factors to decimal(19,0) BEFORE the product (the
    # plan prints the input casts; the sum's decimal(38,0) output type is
    # schema-level, not rendered) — losing these casts is the regression
    gini = text_doc_length_gini(spark, sf_dir)
    assert "decimal(19,0)" in explain_formatted(gini), "gini moment"
    # the linear moments legitimately stay BIGINT
    assert isinstance(field_types(zipf)["n_terms"], LongType)
    assert not isinstance(field_types(gini)["sx"], DecimalType)
