"""Registry-level output-type lint (VERDICT.md round 1, "What's wrong").

The driver's value hasher is stricter than the local canonicalizer in two
ways observed in CORRECTNESS_r01:

1. DuckDB types an uncast integer ``sum()`` as HUGEINT (INT128) and the
   driver's hash then disagrees with Spark's BIGINT even when the values are
   identical (scan_in_memory, scan_json_ingest_inference both hash-failed).
2. Array/struct-typed OUTPUT columns crash the hasher outright
   (``TypeError: unhashable type: 'list'`` — agg_collect,
   join_renest_documents both ERR'd).

So every registered query must produce only driver-hashable scalar columns,
on BOTH engines.  This lint runs each oracle through DuckDB ``DESCRIBE``
(types only, no execution) and each Spark query's analyzed schema, and
fails the build on any hazardous column type before the driver ever sees it.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from json_sql_database_storage_spark import registry

registry.load_all()
_SPECS = registry.specs()
_WITH_ORACLE = sorted(n for n, s in _SPECS.items() if s.oracle is not None)
_ALL = sorted(_SPECS)

# DuckDB types that hash identically to the Spark output through the
# driver's pandas bridge.  HUGEINT / DECIMAL / DATE / LIST / STRUCT / MAP
# are all observed or expected hazards.  Exact match (not prefix) so that
# "BIGINT[]" — a list — is correctly rejected.
_DUCK_OK_TYPES = frozenset({
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
    "DOUBLE", "FLOAT", "VARCHAR",
    "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP_MS", "TIMESTAMP_S",
})
# BOOLEAN is deliberately absent: the driver's hasher is proven on
# int/double/string/timestamp (CORRECTNESS_r01 green rows) but no green row
# has ever carried a boolean — registered outputs use BIGINT 0/1 instead.

_SPARK_OK_TYPES = (
    T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.StringType,
    T.TimestampType, T.TimestampNTZType,
)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_output_types_hashable(duck, name):
    cols = duck.execute(f"DESCRIBE {_SPECS[name].oracle}").fetchall()
    bad = [(c[0], c[1]) for c in cols
           if str(c[1]).upper() not in _DUCK_OK_TYPES]
    assert not bad, (
        f"{name}: oracle output columns with driver-hasher-hazard DuckDB "
        f"types {bad}; cast sums to BIGINT/DOUBLE and render arrays/structs "
        f"with to_json")


@pytest.mark.parametrize("name", _ALL)
def test_spark_output_types_hashable(spark, sf_dir, name):
    schema = _SPECS[name].fn(spark, sf_dir).schema
    bad = [(f.name, f.dataType.simpleString()) for f in schema.fields
           if not isinstance(f.dataType, _SPARK_OK_TYPES)]
    assert not bad, (
        f"{name}: Spark output columns with driver-hasher-hazard types "
        f"{bad}; render arrays/maps/structs with to_json and decimals/dates "
        f"as double/timestamp")


# Cross-engine KIND parity: integer widths canonicalize identically through
# the driver's hash (window_ranking was green in r01 with BIGINT-vs-int), but
# int-vs-float (e.g. DuckDB sign() TINYINT vs Spark signum() DOUBLE) renders
# "1" vs "1.0" under type-sensitive hashing — catch the class statically.
_DUCK_KIND = {
    "BIGINT": "i", "INTEGER": "i", "SMALLINT": "i", "TINYINT": "i",
    "UBIGINT": "i", "UINTEGER": "i",
    "DOUBLE": "f", "FLOAT": "f", "VARCHAR": "s",
    "TIMESTAMP": "t", "TIMESTAMP_NS": "t", "TIMESTAMP_MS": "t",
    "TIMESTAMP_S": "t",
}


def _spark_kind(dt):
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "i"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "f"
    if isinstance(dt, T.StringType):
        return "s"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "t"
    return "?"


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_cross_engine_kind_parity(spark, duck, sf_dir, name):
    duck_kinds = {c[0]: _DUCK_KIND.get(str(c[1]).upper(), "?")
                  for c in duck.execute(f"DESCRIBE {_SPECS[name].oracle}").fetchall()}
    spark_kinds = {f.name: _spark_kind(f.dataType)
                   for f in _SPECS[name].fn(spark, sf_dir).schema.fields}
    mismatched = {c: (duck_kinds[c], spark_kinds[c])
                  for c in duck_kinds if c in spark_kinds
                  and duck_kinds[c] != spark_kinds[c]}
    assert not mismatched, f"{name}: cross-engine kind mismatch {mismatched}"


def test_driver_check_bookkeeping_is_outcome_aware():
    """The rotation derives its "already green" set from the committed
    CORRECTNESS_r*.json files: a name whose latest driver row passed counts
    checked; a name whose latest row ERR'd (stream_sessionize_batch in r2)
    must NOT count checked even though the hardcoded fallback lists it —
    and every name with no driver row at all must sort into the front
    window ahead of every checked name."""
    checked = registry._CHECKED
    assert "scan_in_memory" in checked          # green in r2
    # ERR'd in r2; stays unchecked until a LATER round's file records a pass
    if "stream_sessionize_batch" not in registry._PASSED_LATEST:
        assert "stream_sessionize_batch" not in checked
    order = list(registry.specs())
    never_checked = [n for n in order if n not in checked]
    if never_checked:  # all-green registry: nothing left to front-load
        # Unchecked queries must form a contiguous block ahead of every
        # checked query (minus the pinned reverify prefix): the driver
        # checks a fixed-size prefix per round, so any checked name
        # sorting before an unchecked one wastes a hard-signal slot.
        # (More unchecked names than the ~50-slot window is legitimate —
        # the overflow fronts itself next round via the outcome-aware
        # bookkeeping.)
        reverify = set(registry._REVERIFY_FIRST)
        last_unchecked = max(order.index(n) for n in never_checked)
        checked_before = [n for n in order[:last_unchecked]
                          if n in checked and n not in reverify]
        assert not checked_before, checked_before


# ---------------------------------------------------------------------------
# Broadcast-boundedness audit (r5 verdict "wrong" #2 / next-round #3): every
# F.broadcast() call site in the package must appear here with a documented
# reason its payload is BOUNDED independent of corpus size.  A new broadcast
# site fails this lint until audited — the structural guard against another
# unbounded-vocabulary broadcast slipping into a registered query.
# Keyed by (file relpath, enclosing function); values are the audit note.
# ---------------------------------------------------------------------------

_BROADCAST_AUDIT: dict[tuple[str, str], str] = {
    ("operators/staged_r12.py", "q_orders_open_aging"):
        "1-row max-orderdate anchor scalar (map-side max partial)",
    ("operators/staged_r12.py", "q_supplier_lineload"):
        "1-row book-total scalar feeding the ppm share",
    ("operators/staged_r12.py", "q_price_band_share"):
        "1-row revenue-total scalar feeding the ppm share",
    ("llm/staged_r12.py", "sim_cell_balance"):
        "1-row corpus-total scalar onto the k-row cell census",
    ("llm/staged_r12.py", "text_bigram_entropy_rate"):
        "1-row bigram-entropy fold joined onto the 1-row unigram fold",
    ("llm/staged_r12.py", "text_length_deciles"):
        "1-row corpus doc-count scalar onto the bounded length census",
    ("llm/staged_r12.py", "text_pmi_collocations"):
        "1-row total-bigram-count normalizer scalar (map-side sum partial)",
    ("operators/staged_r13.py", "q_supplier_nation_herfindahl"):
        "supplier (|S|) and nation (25) dims — both dimension-bounded",
    ("operators/staged_r13.py", "q_brand_discount_profile"):
        "part dimension (p_partkey, p_brand) — dimension-bounded",
    ("operators/staged_r13.py", "q_nation_acctbal_profile"):
        "nation dim (25 rows)",
    ("llm/staged_r13.py", "sim_inner_product_stats"):
        "48-row deterministic-hash vector sample (TakeOrdered bound)",
    ("llm/staged_r13.py", "text_first_token_census"):
        "1-row corpus doc-count scalar (map-side sum partial)",
    ("operators/staged_r14.py", "q_region_brand_affinity"):
        "nation (25) and region (5) dims — dimension-bounded",
    ("operators/staged_r14.py", "q_returns_by_nation_year"):
        "nation dim (25 rows)",
    ("operators/staged_r14.py", "q_part_name_terms"):
        "1-row part-count scalar (map-side count partial)",
    ("operators/staged_r14.py", "q_cohort_retention_triangle"):
        "cohort-size relation (≤|years| rows, k=0 slice of the triangle)",
    ("llm/staged_r14.py", "text_positional_term_profile"):
        "top-20 df terms (TakeOrdered bound)",
    ("llm/staged_r14.py", "sim_dimension_covariance_topk"):
        "per-dim sum relation (64 rows, twice) + 1-row vector count",
    ("streaming/queries.py", "stream_static_join"):
        "customer dimension table — |dim| ≪ facts; shuffle-join fallback if it outgrows executors",
    ("operators/staged_r10.py", "stream_scd2_enrichment"):
        "SCD2 customer dimension (≤2 versions × ≤500 keys) — metadata-sized next to the event stream",
    ("llm/staged_r10.py", "text_ngram_novelty"):
        "1-row corpus doc-count scalar",
    ("llm/staged_r10.py", "sample_token_budget_epochs"):
        "1-row (denominator, total-tokens) ordered-fold scalar",
    ("operators/aggregates.py", "agg_hll_sketch_rollup"):
        "1-row global count + per-group sketch summaries (groups × sketch size)",
    ("operators/aggregates.py", "agg_quantile_sketch_rollup"):
        "1-row count, per-group summaries, per-group estimates — all O(groups)",
    ("operators/analytics.py", "events_zscore_outliers"):
        "per-event-type stats table — O(|event types|)",
    ("operators/analytics.py", "q3_shipping_priority"):
        "segment-filtered customer keys — dimension-bounded",
    ("operators/analytics.py", "q5_local_supplier_volume"):
        "region (5) / nation (25) / supplier dims — all dimension-bounded",
    ("operators/analytics.py", "q10_returned_items"): "nation dim (25 rows)",
    ("operators/tpch_staged.py", "q7_volume_shipping"):
        "nation dim (25 rows), twice under different roles",
    ("operators/tpch_staged.py", "q8_market_share"):
        "nation dim (25 rows) / region-filtered nation keys (≤25)",
    ("operators/tpch_staged.py", "q15_top_supplier"):
        "1-row max-revenue aggregate",
    ("operators/tpch_staged.py", "q20_excess_supply_share"):
        "prefix-filtered part keys (dimension-bounded) + nation dim (25 rows)",
    ("operators/staged_r11.py", "q_supplier_churn"):
        "1-row last-data-year scalar (map-side max partial)",
    ("operators/staged_r11.py", "q_nation_trade_balance"):
        "nation dim (25 rows), both fact→dimension directions",
    ("operators/staged_r11.py", "q9_product_type_profit"):
        "suffix-filtered part keys + retail price (dimension-bounded) + nation dim (25 rows)",
    ("operators/staged_r11.py", "q2_min_cost_supplier"):
        "region-filtered nation/supplier dims + size-filtered part keys — all dimension-bounded",
    ("operators/staged_r11.py", "q11_important_stock"):
        "nation-filtered supplier keys (dimension-bounded) + 1-row group-total threshold",
    ("operators/staged_r11.py", "q_order_size_histogram"):
        "1-row histogram total (map-side partials)",
    ("operators/staged_r11.py", "q_ship_latency_p95"):
        "nation dim (25 rows); supplier joins un-broadcast (grows with SF)",
    ("llm/staged_r11.py", "sim_ann_recall_curve"):
        "10-query probe set (≤30 rows), 3-row nprobe grid, 10-row exact-side query sample — all evaluation-bounded",
    ("llm/staged_r11.py", "text_source_overlap"):
        "per-source distinct-gram totals (catalog-sized, one row per source)",
    ("operators/tpch_staged.py", "q22_global_sales_opportunity"):
        "1-row global average-balance threshold",
    ("operators/joins.py", "join_broadcast_dim"): "region dim (5 rows)",
    ("operators/joins.py", "join_cross"): "nation dim (25 rows)",
    ("operators/joins.py", "join_range_theta"): "literal price-bucket table",
    ("operators/joins.py", "join_bnlj_price_bands"): "literal band table",
    ("operators/joins.py", "join_star_revenue"): "region + nation dims",
    ("operators/scale.py", "scale_salted_join"): "literal salt ids",
    ("operators/scans.py", "scan_federated_join"):
        "JDBC customer/nation back-reads — dimension-bounded",
    ("operators/scd.py", "scd2_dimension_versioning"):
        "changed-key set — delta-bounded",
    ("llm/clustering.py", "_assign"): "k centroids × dim doubles",
    ("llm/clustering.py", "sim_semdedup_prod"): "1-row derived k",
    ("llm/pq.py", "pq_encode"): "M×K codebook (bytes)",
    ("llm/pq.py", "_pq_assign"): "M×K codebook (bytes)",
    ("llm/bpe.py", "_train_word_types"):
        "1-row argmax merged-pair table per iteration",
    ("llm/pq.py", "sim_pq_adc_topk"): "codebook + Q×M×K ADC distance table",
    ("llm/pq.py", "sim_ivfpq_topk"):
        "trained codebook (M×K), probe-cell list (Q×nprobe), ADC table",
    ("llm/pq.py", "ivfpq_probe"):
        "persisted centroids (KC×dim) + codebook (M×K) + probe list "
        "(Q×nprobe) + ADC table (Q×M×K) + query vectors (Q) — all "
        "query/codebook-bounded, never corpus-bounded",
    ("llm/pq.py", "sim_ivfpq_residual_topk"):
        "trained coarse centroids (KC×dim), residual codebook (M×K), "
        "probe list (Q×nprobe), per-cell ADC table (Q×nprobe×M×K), "
        "query vectors (Q)",
    ("llm/search.py", "text_inverted_index_search"): "literal query terms",
    ("llm/staged_r9.py", "sample_importance_weights"):
        "256-row hashed-bucket LLR table — fixed feature space at any "
        "corpus size (the DSIR hashing trick)",
    ("llm/staged_r9.py", "text_keyword_topk"):
        "1-row global doc count (IDF denominator)",
    ("llm/staged_r9.py", "sim_embedding_drift"):
        "1-row split point + 1-row half totals over the k-cell census",
    ("llm/staged_r9.py", "text_vocab_growth"):
        "1-row global doc count (decile denominator)",
    ("operators/staged_r9.py", "q_basket_lift"):
        "1-row global order count (lift denominator)",
    ("operators/staged_r9.py", "stream_heavy_hitters"):
        "1-row corpus word count (threshold scalar) + the O(k)-row MG "
        "reduction scalar inside make_version",
    ("operators/staged_r9.py", "q_yearly_growth"): "nation dim (25 rows)",
    ("operators/staged_r9.py", "make_version"):
        "1-row MG reduction scalar (the (cap+1)-th largest count) — the "
        "state table it reduces is O(k) rows by construction",
    ("llm/search.py", "bm25_probe"):
        "literal query terms + 1-row corpus stats + per-query-term df rows",
    ("llm/similarity.py", "cell_similarities"): "label centroids (≤10)",
    ("llm/staged.py", "sim_random_projection_topk"):
        "projected query vectors (fixed count, 16 doubles each)",
    ("llm/dedup.py", "sample_split_no_leakage"):
        "1-row global leaked-cluster count",
    ("llm/similarity.py", "sim_cosine_topk"): "query vectors (fixed count)",
    ("llm/similarity.py", "_ivf_score_rank"):
        "probe rows — Q × nprobe (shared by sim_ivf_topk / sim_ivf_partitioned)",
    ("llm/similarity.py", "sim_nearest_centroid"): "label centroids (≤10)",
    ("llm/sketches.py", "text_heavy_hitters"):
        "1-row count + ≤(k−1)·partitions Misra-Gries candidates",
    ("llm/text_analysis.py", "text_term_cooccurrence"):
        "top-K term lists — O(K)",
    ("llm/text_analysis.py", "lm_token_scores"):
        "top-_LM_VOCAB capped LM + 1-row count (r5 fix: was unbounded "
        "vocab; shared by text_unigram_logprob / sample_lm_quality_buckets)",
    ("llm/text_analysis.py", "sample_domain_balance"):
        "1-row target + per-language rates",
    ("llm/text_analysis.py", "text_tfidf"): "1-row corpus count",
    ("llm/text_analysis.py", "text_decontaminate"):
        "eval-set n-grams — eval corpora are fixed and small",
    ("llm/staged_r9.py", "sample_domain_mixture"):
        "1-row ordered-fold denominator",
    ("llm/staged_r9.py", "sample_cluster_balanced"):
        "1-row denominator + k-row (k=8) cluster quotas",
    ("llm/staged_r9.py", "sim_mmr_rerank"):
        "query vectors (fixed count) + per-round Q-row picked set",
    ("llm/staged_r9.py", "text_bigram_logprob"):
        "1-row vocab size V (the bigram/unigram COUNT tables join, "
        "never broadcast)",
}


def test_every_broadcast_site_is_audited_bounded():
    import ast
    import os

    pkg = os.path.dirname(
        os.path.abspath(registry.__file__))
    found: set[tuple[str, str]] = set()
    for dirpath, _, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, pkg)
            tree = ast.parse(open(path).read())
            spans: list[tuple[int, int, str]] = []

            class _V(ast.NodeVisitor):
                def visit_FunctionDef(self, node):
                    spans.append((node.lineno, node.end_lineno, node.name))
                    self.generic_visit(node)

            _V().visit(tree)
            for node in ast.walk(tree):
                if (isinstance(node, ast.Call)
                        and isinstance(node.func, ast.Attribute)
                        and node.func.attr == "broadcast"):
                    enc = [n for (a, b, n) in spans
                           if a <= node.lineno <= b]
                    found.add((rel, enc[-1] if enc else "<module>"))
    unaudited = found - set(_BROADCAST_AUDIT)
    assert not unaudited, (
        f"unaudited F.broadcast sites {sorted(unaudited)} — add each to "
        f"_BROADCAST_AUDIT with a boundedness argument (no unbounded "
        f"broadcasts: r5 verdict)")
    stale = set(_BROADCAST_AUDIT) - found
    assert not stale, f"stale broadcast-audit entries {sorted(stale)}"


def test_export_order_rotation_contract():
    """r7.8 (r6 verdict next-round #8): the driver's ~50-row correctness
    window covers specs() in export order, so the ordering contract IS
    the freshness mechanism — pin it: (a) every never-driver-checked
    query precedes every checked one (new operators get FIRST rows
    before anything is re-verified); (b) within the checked suffix,
    latest-driver-round is non-decreasing (stalest green signal first);
    (c) any query whose LATEST driver row failed re-fronts into the
    unchecked group.  The hand-pinned _REVERIFY_FIRST prefix (checked
    names whose source files were edited after their latest driver row —
    r10 verdict next-round #2b) sits ahead of everything by design and is
    excluded from the contiguity/staleness assertions."""
    from json_sql_database_storage_spark.registry import (_CHECKED,
                                                          _LATEST_ROUND,
                                                          _REVERIFY_FIRST)

    # the pinned prefix must actually exist and actually front the order —
    # a typo'd entry would otherwise be dropped silently by _export_order's
    # `if n in names` and burn its driver-window slot undetected.  The pin
    # is SELF-EXPIRING: names re-checked at/after _REVERIFY_PINNED_AT_ROUND
    # drop out, so the expected prefix applies the same rule.
    from json_sql_database_storage_spark.registry import (
        _REVERIFY_PINNED_AT_ROUND,
    )

    all_names = list(registry.specs())
    missing = [n for n in _REVERIFY_FIRST if n not in all_names]
    assert not missing, f"_REVERIFY_FIRST names not in registry: {missing}"
    active = [n for n in _REVERIFY_FIRST
              if _LATEST_ROUND.get(n, -1) < _REVERIFY_PINNED_AT_ROUND]
    assert all_names[:len(active)] == active, (
        "active _REVERIFY_FIRST entries must lead the export order")

    names = [n for n in all_names if n not in set(active)]
    flags = [n in _CHECKED for n in names]
    first_checked = flags.index(True) if True in flags else len(names)
    assert all(flags[first_checked:]), (
        "an unchecked query sorted after a checked one")
    rounds = [_LATEST_ROUND.get(n, 0) for n in names[first_checked:]]
    assert rounds == sorted(rounds), "checked suffix not stalest-first"
