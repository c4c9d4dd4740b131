"""Central registry mapping query names → (Spark builder, DuckDB oracle SQL).

The driver contract (__spark_entry__.py) needs two parallel dicts:
``queries()[name](spark, sf_dir) -> DataFrame`` and ``oracle_sql()[name]``
— ANSI SQL DuckDB runs over the same parquet tables. Operator modules
register here via :func:`register`; queries whose semantics aren't
SQL-expressible (LSH bucketing, stateful streaming) register with
``oracle=None`` and get the driver's weaker rows-only check.

Registration order is preserved (dict insertion order) so the benchmark
runs queries in a stable, documented order.

The exposed order is NOT raw import order: the driver's correctness run
verifies a prefix of the registered queries (round 1 cut at 50, leaving
every query registered past the cut — temporal joins, scalar-fn suites,
subqueries, UDF/UDAF/UDTF, streaming windows/state/dedup — with no
driver row; VERDICT r1 §"What's missing" #1). ``_PRIORITY`` pins an
explicit verification-first order: previously-unverified modules, then
queries new or changed this round, then one representative per
already-verified operator family — so a 50-query window still touches
every SURVEY.md §2 component. Queries not in the list follow in import
order; the bench always runs all of them.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False

# Verification-first ordering (see module docstring). Per-round tiers:
#   tier 1 — queries red in the previous round's driver check, fixed now;
#   tier 2 — queries new or semantically changed this round;
#   tier 3 — queries with the OLDEST driver green row (fixtures get
#            regenerated between rounds, so old greens go stale);
#   tier 4 — perf-touched queries + reference-core continuity.
# Everything past the 50-slot window stays registered and benched; the
# next round's rotation brings representatives back.
_PRIORITY: tuple[str, ...] = (
    # --- round 6 rotation ---
    # tier 1: the six r5 hash-fails, all fixed this round by replacing
    # engine-native round(DOUBLE) with the shared floor(x*scale+0.5)
    # idiom (functions.fixed_point / fixed_round) — need green rows.
    "fn_math_suite",
    "udaf_event_type_cents",
    "stream_stateful_user_totals",
    "stream_rollup_hour_to_day",
    "rollup_time_grains",
    "window_range_trailing_1h",
    # tier 2: outputs re-routed through the same idiom this round as
    # knife-edge prophylaxis (VERDICT r5 task #5) — semantics changed,
    # so their r5/r4 greens are void.
    "agg_corr_stats",
    "agg_approx_quantiles",
    "ts_interpolate_linear",
    "text_doc_freq",
    "text_tfidf_topterms",
    "text_lm_score",
    # tier 2b: NEW this round — no driver row exists anywhere yet.
    # Storage layout, batch sessionization, OLS aggregates, value
    # windows, bitwise suite:
    "io_partitioned_prune",
    "join_bucketed_colocated",
    "sessionize_events",
    "agg_regr_ols",
    "window_value_fns",
    "fn_bitwise_suite",
    # the extended TPC-H corpus (operators/tpch_extra.py):
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_late_priority",
    "q14_promo_revenue",
    "q16_supplier_variety",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q2_min_cost_supplier",
    "q4_priority_checking",
    "q11_important_stock",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q22_sales_opportunity",
    # UDF/streaming/lakehouse/vector/card additions:
    "udaf_group_ols",
    "stream_topk_trending",
    "merge_upsert_orders",
    "stream_latest_state_per_user",
    "stream_stateful_sessions",
    "emb_centroid_by_label",
    "pipeline_dataset_card",
    "udaf_cogroup_reconcile",
    # tier 3: reference-core folds (math.c:197-265 semantics) + the
    # three multimodal queries — r1-stale, predate the driver's fixture
    # regeneration (VERDICT r5 task #2; the r6 prior window carried the
    # wider stale set, these are the rows that must never go unproven).
    "math_sub",
    "math_mul",
    "math_div",
    "math_cast_int",
    "math_missing_field",
    "math_nonnumeric",
    "math_case_insensitive",
    "mm_metadata",
    "mm_wav_decode",
    # (mm_decode + mm_frame_sample rotate to r7 — the mm Arrow plumbing
    # family is covered by the two queries above, and mm_wav_decode is
    # the REAL container parser that resolves VERDICT r5 "missing" #4
    # for uncompressed formats — driver proof matters most there.)
    # Past the 50-slot window (r7 rotates representatives back in).
    # FIRST r7 priorities — new-in-r6 but out of window (locally gated
    # only): q13_order_distribution, q20_part_promotion,
    # q21_waiting_supplier, agg_bool_suite, stream_distinct_users_hourly,
    # sample_weighted_bernoulli, rollup_incremental_refresh,
    # ts_downsample_ohlc, io_xml_roundtrip, pysink_fold_roundtrip,
    # agg_median_disc, fn_variant_suite, emb_norm_arrow, fn_url_suite,
    # dedup_url_canonical, cdc_snapshot_diff, dq_volume_anomaly_days,
    # er_fuzzy_match_parts, agg_mode_deterministic,
    # window_running_distinct, agg_winsorized_stats, graph_bfs_hops,
    # stream_session_window_user, agg_exact_moments,
    # fn_string_shape_suite, join_null_safe, mm_decode,
    # mm_frame_sample. Then:
    # q3/q5 (15 TPC-H kin in-window), agg_percentiles/agg_count_distinct
    # (regr/corr/quantiles in-window), dedup_* (exact/simhash/jaccard/cc
    # r1-r5 green, jaccard+cc perf-touched but output-pinned by the
    # local bitwise gate), mem_source_fold (green r5, Arrow batching
    # pinned by tests), sim/text/setop/window/subquery/sampling/
    # curation/skew/kmeans/pagerank/decontam/quality/scd2/udf/udtf
    # families — all r4/r5-green with unchanged semantics.
)


def _ensure_loaded() -> None:
    """Import every operator module for its registration side effects,
    then fix the exposed order to _PRIORITY + (rest, import order)."""
    global _LOADED, _QUERIES, _ORACLES
    if _LOADED:
        return
    # Imports deferred so `import registry` alone has no Spark dependency cost.
    from fluent_bit_filter_math_spark.operators import (  # noqa: F401
        mathfold,
        relational,
        dedup,
        similarity,
        text,
        multimodal,
        temporal,
        sql_functions,
        subqueries,
        python_udfs,
        sampling,
        curation,
        skew,
        quality,
        graph,
        storage,
        tpch_extra,
    )
    from fluent_bit_filter_math_spark.streaming import (  # noqa: F401
        dedup as stream_dedup,
        joins as stream_joins,
        stateful,
        windows,
    )

    missing = [n for n in _PRIORITY if n not in _QUERIES]
    if missing:
        raise RuntimeError(f"_PRIORITY names unknown queries: {missing}")
    ordered = list(_PRIORITY) + [n for n in _QUERIES if n not in _PRIORITY]
    _QUERIES = {n: _QUERIES[n] for n in ordered}
    _ORACLES = {n: _ORACLES[n] for n in ordered if n in _ORACLES}
    _LOADED = True
