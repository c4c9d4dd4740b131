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
    # tier 2: queries whose outputs were re-routed through the same
    # idiom this round as knife-edge prophylaxis (VERDICT r5 task #5) —
    # semantics changed, so their r5/r4 greens are void.
    "agg_corr_stats",
    "agg_approx_quantiles",
    "ts_interpolate_linear",
    "text_doc_freq",
    "text_tfidf_topterms",
    "text_lm_score",
    # tier 2b: NEW this round — no driver row exists yet anywhere:
    # storage-layout queries (partition pruning, bucketed co-located
    # join), batch sessionization, OLS regression aggregates, value
    # window fns, bitwise suite.
    "io_partitioned_prune",
    "join_bucketed_colocated",
    "sessionize_events",
    "agg_regr_ols",
    "window_value_fns",
    "fn_bitwise_suite",
    # tier 2c: NEW this round — the extended TPC-H corpus (Q7-Q19
    # shapes adapted to the fixture schema; operators/tpch_extra.py).
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_late_priority",
    "q14_promo_revenue",
    "q16_supplier_variety",
    "q18_large_orders",
    "q19_disjunctive_pred",
    # tier 2d: NEW this round — grouped-OLS applyInPandas UDAF
    # (integer-exact kernel), streaming top-k trending (stateful hourly
    # counts + batch-side rank finishing), and lakehouse MERGE/upsert
    # (single full-outer-join shuffle).
    "udaf_group_ols",
    "stream_topk_trending",
    "merge_upsert_orders",
    "stream_latest_state_per_user",
    "emb_centroid_by_label",
    "pipeline_dataset_card",
    # tier 3: the 28 in-window of 34 queries whose latest driver row is ROUND 1 — before
    # the driver demonstrably regenerated fixtures (the r2→r3 NTZ flip).
    # Includes the §2.1 reference folds (math.c:197-265 semantics), the
    # TPC-H shapes, and all three multimodal queries (VERDICT r5 task #2).
    "math_sub",
    "math_mul",
    "math_div",
    "math_cast_int",
    "math_missing_field",
    "math_nonnumeric",
    "math_case_insensitive",
    "q3_shipping_priority",
    "q5_local_supplier",
    "agg_percentiles",
    "dedup_exact",
    "mm_metadata",
    "mm_decode",
    "mm_frame_sample",
    # tier 4: touched for performance this round (length-bucket pruning,
    # single-action CC fixpoint, mem-source batching).
    "dedup_ngram_jaccard",
    "dedup_cluster_cc",
    "mem_source_fold",
    # Demoted to fit the eighteen new queries (family covered in-window):
    # dedup_simhash (exact/jaccard/cc in-window), sim_range_search
    # (bruteforce green r5, gemm/ivf r4), text_lang_id (token_stats +
    # three tier-2 text queries remain), agg_count_distinct
    # (q16_supplier_variety's COUNT DISTINCT is in-window), join_anti
    # (q16's left_anti exclusion is in-window), text_token_stats
    # (doc_freq/tfidf/lm_score tier-2 remain),
    # agg_cube + agg_rollup (rollup_time_grains' GROUPING SETS kin
    # in-window), window_rank_lag + window_running_total (4 window
    # queries remain), sort_limit_topn (topk_per_group in-window),
    # setop_union/intersect (the *_all bag variants were green in r5),
    # q6_forecast_revenue (single-table filter-agg shape covered by q1 +
    # q14/q19), text_token_count_regex/bigrams/fingerprint (token_stats,
    # lang_id + three tier-2 text queries remain), dedup_minhash_signatures
    # (dedup_minhash_lsh green r5; exact+simhash in-window),
    # sim_ann_bucketed (range/bruteforce/gemm/ivf covered r4/r5),
    # join_full_outer (semi/anti/asof/bucketed in-window), math_sum
    # (entry() smoke-checks the flagship fold every round; six sibling
    # folds in-window) — r7 rotates them back in.
    # Families left past the window are all r4/r5-green with unchanged
    # semantics (streaming dedup/joins/windows, fn suites, subqueries,
    # sampling, curation, skew, kmeans, pagerank, decontam, quality,
    # scd2, udf/udtf, grouping sets, pivot, approx sketches, quantize,
    # distribution windows, set-ops *_all, unpivot, locf) — rotation
    # brings representatives back in r7.
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
