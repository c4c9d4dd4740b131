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
    # --- round 10 rotation (composition from tools/green_age.py) ---
    # tier 1: never driver-checked — the 18 new r10 operators (the
    # streaming Python DataSource writer quadrant, VERDICT r9 #6, plus
    # the retrieval/eval/sketch/audit/codec/stat additions), and the
    # 15 late-r10 additions (rank/effect-size stats, link analysis,
    # WL fingerprints, retrieval eval, readability/PMI, silhouette,
    # concentration/Lorenz, l-diversity, PPR, purchase cycles, MASE,
    # calendar gaps). Never-checked outranks stale (the r6 lesson): a
    # query with NO driver row ever is a coverage hole; a stale green
    # still has current-fixture evidence in CORRECTNESS_LOCAL.json.
    # Their slots come from the window's tail (10 r1-era + 5 r4-era
    # refreshes, moved to the r11 queue head below);
    # tools/window_audit.py asserts this composition.
    "sim_mmr_diversify",
    "graph_hyperanf_nf",
    "dedup_cdc_chunks",
    "ts_mase_seasonal_naive",
    "dq_missing_dates",
    "dq_l_diversity",
    "graph_personalized_pagerank",
    "q_repeat_purchase_intervals",
    "agg_hhi_source_mix",
    "agg_lorenz_deciles",
    "dq_cramers_v",
    "dq_spearman_trend",
    "graph_hits",
    "graph_wl_refinement",
    "retrieval_pr_at_k",
    "text_flesch_readability",
    "text_pmi_collocations",
    "emb_silhouette",
    "stream_pysink_roundtrip",
    "retrieval_rrf_fusion",
    "retrieval_ndcg_eval",
    "ts_autocorr_lag1",
    "graph_degree_assortativity",
    "sketch_ams_f2",
    "dq_iqr_outliers",
    "dedup_minhash_error_audit",
    "mm_bmp_decode",
    "graph_clustering_coefficient",
    "agg_weighted_median",
    "text_rake_keywords",
    "emb_random_projection_jl",
    "agg_bootstrap_poisson",
    "dq_welch_t_squared",
    "q_rfm_segmentation",
    "sketch_dd_quantiles",
    "graph_jaccard_link_prediction",
    # tier 2: semantically touched in r10 — the bootstrap index went
    # two-level (VERDICT #3), the EWMA oracle moved to the
    # negative-safe '>> 2' fold and the z-band comparison to
    # DECIMAL(38,0) (r9 ADVICE #1/#3). The TWS/late-audit split
    # builders also changed, but only their scratch-dir TAGS (data
    # prep naming, not semantics) — they stay r8/r9-green and are
    # re-proven by the local gate, not re-queued here.
    "agg_bootstrap_ci",
    "ts_ewma_recursive",
    "ts_zband_outliers",
    # tier 3a: ALL 24 r1-era stale greens (VERDICT r9 #1) — their only
    # driver row is round 1, verified on long-regenerated fixtures.
    "dedup_exact",
    "text_token_stats",
    "sort_limit_topn",
    "setop_union",
    "agg_count_distinct",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q5_local_supplier",
    "window_rank_lag",
    "window_running_total",
    "agg_rollup",
    # The 50-query window cuts after the 11th r1-era refresh: the 18
    # late-r10 additions displaced the window's old tail (13 r1-era +
    # the 5 family-diverse r4-era picks) to the r11 queue head below.
    # Past slot 50 — the explicit r11 queue: displaced r1-era first
    # (oldest greens), then the r4-era cohort, then r5 by age.
    "agg_cube",
    "setop_intersect",
    "join_anti",
    "join_full_outer",
    "agg_percentiles",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "sim_range_search",
    "sim_ann_bucketed",
    "text_lang_id",
    "text_token_count_regex",
    "text_fingerprint",
    "text_bigrams",
    "decontam_ngram_overlap",
    "dedup_ngram_jaccard",
    "emb_kmeans",
    "graph_pagerank",
    "fn_json_suite",
    "join_salted_skew",
    "win_tumbling_hour",
    "dedup_cluster_cc",
    "dedup_embedding_cosine",
    "scd2_user_state",
    "dedup_incremental",
    "fn_date_suite",
    "fn_string_suite",
    "join_range_ship_window",
    "stream_static_join_enrich",
    "sample_stratified",
    "sample_domain_mixture",
    "subq_above_avg_balance",
    "subq_exists_late_ship",
    "text_pii_redact",
    "udtf_tokenize_docs",
    "agg_grouping_sets",
    "agg_argmax_order",
    "agg_pivot_status_priority",
    "dq_table_audit",
    "pipeline_curate_corpus",
    "pipeline_pack_sequences",
    "setop_except",
    "sim_ann_gemm",
    "sim_ann_ivf",
    "subq_not_exists_customers",
    "text_repetition_filter",
    "udf_scalar_doc_stats",
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
        retrieval,
        sketches,
    )
    from fluent_bit_filter_math_spark.streaming import (  # noqa: F401
        dedup as stream_dedup,
        foreach_sink,
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
