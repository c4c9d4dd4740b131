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
    # --- round 11 rotation (composition from tools/green_age.py) ---
    # r11 has ZERO never-checked backlog for the first time (all 317
    # queries have a driver-green row; VERDICT r10 §coverage), so the
    # entire 50-slot window is tier-3 staleness retirement, exactly as
    # VERDICT r10 "Next round" #1 prescribes: the 13 r1-era greens,
    # the full 33-query r4-era cohort, then the 4 oldest r5 queries
    # (alphabetical within equal age, matching green_age.py order).
    # Done-criterion: tools/green_age.py shows no query older than r5
    # once CORRECTNESS_r11.json lands.
    # tier 1: the eight r11-new operators (never driver-checked — the
    # Kafka wire-path closure per VERDICT r10 #6, plus the k-core
    # peel, bigram Heaps'-law curve, skyline, Borůvka MSF, and
    # deterministic random-walk + PPR-sweep-cut + streaming-Kafka-wire additions); their slots displace the
    # window's tail entries to the r12 queue head.
    "kafka_wire_roundtrip",
    "graph_kcore_peel",
    "text_heaps_vocab_growth",
    "q_pareto_frontier",
    "graph_boruvka_msf",
    "graph_random_walks",
    "graph_ppr_sweep_cut",
    "stream_kafka_wire_fold",
    # tier 3a: the 13 r1-era stale greens (only driver row is round 1,
    # verified on long-regenerated fixtures).
    "agg_cube",
    "agg_percentiles",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "join_anti",
    "join_full_outer",
    "setop_intersect",
    "sim_ann_bucketed",
    "sim_range_search",
    "text_bigrams",
    "text_fingerprint",
    "text_lang_id",
    "text_token_count_regex",
    # tier 3b: the complete r4-era cohort (33 queries).
    "agg_argmax_order",
    "agg_grouping_sets",
    "agg_pivot_status_priority",
    "decontam_ngram_overlap",
    "dedup_cluster_cc",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "dq_table_audit",
    "emb_kmeans",
    "fn_date_suite",
    "fn_json_suite",
    "fn_string_suite",
    "graph_pagerank",
    "join_range_ship_window",
    "join_salted_skew",
    "pipeline_curate_corpus",
    "pipeline_pack_sequences",
    "sample_domain_mixture",
    "sample_stratified",
    "scd2_user_state",
    "setop_except",
    "sim_ann_gemm",
    "sim_ann_ivf",
    "stream_static_join_enrich",
    "subq_above_avg_balance",
    "subq_exists_late_ship",
    "subq_not_exists_customers",
    "text_pii_redact",
    # Past slot 50 — the 8 tier-1 insertions displaced the r4/r5-era
    # tail (text_repetition_filter, udf_scalar_doc_stats,
    # udtf_tokenize_docs, win_tumbling_hour, agg_approx_distinct,
    # agg_histogram, agg_string_agg, dedup_minhash_lsh move to the r12
    # queue head); then the remaining r5 cohort, then r6 by age.
    # Queries touched in r11 get promoted into next round's tier 2
    # ahead of these.
    "text_repetition_filter",
    "udf_scalar_doc_stats",
    "udtf_tokenize_docs",
    "win_tumbling_hour",
    "agg_approx_distinct",
    "agg_histogram",
    "agg_string_agg",
    "dedup_minhash_lsh",
    "emb_quantize_int8",
    "fn_array_suite",
    "fn_conditional_suite",
    "fn_higher_order_suite",
    "fn_map_suite",
    "fn_null_semantics",
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
    from fluent_bit_filter_math_spark.sources import (  # noqa: F401
        kafka_wire,
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
