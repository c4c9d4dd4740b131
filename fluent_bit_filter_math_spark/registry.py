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
    # --- round 12 rotation (composition from tools/green_age.py) ---
    # Zero never-checked backlog again (all 325 queries driver-green by
    # the r1-r11 union), so the whole 50-slot window is tier-3
    # staleness retirement per VERDICT r11 "Next round" #1. Exact
    # composition: SEVEN tier-2 insertions (io_table_format_snapshot,
    # stream_table_format_sink, stream_table_format_source — the
    # r12-new commit-log table format — plus mm_jpeg_decode +
    # mm_jpeg_color_decode + mm_jpeg_420_decode, the baseline-JPEG
    # entropy layer in grayscale, YCbCr-4:4:4 and 4:2:0-subsampled
    # forms, and io_avro_roundtrip, the from-scratch Avro OCF
    # connector; all never driver-checked), then the 4 r4-era greens
    # and the complete 39-query r5-era cohort — 50 total.
    # Done-criterion: once CORRECTNESS_r12.json lands,
    # tools/green_age.py shows no query whose newest driver green is
    # older than r6 except the seven displaced r6 picks
    # (agg_corr_stats, agg_regr_ols, fn_bitwise_suite,
    # io_partitioned_prune, join_bucketed_colocated,
    # math_case_insensitive, math_cast_int — r13 queue head).
    # tier 2: new this round (the commit-log table format's batch and
    # streaming halves).
    "io_table_format_snapshot",
    "stream_table_format_sink",
    "stream_table_format_source",
    "mm_jpeg_decode",
    "mm_jpeg_color_decode",
    "mm_jpeg_420_decode",
    "io_avro_roundtrip",
    # tier 3a: the 4 r4-era stale greens (oldest in the corpus).
    "text_repetition_filter",
    "udf_scalar_doc_stats",
    "udtf_tokenize_docs",
    "win_tumbling_hour",
    # tier 3b: the complete r5-era cohort (39 queries, alphabetical).
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
    "fn_try_suite",
    "join_asof_events",
    "join_semi",
    "math_chain",
    "math_div_ieee",
    "math_malformed_passthrough",
    "math_sum",
    "math_tag_route",
    "mem_source_fold",
    "q1_pricing_summary",
    "reshape_unpivot",
    "sample_per_stratum_topk",
    "sample_split_assign",
    "setop_except_all",
    "setop_intersect_all",
    "sim_topk_bruteforce",
    "stream_dedup_events",
    "stream_dedup_within_watermark",
    "stream_file_sink_roundtrip",
    "stream_math_fold",
    "stream_stream_join_attrib",
    "subq_in_big_orders",
    "subq_scalar_below_avg_qty",
    "text_quality_score",
    "topk_per_group",
    "ts_resample_locf",
    "win_session_user",
    "win_sliding_hour_30m",
    "window_distribution_fns",
    # tier 3c: empty this round — the seven tier-2 insertions consumed
    # the r6-era slots; the displaced picks named above head the r13
    # queue with the other 30 r6-era queries below.
    "agg_corr_stats",
    "agg_regr_ols",
    "fn_bitwise_suite",
    "io_partitioned_prune",
    "join_bucketed_colocated",
    "math_case_insensitive",
    "math_cast_int",
    # Past slot 50 — the remaining r6-era cohort by age then name;
    # queries touched in r12 get promoted into r13's tier 2 ahead of
    # these.
    "math_div",
    "math_missing_field",
    "math_mul",
    "math_nonnumeric",
    "math_sub",
    "merge_upsert_orders",
    "mm_metadata",
    "mm_wav_decode",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_revenue",
    "q15_top_supplier",
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
        avro_ocf,
        kafka_wire,
        table_format,
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
