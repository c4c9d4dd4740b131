"""Arbitrary stateful streaming: per-key running totals via
``applyInPandasWithState``.

SURVEY.md §2.3's "Streaming: arbitrary state" row — no reference
analogue (the reference's ctx holds only config, never data state,
/root/reference/filter_math/math.h:46-55).

The operator keeps (count, sum-of-cents) per user in the state store
and emits the updated totals each micro-batch. Registered as a driver
query by running the bounded stream (availableNow) to completion and
returning the final totals — so the DuckDB oracle can still verify the
stateful path end-to-end: with a single source file the replay is one
micro-batch, making the emitted totals the final ones.

Values accumulate as integer cents (the fixture's `value` has 2 dp):
exact arithmetic, so state-store accumulation order can never produce
a float divergence from the oracle.

Scale: state is partitioned by the grouping key across executors
(RocksDB-backed in production); each micro-batch shuffles only that
batch's rows to their key's state partition. The Pandas kernel sees
one group per call with its state handle — no driver involvement.

Spark 4's successor API, ``transformWithStateInPandas`` (typed state
variables, timers, TTL), is the upgrade path; it is unavailable in this
container (its Python driver worker needs ``google.protobuf``, which is
broken here and cannot be installed), so the engine ships the
``applyInPandasWithState`` form, which expresses the same per-key
arbitrary state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fluent_bit_filter_math_spark.pipeline import (
    read_events_stream,
    run_stream_to_memory,
)
from fluent_bit_filter_math_spark.functions import exact_cents
from fluent_bit_filter_math_spark.registry import register

_OUT_SCHEMA = "user_id long, n_events long, total_cents long"
_STATE_SCHEMA = "n long, cents long"


def _update_totals(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # `cents` is pre-fixed JVM-side via exact_cents (floor(x*100+0.5),
        # rendering-independent in both engines; engine-native round(DOUBLE)
        # is not, and pandas .round() is half-to-even) — exact integers
        # only cross the Arrow boundary and enter the state store.
        cents += int(pdf["cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def user_running_totals_stream(spark: SparkSession, path: str) -> DataFrame:
    stream = read_events_stream(spark, path, drop_nanos=True).select(
        "user_id", exact_cents(F.col("value")).alias("cents")
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_stateful_user_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS total_cents
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = user_running_totals_stream(spark, f"{sf_dir}/events.parquet")
    return run_stream_to_memory(
        out, "stream_stateful_user_totals", output_mode="update"
    )
