"""Salted equi-join — the explicit skew breaker.

AQE's skew-join splitting (on in ``session.py``) handles most hot keys
by subdividing oversized shuffle partitions at runtime, but it only
triggers on sort-merge joins and only after the skewed shuffle files
exist. When one key holds a double-digit percentage of a 100 TB fact
table, the classic preventive rewrite is salting:

* the BIG side gets a deterministic salt in [0, S) per row, turning one
  hot key into S distinct shuffle keys;
* the SMALL(er) side is replicated S times, once per salt value;
* the equi-join runs on (key, salt) — the hot key's rows now spread
  over S reducers.

Exactness: every big-side row carries exactly one salt s, and the other
side has exactly one replica with that s per original row, so each
joined pair appears exactly once — identical output to the unsalted
join (pinned in ``tests/test_scale.py``). The salt is a hash of the
big side's whole row (not ``rand()``), so retries/recomputations of a
task salt identically — nondeterministic salting breaks exactly-once
sinks under task retry.

Supported join types: ``inner`` and ``left`` (big side preserved).
``right``/``full`` would emit unmatched replicated-side rows once per
replica — compose the mirrored call instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SUPPORTED = ("inner", "left")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column names ``on``, spreading each
    join key over ``salt`` shuffle partitions."""
    if how not in _SUPPORTED:
        raise ValueError(
            f"how={how!r} not in {_SUPPORTED}: outer-on-the-replicated-side "
            "would duplicate unmatched rows once per salt replica"
        )
    if salt < 1:
        raise ValueError("salt must be >= 1")
    dupes = set(big.columns) & set(small.columns) - set(on)
    if dupes:
        raise ValueError(f"ambiguous non-key columns on both sides: {dupes}")

    salt_expr: Column = F.pmod(F.xxhash64(*big.columns), F.lit(salt))
    b = big.withColumn("_salt", salt_expr)
    s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>")),
    )
    out = b.join(s, on=on + ["_salt"], how=how)
    return out.drop("_salt")


# ---------------------------------------------------------------------------
# driver-verified salted-join query — proves the rewrite is output-
# identical to the plain join (the oracle IS the plain join): event
# value totals per market segment, with the events→customer equi-join
# spread over SALT shuffle keys per custkey. The post-join aggregate
# keeps the checked output small and engine-stable (DECIMAL(38,6)
# partial sums, the repo's cross-engine float idiom).
# ---------------------------------------------------------------------------
from pyspark.sql import SparkSession

from fluent_bit_filter_math_spark.registry import register
from fluent_bit_filter_math_spark.sources import table

JOIN_SALT = 8


@register(
    "join_salted_skew",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey"), "value"
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    j = salted_join(ev, cust, on=["custkey"], salt=JOIN_SALT)
    return j.groupBy("c_mktsegment").agg(
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_value"),
        F.count("*").alias("n_events"),
    )
