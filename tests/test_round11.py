"""Round-11 additions: plan pins for the r11 perf work.

VERDICT r10 #3 flagged q_rfm_segmentation at 48 shuffle exchanges —
three chained two-level-rank pipelines, each doubling the upstream
lineage. The r11 shape computes the per-customer aggregate once
(localCheckpoint truncates lineage), unpivots the three metrics, and
ranks them in ONE pass; these tests pin that the collapse holds.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_rfm_single_rank_pass_exchange_budget(spark, sf_dir):
    """The unpivoted single-pass shape stays in single digits of
    exchanges past the checkpoint (r10: 48). The checkpoint scan is
    the only place the customer aggregate is materialized, so no
    orders re-scan appears downstream."""
    from fluent_bit_filter_math_spark.operators.relational import (
        q_rfm_segmentation,
    )

    plan = plan_of(q_rfm_segmentation(spark, sf_dir))
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 12, f"rfm exchange budget blown: {n_exchange}"
    # Upstream of the checkpoint is gone from this plan: exactly zero
    # parquet scans of orders remain (the rank pass reads the
    # checkpointed customer aggregate).
    assert "orders.parquet" not in plan
    # One within-bucket rank window, not three chained ones.
    assert len(re.findall(r"row_number", plan)) == 1
