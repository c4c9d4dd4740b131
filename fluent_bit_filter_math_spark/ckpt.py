"""Release the executor-storage blocks behind an eager
``localCheckpoint()``.

``df.unpersist()`` is a NO-OP for checkpointed frames: it talks to the
CacheManager, and checkpoint blocks are not cache entries (verified
empirically r13 — storage info unchanged after both ``df.unpersist()``
and ``df.rdd.unpersist()``). The blocks belong to the LogicalRDD inside
the checkpointed plan; freeing them means unpersisting THAT RDD through
the context's persistentRdds registry. Without this, every round of an
unrolled iterative algorithm leaves its full per-round snapshot pinned
in executor storage until JVM GC + ContextCleaner get around to it —
bounded by round count, but at 100 TB a round snapshot is data-sized,
so reclaim must be deterministic (ADVICE r12).

The frame is UNREADABLE after release (the whole point): only release
a round's state after its replacement is materialized and every reader
of the old frame has completed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free the storage blocks of an eagerly localCheckpoint()ed
    *df*; returns True when blocks were actually released. Safe no-op
    (False) for frames that are not checkpoint roots."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        rid = plan.rdd().id()
        jsc = df.sparkSession.sparkContext._jsc.sc()
        it = jsc.persistentRdds().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == rid:
                kv._2().unpersist(False)
                return True
        return False
    except Exception:
        # release is an optimization, never a correctness dependency
        return False
