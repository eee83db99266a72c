"""Eager, exact freeing of superseded ``localCheckpoint`` storage.

``DataFrame.unpersist()`` cannot free a checkpoint's blocks (they
belong to the internal checkpointed RDD, not the Dataset cache), and
the ContextCleaner only reclaims them after a driver full GC, which
the JVM may defer for many minutes — measured 3-5× late-session
degradation when rounds of an iterative operator leak blocks (see
``dedup.connected_components``). So superseded checkpoints are freed
eagerly and EXACTLY, by the backing RDD id read from the
LogicalRDD plan node.

That id read goes through Spark-classic private API
(``queryExecution().analyzed().rdd()``); a Spark minor bump or a
Connect migration can remove the path. ``ck_rdd_id`` feature-detects
it and returns ``None`` when unavailable, and callers then simply
skip the eager free — degrading to the ContextCleaner-after-GC
behavior (the bench harness already triggers an adaptive driver GC
between queries), never to a wrong unpersist. A registry set-diff
fallback was considered and rejected: diffing
``getPersistentRDDs()`` before/after can free blocks persisted
CONCURRENTLY by another driver thread (e.g. a streaming
``foreachBatch`` caching its micro-batch), which exact ids are
immune to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ck_rdd_id(df: DataFrame) -> int | None:
    """Backing RDD id of a localCheckpointed DataFrame's LogicalRDD
    plan node, or ``None`` when the private plan path is unavailable
    (callers then skip the eager free — see module docstring)."""
    try:
        return df._jdf.queryExecution().analyzed().rdd().id()
    except Exception:
        return None


def unpersist_by_id(df_or_spark, rdd_id: int) -> None:
    """Unpersist the JVM RDD with ``rdd_id`` if it is still registered
    (non-blocking). Accepts a DataFrame or a SparkSession."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    if jmap.contains(rdd_id):
        jmap.apply(rdd_id).unpersist(False)


def unpersist_ck(df: DataFrame) -> None:
    """Free a superseded localCheckpoint's storage blocks eagerly and
    exactly; a no-op (ContextCleaner handles it after the next driver
    full GC) when the private id-read path is unavailable."""
    rdd_id = ck_rdd_id(df)
    if rdd_id is not None:
        unpersist_by_id(df, rdd_id)
