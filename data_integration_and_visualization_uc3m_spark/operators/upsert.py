"""K2 — conflict-ignoring idempotent upsert (SURVEY.md §2.2).

The reference loads with ``INSERT ... ON CONFLICT (keys) DO NOTHING``
(``crime_immigration_etl.py:335-368``; UNIQUE keys at
``schema.sql:57,81,104``). Plain Spark appends have no conflict
detection, so the semantics decompose into two relational steps:

1. within-batch first-wins dedup on the natural key (the within-batch
   effect of ON CONFLICT), and
2. left-anti join of the incoming batch against the existing target
   (the cross-batch effect), then union/append.

Run twice with the same batch ⇒ identical table (idempotency test in
``tests/``). With a transactional table format (Delta/Iceberg) this is
``MERGE INTO ... WHEN NOT MATCHED THEN INSERT``; those jars aren't in
this image, so the anti-join form is the portable core.

Scale: the anti-join shuffles on the natural key unless the target's
key set is broadcastable. For very large targets, partition the
warehouse by a key prefix so the anti-join prunes partitions, or keep a
bucketed key index table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_batch_first_wins(
    batch: DataFrame, keys: list[str], order_by: list[str] | None = None
) -> DataFrame:
    """A2 + SURVEY §7.4.3 — deterministic first-wins dedup.

    pandas ``drop_duplicates`` keeps the first row in file order
    (``crime_immigration_etl.py:199-203``); Spark's ``dropDuplicates``
    picks an arbitrary row. With ``order_by`` the pick is made
    deterministic via ``row_number``; without it, falls back to
    ``dropDuplicates`` (caller accepts nondeterminism).
    """
    if not order_by:
        return batch.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_ignore(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    order_by: list[str] | None = None,
) -> DataFrame:
    """K2 — ON CONFLICT DO NOTHING as a DataFrame transform.

    Returns target ∪ (batch rows whose key is absent from target).
    Column order follows the target schema (unionByName).
    """
    incoming = dedup_batch_first_wins(batch, keys, order_by)
    fresh = incoming.join(target.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")
    return target.unionByName(fresh.select(*target.columns))


def write_upsert_parquet(
    spark_target_path: str, batch: DataFrame, keys: list[str]
) -> None:
    """Materialized form: read existing parquet target (if any), upsert,
    write back atomically to a new snapshot directory. Kept thin — the
    relational core above is what the correctness gate exercises."""
    spark = batch.sparkSession
    try:
        target = spark.read.parquet(spark_target_path)
        merged = upsert_ignore(target, batch, keys)
    except Exception:  # target doesn't exist yet → first load
        merged = dedup_batch_first_wins(batch, keys)
    merged.write.mode("overwrite").parquet(spark_target_path + "_new")
