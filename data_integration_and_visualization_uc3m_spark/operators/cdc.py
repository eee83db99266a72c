"""Snapshot-diff / change-data-capture operators.

The reference's load path is "re-run the whole ETL, let ON CONFLICT DO
NOTHING absorb the overlap" (crime_immigration_etl.py:335-368) — fine
at 3k rows, unusable at 100 TB where reprocessing everything per
refresh is the cardinal sin. The scale-correct primitive is a
snapshot DIFF: given yesterday's table and today's, emit exactly the
added / removed / changed rows, then apply only those (the input to an
incremental MERGE, SCD2 append, or downstream cache invalidation).

Implementation: one full outer join on the natural key. At scale both
sides are bucketed/partitioned on the key so the join is co-located;
here AQE picks the strategy. Change detection compares a md5 over the
tracked columns (null-safe, computed map-side on each side BEFORE the
join, so the shuffle carries one 32-char digest instead of the full
row when ``project_digest_only`` is set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def _digest(cols: list[str]) -> F.Column:
    # null-safe row digest: null → sentinel (concat_ws drops nulls,
    # which would make ('a', null) collide with ('a',)).
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
    # separator spelled as an escape, not a raw control byte, so it is
    # visible in diffs. Caveat: a value CONTAINING \x01 is ambiguous
    # with the separator; acceptable for the change-detection digest
    # (collision needs adjacent values crafted around the separator).
    return F.md5(F.concat_ws("\x01", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Full-outer diff of two snapshots on ``keys``.

    Returns one row per key present in either side with
    ``change_type`` ∈ {added, removed, changed, unchanged}, old/new
    values of ``compare_cols`` prefixed ``old_`` / ``new_``.

    Both inputs are projected to keys + tracked columns + digest before
    the join — column pruning keeps the shuffle minimal, and the digest
    comparison is one string equality regardless of tracked-column
    count.
    """
    o = old.select(
        *keys,
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        _digest(compare_cols).alias("_old_digest"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        _digest(compare_cols).alias("_new_digest"),
    )
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_old_digest").isNull(), F.lit("added"))
        .when(F.col("_new_digest").isNull(), F.lit("removed"))
        .when(F.col("_old_digest") != F.col("_new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.withColumn(CHANGE_COL, change).drop("_old_digest", "_new_digest")


def changes_only(diff: DataFrame) -> DataFrame:
    """The incremental payload: everything except unchanged rows.

    At 100 TB this filter is why CDC wins — downstream consumers see
    |delta| rows, not |table| rows.
    """
    return diff.filter(F.col(CHANGE_COL) != "unchanged")


def incremental_agg_update(
    prior: DataFrame,
    diff: DataFrame,
    group_col: str,
    val_col: str,
    count_col: str = "n_rows",
    sum_col: str = "total",
) -> DataFrame:
    """Maintain a per-group (count, sum) aggregate from a snapshot diff
    instead of recomputing it from the full table.

    The 100 TB motivation: a daily pipeline touches |delta| rows, not
    |table| rows — the aggregate update joins the prior aggregate
    (|groups| rows) with per-group deltas derived from the diff. Work
    is O(|delta| + |groups|), independent of table size.

    Contribution model (handles group-key changes too): removed and
    changed rows retract (old_group, old_val); added and changed rows
    insert (new_group, new_val). ``val_col`` must be exact (decimal /
    integer) — retract/insert cancellation is only exact in
    fixed-point arithmetic. Groups whose count reaches 0 drop out.
    """
    minus = diff.filter(F.col(CHANGE_COL).isin("removed", "changed")).select(
        F.col(f"old_{group_col}").alias(group_col),
        F.lit(-1).cast("long").alias("_dn"),
        (-F.col(f"old_{val_col}")).alias("_dv"),
    )
    plus = diff.filter(F.col(CHANGE_COL).isin("added", "changed")).select(
        F.col(f"new_{group_col}").alias(group_col),
        F.lit(1).cast("long").alias("_dn"),
        F.col(f"new_{val_col}").alias("_dv"),
    )
    deltas = (
        minus.unionByName(plus)
        .groupBy(group_col)
        .agg(F.sum("_dn").alias("_dn"), F.sum("_dv").alias("_dv"))
    )
    merged = prior.join(deltas, group_col, "full_outer").select(
        group_col,
        (
            F.coalesce(F.col(count_col), F.lit(0).cast("long"))
            + F.coalesce(F.col("_dn"), F.lit(0).cast("long"))
        ).alias(count_col),
        (
            F.coalesce(F.col(sum_col), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("_dv"), F.lit(0).cast("decimal(18,2)"))
        ).alias(sum_col),
    )
    return merged.filter(F.col(count_col) > 0)


def incremental_join_insert_only(
    old_a: DataFrame,
    delta_a: DataFrame,
    old_b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental view maintenance for an INNER equi-join under
    insert-only deltas: the new matches are exactly

        (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    so a materialized join result is maintained by appending this
    delta instead of re-joining the full tables — O(|Δ|·selectivity)
    work instead of O(|A|+|B|) per refresh. (Updates/deletes need the
    retraction form; the aggregate twin lives in
    :func:`incremental_agg_update`.)
    """
    return (
        delta_a.join(old_b, on)
        .unionByName(old_a.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )
