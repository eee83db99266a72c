"""Time-series regularization — resampling onto a fixed grid with
forward fill.

Event streams are irregular; most downstream consumers (feature
pipelines, daily dashboards, state-of-the-world joins) want one row
per key per grid step with the last observation carried forward. The
scale-correct formulation:

  1. aggregate observations to the grid step (one hash shuffle on
     (key, step) — map-side partial aggregation applies),
  2. explode each key's [first, last] span into its grid steps via
     ``sequence`` — bounded fan-out (span length), no range join, no
     BroadcastNestedLoopJoin, and
  3. one window per key (``last(value, ignorenulls)`` ordered by step)
     to carry observations forward.

Each step is shuffle-aligned on the key: steps 2-3 reuse step 1's
hash partitioning modulo the grid column, and the window sorts
locally within a key. Spans are contiguous per key, so executor
memory is bounded by max span length x row width, not corpus size.

No counterpart in the reference (its tables are already annual:
crime_immigration_etl.py:268-303); this is a north-star extension in
the SURVEY §7 phase-E family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    agg: F.Column | None = None,
) -> DataFrame:
    """Daily grid per key over [first observed day, last observed day],
    with the per-day aggregate forward-filled across gap days.

    ``agg`` defaults to an exact DECIMAL(18,6) sum of ``value_col``
    (portable bit-for-bit to a SQL oracle; see queries.py conventions).
    Output: (key, day, value_ffill DOUBLE, is_observed BOOLEAN).

    The first grid day is by construction observed, so ``value_ffill``
    is never NULL.
    """
    if agg is None:
        agg = F.sum(F.col(value_col).cast("decimal(18,6)"))
    daily = df.groupBy(
        F.col(key_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(agg.alias("__v"))
    grid = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("__mn"), F.max("day").alias("__mx"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, [key_col, "day"], "left")
        .select(
            key_col,
            "day",
            F.last("__v", ignorenulls=True)
            .over(w)
            .cast("double")
            .alias("value_ffill"),
            F.col("__v").isNotNull().alias("is_observed"),
        )
    )


def ewma_lag_chain(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    span: int = 7,
) -> DataFrame:
    """EWMA over the ``span`` most recent observations per key with
    decay 1/2 — weights 2^-j, renormalized over the observations
    actually present near a series head.

    Determinism contract (queries.py conventions): 2^-j weights are
    exact binary fractions, every product is therefore exact, and the
    numerator/denominator are FIXED-ORDER left-associated addition
    chains over lag() columns — not a SUM() whose accumulation order
    floats with partitioning — so the result is bit-identical on any
    engine and any parallelism. One window per key (span-1 lags share
    a single sort), no self-join, no range join.

    Input must be one row per (key, order) with ``value_col`` already
    DOUBLE; output adds ``ewma`` (DOUBLE) and ``n_obs`` (INT, number
    of observations the renormalized weight mass covers).
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    lags = [
        F.lag(F.col(value_col), j).over(w) for j in range(1, span)
    ]
    num = F.col(value_col)
    den = F.lit(1.0)
    n_obs = F.lit(1)
    for j, lj in enumerate(lags, start=1):
        wt = F.lit(2.0 ** -j)
        num = num + F.coalesce(lj, F.lit(0.0)) * wt
        den = den + F.when(lj.isNotNull(), wt).otherwise(F.lit(0.0))
        n_obs = n_obs + F.when(lj.isNotNull(), 1).otherwise(0)
    return df.select(
        "*",
        (num / den).alias("ewma"),
        n_obs.cast("int").alias("n_obs"),
    )
