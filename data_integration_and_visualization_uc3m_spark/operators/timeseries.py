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


def holt_linear_pandas(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 7,
) -> DataFrame:
    """Holt's linear (level+trend) exponential smoothing per key — the
    grouped-map `applyInPandas` operator: a genuine sequential
    recursion over each key's ordered series, which no finite window
    expansion expresses (the EWMA lag-chain trick above stops at
    single-recursion weights; Holt's two COUPLED recursions do not
    unroll into a bounded window).

    Per key, over observations y_1..y_n in ``order_col`` order:

        level_1 = y_1, trend_1 = 0
        level_t = α·y_t + (1−α)·(level_{t−1} + trend_{t−1})
        trend_t = β·(level_t − level_{t−1}) + (1−β)·trend_{t−1}

    Returns one row per key: (key, n_obs, level_fp6, trend_fp6,
    forecast_fp6) with forecast = level_n + horizon·trend_n.

    Determinism contract: α, β default to exact binary fractions and
    every step is a FIXED sequence of IEEE-double operations replayed
    identically by the DuckDB oracle's recursive CTE — so even this
    iterative operator stays bit-exact under the fp6 convention.
    Scale: one shuffle on the key; each pandas group holds one key's
    series (bounded by series length, not corpus size). Arrow moves
    the batches; the Python loop is O(series length) per key.

    Input contract (same as ewma_lag_chain): exactly one row per
    (key, order) — with duplicate order values the within-tie sequence
    depends on physical partitioning and the recursion is undefined.
    Pre-aggregate to the grid first.
    """
    import math

    import pandas as pd

    from pyspark.sql import types as T

    key_field = df.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType),
            T.StructField("n_obs", T.LongType()),
            T.StructField("level_fp6", T.LongType()),
            T.StructField("trend_fp6", T.LongType()),
            T.StructField("forecast_fp6", T.LongType()),
        ]
    )
    one_minus_a = 1.0 - alpha
    one_minus_b = 1.0 - beta

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        ys = [float(v) for v in pdf[value_col]]
        level = ys[0]
        trend = 0.0
        for y in ys[1:]:
            new_level = alpha * y + one_minus_a * (level + trend)
            trend = beta * (new_level - level) + one_minus_b * trend
            level = new_level
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_obs": [len(ys)],
                "level_fp6": [math.floor(level * 1000000)],
                "trend_fp6": [math.floor(trend * 1000000)],
                "forecast_fp6": [
                    math.floor((level + horizon * trend) * 1000000)
                ],
            }
        )

    return (
        df.select(key_col, order_col, value_col)
        .groupBy(key_col)
        .applyInPandas(smooth, out_schema)
    )


def cusum_above_mean(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    x_col: str,
    n_decimal: str = "decimal(6,0)",
) -> DataFrame:
    """One-sided CUSUM drift statistic per key, division- and
    libm-free (exact decimal end to end, so both engines agree
    bit-for-bit).

    The textbook recursion ``S_t = max(0, S_{t-1} + (x_t - mean))``
    is not a window aggregate, but it has a closed form: with
    ``P_t = Σ_{i≤t} (x_i - mean)``,
    ``S_t = P_t - min(0, min_{j≤t} P_j)`` — a running sum plus a
    running min, two ordered windows per key, fully vectorized and
    shuffle-aligned on the key. The ``min(0, …)`` includes the EMPTY
    prefix (P before the first row is 0): without it, a series whose
    FIRST step is above the mean reports S_0 = 0 instead of the
    recursion's S_0 = d_0 (found by the property test; the two forms
    agree whenever the first deviation is ≤ 0).

    To avoid the mean's division entirely, work scaled by n:
    ``d'_t = n·x_t - Σx`` (so ``S'_t = n·S_t``), all exact DECIMAL.
    The per-key scalars come from an unordered window over the key —
    the same single shuffle the ordered windows need anyway.

    ``x_col`` must already be a DECIMAL column; the per-key row count
    is cast to ``n_decimal`` so the product's precision stays inside
    DECIMAL(38) without Spark's silent precision-loss rescaling.

    Returns the input keys + order column + ``cusum_scaled``
    (= n·CUSUM, exact decimal). No reference counterpart (north-star
    time-series family, alongside resample/EWMA/Holt/STL above).
    """
    kw = Window.partitionBy(*key_cols)
    ow = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(x_col)
    withd = df.select(
        *key_cols,
        order_col,
        (
            F.count(F.lit(1)).over(kw).cast(n_decimal) * x
            - F.sum(x).over(kw)
        ).alias("__d"),
    )
    p = withd.select(
        *key_cols, order_col, F.sum("__d").over(ow).alias("__p")
    )
    return p.select(
        *key_cols,
        order_col,
        (
            F.col("__p") - F.least(F.min("__p").over(ow), F.lit(0))
        ).alias("cusum_scaled"),
    )
