"""Skew mitigation operators (100 TB north star).

AQE's skew-join splitting (on by default in the session factory)
handles most skew at runtime; these explicit operators cover the two
cases AQE can't:

1. **Skewed aggregation** — AQE doesn't split a hot groupBy key. The
   two-phase salted aggregate partially aggregates (key, salt) first,
   spreading one hot key over N reducers, then combines.
2. **Skewed broadcast-infeasible join** — when the build side is too
   big to broadcast AND the probe side has hot keys, replicate the
   build side per salt so each hot-key shard joins locally.

Both are mechanical rewrites that preserve semantics for algebraic
aggregates (sum/count/min/max) — which is why the engine's money math
(exact decimal sums) composes with them untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_COMBINERS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random salt on the hot key(s).

    Phase 1 shuffles on (keys, salt) — the hot key spreads over
    ``salt_buckets`` reducers; phase 2 combines the partials on keys
    alone (tiny: one row per key×salt). ``aggs`` maps output name →
    (phase-1 aggregate expression, combiner name ∈ {sum, min, max}) —
    count combines with sum.

    Only algebraic aggregates compose this way; avg must be expressed
    as sum+count by the caller (exactly how Spark itself decomposes it).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    phase2 = [
        _COMBINERS[comb](F.col(name)).alias(name) for name, (_, comb) in aggs.items()
    ]
    return phase1.groupBy(*keys).agg(*phase2)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the probe side, replicate the build side
    once per salt value, join on (keys, salt).

    Cost: build side × salt_buckets rows shuffled — worth it exactly
    when one probe key would otherwise occupy a single reducer for the
    whole stage. For build sides that fit in memory, plain
    ``F.broadcast`` beats this; salting is for the middle regime.
    """
    salted_probe = probe.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_build = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_probe.join(replicated_build, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def key_histogram(df: DataFrame, keys: list[str], top_n: int = 20) -> DataFrame:
    """Skew diagnosis: per-key row counts, heaviest first — the first
    thing to run when a stage's max task time dwarfs its median."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), *[F.col(k) for k in keys])
        .limit(top_n)
    )


def self_join_blowup(df: DataFrame, key_col: str) -> DataFrame:
    """Join-planning diagnostic: the EXACT output cardinality a self
    equi-join on ``key_col`` would produce (Σ count(k)²), its blowup
    factor over the input size, and the hottest key's share — the
    numbers that decide between a plain shuffle join, salting, or a
    df-cap BEFORE the join is ever run. One groupBy + a 1-row
    aggregate; integer-exact.
    """
    c = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    sq = F.col("cnt") * F.col("cnt")
    t = c.agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(sq).alias("predicted_pairs"),
        F.max(sq).alias("max_key_pairs"),
    )
    return t.select(
        "n_rows",
        "predicted_pairs",
        "max_key_pairs",
        (F.col("predicted_pairs").cast("double") / F.col("n_rows")).alias(
            "blowup_factor"
        ),
        (
            F.col("max_key_pairs").cast("double") / F.col("predicted_pairs")
        ).alias("top_key_share"),
    )
