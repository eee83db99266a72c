"""Distributed exact-integer linear algebra over embedding columns.

Two iterative-ML building blocks a training-data platform runs over
its embedding store (beyond the reference's scalar aggregates,
crime_immigration_etl.py:255-275):

* Gram-matrix accumulation + one power-iteration step — the core of
  distributed PCA / spectral diagnostics ("is this embedding space
  collapsing to one direction?");
* one Lloyd (k-means) reassignment step seeded from the stored
  labels — cluster drift measurement and the inner loop of IVF
  index training (operators/similarity.py builds on such centroids).

Both follow the repo's exact-integer determinism discipline: float
components are fixed-pointed per term BEFORE any cross-row sum, so
every accumulation is associative integer math and the Spark plan's
reduction order (or DuckDB's) cannot change a single output bit.

Scale design: the Gram matrix is accumulated per PARTITION with an
Arrow-batched `mapInPandas` (each task emits at most d² = 4096
partial rows regardless of row count), so the shuffle is
O(partitions · d²), never O(rows). The Lloyd step broadcasts the
k·d centroid table (k is small by construction) and stays map-side
until the final k-row aggregate.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAM_SCALE = 10_000  # fp4 on v_i*v_j products: exact to sf≈10 in DEC38
COMP_SCALE = 1_000_000  # fp6 on raw components (centroid sums)
DIST_SCALE = 100_000_000  # fp8 on squared distances

DEC38 = "decimal(38,0)"


def gram_fixed_point(
    df: DataFrame, vec_col: str = "embedding", scale: int = GRAM_SCALE
) -> DataFrame:
    """(i, j, g): Gram matrix Σ_rows floor(v_i·v_j·scale) as exact
    BIGINT, accumulated per partition via Arrow batches. Each task
    yields ≤ d² rows; the only shuffle is the final (i, j) sum over
    n_partitions·d² rows. Per-row flooring (not floor-after-sum) is
    what makes the result independent of partitioning AND expressible
    as one SQL aggregation for the oracle. NULL vectors contribute
    nothing (dropped before the Arrow pass — the same semantics as the
    oracle's unnest, which emits no rows for a NULL list)."""
    import numpy as np

    df = df.na.drop(subset=[vec_col])
    out_schema = "i int, j int, g long"

    def partial_gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        d = None
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if acc is None:
                d = m.shape[1]
                acc = np.zeros((d, d), dtype=np.int64)
            # chunked so the per-row outer-product tensor stays small
            for lo in range(0, len(m), 256):
                blk = m[lo : lo + 256]
                outer = blk[:, :, None] * blk[:, None, :]
                acc += np.floor(outer * scale).astype(np.int64).sum(axis=0)
        if acc is not None:
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype(np.int32),
                    "j": jj.ravel().astype(np.int32),
                    "g": acc.ravel(),
                }
            )

    partials = df.select(vec_col).mapInPandas(partial_gram, out_schema)
    return partials.groupBy("i", "j").agg(F.sum("g").alias("g"))


def power_iteration_once(gram: DataFrame) -> DataFrame:
    """One power-iteration step from the all-ones vector over an
    integer Gram matrix: v1 = G·1 (exact BIGINT), and the Rayleigh
    quotient λ̂ = (v1ᵀ G v1)/(v1ᵀ v1) with DECIMAL(38,0) moments —
    the dominant-eigenvalue estimate. Output: one row per dimension
    (i, v1_i) with the shared λ̂ as a fixed-point column, so the
    dominant direction AND its strength land in one result.

    All joins are on the d-sized axis (≤ 64 rows) — broadcast by
    construction; nothing here rescans the data once the Gram matrix
    exists."""
    v1 = gram.groupBy("i").agg(F.sum("g").alias("v"))
    # w_i = Σ_j g_ij · v_j  (DEC38: |g·v| can exceed int64)
    w = (
        gram.join(
            F.broadcast(v1.select(F.col("i").alias("j"), F.col("v").alias("vj"))),
            "j",
        )
        .groupBy("i")
        .agg(F.sum(F.col("g").cast(DEC38) * F.col("vj").cast(DEC38)).alias("w"))
    )
    num_den = (
        v1.join(F.broadcast(w), "i")
        .agg(
            F.sum(F.col("v").cast(DEC38) * F.col("w")).alias("num"),
            F.sum(F.col("v").cast(DEC38) * F.col("v").cast(DEC38)).alias("den"),
        )
    )
    rayleigh = F.floor(
        F.col("num").cast("double") / F.col("den").cast("double") * 1_000_000
    ).cast("long")
    return (
        v1.crossJoin(F.broadcast(num_den.select(rayleigh.alias("rayleigh_fp6"))))
        .select("i", F.col("v").alias("v1"), "rayleigh_fp6")
    )


def lloyd_step(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """One Lloyd reassignment: centroids = per-label means (exact
    fixed-point sums ⇒ bit-identical centroid doubles on any engine),
    then every vector moves to its nearest centroid (squared L2,
    per-dimension fp8 floor ⇒ integer distances, label-asc tiebreak).
    Returns per-new-label (new_label, n_points, inertia_fp8).

    Plan shape: one explode-aggregation for centroids (k·d rows),
    centroid table broadcast back, distance + argmin map-side via an
    array fold (no per-dimension shuffle on the assignment pass), one
    final k-row aggregate."""
    comp = df.select(
        F.col(label_col).alias("lbl"),
        F.posexplode(vec_col).alias("i", "x"),
    ).select(
        "lbl",
        "i",
        F.floor(F.col("x").cast("double") * COMP_SCALE).cast("long").alias("xf"),
    )
    cent = comp.groupBy("lbl", "i").agg(
        F.sum("xf").alias("s"), F.count(F.lit(1)).alias("n")
    )
    # centroid component as ONE double division of exact integers
    cent_arr = (
        cent.select(
            "lbl",
            "i",
            (F.col("s").cast("double") / (F.col("n") * float(COMP_SCALE))).alias("c"),
        )
        .groupBy("lbl")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))),
                lambda s: s["c"],
            ).alias("cvec")
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("cvec"),
            lambda a, b: F.floor(
                (a.cast("double") - b) * (a.cast("double") - b) * DIST_SCALE
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    assigned = (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(cent_arr))
        .select(F.col(id_col), F.struct(d2.alias("d2"), F.col("lbl")).alias("dl"))
        .groupBy(id_col)
        .agg(F.min("dl").alias("best"))
    )
    return (
        assigned.groupBy(F.col("best.lbl").alias("new_label"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("best.d2").alias("inertia_fp8"),
        )
    )
