"""Skyline (Pareto-dominance) operator — preference queries.

A row is in the skyline iff no other row dominates it (≥ in every
preference dimension, > in at least one). Public construction after the
classic block-nested / partition-skyline literature (e.g. "Integration
of Skyline Queries into Spark SQL", EDBT 2023 — the paper integrates a
physical operator; here the same result is achieved with a two-phase
relational decomposition, no Catalyst surgery):

1. **local phase** — per-partition skyline via grouped pandas
   (Arrow-batched): drops the vast majority of dominated rows in
   parallel with zero shuffle;
2. **global phase** — the few survivors are anti-joined against their
   own dominators (survivor set is small, so the quadratic check is
   cheap and Spark broadcasts it).

Dimensions are (column, direction) pairs, direction ∈ {"max", "min"}.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pandas_skyline(pdf: pd.DataFrame, dims: list[tuple[str, str]]) -> pd.DataFrame:
    # sort by first dim descending-preference: a row can only be
    # dominated by rows before it ⇒ single forward pass
    by = [c for c, _ in dims]
    ascending = [d == "min" for _, d in dims]
    pdf = pdf.sort_values(by=by, ascending=ascending, kind="mergesort")
    kept_idx = []
    kept_vals: list[tuple] = []

    def dominates(a: tuple, b: tuple) -> bool:
        ge = all(
            (av >= bv if d == "max" else av <= bv)
            for (av, bv, (_, d)) in zip(a, b, dims)
        )
        gt = any(
            (av > bv if d == "max" else av < bv)
            for (av, bv, (_, d)) in zip(a, b, dims)
        )
        return ge and gt

    vals = list(pdf[by].itertuples(index=False, name=None))
    for i, v in enumerate(vals):
        if not any(dominates(k, v) for k in kept_vals):
            kept_idx.append(i)
            kept_vals.append(v)
    return pdf.iloc[kept_idx]


def skyline(df: DataFrame, dims: list[tuple[str, str]]) -> DataFrame:
    """Two-phase distributed skyline. Exact: phase 1 never removes a
    global-skyline row (local dominance implies global dominance)."""

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _pandas_skyline(pdf, dims)

    survivors = df.mapInPandas(local, df.schema)

    # global phase: survivors anti-joined against dominating survivors
    a = survivors.alias("a")
    b = survivors.alias("b")
    ge = None
    gt = None
    for c, d in dims:
        cmp_ge = (F.col(f"b.{c}") >= F.col(f"a.{c}")) if d == "max" else (
            F.col(f"b.{c}") <= F.col(f"a.{c}")
        )
        cmp_gt = (F.col(f"b.{c}") > F.col(f"a.{c}")) if d == "max" else (
            F.col(f"b.{c}") < F.col(f"a.{c}")
        )
        ge = cmp_ge if ge is None else (ge & cmp_ge)
        gt = cmp_gt if gt is None else (gt | cmp_gt)
    return a.join(b, ge & gt, "left_anti").select([F.col(f"a.{c}") for c in df.columns])
