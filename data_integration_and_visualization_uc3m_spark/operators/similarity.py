"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k is the correctness baseline; signed-random-
projection LSH bucketing is the scale path (restricts candidates to one
bucket before the exact re-rank — the classic Charikar construction).

Determinism design (oracle-portable):
- all dot products fold left-to-right in DOUBLE (Spark ``F.aggregate``
  over ``zip_with``; DuckDB ``list_sum(list_transform(list_zip(...)))``)
  so both engines produce bit-identical floats;
- LSH hyperplanes are Rademacher (±1) vectors derived from md5 parity
  of (plane, dim) — reproducible in any engine with md5, no RNG state.

Scale: brute-force is O(n) per query with a full scan — fine for one
query vector, wrong for n×n. The LSH path buckets once (one narrow
shuffle on bucket id), then joins within buckets. At 100 TB the bucket
table is written partitioned by bucket so probes prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    """Left-fold double dot product — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    v = F.col(vec_col)
    return df.withColumn(out, F.sqrt(_dot(v, v)))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    One scan, no shuffle until the final TakeOrdered(k). The query
    vector is a literal array in the plan (broadcast-equivalent).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col)
    cos = _dot(v, q) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(q, q)))
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def rademacher_component(plane: int, dim_col) -> F.Column:
    """±1 pseudo-random component for (plane, dim), via md5 hex parity —
    engine-portable replacement for a seeded Gaussian."""
    h = F.md5(F.concat_ws(":", F.lit(plane), dim_col))
    return F.when(
        F.substring(h, 1, 1).isin("1", "3", "5", "7", "9", "b", "d", "f"),
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))


def lsh_bucket(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector an LSH bucket id from the signs of ``n_planes``
    signed random projections. bucket ∈ [0, 2^n_planes).

    Entirely map-side (no shuffle): the projection is an array fold per
    plane. Vectors in the same bucket are cosine-similar with the usual
    hyperplane-LSH probability; multi-probe = also search neighboring
    buckets (Hamming-1 bucket ids).
    """
    v = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.size(v) - 1),
                    lambda d: rademacher_component(p, d),
                ),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    n_planes: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN query: bucket the corpus, keep the query's bucket, exact
    cosine re-rank inside it. Recall < 1 by construction (single-probe);
    the oracle checks the computation, the bench checks the win."""
    bucketed = lsh_bucket(df, n_planes, id_col, vec_col)
    qdf = lsh_bucket(
        df.sparkSession.createDataFrame(
            [(0, [float(x) for x in query_vec])], f"{id_col} long, {vec_col} array<float>"
        ),
        n_planes,
        id_col,
        vec_col,
    ).select(F.col("bucket").alias("qbucket"))
    cand = bucketed.join(F.broadcast(qdf), F.col("bucket") == F.col("qbucket"))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
