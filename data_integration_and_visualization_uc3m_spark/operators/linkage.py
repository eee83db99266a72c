"""Entity resolution / record linkage — fuzzy matching over a value
vocabulary (north-star extension; no counterpart in the reference,
whose joins are exact equi-joins — crime_immigration_etl.py:215-249).

The linkage problem at 100 TB is never "compare every row to every
row": it is (1) collapse rows to the DISTINCT value vocabulary with
multiplicities (the vocabulary is orders of magnitude smaller than the
row count), (2) generate candidate pairs with a LOSSLESS blocking key
(every true match is guaranteed to share a block), (3) verify with the
exact distance only inside blocks. All three stages are plain
DataFrame ops; the verifier (``levenshtein``) is a JVM built-in, so
nothing leaves codegen.

Blocking here is the length-band construction: for edit distance ≤ d,
|len(a) − len(b)| ≤ d is necessary, so names bucketed by
``len div (d+1)`` can only match within the same or an adjacent
bucket. The probe side explodes to its {b−1, b, b+1} neighborhood and
the build side stays single-bucket — an ordered pair therefore meets
in EXACTLY one bucket, and the ``name_a < name_b`` order filter keeps
each unordered pair exactly once (no distinct pass needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def name_vocabulary(
    df: DataFrame, name_col: str, out_col: str = "name"
) -> DataFrame:
    """Distinct values with multiplicities — the linkage working set."""
    return df.groupBy(F.col(name_col).alias(out_col)).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def fuzzy_name_pairs(
    df: DataFrame, name_col: str, max_distance: int = 3
) -> DataFrame:
    """Near-duplicate value pairs (edit distance ≤ ``max_distance``)
    over the distinct-value vocabulary of ``name_col``, with each
    side's row multiplicity — the candidate unit of dirty-dimension
    cleanup (misspelled city/product/person names).

    Returns (name_a, name_b, distance, n_rows_a, n_rows_b) with
    name_a < name_b. The length-band blocking is lossless (see module
    docstring), so the result equals the quadratic all-pairs filter —
    which is exactly what the SQL oracle spells.
    """
    d = max_distance
    vocab = name_vocabulary(df, name_col).withColumn(
        "_len", F.length("name")
    )
    bucket = F.floor(F.col("_len") / (d + 1)).cast("long")
    probe = vocab.select(
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("n_rows_a"),
        F.col("_len").alias("_len_a"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("_block"),
    )
    build = vocab.select(
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("n_rows_b"),
        F.col("_len").alias("_len_b"),
        bucket.alias("_block"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        probe.join(build, "_block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(
            F.abs(F.col("_len_a") - F.col("_len_b")) <= F.lit(d)
        )
        .withColumn("distance", dist)
        .filter(F.col("distance") <= F.lit(d))
        .select("name_a", "name_b", "distance", "n_rows_a", "n_rows_b")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    name_col: str,
    window: int = 3,
    max_distance: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): rank
    the distinct-value vocabulary in sort order and compare each value
    only to its ``window`` successors — candidate volume is
    |vocab|·window by construction, independent of the value-length
    distribution (the knob the length-band blocking above doesn't
    have). NOT lossless: a true match sorted > window positions away
    is missed; production linkage runs multiple passes with different
    sort keys. Ranks come from slicing.global_rank (range-partitioned
    prefix ranks — no single-partition window); successors are a
    bounded explode (rank+1 … rank+window) equi-join, so the whole
    construction is two shuffles regardless of scale.

    Returns (name_a, name_b, distance, n_rows_a, n_rows_b) with
    name_a < name_b (sort order IS the canonical pair order).
    """
    from .slicing import global_rank

    vocab = name_vocabulary(df, name_col)
    ranked = global_rank(vocab, [F.col("name")], "r")
    probe = ranked.select(
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("n_rows_a"),
        F.explode(
            F.sequence(F.col("r") + 1, F.col("r") + window)
        ).alias("rr"),
    )
    build = ranked.select(
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("n_rows_b"),
        F.col("r").alias("rr"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    out = probe.join(build, "rr").select(
        "name_a",
        "name_b",
        dist.alias("distance"),
        "n_rows_a",
        "n_rows_b",
    )
    if max_distance is not None:
        out = out.filter(F.col("distance") <= F.lit(max_distance))
    return out


def multipass_blocked_pairs(
    left: DataFrame,
    right: DataFrame,
    passes: list[tuple[str, str]],
    left_id: str,
    right_id: str,
    max_block_pairs: int = 2_000_000,
) -> DataFrame:
    """Multi-pass blocking — the standard Fellegi-Sunter recall recipe
    (Hernández & Stolfo 1995 run several passes with different keys):
    each pass equi-joins ``left`` and ``right`` on one blocking-key
    pair ``(lk, rk)`` (names must differ between sides), the passes'
    candidate sets union, and pairs seen by more than one pass
    collapse to one via DISTINCT on the id pair — a true match missed
    by one key (typo'd nation) is still caught by another (name
    suffix).

    ``max_block_pairs`` is the documented knob that bounds the worst
    block: a block whose candidate volume ``cnt_left × cnt_right``
    exceeds it is EXCLUDED from pair generation (its members can
    still pair in another pass; the exclusion is observable via
    ``blocking_audit``). The exclusion semi-joins BOTH sides against
    the ok-block set BEFORE the block join, so an oversized block
    never physically explodes — the cap sits below the join, the
    ``tools/plan_audit.py`` ordering rule.

    Returns DISTINCT ``(left_id, right_id)``; join attributes back on
    the ids for comparator scoring (attributes are functionally
    dependent on the ids, so the dedup is deterministic)."""
    cand: DataFrame | None = None
    for lk, rk in passes:
        cl = left.groupBy(lk).agg(F.count(F.lit(1)).alias("_nl"))
        cr = right.groupBy(rk).agg(F.count(F.lit(1)).alias("_nr"))
        ok = cl.join(cr, F.col(lk) == F.col(rk)).filter(
            F.col("_nl") * F.col("_nr") <= F.lit(max_block_pairs)
        )
        l_ok = left.select(left_id, lk).join(
            ok.select(lk), lk, "left_semi"
        )
        r_ok = right.select(right_id, rk).join(
            ok.select(rk), rk, "left_semi"
        )
        p = l_ok.join(r_ok, F.col(lk) == F.col(rk)).select(
            left_id, right_id
        )
        cand = p if cand is None else cand.unionByName(p)
    assert cand is not None, "at least one blocking pass required"
    return cand.distinct()


def blocking_audit(
    left: DataFrame,
    right: DataFrame,
    passes: list[tuple[str, str]],
    max_block_pairs: int = 2_000_000,
) -> DataFrame:
    """Block-size observability for ``multipass_blocked_pairs``: one
    row per pass — ``(pass_idx, n_blocks, max_block_pairs_seen,
    n_oversized)`` where a block is oversized when its candidate
    volume exceeds the knob (those blocks were excluded from pair
    generation). Per-key aggregates only; never materializes pairs."""
    out: DataFrame | None = None
    for i, (lk, rk) in enumerate(passes, start=1):
        cl = left.groupBy(lk).agg(F.count(F.lit(1)).alias("_nl"))
        cr = right.groupBy(rk).agg(F.count(F.lit(1)).alias("_nr"))
        b = cl.join(cr, F.col(lk) == F.col(rk)).select(
            (F.col("_nl") * F.col("_nr")).alias("_pairs")
        )
        a = b.agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.max("_pairs").cast("long").alias("max_block_pairs_seen"),
            F.sum(
                F.when(F.col("_pairs") > F.lit(max_block_pairs), 1)
                .otherwise(0)
            ).cast("long").alias("n_oversized"),
        ).select(F.lit(i).cast("long").alias("pass_idx"), "*")
        out = a if out is None else out.unionByName(a)
    assert out is not None
    return out
