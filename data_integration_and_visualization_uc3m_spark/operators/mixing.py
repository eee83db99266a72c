"""Corpus mixing — composing a training set from sources at target
proportions.

Pretraining corpora are MIXED, not concatenated: each source (web,
code, books, ...) gets a target share of the final corpus, and the
pipeline must derive per-source sampling rates that (a) hit the target
composition and (b) waste no data — the achievable corpus size is
limited by the scarcest source relative to its share,
``n_feasible = min_s(count_s / weight_s)``.

Scale shape: the plan is a per-source aggregate (tiny — one row per
source) crossed back as a broadcast scalar; the apply step joins the
broadcast plan onto the corpus and keeps a deterministic md5-hash
fraction per source (see operators.sampling) — a pure map-side filter,
no shuffle of the corpus at any scale, reproducible across re-runs
(epoch-stable mixing).

No counterpart in the reference (single-source ingest:
crime_immigration_etl.py:88-150); north-star extension, SURVEY §7
phase E.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import HASH_SPACE, hash_bucket


def _check_weights(weights: dict[str, float]) -> None:
    if not weights:
        raise ValueError("weights must name at least one source")
    bad = {k: v for k, v in weights.items() if not v > 0}
    if bad:
        raise ValueError(
            f"weights must be > 0 (a zero/negative share makes the "
            f"feasible corpus size undefined): {bad}"
        )


def _weight_expr(weights: dict[str, float], source_col: str) -> F.Column:
    expr: F.Column = F.lit(None).cast("double")
    for src, wgt in sorted(weights.items()):
        expr = F.when(F.col(source_col) == src, F.lit(float(wgt))).otherwise(
            expr
        )
    return expr


def mix_plan(
    docs: DataFrame, weights: dict[str, float], source_col: str = "source"
) -> DataFrame:
    """Per-source sampling plan for a target mix.

    Output per source: ``n_docs``, ``weight``, ``n_target`` (docs to
    keep), ``rate`` (n_target / n_docs). Sources absent from
    ``weights`` get weight NULL and are excluded from the plan (rate
    would be 0). All arithmetic is IEEE-double on exact integer
    operands, so a SQL oracle reproduces it bit-for-bit.
    """
    _check_weights(weights)
    counts = (
        docs.filter(_weight_expr(weights, source_col).isNotNull())
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("weight", _weight_expr(weights, source_col))
    )
    feasible = counts.select(
        F.min(F.col("n_docs").cast("double") / F.col("weight")).alias(
            "__feasible"
        )
    )
    return (
        counts.crossJoin(F.broadcast(feasible))
        .select(
            source_col,
            "n_docs",
            "weight",
            F.floor(F.col("weight") * F.col("__feasible"))
            .cast("long")
            .alias("n_target"),
            (
                F.floor(F.col("weight") * F.col("__feasible"))
                / F.col("n_docs")
            ).alias("rate"),
        )
    )


def mix_apply(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix0",
) -> DataFrame:
    """Materialize the mix: keep a deterministic hash fraction of each
    source at its planned rate. Returns the kept rows.

    The integer keep-threshold ``floor(rate * 2^32)`` makes the filter
    exact and portable; the plan side is a handful of rows, broadcast —
    the corpus never shuffles.
    """
    plan = mix_plan(docs, weights, source_col).select(
        source_col,
        F.floor(F.col("rate") * F.lit(HASH_SPACE))
        .cast("long")
        .alias("__threshold"),
    )
    return (
        docs.join(F.broadcast(plan), source_col, "inner")
        .filter(hash_bucket(F.col(id_col), seed) < F.col("__threshold"))
        .drop("__threshold")
    )


def curriculum_order(
    docs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 10,
    seed: str = "cur0",
) -> DataFrame:
    """Curriculum ordering: a deterministic global training order that
    presents higher-quality buckets first, shuffled within each bucket
    (quality-bucket curriculum — coarse difficulty phases with
    randomized order inside a phase, so the model never sees a
    quality-sorted gradient *within* a batch).

    Bucketing uses FIXED thresholds (``floor(quality * n_buckets)`` on
    a [0,1] score), not ntile: an ntile needs a global sort of the
    corpus, a fixed-bin bucket is a map-side expression. The global
    rank is then assembled scale-safely:

    - within-bucket rank: ``row_number`` over (md5, id) partitioned by
      bucket — one shuffle, the same shape as ``training_shuffle``;
    - bucket offsets: the bucket-size aggregate (≤ ``n_buckets`` rows)
      cumulated with a window over that TINY relation and broadcast
      back.

    ``curriculum_rank = offset(higher-quality buckets) + within-bucket
    rank`` — a total order identical on any cluster layout, with no
    global sort anywhere.
    """
    from pyspark.sql import Window

    from .sampling import hash_bucket

    q = F.col(quality_col)
    bucket = F.least(
        F.floor(q * n_buckets).cast("int"), F.lit(n_buckets - 1)
    )
    b = docs.select(
        F.col(id_col), q.alias("quality"), bucket.alias("bucket")
    )
    w_in = Window.partitionBy("bucket").orderBy(
        hash_bucket(F.col(id_col), seed), F.col(id_col)
    )
    ranked = b.withColumn("bucket_rank", F.row_number().over(w_in).cast("long"))
    sizes = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    # offset = rows in strictly higher-quality buckets (descending order)
    w_off = (
        Window.orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "bucket",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset"),
    )
    return ranked.join(F.broadcast(offsets), "bucket").select(
        F.col(id_col),
        "quality",
        "bucket",
        (F.col("offset") + F.col("bucket_rank")).alias("curriculum_rank"),
    )


def epoch_plan(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    token_col: str = "tokens",
) -> DataFrame:
    """Multi-epoch corpus budgeting: given a total token budget and
    target mix weights, how many PASSES (epochs) over each source does
    the training run make? Scarce high-weight sources repeat
    (epochs > 1, the standard up-sampling of curated sources);
    abundant sources are sub-sampled (epochs < 1).

    Per source: ``target_tokens = floor(budget · w / Σw)`` and
    ``epochs_fp6 = floor(target / available · 10⁶)`` — fixed-point so
    the ratio is oracle-exact. Shape: one per-source aggregate (tiny),
    everything else map-side arithmetic; the corpus itself is never
    shuffled by planning.
    """
    _check_weights(weights)
    wsum = float(sum(weights.values()))
    counts = (
        docs.filter(_weight_expr(weights, source_col).isNotNull())
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).alias("avail_tokens"),
        )
        .withColumn("weight", _weight_expr(weights, source_col))
    )
    target = F.floor(
        F.lit(float(token_budget)) * F.col("weight") / F.lit(wsum)
    ).cast("long")
    return counts.select(
        source_col,
        "n_docs",
        "avail_tokens",
        "weight",
        target.alias("target_tokens"),
        F.floor(
            target.cast("double") / F.col("avail_tokens") * 1000000
        )
        .cast("long")
        .alias("epochs_fp6"),
    )


def epoch_apply(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    token_col: str = "tokens",
    id_col: str = "doc_id",
    seed: str = "ep0",
) -> DataFrame:
    """Materialize the multi-epoch plan (:func:`epoch_plan`): each kept
    document appears ``floor(epochs)`` times plus one more trial kept
    with probability ``frac(epochs)``, decided by a deterministic
    per-(doc, epoch) md5 draw — so the expected instance count hits
    the token target exactly and a re-run (or a different cluster
    layout) produces the identical instance set.

    All threshold math is EXACT integer arithmetic on the fp6 epoch
    fixed point: ``thr = (epochs_fp6 mod 10⁶) · 2³² div 10⁶`` (the
    div is spelled subtract-mod so the double division is exact —
    numerator a multiple of 10⁶ below 2⁵³). The plan is a per-source
    broadcast; the explode fan-out per row is ``ceil(epochs)``,
    bounded by the budget itself.

    Output: the instance relation (id, source, epoch) — downstream
    shuffling/packing treats each instance as an independent row.
    """
    plan = epoch_plan(docs, weights, token_budget, source_col, token_col)
    eps = F.col("epochs_fp6")
    n_full = ((eps - eps % 1000000) / 1000000).cast("long")
    thr = (
        ((eps % 1000000) * F.lit(4294967296)
         - ((eps % 1000000) * F.lit(4294967296)) % 1000000)
        / 1000000
    ).cast("long")
    planned = plan.select(
        source_col, n_full.alias("_n_full"), thr.alias("_thr")
    )
    inst = docs.join(F.broadcast(planned), source_col).select(
        F.col(id_col),
        F.col(source_col),
        F.col("_n_full"),
        F.col("_thr"),
        F.explode(F.sequence(F.lit(0), F.col("_n_full"))).alias("epoch"),
    )
    draw = hash_bucket(
        F.concat_ws(":", F.col(id_col).cast("string"),
                    F.col("epoch").cast("string")),
        seed,
    )
    return inst.filter(
        (F.col("epoch") < F.col("_n_full")) | (draw < F.col("_thr"))
    ).select(id_col, source_col, "epoch")


def temperature_plan(
    docs: DataFrame,
    token_budget: int,
    source_col: str = "source",
    token_col: str = "tokens",
) -> DataFrame:
    """Temperature-scaled mixing at α = 0.5 (the UniMax / mT5 family:
    sample sources ∝ sizeᵅ so head sources are DAMPED and tail
    languages/domains up-weighted, without hand-tuned weights).

    α is fixed at 0.5 because √ is the one fractional power with an
    IEEE-exact, engine-identical primitive (general ``pow`` is a libm
    call with no cross-engine rounding contract — same reason the
    quality scorer uses a rational squash). Each source's weight
    ``floor(√tokens·10⁹)`` is fixed-pointed BEFORE the cross-source
    sum (convention 7), so the normalizer is exact-integer and the
    final shares are doubles of identical operands.

    One vocabulary-sized aggregate; nothing else touches the corpus.
    """
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("avail_tokens"),
    )
    w = F.floor(
        F.sqrt(F.col("avail_tokens").cast("double")) * F.lit(1000000000)
    ).cast("long")
    weighted = counts.withColumn("w_fp9", w)
    norm = weighted.agg(F.sum("w_fp9").alias("w_total"))
    share = F.col("w_fp9").cast("double") / F.col("w_total")
    return (
        weighted.crossJoin(F.broadcast(norm))
        .select(
            source_col,
            "n_docs",
            "avail_tokens",
            "w_fp9",
            F.floor(F.lit(float(token_budget)) * share)
            .cast("long")
            .alias("target_tokens"),
            share.alias("share"),
        )
    )
