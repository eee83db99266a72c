"""Iterative graph analytics — weighted PageRank in exact integer
arithmetic.

Complements the connected-components operator (operators.dedup:531):
CC answers "which nodes form one group"; PageRank ranks nodes by
recursive link mass — the standard importance measure for entity
graphs distilled from a warehouse (trade flows, citation edges,
user-interaction graphs).

Scale shape: one iteration = one hash join (ranks ⋈ edges on src) +
one aggregation (sum by dst) — both shuffle-aligned on the node key,
so successive iterations reuse the same partitioning. O(diameter-free)
fixed iteration count; every few rounds a ``localCheckpoint`` cuts the
growing lineage, with superseded checkpoint blocks freed eagerly and
exactly (same storage-hygiene discipline as connected_components —
see dedup.py:547-572 for the measured rationale).

Determinism: ranks are fixed-point BIGINTs (1.0 ≡ 10^12); every
update is integer multiply / integer division (``div``), so the
result is bit-identical on any engine and any partitioning — float
summation order never enters. Rank mass from dangling nodes (no
out-edges) is dropped, not redistributed; with the fixed damping base
this is the simplest portable convention, and the oracle mirrors it.

No counterpart in the reference (its joins are flat dimension lookups,
``crime_immigration_etl.py:268-303``; no iterative computation
anywhere in its surface) — north-star extension, SURVEY §7 phase E.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._ck import ck_rdd_id, unpersist_by_id

SCALE = 1_000_000_000_000  # 1.0 in fixed point


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 10,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank over (src, dst, w) edges; returns
    (node, rank_fp) with rank_fp in units of 10^-12.

    ``damping_pct`` is an integer percentage so the damping step stays
    in exact integer arithmetic: ``new = base + damping*contrib div
    100`` with ``base = (100-damping) * (SCALE div N) div 100``.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    spark = edges.sparkSession

    # exact-id checkpoint hygiene, shared helper (operators/_ck.py)
    def _ck_rdd_id(df: DataFrame) -> int | None:
        return ck_rdd_id(df)

    def _unpersist(rdd_id: int | None) -> None:
        if rdd_id is not None:
            unpersist_by_id(spark, rdd_id)

    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    e = e.join(outw, "src").localCheckpoint()
    edges_id = _ck_rdd_id(e)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    nodes_id = _ck_rdd_id(nodes)
    n = nodes.count()
    if n == 0:  # empty edge relation — empty result, same schema
        return nodes.select(
            "node", F.lit(None).cast("long").alias("rank_fp")
        )
    init = SCALE // n
    base = (100 - damping_pct) * init // 100

    ranks = nodes.withColumn("r", F.lit(init).cast("long"))
    prev_ck: int | None = None
    for i in range(iterations):
        contrib = (
            ranks.join(e, ranks.node == e.src)
            .groupBy("dst")
            .agg(
                F.sum(F.expr("(r * w) div ow")).alias("c")
            )
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_pct} * coalesce(c, 0L)) div 100"
                )
            ).cast("long").alias("r"),
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint()
            if prev_ck is not None:
                _unpersist(prev_ck)
            prev_ck = _ck_rdd_id(ranks)
    _unpersist(edges_id)
    _unpersist(nodes_id)
    return ranks.select("node", F.col("r").alias("rank_fp"))


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle participation over an undirected simple graph.

    Canonicalizes to distinct ``lo < hi`` edges (direction and
    self-loops dropped), enumerates each triangle exactly once in
    canonical orientation ``a < b < c`` — wedges from the edge
    self-join ``(a,b) ⋈ (b,c)`` closed by a LEFT SEMI probe on the
    ``(a,c)`` edge — then explodes each triangle's three corners and
    counts per node.

    Scale shape: two hash joins on node keys, no cartesian anywhere.
    Wedge fan-out is Σ deg(v)² on canonical ids; the standard
    degree-ordering refinement (rank nodes by degree before
    canonicalizing, so high-degree hubs sit on the closing side)
    bounds it to O(m^1.5) and drops in here by swapping the
    canonical comparator — unnecessary for dimension-sized entity
    graphs, documented for the 100 TB path.

    Returns (node, n_triangles); nodes in no triangle are absent.
    """
    # localCheckpoint: the bounded (<=|V|^2) distinct-edge relation
    # feeds all THREE triangle arms (ab, bc, ac) — unstaged, each arm
    # re-derived the caller's whole upstream fact pipeline (r12 rescan
    # audit: 3 scans of every base table in nation_trade_triangles).
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
        .localCheckpoint()
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"], "left_semi")
    return (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def k_core_fixed_rounds(
    edges: DataFrame,
    k: int,
    rounds: int = 6,
    a: str = "lo",
    b: str = "hi",
) -> DataFrame:
    """Bounded-round k-core peeling over an undirected edge relation
    (canonical ``a < b`` per row): repeatedly drop nodes of degree < k
    and the edges touching them. Runs EXACTLY ``rounds`` rounds — no
    driver-side convergence action at all, the whole unrolled
    iteration is ONE lazy plan — so the SQL twin (the same unroll as
    chained CTEs) is equivalent by construction; pick ``rounds`` ≥ the
    expected peel depth (peeling removes ≥1 node per round until
    stable, so ``rounds`` bounds the cascade length, not the graph
    size).

    Per round: one degree aggregation + two semi-joins — the same
    join+agg shape as the other iterative operators here (connected
    components, PageRank), minus their convergence COLLECT (no result
    inspection; the only driver action is the per-round checkpoint).
    Each round's edge relation references the previous round THREE
    times (degree build + both semi-join probes), so without lineage
    truncation the unrolled plan triples per round (3^rounds subtree
    copies — measured: the analyzed plan alone hangs the session at 6
    rounds). Rounds are therefore localCheckpoint'd with the same
    exact superseded-id freeing as connected_components. Returns the
    surviving nodes with their residual degrees.
    """
    spark = edges.sparkSession

    # exact-id checkpoint hygiene, shared helper (operators/_ck.py)
    def _ck_rdd_id(df: DataFrame) -> int | None:
        return ck_rdd_id(df)

    def _unpersist(rdd_id: int | None) -> None:
        if rdd_id is not None:
            unpersist_by_id(spark, rdd_id)

    e = edges.select(F.col(a).alias("lo"), F.col(b).alias("hi")).localCheckpoint()
    prev_id = _ck_rdd_id(e)
    for _ in range(rounds):
        deg = (
            e.select(F.col("lo").alias("node"))
            .unionAll(e.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "lo"), "lo", "left_semi")
            .join(keep.withColumnRenamed("node", "hi"), "hi", "left_semi")
            .localCheckpoint()
        )
        _unpersist(prev_id)
        prev_id = _ck_rdd_id(e)
    return (
        e.select(F.col("lo").alias("node"))
        .unionAll(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def label_propagation_rounds(
    edges: DataFrame, rounds: int = 2
) -> DataFrame:
    """Weighted label propagation (community detection), synchronous
    rounds with a FULLY DETERMINISTIC update: node u's next label is
    the neighbor label with the greatest incident edge weight, ties
    broken by smallest label (row_number over (weight DESC, label)).
    Classic LPA leaves tie-breaking and update order unspecified —
    pinning both is what makes the result reproducible across engines
    and partitionings, the same discipline as pagerank_fixed_point
    above.

    ``edges`` is directed (src, dst, w); propagation runs over the
    symmetrized graph (both directions union-aggregated). Labels start
    as each node's own id; nodes appear iff they touch an edge.

    Per round: one hash join (labels onto the edge relation keyed by
    the neighbor end) + one (node, label) aggregation + one per-node
    window — all shuffle-aligned on the node key, O(|edges|) per
    round. Fixed ``rounds`` (not convergence-polled) keeps the plan
    statically analyzable and the oracle unrollable.

    Returns (node, label) after ``rounds`` rounds.
    """
    # localCheckpoint, NOT persist: the function returns a LAZY plan,
    # so a persist paired with an end-of-function unpersist is a no-op
    # by the time the caller executes — the cache entry is gone and
    # every und reference re-derives the whole upstream edge pipeline
    # (r12 rescan audit: 42 fact-table scans in the modularity query's
    # plan). The eager checkpoint materializes the bounded symmetrized
    # relation once and every round reads the pinned RDD.
    und = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w")
        .unionByName(
            edges.select(
                F.col("dst").alias("u"), F.col("src").alias("v"), "w"
            )
        )
        .groupBy("u", "v")
        .agg(F.sum("w").cast("long").alias("w"))
        .localCheckpoint()
    )
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    rank_w = Window.partitionBy("node").orderBy(
        F.col("sw").desc(), F.col("label")
    )
    for _ in range(rounds):
        scores = (
            und.join(
                labels.select(
                    F.col("node").alias("v"), F.col("label")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.sum("w").cast("long").alias("sw"))
        )
        labels = (
            scores.withColumn("rn", F.row_number().over(rank_w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    # The returned labels are deliberately NOT checkpointed: consumers
    # referencing them twice (modularity's lu/lv) re-derive the rounds
    # from the PINNED und — cheap |V|-sized arithmetic — and the extra
    # eager job a labels checkpoint adds measured slower at sf0.1
    # (modularity 1.87 → 2.42 s). The und checkpoint above is the one
    # that guards the fact pipeline.
    return labels


def community_modularity_terms(
    edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """Per-community modularity contributions, EXACT-INTEGER form.

    Over the symmetrized weight matrix (``T = Σ_uv A_uv = 2m``), the
    standard modularity is ``Q = Σ_c [W_c/T − (d_c/T)²]`` with
    ``W_c`` the intra-community weight and ``d_c`` the community
    degree sum. Scaling by T² clears every division:
    ``T²·Q = Σ_c (T·W_c − d_c²)`` — all BIGINT, so the partition
    quality score is bit-exact on any engine with zero float
    accumulation (emit the fp ratio downstream if wanted; the
    integer terms are the oracle-stable artifact).

    Returns one row per community:
    ``(label, w_in, degree, contrib_scaled)`` where
    ``contrib_scaled = T·w_in − degree²``.
    """
    und = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w")
        .unionByName(
            edges.select(
                F.col("dst").alias("u"), F.col("src").alias("v"), "w"
            )
        )
        .groupBy("u", "v")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    lu = labels.select(F.col("node").alias("u"), F.col("label").alias("lu"))
    lv = labels.select(F.col("node").alias("v"), F.col("label").alias("lv"))
    annotated = und.join(lu, "u").join(lv, "v")
    t = annotated.agg(F.sum("w").cast("long").alias("t"))
    intra = (
        annotated.filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.sum("w").cast("long").alias("w_in"))
    )
    deg = (
        annotated.groupBy(F.col("lu").alias("label"))
        .agg(F.sum("w").cast("long").alias("degree"))
    )
    return (
        deg.join(intra, "label", "left")
        .select(
            "label",
            F.coalesce(F.col("w_in"), F.lit(0)).cast("long").alias("w_in"),
            "degree",
        )
        .crossJoin(F.broadcast(t))
        .select(
            "label",
            "w_in",
            "degree",
            (
                F.col("t") * F.col("w_in")
                - F.col("degree") * F.col("degree")
            ).cast("long").alias("contrib_scaled"),
        )
    )
