"""Query registry — part 11: round-14 additions.

Continues the chain (see queries/_core.py). Theme: SCALE-SAFE TWINS
for the three fixed-cardinality-blocking queries the r13 decade probe
measured at 24-159x on 10x data (BASELINE.md "Fixed-cardinality
blocking"). The pinned forms (`semdedup_verdicts` k=8 codebook,
`dedup_embedding_cosine` 10-value label blocking,
`ppjoin_word_set_pairs` saturated 3-gram universe) stay registered for
oracle comparability; these twins are the forms a 100 TB user should
call — same operators, same semantics class, but the blocking key's
cardinality SCALES with the corpus, so within-cell candidate volume
stays ~cap·|V| (embedding twins: adaptive-resolution SRP descent,
similarity.adaptive_lsh_cells) or keys on genuinely rare tokens
(ppjoin twin: 5-gram shingles, whose universe grows combinatorially
with the corpus instead of saturating at the 31-word vocabulary's
~30k 3-gram combos — measured median df 1 of 5,000 docs at sf0.1 vs
77% saturation for 3-grams at sf1).

Registration order is append-only.
"""

from __future__ import annotations

from ._p10 import *  # noqa: F401,F403

# Shared oracle CTE: the adaptive-resolution SRP-LSH cell assignment
# (similarity.adaptive_lsh_cells) re-derived in SQL — 12 md5-parity
# hyperplanes, bucket read at 4/8/12 bits, each vector blocking at the
# coarsest ancestry level whose population fits cell_cap=64. Exactly
# the descent the knn_beam_search_recall oracle pins; shared here so
# both embedding twins spell the same cells. ``count_where`` restricts
# the POPULATION COUNTS to a sub-relation (the frozen-index form the
# delta-merge query needs: counts from the base only, LEFT joins so an
# unseen bucket counts 0 and opens coarse).


def _adaptive_cells_cte(count_where: str = "") -> str:
    return _ADAPTIVE_CELLS_TEMPLATE.replace("{CW}", count_where)


_ADAPTIVE_CELLS_TEMPLATE = """planes AS (
        SELECT p.plane, d.dim,
               CASE WHEN substr(md5(CAST(p.plane AS VARCHAR) || ':'
                                  || CAST(d.dim AS VARCHAR)), 1, 1)
                         IN ('1','3','5','7','9','b','d','f')
                    THEN 1.0 ELSE -1.0 END AS c
        FROM (SELECT unnest(range(12)) AS plane) p,
             (SELECT unnest(range(64)) AS dim) d
    ), proj AS (
        SELECT e.vec_id, p.plane,
               SUM(CAST(e.embedding[CAST(p.dim AS INTEGER) + 1] AS DOUBLE)
                   * p.c) AS s
        FROM embeddings e, planes p
        GROUP BY e.vec_id, p.plane
    ), buck AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN s > 0
                             THEN 1::BIGINT << CAST(plane AS INTEGER)
                             ELSE 0 END) AS BIGINT) AS b12
        FROM proj GROUP BY vec_id
    ), vecs AS (
        SELECT * FROM (
            SELECT e.vec_id, e.embedding,
                   sqrt(list_sum(list_transform(list_zip(e.embedding, e.embedding),
                        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))) AS norm,
                   b.b12 % 16 AS b4, b.b12 % 256 AS b8, b.b12
            FROM embeddings e JOIN buck b USING (vec_id)
        ) WHERE norm > 0
    ), c4 AS (
        SELECT b4, COUNT(*) AS n4 FROM vecs {CW} GROUP BY b4
    ), c8 AS (
        SELECT b8, COUNT(*) AS n8 FROM vecs {CW} GROUP BY b8
    ), cells AS (
        SELECT v.vec_id, v.embedding, v.norm,
               CASE WHEN COALESCE(c4.n4, 0) <= 64 THEN 0
                    WHEN COALESCE(c8.n8, 0) <= 64 THEN 1 ELSE 2 END AS lvl,
               CASE WHEN COALESCE(c4.n4, 0) <= 64 THEN v.b4
                    WHEN COALESCE(c8.n8, 0) <= 64 THEN v.b8
                    ELSE v.b12 END AS bkt
        FROM vecs v LEFT JOIN c4 USING (b4) LEFT JOIN c8 USING (b8)
    )"""


_ADAPTIVE_CELLS_CTE = _adaptive_cells_cte()


@register(
    "semdedup_verdicts_scaled",
    f"""
    WITH {_ADAPTIVE_CELLS_CTE}, dups AS (
        SELECT DISTINCT b.vec_id AS dup_id
        FROM cells a JOIN cells b
          ON a.lvl = b.lvl AND a.bkt = b.bkt AND a.vec_id < b.vec_id
        WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              / (a.norm * b.norm) >= 0.4
    )
    SELECT c.vec_id,
           CAST(c.lvl * 4096 + c.bkt AS INTEGER) AS cluster,
           (c.vec_id IN (SELECT dup_id FROM dups)) AS is_dup
    FROM cells c
    """,
    ops=["semdedup", "similarity-blocked", "embedding-near-dup",
         "adaptive-lsh-cells"],
)
def semdedup_verdicts_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with SCALE-SAFE cells — the registered 100 TB form of
    `semdedup_verdicts` (whose codebook is pinned at k=8 for oracle
    comparability and measured Θ(n²/k): 27.4x on 10x data; raising k
    alone measured insufficient — one Lloyd step leaves cells
    unbalanced, BASELINE.md "Fixed-cardinality blocking"). Cells here
    come from similarity.adaptive_lsh_cells: every cell is bounded by
    cell_cap=64 BY CONSTRUCTION, so the within-cell verdict join stays
    ~cap·|V| candidates at any corpus size. One verdict row per
    non-degenerate vector: its cell id (lvl·4096+bkt — unique across
    levels since bkt < 2^12) and whether a lower-id cell-mate sits at
    cosine >= 0.4 (first-wins, same convention as the pinned form).
    The dup flag joins the bounded dup-id relation back via a grouped
    broadcast — no distinct over the corpus."""
    e = _t(spark, sf_dir, "embeddings", fanout=True)
    keyed = similarity.adaptive_lsh_cells(e, cell_cap=64)
    a = keyed.select(
        F.col("_id").alias("_ida"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "lvl", "bkt",
    )
    b = keyed.select(
        F.col("_id").alias("_idb"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "lvl", "bkt",
    )
    cos = similarity._dot(F.col("_va"), F.col("_vb")) / (
        F.col("_na") * F.col("_nb")
    )
    dups = (
        a.join(b, ["lvl", "bkt"])
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cos >= 0.4)
        .groupBy(F.col("_idb").alias("_dup"))
        .agg(F.lit(True).alias("_f"))
    )
    return (
        keyed.join(F.broadcast(dups), keyed["_id"] == dups["_dup"], "left")
        .select(
            F.col("_id").alias("vec_id"),
            (F.col("lvl") * 4096 + F.col("bkt")).cast("int").alias("cluster"),
            F.coalesce(F.col("_f"), F.lit(False)).alias("is_dup"),
        )
    )


@register(
    "dedup_embedding_cosine_srp",
    f"""
    WITH {_ADAPTIVE_CELLS_CTE}
    SELECT * FROM (
        SELECT CAST(a.lvl * 4096 + a.bkt AS INTEGER) AS block,
               a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                 / (a.norm * b.norm) AS cosine
        FROM cells a JOIN cells b
          ON a.lvl = b.lvl AND a.bkt = b.bkt AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.3
    """,
    ops=["dedup-embedding", "similarity-blocked", "adaptive-lsh-cells"],
)
def dedup_embedding_cosine_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs with SRP blocking — the
    registered 100 TB form of `dedup_embedding_cosine` (whose 10-value
    label blocking measured 159x on 10x data; the fixed 8-plane/256-cell
    SRP arm measured 85.7 → 13.8 s at sf1, BASELINE.md
    "Fixed-cardinality blocking"). This twin goes one step further than
    the measured fixed-256-cell arm: similarity.adaptive_lsh_cells
    bounds EVERY cell by cell_cap=64 by construction, so candidate
    volume is ~cap·|V| at any corpus size — the hyperplane-recall trade
    (blocking is candidate GENERATION with recall < 1) is the same one
    the IVF/nprobe family already quantifies. Within a cell the cosine
    is exact and bit-identical to the oracle's left-fold."""
    e = _t(spark, sf_dir, "embeddings", fanout=True)
    keyed = similarity.adaptive_lsh_cells(e, cell_cap=64)
    cells = keyed.select(
        (F.col("lvl") * 4096 + F.col("bkt")).cast("int").alias("cell"),
        F.col("_id").alias("vec_id"),
        F.col("_v").alias("embedding"),
    )
    return similarity.cosine_pairs_blocked(
        cells, block_col="cell", threshold=0.3
    )


# 5-gram shingle relation: same tokenizer as _SHINGLES_CTE (split
# lower(text) on space) but 5-word windows — the universe grows
# combinatorially with the corpus (vs the 3-gram universe saturating
# at ~31^3 combos), so document frequencies stay LOW and prefix
# filtering has rare tokens to key on.
_SHINGLES5_CTE = """sh5 AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(
                [array_to_string(list_slice(toks, i + 1, i + 5), ' ')
                 FOR i IN range(0, greatest(len(toks) - 5, 0) + 1)]
            ) AS shingle
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                  FROM documents)
        ) WHERE length(shingle) > 0
    )"""


@register(
    "ppjoin_rare_shingle_pairs",
    f"""
    WITH {_SHINGLES5_CTE}, tok AS (
        SELECT doc_id, shingle AS w FROM sh5
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS set_size FROM tok GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common,
           CAST(sa.set_size AS BIGINT) AS size_a,
           CAST(sb.set_size AS BIGINT) AS size_b,
           CAST(n_common * 1000
                // (sa.set_size + sb.set_size - n_common)
                AS BIGINT) AS jaccard_milli
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE 5 * n_common >= 3 * (sa.set_size + sb.set_size - n_common)
    """,
    ops=["set-similarity-join", "prefix-filtering", "dedup-jaccard"],
)
def ppjoin_rare_shingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin over a RARITY-BEARING token universe — the registered
    100 TB form of `ppjoin_word_set_pairs`, whose 3-gram shingle
    universe saturates at the 31-word vocabulary's ~30k combinations
    (median shingle df 77% of docs at sf1 → prefix filtering has
    nothing rare to key on → Θ(n²) candidates, measured 24x on 10x
    data). 5-gram shingles grow combinatorially with the corpus
    (measured median df 1 of 5,000 docs at sf0.1), so each document's
    prefix — its rarest shingles under the global (df, shingle) order
    — actually prunes: candidate volume tracks the df of rare keys,
    which stays bounded as the corpus grows. Same operator
    (dedup.ppjoin_pairs), same lossless prefix principle, same exact
    integer threshold math; only the token relation differs."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    tok = dedup.ngram_set(d, n=5)
    return dedup.ppjoin_pairs(
        tok, id_col="doc_id", item_col="shingle", t_num=3, t_den=5
    )


@register(
    "knn_graph_delta_merge",
    f"""
    WITH {_adaptive_cells_cte("WHERE vec_id % 10 <> 0")}
    SELECT src, dst, cos FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                 / (a.norm * b.norm) AS cos,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_sum(list_transform(
                                list_zip(a.embedding, b.embedding),
                                p -> CAST(p[1] AS DOUBLE)
                                     * CAST(p[2] AS DOUBLE)))
                              / (a.norm * b.norm) DESC, b.vec_id
               ) AS rn
        FROM cells a JOIN cells b
          ON a.lvl = b.lvl AND a.bkt = b.bkt AND a.vec_id <> b.vec_id
    ) WHERE rn <= 8
    """,
    ops=["ann-graph-traversal", "incremental-index-maintenance",
         "cdc-delta-merge", "adaptive-lsh-cells"],
)
def knn_graph_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance (VERDICT r13 ask #8b): a CDC
    delta batch (every 10th vec_id — the new-arrivals slice) attaches
    to the existing k-NN graph through the FROZEN base cell structure
    (similarity.knn_graph_delta_merge): delta vectors assign via the
    base's population counts like a frozen IVF codebook, delta sources
    score only their cell-mates, and base sources merge their stored k
    edges with same-cell delta candidates — top-k(A ∪ B) =
    top-k(top-k(A) ∪ B), so the merge is EXACTLY a frozen-cell rebuild
    over base ∪ delta. The ORACLE spells that full rebuild, so the
    oracle gate proves incremental == batch (the
    incremental_dedup_assign discipline). Per-batch work is
    delta-proportional: the stored |V|·k edge relation plus
    delta-sized join arms — no corpus-scale recompute."""
    e = _t(spark, sf_dir, "embeddings", fanout=True)
    base = e.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 0)
    delta = e.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 0)
    return similarity.knn_graph_delta_merge(base, delta, k=8, cell_cap=64)


@register(
    "knn_graph_delta_delete",
    f"""
    WITH {_ADAPTIVE_CELLS_CTE}
    SELECT src, dst, cos FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                 / (a.norm * b.norm) AS cos,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_sum(list_transform(
                                list_zip(a.embedding, b.embedding),
                                p -> CAST(p[1] AS DOUBLE)
                                     * CAST(p[2] AS DOUBLE)))
                              / (a.norm * b.norm) DESC, b.vec_id
               ) AS rn
        FROM cells a JOIN cells b
          ON a.lvl = b.lvl AND a.bkt = b.bkt AND a.vec_id <> b.vec_id
        WHERE a.vec_id % 7 <> 0 AND b.vec_id % 7 <> 0
    ) WHERE rn <= 8
    """,
    ops=["ann-graph-traversal", "incremental-index-maintenance",
         "cdc-delta-delete", "adaptive-lsh-cells"],
)
def knn_graph_delta_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index DELETION — the complement of
    `knn_graph_delta_merge`: every 7th vec_id leaves the corpus, and
    the stored k-NN graph repairs itself without a rebuild
    (similarity.knn_graph_delta_delete): edges from deleted srcs
    vanish, srcs that lost a top-k neighbor re-rank their surviving
    cell-mates (found by one semi-join over the stored |V|·k edge
    artifact), everyone else keeps their edges verbatim — deleting a
    vector never in a src's top-k cannot change that top-k. Cells stay
    FROZEN (counts from the pre-delete corpus, the IVF
    no-retrain-on-delete convention). The ORACLE spells the frozen-cell
    full rebuild over survivors, so the oracle gate proves
    incremental == batch."""
    e = _t(spark, sf_dir, "embeddings", fanout=True)
    dele = e.filter(F.pmod(F.col("vec_id"), F.lit(7)) == 0).select("vec_id")
    return similarity.knn_graph_delta_delete(e, dele, k=8, cell_cap=64)


@register(
    "streaming_ann_index_e2e",
    f"""
    WITH {_adaptive_cells_cte("WHERE vec_id % 4 = 0")}
    SELECT src, dst, cos FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                 / (a.norm * b.norm) AS cos,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_sum(list_transform(
                                list_zip(a.embedding, b.embedding),
                                p -> CAST(p[1] AS DOUBLE)
                                     * CAST(p[2] AS DOUBLE)))
                              / (a.norm * b.norm) DESC, b.vec_id
               ) AS rn
        FROM cells a JOIN cells b
          ON a.lvl = b.lvl AND a.bkt = b.bkt AND a.vec_id <> b.vec_id
    ) WHERE rn <= 8
    """,
    ops=["streaming-e2e", "ann-graph-traversal",
         "incremental-index-maintenance", "adaptive-lsh-cells"],
)
def streaming_ann_index_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental ANN index, proven end-to-end: embeddings
    staged as 4 mtime-ordered chunk files (chunk = vec_id % 4),
    streamed one file per micro-batch (streaming/ann.py). Batch 0
    trains the adaptive-LSH cell structure and FREEZES its population
    counts; every later batch assigns through the frozen counts and
    merges into the stored |V|*k edge artifact with
    similarity.knn_graph_delta_merge_prebuilt — per-batch compute is
    delta-proportional, state is epoch-scoped/replay-safe. The ORACLE
    spells the frozen-cell FULL REBUILD over all vectors with counts
    from chunk 0 alone, so a hash match proves the incremental stream
    maintained exactly the batch index across every micro-batch
    boundary."""
    import glob
    import os
    import shutil
    import time as _time

    from ..streaming.ann import read_index_edges, run_stream_ann_index

    e = _t(spark, sf_dir, "embeddings")
    work = scratch_dir("stream_ann", sf_dir, clean=True)
    src = f"{work}/src"
    os.makedirs(src)
    base = _time.time()
    for c in range(4):
        tmp = f"{work}/tmp{c}"
        e.filter(F.pmod(F.col("vec_id"), F.lit(4)) == c).repartition(
            1
        ).write.mode("overwrite").parquet(tmp)
        dst = f"{src}/chunk{c}.parquet"
        shutil.copyfile(glob.glob(f"{tmp}/part-*.parquet")[0], dst)
        # distinct ascending mtimes pin FileStreamSource arrival order
        os.utime(dst, (base + c, base + c))
    run_stream_ann_index(
        spark, src, f"{work}/state", f"{work}/ckpt", k=8, cell_cap=64
    )
    return read_index_edges(spark, f"{work}/state").select(
        "src", "dst", "cos"
    )


@register(
    "compaction_bin_plan",
    """
    WITH files AS (
        SELECT source, doc_id // 50 AS file_id,
               CAST(SUM(n_chars) AS BIGINT) AS file_bytes,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source, doc_id // 50
    ), planned AS (
        SELECT source, file_id, file_bytes, n_docs,
               CAST(COALESCE(SUM(file_bytes) OVER (
                   PARTITION BY source ORDER BY file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 16384 AS BIGINT) AS bin_id
        FROM files
    )
    SELECT source, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(file_bytes) AS BIGINT) AS bin_bytes,
           CAST(SUM(file_bytes) * 1000 // 16384 AS BIGINT) AS fill_milli,
           (COUNT(*) > 1) AS is_compaction
    FROM planned
    GROUP BY source, bin_id
    """,
    ops=["storage-maintenance", "small-files-compaction",
         "bin-packing-plan"],
)
def compaction_bin_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMALL-FILES COMPACTION planning as a relational operator — the
    storage-maintenance step every long-lived 100 TB table needs
    (streaming sinks and per-batch writers mint small files; reads then
    pay a footer+task per file). The file inventory here is the
    documents table chunked 50 docs/file with byte sizes from real
    n_chars sums; in production it comes from the filesystem listing or
    the table format's manifest. The PLAN is next-fit bin packing by
    running total, computed entirely with per-partition windows: within
    each source partition (compaction never merges across partition
    boundaries — it would break partition pruning), files in id order
    accumulate into bins of target 16 KiB via
    ``bin = floor(preceding-cumsum / target)`` — deterministic integer
    math, no driver loop, no global sort. Output: one row per planned
    output file (bin): file count, docs, bytes, fill ratio in milli,
    and whether the bin actually merges anything (``is_compaction``).
    Scale shape: one window + one aggregate, both keyed by the
    partition column — the planner parallelizes over partitions and
    emits a bounded plan relation; the rewrite itself is a distributed
    copy job driven by this plan."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    target = F.lit(16384).cast("long")
    files = d.groupBy(
        "source", F.expr("doc_id div 50").alias("file_id")
    ).agg(
        F.sum("n_chars").cast("long").alias("file_bytes"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.select(
        "source", "file_bytes", "n_docs",
        (F.coalesce(F.sum("file_bytes").over(w), F.lit(0).cast("long"))
         / target).cast("long").alias("bin_id"),
    )
    return planned.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("file_bytes").cast("long").alias("bin_bytes"),
        F.expr("CAST(sum(file_bytes) * 1000 div 16384 AS BIGINT)")
        .alias("fill_milli"),
        (F.count(F.lit(1)) > 1).alias("is_compaction"),
    )


@register(
    "ann_dpp_pruned_topk",
    f"""
    WITH {_ADAPTIVE_CELLS_CTE}, qc AS (
        SELECT lvl, bkt, embedding AS qv, norm AS qn
        FROM cells WHERE vec_id = 1
    )
    SELECT c.vec_id,
           list_sum(list_transform(list_zip(c.embedding, qc.qv),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (c.norm * qc.qn) AS cosine
    FROM cells c JOIN qc ON c.lvl = qc.lvl AND c.bkt = qc.bkt
    ORDER BY cosine DESC, c.vec_id
    LIMIT 10
    """,
    ops=["similarity-ivf", "partition-pruning", "adaptive-lsh-cells",
         "storage-layout"],
)
def ann_dpp_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-PRUNED ANN probe — the storage-layout demonstration
    behind the IVF scale story ("partition-by-cell + partition pruning
    at the scan", ivf_topk): the adaptive-LSH cell index is WRITTEN
    partitioned by (lvl, bkt), and the probe joins it with the query's
    1-row cell relation — Spark's DYNAMIC PARTITION PRUNING turns that
    join into partition filters on BOTH columns
    (``SubqueryAdaptiveBroadcast dynamicpruning#...`` feeding
    ``PartitionFilters`` in the scan, verified in PLANS.md), so the
    scan reads ONLY the query's cell directory instead of the corpus.
    At 100 TB this is the difference between touching one ~cell_cap
    slice and touching every file: the index layout, not the executor
    count, bounds probe latency. Exact cosine (stored norms — the same
    left-fold values the oracle recomputes) ranks the pruned cell's
    members, top-10. Scratch: stable per (query, sf)."""
    import os

    from ..operators.similarity import (
        _descend, _dot, _srp_keyed, _unpersist_ck,
    )

    e = _t(spark, sf_dir, "embeddings")
    store = os.path.join(scratch_dir("ann_dpp", sf_dir, clean=True),
                         "cells")
    # The cells relation has exactly ONE consumer here — the
    # partitioned write — so adaptive_lsh_cells' output checkpoint
    # (which exists because ordinary consumers join the relation
    # twice) would be a wasted full |V|-row materialization + job
    # (r15 opt, guide §5 caching-only-when-reused). Stage only the
    # SRP fold (it still feeds the two count aggregates + the descent
    # arm — the r14 no-CSE lesson) and let the WRITE be the single
    # materialization of the descend; the staged fold is freed as soon
    # as the store exists. Same cells values, same layout.
    srp = _srp_keyed(e, "vec_id", "embedding").localCheckpoint()
    c4 = srp.groupBy("_b4").agg(F.count(F.lit(1)).alias("_n4"))
    c8 = srp.groupBy("_b8").agg(F.count(F.lit(1)).alias("_n8"))
    cells = _descend(srp, c4, c8, cell_cap=64)
    # Repartition by the partition columns (explicit partition count —
    # a keyed repartition without one is AQE-coalesced back to ONE
    # partition at this SF) before the partitioned write: without it a
    # single task wrote all ~255 (lvl, bkt) directories sequentially
    # (measured 4.8-5.6 s vs 1.3-1.6 s with the 32-way spread; guide §6
    # small-files/output-sizing). defaultParallelism keeps the count
    # scale-adaptive (cluster cores, not a local constant); hashing on
    # the partition columns keeps exactly one file per cell directory
    # at any scale — the layout DPP prunes against is unchanged.
    cells.repartition(
        spark.sparkContext.defaultParallelism, "lvl", "bkt"
    ).write.mode("overwrite").partitionBy("lvl", "bkt").parquet(store)
    _unpersist_ck(srp)  # the store is the artifact; the fold is done
    stored = spark.read.parquet(store)
    qc = (
        stored.filter(F.col("_id") == 1)
        .select("lvl", "bkt", F.col("_v").alias("_qv"),
                F.col("_n").alias("_qn"))
    )
    return (
        stored.join(F.broadcast(qc), ["lvl", "bkt"])
        .select(
            F.col("_id").alias("vec_id"),
            (_dot(F.col("_v"), F.col("_qv"))
             / (F.col("_n") * F.col("_qn"))).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


__all__ = [n for n in globals() if not n.startswith("__")]


# HyperLogLog rho = position of the first set bit (from the MSB) in
# the 32-bit window below the bucket bits; 33 when the window is all
# zeros. Spelled as one integer CASE chain so BOTH engines compute it
# with exact comparisons — no log2/doubles near power-of-2 boundaries.
_HLL_RHO_CASE = (
    "CASE "
    + " ".join(
        f"WHEN w32 >= {1 << (31 - i)} THEN {i + 1}" for i in range(32)
    )
    + " ELSE 33 END"
)

# alpha_256 * m^2 * 2^33 / S, every literal cast to DOUBLE and the
# op tree left-associated identically in Spark and DuckDB so the one
# floating chain is bit-identical (all inputs exact integers).
_HLL_EST_SQL = (
    "CAST(0.7213 AS DOUBLE)"
    " / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)"
    " / CAST(256.0 AS DOUBLE))"
    " * CAST(65536.0 AS DOUBLE) * CAST(8589934592.0 AS DOUBLE)"
    " / CAST(s_scaled AS DOUBLE)"
)


@register(
    "hll_register_distinct",
    f"""
    WITH h AS (
        SELECT o_orderpriority AS prio, o_orderkey % 2 AS parity,
               CAST(('0x' || substring(md5('h:' ||
                        CAST(o_custkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM orders
    ), wb AS (
        SELECT prio, parity, hv % 256 AS bucket,
               (hv // 256) % 4294967296 AS w32
        FROM h
    ), rh AS (
        SELECT prio, parity, bucket, {_HLL_RHO_CASE} AS rho FROM wb
    ), regs_half AS (
        SELECT prio, parity, bucket, MAX(rho) AS r
        FROM rh GROUP BY prio, parity, bucket
    ), regs_merged AS (
        SELECT prio, bucket, MAX(r) AS r
        FROM regs_half GROUP BY prio, bucket
    ), regs AS (
        SELECT prio, bucket, MAX(rho) AS r FROM rh GROUP BY prio, bucket
    ), mergechk AS (
        SELECT COALESCE(w.prio, m.prio) AS prio,
               BOOL_AND(w.r IS NOT DISTINCT FROM m.r)
                 AS merge_consistent
        FROM regs w FULL JOIN regs_merged m
          ON w.prio = m.prio AND w.bucket = m.bucket
        GROUP BY COALESCE(w.prio, m.prio)
    ), summ AS (
        SELECT prio, COUNT(*) AS buckets_hit,
               SUM(1::BIGINT << (33 - r)) AS s_hit
        FROM regs GROUP BY prio
    ), est AS (
        SELECT prio, buckets_hit,
               s_hit + (256 - buckets_hit) * 8589934592 AS s_scaled
        FROM summ
    ), est2 AS (
        SELECT prio, buckets_hit, s_scaled,
               {_HLL_EST_SQL} AS raw_estimate
        FROM est
    ), ex AS (
        SELECT o_orderpriority AS prio,
               COUNT(DISTINCT o_custkey) AS exact_distinct
        FROM orders GROUP BY o_orderpriority
    )
    SELECT e.prio AS o_orderpriority,
           CAST(256 AS BIGINT) AS m,
           CAST(e.buckets_hit AS BIGINT) AS buckets_hit,
           CAST(e.s_scaled AS BIGINT) AS s_scaled,
           e.raw_estimate,
           CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
           (e.raw_estimate <= CAST(640.0 AS DOUBLE)
            AND e.buckets_hit < 256) AS lc_regime,
           mc.merge_consistent
    FROM est2 e JOIN ex x ON e.prio = x.prio
    JOIN mergechk mc ON e.prio = mc.prio
    """,
    ops=["sketch-hll-registers", "mergeable-aggregate",
         "distinct-estimate"],
)
def hll_register_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYPERLOGLOG REGISTERS AS RELATIONAL ALGEBRA — the mergeable
    distinct-count sketch built from scratch with exact cross-engine
    parity (`approx_sketches` exercises Spark's built-in HLL++, whose
    binary sketch is engine-private; here the REGISTERS themselves are
    the relation, so parity is bit-exact). Per (priority, custkey):
    a 60-bit md5 hash splits into an 8-bit bucket and a 32-bit rho
    window; rho = first-set-bit position via an integer CASE chain
    (no float log2). Registers = groupBy(prio, bucket).max(rho) — the
    canonical MERGEABLE aggregate: max() is associative/commutative,
    so 256 tiny rows per group flow through map-side partial
    aggregation no matter how many billions of rows feed them; that is
    the whole 100 TB story (profile distinct cardinalities with one
    scan + a 1.3 KB state per group). Mergeability is PROVEN in-query:
    registers built separately over even/odd orderkey halves and
    max-merged must equal the whole-corpus registers
    (`merge_consistent`, full-join bool_and). The estimate keeps every
    aggregate in exact integers — sum of 2^(33-rho) scaled by 2^33 —
    and spends exactly one double chain on alpha_m*m^2*2^33/S, spelled
    identically in both engines; `lc_regime` flags groups where the
    linear-counting correction would apply downstream.

    Reference parity: extends the reference's aggregate family
    (etl.py:71-76 yearly means) to sketch aggregates; no reference
    counterpart — LLM-pipeline extension surface."""
    o = _t(spark, sf_dir, "orders")
    h = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.pmod(F.col("o_orderkey"), F.lit(2)).alias("parity"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("h:"),
                               F.col("o_custkey").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long").alias("hv"),
    )
    wb = h.select(
        "prio", "parity",
        F.pmod(F.col("hv"), F.lit(256)).alias("bucket"),
        F.expr("pmod(hv div 256, 4294967296)").alias("w32"),
    )
    rh = wb.select(
        "prio", "parity", "bucket", F.expr(_HLL_RHO_CASE).alias("rho")
    )
    regs_half = rh.groupBy("prio", "parity", "bucket").agg(
        F.max("rho").alias("r")
    )
    # The merged registers feed BOTH the merge check and the estimate:
    # localCheckpoint the <=2*256*|groups|-row relation so the second
    # consumer reuses the materialized registers instead of re-deriving
    # the whole orders lineage (audited plan: 2 orders scans — the
    # two verification arms; the checkpoint build itself is the third,
    # paid once at construction).
    regs_merged = regs_half.groupBy("prio", "bucket").agg(
        F.max("r").alias("r")
    ).localCheckpoint()
    # Independent whole-corpus aggregation — the merge check compares
    # this direct arm against the merged halves.
    regs = rh.groupBy("prio", "bucket").agg(F.max("rho").alias("r"))
    mergechk = (
        regs.alias("w")
        .join(
            regs_merged.alias("m"),
            (F.col("w.prio") == F.col("m.prio"))
            & (F.col("w.bucket") == F.col("m.bucket")),
            "full",
        )
        .select(
            F.coalesce(F.col("w.prio"), F.col("m.prio")).alias("prio"),
            F.col("w.r").eqNullSafe(F.col("m.r")).alias("eq"),
        )
        .groupBy("prio")
        .agg(F.expr("bool_and(eq)").alias("merge_consistent"))
    )
    est = regs_merged.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("buckets_hit"),
        F.expr(
            "sum(shiftleft(cast(1 as bigint), 33 - r))"
        ).alias("s_hit"),
    ).select(
        "prio", "buckets_hit",
        (F.col("s_hit")
         + (F.lit(256).cast("long") - F.col("buckets_hit"))
         * F.lit(8589934592).cast("long")).alias("s_scaled"),
    ).withColumn("raw_estimate", F.expr(_HLL_EST_SQL))
    exact = o.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    return (
        est.join(F.broadcast(exact), "prio")
        .join(F.broadcast(mergechk), "prio")
        .select(
            F.col("prio").alias("o_orderpriority"),
            F.lit(256).cast("long").alias("m"),
            "buckets_hit", "s_scaled", "raw_estimate",
            "exact_distinct",
            ((F.col("raw_estimate") <= F.lit(640.0))
             & (F.col("buckets_hit") < 256)).alias("lc_regime"),
            "merge_consistent",
        )
    )


@register(
    "kmv_theta_intersection",
    """
    WITH h AS (
        SELECT DISTINCT o_orderpriority AS prio,
               CAST(('0x' || substring(md5('h:' ||
                        CAST(o_custkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM orders
    ), rk AS (
        SELECT prio, hv,
               ROW_NUMBER() OVER (PARTITION BY prio ORDER BY hv) AS rn
        FROM h
    ), sk AS (
        SELECT prio, hv, rn FROM rk WHERE rn <= 64
    ), th AS (
        SELECT prio,
               COALESCE(MAX(CASE WHEN rn = 64 THEN hv END),
                        1152921504606846976) AS theta
        FROM sk GROUP BY prio
    ), pairs AS (
        SELECT a.prio AS p1, b.prio AS p2,
               LEAST(ta.theta, tb.theta) AS theta,
               COUNT(*) FILTER (
                   WHERE a.hv = b.hv
                     AND a.hv < LEAST(ta.theta, tb.theta)
               ) AS kmv_matches
        FROM sk a JOIN sk b ON a.hv = b.hv AND a.prio < b.prio
        JOIN th ta ON ta.prio = a.prio
        JOIN th tb ON tb.prio = b.prio
        GROUP BY a.prio, b.prio, LEAST(ta.theta, tb.theta)
    ), allpairs AS (
        SELECT ta.prio AS p1, tb.prio AS p2,
               LEAST(ta.theta, tb.theta) AS theta,
               COALESCE(p.kmv_matches, 0) AS kmv_matches
        FROM th ta JOIN th tb ON ta.prio < tb.prio
        LEFT JOIN pairs p ON p.p1 = ta.prio AND p.p2 = tb.prio
    ), ex AS (
        SELECT a.prio AS p1, b.prio AS p2,
               COUNT(*) AS exact_common
        FROM (SELECT DISTINCT o_orderpriority AS prio, o_custkey AS c
              FROM orders) a
        JOIN (SELECT DISTINCT o_orderpriority AS prio, o_custkey AS c
              FROM orders) b
          ON a.c = b.c AND a.prio < b.prio
        GROUP BY a.prio, b.prio
    )
    SELECT ap.p1, ap.p2, CAST(64 AS BIGINT) AS k,
           CAST(ap.theta AS BIGINT) AS theta,
           CAST(ap.kmv_matches AS BIGINT) AS kmv_matches,
           CAST(ap.kmv_matches AS DOUBLE)
             * CAST(1152921504606846976 AS DOUBLE)
             / CAST(ap.theta AS DOUBLE) AS theta_estimate,
           CAST(COALESCE(ex.exact_common, 0) AS BIGINT) AS exact_common
    FROM allpairs ap LEFT JOIN ex ON ex.p1 = ap.p1 AND ex.p2 = ap.p2
    """,
    ops=["sketch-kmv-theta", "set-intersection-estimate",
         "mergeable-aggregate"],
)
def kmv_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THETA/KMV SKETCH SET INTERSECTION — distinct-set algebra at
    sketch size: per order priority, keep the k=64 SMALLEST 60-bit
    md5 hashes of its customer set (a KMV sketch; bottom-k is order-
    insensitive and mergeable — merging two sketches is min-k of the
    union, which is how a 1000-executor cluster builds it with
    map-side partial TakeOrdered state, never the full distinct set).
    For every priority pair the theta-sketch rule estimates the
    intersection: theta = min(theta_a, theta_b); matches = shared
    hashes below theta; |A∩B| ~= matches * 2^60 / theta — the ONE
    double chain, fed by exact integers and spelled identically in
    the DuckDB oracle. At 100 TB the exact pairwise-intersection join
    this query carries for ground truth is the thing you CANNOT run —
    the sketch path touches each input row once and intersects
    64-row relations. Partition shape: the rank window partitions by
    priority (5 bounded partitions); sketch-sketch joins are
    broadcast-size by construction. Guard: a priority with fewer than
    k distinct hashes keeps its whole set and theta = 2^60 (exact
    regime).

    Reference parity: no counterpart (reference dedupes row batches,
    etl.py:64-67); LLM-pipeline extension surface."""
    o = _t(spark, sf_dir, "orders")
    h = (
        o.select(
            F.col("o_orderpriority").alias("prio"),
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("h:"),
                                   F.col("o_custkey").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long").alias("hv"),
        )
        .groupBy("prio", "hv")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    w = Window.partitionBy("prio").orderBy("hv")
    # The sketch relation is <= k*|groups| rows BY CONSTRUCTION (320
    # here) and every downstream relation (thetas, pair matches, the
    # theta grid) derives from it: localCheckpoint once so the four
    # consumers read the materialized sketch instead of re-deriving
    # the orders lineage each (audited plan: 8 -> 2 orders scans, the
    # exact ground-truth arm's self-join; the checkpoint build scan is
    # paid once at construction).
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 64)
        .localCheckpoint()
    )
    full = F.lit(1152921504606846976).cast("long")
    th = sk.groupBy("prio").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == 64, F.col("hv"))), full
        ).alias("theta")
    )
    ta = th.select(F.col("prio").alias("p1"),
                   F.col("theta").alias("_tha"))
    tb = th.select(F.col("prio").alias("p2"),
                   F.col("theta").alias("_thb"))
    matches = (
        sk.select(F.col("prio").alias("p1"), "hv")
        .join(sk.select(F.col("prio").alias("p2"), F.col("hv")), "hv")
        .filter(F.col("p1") < F.col("p2"))
        .join(F.broadcast(ta), "p1")
        .join(F.broadcast(tb), "p2")
        .withColumn("_th", F.least("_tha", "_thb"))
        .groupBy("p1", "p2", F.col("_th").alias("theta"))
        .agg(
            F.sum(
                F.when(F.col("hv") < F.col("_th"), 1).otherwise(0)
            ).cast("long").alias("kmv_matches")
        )
    )
    # group-grid crossJoin: |priorities|^2 = 25 rows, both sides are
    # per-group 1-row theta aggregates (plan-audit SCALAR_OK entry)
    allpairs = (
        ta.crossJoin(tb)
        .filter(F.col("p1") < F.col("p2"))
        .withColumn("theta", F.least("_tha", "_thb"))
        .select("p1", "p2", "theta")
        .join(matches, ["p1", "p2", "theta"], "left")
        .withColumn(
            "kmv_matches",
            F.coalesce(F.col("kmv_matches"), F.lit(0).cast("long")),
        )
    )
    dcust = (
        o.select(F.col("o_orderpriority").alias("prio"),
                 F.col("o_custkey").alias("c"))
        .distinct()
    )
    exact = (
        dcust.select(F.col("prio").alias("p1"), "c")
        .join(dcust.select(F.col("prio").alias("p2"), "c"), "c")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_common"))
    )
    return allpairs.join(exact, ["p1", "p2"], "left").select(
        "p1", "p2",
        F.lit(64).cast("long").alias("k"),
        "theta", "kmv_matches",
        (F.col("kmv_matches").cast("double")
         * F.lit(1152921504606846976).cast("double")
         / F.col("theta").cast("double")).alias("theta_estimate"),
        F.coalesce(F.col("exact_common"),
                   F.lit(0).cast("long")).alias("exact_common"),
    )
