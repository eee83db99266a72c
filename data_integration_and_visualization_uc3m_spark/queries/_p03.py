"""Query registry — part 3/8 of the mechanical queries.py split.

Contiguous slice of the original module; see queries/_core.py for
the chaining scheme. Do not reorder across parts — registration
order is the driver-window rotation order.
"""

from __future__ import annotations

from ._p02 import *  # noqa: F401,F403



@register(
    "ivf_recall_report",
    """
    WITH q AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
    ), brute AS (
        SELECT vec_id FROM (
            SELECT vec_id,
                   list_sum(list_transform(list_zip(embedding, qv),
                                           s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(list_zip(embedding, embedding),
                                                   s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(list_zip(qv, qv),
                                                     s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))))
                     AS cosine
            FROM embeddings, q
            ORDER BY cosine DESC, vec_id
            LIMIT 15)
    ), dims AS (
        SELECT CAST(unnest(range(64)) AS INTEGER) AS dim
    ), comp AS (
        SELECT label, d.dim,
               SUM(CAST(FLOOR(CAST(embedding[d.dim + 1] AS DOUBLE) * 1000000000)
                        AS BIGINT)) AS sum_nano,
               COUNT(*) AS cnt
        FROM embeddings, dims d
        GROUP BY label, d.dim
    ), diffs AS (
        SELECT c.label,
               CAST(q.qv[c.dim + 1] AS DOUBLE)
                 - CAST(c.sum_nano AS DOUBLE) / c.cnt / 1000000000 AS diff
        FROM comp c, q
    ), cdist AS (
        SELECT label,
               SUM(CAST(FLOOR(diff * diff * 1000000000) AS BIGINT)) AS dist_nano
        FROM diffs GROUP BY label
    ), probe AS (
        SELECT label FROM cdist ORDER BY dist_nano, label LIMIT 3
    ), ivf AS (
        SELECT vec_id FROM (
            SELECT e.vec_id,
                   list_sum(list_transform(list_zip(e.embedding, q.qv),
                                           s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(list_zip(e.embedding, e.embedding),
                                                   s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(list_zip(q.qv, q.qv),
                                                     s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))))
                     AS cosine
            FROM embeddings e JOIN probe USING (label), q
            WHERE list_sum(list_transform(e.embedding,
                                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
            ORDER BY cosine DESC, e.vec_id
            LIMIT 15)
    )
    SELECT CAST((SELECT COUNT(*) FROM brute b JOIN ivf i ON b.vec_id = i.vec_id) AS BIGINT)
               AS n_overlap,
           CAST((SELECT COUNT(*) FROM ivf) AS BIGINT) AS k_ivf,
           CAST((SELECT COUNT(*) FROM brute b JOIN ivf i ON b.vec_id = i.vec_id) AS BIGINT)
               / 15.0 AS recall_at_15
    """,
    ops=["similarity-ivf", "ann-recall"],
)
def ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality quantified UNDER the oracle gate: brute-force cosine
    top-15 vs the nprobe=3 IVF top-15, reporting overlap and recall@15.
    Rare for ANN — the whole measurement is deterministic (fixed-point
    centroids, ordered tiebreaks), so the recall number itself is
    hash-checked, not just eyeballed. Query vector = 1-row broadcast
    relation on both arms (similarity.*_rel) — no driver fetch.

    Sampling policy at production scale: the brute-truth arm is a
    full-corpus scan PER QUERY VECTOR, so at 100 TB recall is
    estimated over a hash-sampled query set (and, when even one scan
    per probe is too much, a hash-sampled corpus stratum via
    ``sampling.hash_sample`` — recall over a stratum is an unbiased
    estimator). The IVF arm stays production-shaped; only the truth
    arm is sampled. Full corpus is the oracle-checked test-SF
    configuration."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    brute = similarity.cosine_topk_rel(e, q, k=15).select("vec_id")
    ivf = similarity.ivf_topk_rel(e, q, k=15, nprobe=3).select("vec_id")
    overlap = brute.join(ivf, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    kivf = ivf.agg(F.count(F.lit(1)).cast("long").alias("k_ivf"))
    return overlap.crossJoin(kivf).select(
        "n_overlap",
        "k_ivf",
        (F.col("n_overlap") / F.lit(15.0)).alias("recall_at_15"),
    )


_IVF_COS = (
    "list_sum(list_transform(list_zip(e.embedding, q.qv),"
    " s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(list_zip(e.embedding, e.embedding),"
    " s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(list_zip(q.qv, q.qv),"
    " s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))))"
)


def _ivf_arm_cte(n: int) -> str:
    """One IVF arm at nprobe=n over the shared q/cdist CTEs (same
    construction as ivf_recall_report's fixed arm)."""
    return f"""probe{n} AS (
        SELECT label FROM cdist ORDER BY dist_nano, label LIMIT {n}
    ), ivf{n} AS (
        SELECT vec_id FROM (
            SELECT e.vec_id, {_IVF_COS} AS cosine
            FROM embeddings e JOIN probe{n} USING (label), q
            WHERE list_sum(list_transform(e.embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
            ORDER BY cosine DESC, e.vec_id
            LIMIT 15)
    )"""


_IVF_SWEEP_ARMS = ", ".join(_ivf_arm_cte(n) for n in (1, 2, 3, 4))
_IVF_SWEEP_SELECTS = "\n    UNION ALL\n".join(
    f"""    SELECT CAST({n} AS BIGINT) AS nprobe,
           CAST((SELECT COUNT(*) FROM ivf{n}) AS BIGINT) AS k_ivf,
           CAST((SELECT COUNT(*) FROM brute b JOIN ivf{n} i
                 ON b.vec_id = i.vec_id) AS BIGINT) AS n_overlap,
           CAST((SELECT COUNT(*) FROM brute b JOIN ivf{n} i
                 ON b.vec_id = i.vec_id) AS BIGINT) / 15.0
               AS recall_at_15"""
    for n in (1, 2, 3, 4)
)


@register(
    "ivf_nprobe_recall_sweep",
    f"""
    WITH q AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
    ), brute AS (
        SELECT vec_id FROM (
            SELECT e.vec_id, {_IVF_COS} AS cosine
            FROM embeddings e, q
            ORDER BY cosine DESC, e.vec_id
            LIMIT 15)
    ), dims AS (
        SELECT CAST(unnest(range(64)) AS INTEGER) AS dim
    ), comp AS (
        SELECT label, d.dim,
               SUM(CAST(FLOOR(CAST(embedding[d.dim + 1] AS DOUBLE)
                        * 1000000000) AS BIGINT)) AS sum_nano,
               COUNT(*) AS cnt
        FROM embeddings, dims d
        GROUP BY label, d.dim
    ), diffs AS (
        SELECT c.label,
               CAST(q.qv[c.dim + 1] AS DOUBLE)
                 - CAST(c.sum_nano AS DOUBLE) / c.cnt / 1000000000 AS diff
        FROM comp c, q
    ), cdist AS (
        SELECT label,
               SUM(CAST(FLOOR(diff * diff * 1000000000) AS BIGINT))
                   AS dist_nano
        FROM diffs GROUP BY label
    ), {_IVF_SWEEP_ARMS}
{_IVF_SWEEP_SELECTS}
    """,
    ops=["similarity-ivf", "ann-recall", "ann-sweep"],
)
def ivf_nprobe_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF operating curve: recall@15 vs brute-force truth at
    nprobe ∈ {1,2,3,4} in one relation — the quality/latency knob a
    100 TB deployment actually tunes (each probed cell is a partition
    scan; recall climbs with probes). Like ivf_recall_report, the
    entire measurement is deterministic (fixed-point centroids,
    ordered tiebreaks), so the CURVE itself is hash-checked. All four
    IVF arms come from ONE pass (similarity.ivf_sweep_topk_rel): one
    centroid aggregation, one candidate scan, per-arm top-k via a
    probe-budget-bounded window — the r9 bench regression fix (the
    previous union of 4 ivf_topk_rel arms re-aggregated centroids and
    re-scanned the corpus per arm)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    brute = similarity.cosine_topk_rel(e, q, k=15).select("vec_id")
    arms = similarity.ivf_sweep_topk_rel(e, q, k=15, max_nprobe=4).select(
        F.col("nprobe").cast("long").alias("nprobe"), "vec_id"
    )
    k_ivf = arms.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("long").alias("k_ivf")
    )
    n_over = (
        arms.join(brute, "vec_id")
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    grid = spark.range(1, 5).select(F.col("id").alias("nprobe"))
    return (
        grid.join(k_ivf, "nprobe", "left")
        .join(n_over, "nprobe", "left")
        .select(
            "nprobe",
            F.coalesce(F.col("k_ivf"), F.lit(0).cast("long")).alias(
                "k_ivf"
            ),
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias(
                "n_overlap"
            ),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
                / F.lit(15.0)
            ).alias("recall_at_15"),
        )
    )


@register(
    "partitioned_warehouse_prune",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE year(o_orderdate) = 1997
    GROUP BY o_orderpriority
    """,
    ops=["K6", "partition-pruning"],
)
def partitioned_warehouse_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse round-trip with partition pruning UNDER the oracle
    gate: orders snapshotted partitioned by order year (K6 with
    partition_by — the at-rest layout for a 100 TB fact table), read
    back with a partition-key predicate so the scan lists exactly one
    year directory (PartitionFilters in the plan, zero row-group reads
    elsewhere), then aggregated. The oracle is the plain SQL over raw
    orders — layout must not change results."""

    from ..sinks.writers import write_parquet_snapshot

    o = _t(spark, sf_dir, "orders")
    work = scratch_dir("warehouse", sf_dir, clean=True)
    path = f"{work}/orders_by_year"
    write_parquet_snapshot(
        o.withColumn("order_year", F.year("o_orderdate")),
        path,
        partition_by=["order_year"],
    )
    back = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec2("o_totalprice")).cast("double").alias("revenue"),
    )


@register(
    "order_gaps_lead_lag",
    """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS order_seq,
           date_diff('day',
                     lag(o_orderdate) OVER w,
                     o_orderdate) AS gap_days,
           date_diff('day',
                     first_value(o_orderdate) OVER w,
                     o_orderdate) AS days_since_first,
           cume_dist() OVER w AS order_cume
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    ops=["§2.8", "window-lag-lead"],
)
def order_gaps_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth over per-customer order sequences:
    row_number, lag-based inter-order gap, distance from first order,
    and cume_dist — the §2.8 surface beyond rank/top-k. The window
    order carries the unique o_orderkey tiebreaker (convention #4) so
    every offset function is deterministic."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "gap_days"
        ),
        F.datediff(
            F.col("o_orderdate"), F.first("o_orderdate").over(w)
        ).alias("days_since_first"),
        F.cume_dist().over(w).alias("order_cume"),
    )


@register(
    "int8_recall_report",
    """
    WITH fq AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
    ), brute AS (
        SELECT vec_id FROM (
            SELECT vec_id,
                   list_sum(list_transform(list_zip(embedding, qv),
                                           s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(list_zip(embedding, embedding),
                                                   s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(list_zip(qv, qv),
                                                     s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))))
                     AS cosine
            FROM embeddings, fq
            WHERE vec_id <> 0
            ORDER BY cosine DESC, vec_id
            LIMIT 10)
    ), vd AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), staged AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) AS scale
        FROM vd
    ), quant AS (
        SELECT vec_id,
               CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
                    ELSE list_transform(v, x -> CAST(floor(x / scale * 127) AS INTEGER))
               END AS codes
        FROM staged
    ), q AS (
        SELECT codes AS qc FROM quant WHERE vec_id = 0
    ), scored AS (
        SELECT vec_id,
               list_dot_product(codes, qc) AS dot,
               list_dot_product(codes, codes) AS na2,
               list_dot_product(qc, qc) AS nb2
        FROM quant CROSS JOIN q
        WHERE vec_id <> 0
    ), int8 AS (
        SELECT vec_id FROM (
            SELECT vec_id, dot / (sqrt(na2) * sqrt(nb2)) AS cos_int8
            FROM scored
            WHERE na2 > 0
            ORDER BY cos_int8 DESC, vec_id
            LIMIT 10)
    )
    SELECT CAST((SELECT COUNT(*) FROM brute b JOIN int8 i ON b.vec_id = i.vec_id) AS BIGINT)
               AS n_overlap,
           CAST((SELECT COUNT(*) FROM brute b JOIN int8 i ON b.vec_id = i.vec_id) AS BIGINT)
               / 10.0 AS recall_at_10
    """,
    ops=["ann-int8", "ann-recall"],
)
def int8_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization quality quantified under the oracle gate: top-10 by
    exact float cosine vs top-10 on the int8 codes (both excluding the
    query vector itself), reporting overlap and recall@10 — the number
    that justifies (or vetoes) shipping the 4× smaller index. The
    exact arm's query vector is a 1-row broadcast relation
    (similarity.cosine_topk_rel) — no driver fetch.

    Sampling policy at production scale: as with ivf_recall_report,
    the exact-truth arm runs over a hash-sampled query set / corpus
    stratum (``sampling.hash_sample``) at 100 TB; the int8 arm stays
    production-shaped. Full corpus is the oracle-checked test-SF
    configuration."""
    e = _t(spark, sf_dir, "embeddings")
    brute = similarity.cosine_topk_rel(
        e.filter(F.col("vec_id") != 0), e.filter(F.col("vec_id") == 0), k=10
    ).select("vec_id")
    int8 = ann_int8_topk(spark, sf_dir).select("vec_id")
    return brute.join(int8, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap"),
        (F.count(F.lit(1)).cast("long") / F.lit(10.0)).alias("recall_at_10"),
    )


@register(
    "unpivot_event_matrix",
    """
    WITH wide AS (
        SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
               CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
               CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
               CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        FROM events
        GROUP BY user_bucket
    )
    SELECT user_bucket, 'click' AS event_type, click AS n_events FROM wide
    UNION ALL SELECT user_bucket, 'error', error FROM wide
    UNION ALL SELECT user_bucket, 'purchase', purchase FROM wide
    UNION ALL SELECT user_bucket, 'signup', signup FROM wide
    UNION ALL SELECT user_bucket, 'view', view FROM wide
    """,
    ops=["unpivot", "P1"],
)
def unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long, melt): the inverse of pivot_event_matrix,
    via the native ``unpivot`` API (a zero-shuffle projection — each
    wide row expands in place, no exchange). Round-trips the pivoted
    matrix back to tidy long form, null-free by construction."""
    wide = pivot_event_matrix(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    return wide.unpivot(
        ids=["user_bucket"],
        values=types,
        variableColumnName="event_type",
        valueColumnName="n_events",
    )


@register(
    "containment_pairs",
    f"""
    WITH {_SHINGLES_CTE}, sizes AS (
        SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, n_common, sa.set_size AS size_a, sb.set_size AS size_b,
           CAST(n_common AS DOUBLE) / least(sa.set_size, sb.set_size) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / least(sa.set_size, sb.set_size) >= 0.8
    """,
    ops=["dedup-containment"],
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (|A∩B| / min set size ≥ 0.8) over
    word-3-gram shingles: catches quote inclusion and page-within-crawl
    duplication that symmetric Jaccard under-scores when the two
    documents differ a lot in length."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    sets = dedup.ngram_set(d, n=3)
    return dedup.containment_pairs(sets, item_col="shingle", threshold=0.8)


@register(
    "dup_rate_by_source",
    """
    WITH g AS (
        SELECT md5(text) AS h, source, COUNT(*) AS n
        FROM documents GROUP BY h, source
    ), per AS (
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_exact_dups
        FROM g GROUP BY source
    )
    SELECT source, n_docs, n_exact_dups,
           n_exact_dups / n_docs AS dup_rate
    FROM per
    """,
    ops=["dedup-analytics", "A3"],
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation analytics: per-source exact-duplicate rate (md5 content
    groups within a source; n−1 of each group are dups). The report a
    pipeline uses to decide which crawl sources need dedup attention."""
    d = _t(spark, sf_dir, "documents")
    g = d.groupBy(F.md5("text").alias("h"), "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    per = g.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_exact_dups"),
    )
    return per.select(
        "source",
        "n_docs",
        "n_exact_dups",
        (F.col("n_exact_dups") / F.col("n_docs")).alias("dup_rate"),
    )


@register(
    "dedup_survivors_by_quality",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE.strip()}, sigs AS (
        SELECT doc_id,
               {_MH_MINS}
        FROM sh GROUP BY doc_id
    ), bands AS (
        {_MH_BANDS}
    ), cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), ssizes AS (
        SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
    ), verified AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        FROM cands c
        JOIN sh ta ON ta.doc_id = c.id_a
        JOIN sh tb ON tb.doc_id = c.id_b AND tb.shingle = ta.shingle
        GROUP BY c.id_a, c.id_b
    ), pairs AS (
        SELECT v.id_a, v.id_b FROM verified v
        JOIN ssizes sa ON sa.doc_id = v.id_a
        JOIN ssizes sb ON sb.doc_id = v.id_b
        WHERE CAST(v.n_common AS DOUBLE) / (sa.set_size + sb.set_size - v.n_common) >= 0.5
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach(u, label) AS (
        SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
    ), clusters AS (
        SELECT u AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY u
    ), quality AS (
        SELECT doc_id,
               0.4 * (CASE WHEN len(toks) >= 20 AND len(toks) <= 1000 THEN 1.0 ELSE 0.0 END)
                 + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
                 + 0.3 * (CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','a','that'))) AS DOUBLE)
                          / len(toks)) AS quality_score
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
    ), csize AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM clusters GROUP BY cluster_id
    ), ranked AS (
        SELECT c.doc_id, c.cluster_id,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY q.quality_score DESC, c.doc_id) AS rn
        FROM clusters c JOIN quality q USING (doc_id)
    )
    SELECT r.doc_id, CAST(r.cluster_id AS BIGINT) AS cluster_id, s.cluster_size
    FROM ranked r JOIN csize s USING (cluster_id) WHERE r.rn = 1
    UNION ALL
    SELECT d.doc_id, CAST(d.doc_id AS BIGINT) AS cluster_id,
           CAST(1 AS BIGINT) AS cluster_size
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM clusters c WHERE c.doc_id = d.doc_id)
    """,
    ops=["dedup-survivors", "dedup-clusters", "text-quality"],
)
def dedup_survivors_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's LAST step done right: inside each
    near-dup cluster keep the HIGHEST-quality document (not the
    arbitrary min-id), singletons pass through with cluster_size 1.
    Composes the full chain — shingles → MinHash-LSH candidates →
    exact verify → connected components → quality-ranked survivor
    selection — under one oracle hash."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    clusters = dedup_clusters(spark, sf_dir)
    q = text.quality_score(d).select("doc_id", "quality_score")
    csize = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    keep = (
        clusters.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(csize, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size")
    )
    singles = (
        d.select("doc_id")
        .join(clusters.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col("doc_id").alias("cluster_id"),
            F.lit(1).cast("long").alias("cluster_size"),
        )
    )
    return keep.unionByName(singles)


@register(
    "lang_confusion_matrix",
    f"""
    WITH p AS ({REGISTRY["lang_id_predict"].oracle})
    SELECT actual_lang, predicted_lang, COUNT(*) AS n_docs
    FROM p
    GROUP BY actual_lang, predicted_lang
    """,
    ops=["text-langid", "A3"],
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation INSIDE the engine: actual × predicted
    language counts over the heuristic language-ID — the confusion
    matrix a curation pipeline reviews before trusting lang filters.
    Oracle composes the lang_id oracle as a CTE (DRY: one definition
    of the argmax tiebreak in each engine)."""
    p = lang_id_predict(spark, sf_dir).select("actual_lang", "predicted_lang")
    return p.groupBy("actual_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "dedup_cluster_size_histogram",
    f"""
    WITH c AS ({REGISTRY["dedup_clusters"].oracle})
    SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM c GROUP BY cluster_id
    )
    GROUP BY cluster_size
    """,
    ops=["dedup-clusters", "A3"],
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact report: distribution of near-dup cluster sizes
    (how much of the corpus collapses, and into how large groups) —
    the one-glance number for a dedup run review."""
    clusters = dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


@register(
    "upsert_time_travel",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderkey % 3 = 0
    GROUP BY o_orderstatus
    """,
    ops=["K2", "K3", "time-travel"],
)
def upsert_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation / time travel on the versioned upsert table,
    proven by the oracle: commit slice A, then upsert slice B (the live
    table is now A∪B), then read the FIRST snapshot by name and
    aggregate it. Hash-matches the SQL over slice A only if committed
    snapshots are immutable and remain readable after later commits —
    the Delta/Iceberg-style guarantee, no jars."""
    import os

    from ..operators.upsert import write_upsert_parquet

    o = _t(spark, sf_dir, "orders")
    root = scratch_dir("timetravel", sf_dir, clean=True)
    v1 = write_upsert_parquet(
        root, o.filter(F.col("o_orderkey") % 3 == 0), ["o_orderkey"]
    )
    write_upsert_parquet(
        root, o.filter(F.col("o_orderkey") % 3 == 1), ["o_orderkey"]
    )
    old = spark.read.parquet(os.path.join(root, v1))  # time travel to v1
    return old.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec2("o_totalprice")).cast("double").alias("revenue"),
    )


@register(
    "upsert_replace_orders",
    """
    WITH target AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    ), batch AS (
        SELECT o_orderkey, 'R' AS o_orderstatus, o_totalprice + 1.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 6 = 0
    ), merged AS (
        SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice
        FROM target t
        WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM batch
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM merged
    GROUP BY o_orderstatus
    """,
    ops=["K2", "merge-update"],
)
def upsert_replace_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE WHEN MATCHED THEN UPDATE semantics (last-write-wins
    upsert): a correction batch (every 6th order re-statused 'R' with
    +1.0 price) replaces its target rows, non-conflicting target rows
    survive, and the merged table is summarized. The DO-UPDATE twin of
    upsert_conflict_ignore, same anti-join+union shuffle shape."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    target = o.filter(F.col("o_orderkey") % 2 == 0)
    batch = o.filter(F.col("o_orderkey") % 6 == 0).select(
        "o_orderkey",
        F.lit("R").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
    )
    merged = upsert.upsert_replace(target, batch, keys=["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec2("o_totalprice")).cast("double").alias("revenue"),
    )


@register(
    "quality_weighted_sample",
    f"""
    WITH q AS ({REGISTRY["doc_quality_score"].oracle})
    SELECT doc_id, quality_score
    FROM q
    WHERE CAST(('0x'||substring(md5('w0:'||CAST(doc_id AS VARCHAR)),1,8))
               AS BIGINT)
          < CAST(FLOOR(0.5 * quality_score * 4294967296.0) AS BIGINT)
    """,
    ops=["sampling-weighted", "text-quality"],
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic subsampling: acceptance
    probability = 0.5 · quality_score per document — high-quality docs
    preferentially retained at a controlled budget, map-side and
    seed-stable (the standard curation downsampler). Exact integer
    threshold compare ⇒ oracle-identical selection."""
    d = _t(spark, sf_dir, "documents")
    q = text.quality_score(d).select("doc_id", "quality_score")
    return sampling.weighted_hash_sample(
        q, key_col="doc_id", weight_col="quality_score", base_rate=0.5, seed="w0"
    ).select("doc_id", "quality_score")


@register(
    "streaming_stateful_totals_e2e",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS BIGINT)
               AS total_micros
    FROM events
    GROUP BY user_id
    """,
    ops=["streaming-stateful", "streaming-e2e"],
)
def streaming_stateful_totals_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom STATEFUL Python operator under the oracle gate:
    events stream through ``applyInPandasWithState`` (per-user running
    count + fixed-point micro total carried across micro-batches), each
    batch's cumulative rows replace-upsert into a versioned table, and
    the drained table must hash-match plain batch SQL GROUP BY over the
    raw events. Fixed-point state (floor(value·1e6) int64) makes the
    Python accumulation order-independent — the determinism convention
    applied inside the state store."""

    from ..operators.upsert import read_upsert_parquet
    from ..streaming.events import run_stream_stateful_totals

    e = _t(spark, sf_dir, "events")
    work = scratch_dir("stream_state", sf_dir, clean=True)
    src = f"{work}/src"
    e.repartition(4).write.mode("overwrite").parquet(src)
    run_stream_stateful_totals(spark, src, f"{work}/target", f"{work}/ckpt")
    return read_upsert_parquet(spark, f"{work}/target").select(
        "user_id", "n_events", "total_micros"
    )


@register(
    "streaming_attribution_e2e",
    """
    WITH v AS (
        SELECT user_id, ts AS view_ts, event_id AS view_id
        FROM events WHERE event_type = 'view'
    ), p AS (
        SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id,
           COUNT(*) AS n_attributions,
           CAST(SUM(CAST(p.purchase_value AS DECIMAL(18,6))) AS DOUBLE)
               AS attributed_value
    FROM v JOIN p
      ON v.user_id = p.user_id
     AND p.purchase_ts > v.view_ts
     AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
    GROUP BY v.user_id
    """,
    ops=["streaming-join", "streaming-e2e"],
)
def streaming_attribution_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join under the oracle gate: the events
    stream is split into view and purchase streams, inner-joined on
    user within a 30-minute attribution window with BOTH sides
    watermarked (real state-store join, matches found across
    micro-batches), matches appended to parquet, then aggregated.
    Hash-matches the batch SQL interval self-join exactly."""

    from ..streaming.events import run_stream_attribution_to_parquet

    e = _t(spark, sf_dir, "events")
    work = scratch_dir("stream_attr", sf_dir, clean=True)
    src = f"{work}/src"
    e.repartition(4).write.mode("overwrite").parquet(src)
    run_stream_attribution_to_parquet(
        spark, src, f"{work}/out", f"{work}/ckpt"
    )
    matched = spark.read.parquet(f"{work}/out")
    return matched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_attributions"),
        F.sum(F.col("purchase_value").cast(DEC6)).cast("double").alias(
            "attributed_value"
        ),
    )


@register(
    "column_profile_lineitem",
    """
    WITH stacked AS (
        SELECT 'l_returnflag' AS col, CAST(l_returnflag AS VARCHAR) AS val FROM lineitem
        UNION ALL SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_orderkey', CAST(l_orderkey AS VARCHAR) FROM lineitem
    )
    SELECT col,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(val) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           MIN(val) AS min_val,
           MAX(val) AS max_val
    FROM stacked
    GROUP BY col
    """,
    ops=["profiling", "A3"],
)
def column_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile (null count, exact distinct,
    min/max) for a column set, computed in ONE scan: the columns are
    stacked in-row (explode of structs, no extra table passes) and
    profiled with a single aggregation — the engine's equivalent of
    the stats pass a warehouse runs before planning. Columns are
    profiled through their string form, restricted to string/integer
    columns whose rendering is engine-identical (doubles are not —
    shortest-roundtrip formats differ)."""
    cols = [
        "l_returnflag",
        "l_linestatus",
        "l_suppkey",
        "l_linenumber",
        "l_orderkey",
    ]
    # fanout: the profile explodes every row 5x — a single-file scan
    # would serialize that on one core
    l = _t(spark, sf_dir, "lineitem", fanout=True)
    stacked = l.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.col", "s.val")
    return stacked.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).cast("long").alias("n_nulls"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


@register(
    "events_anomaly_mad",
    """
    WITH ranked AS (
        SELECT event_type, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM events
    ), med AS (
        SELECT event_type, value AS med_val
        FROM ranked WHERE rn = CAST(FLOOR((cnt + 1) / 2.0) AS BIGINT)
    ), dev AS (
        SELECT e.event_type, e.event_id, e.value,
               ABS(e.value - m.med_val) AS abs_dev, m.med_val
        FROM events e JOIN med m USING (event_type)
    ), dev_ranked AS (
        SELECT event_type, abs_dev,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY abs_dev, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM dev
    ), mad AS (
        SELECT event_type, abs_dev AS mad_val
        FROM dev_ranked WHERE rn = CAST(FLOOR((cnt + 1) / 2.0) AS BIGINT)
    )
    SELECT d.event_type, d.event_id, d.value, d.med_val, m.mad_val
    FROM dev d JOIN mad m USING (event_type)
    WHERE d.abs_dev > 5.0 * m.mad_val
    """,
    ops=["robust-stats", "W2"],
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: per-type median + median absolute
    deviation (both as lower discrete medians — real data elements,
    engine-identical), flagging values beyond 5 MADs. The robust twin
    of the z-score detector: immune to the outliers polluting their
    own threshold. Two window passes + broadcast of the tiny per-type
    stats — no driver math."""
    e = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    med = (
        e.withColumn("rn", F.row_number().over(wr))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.floor((F.col("cnt") + 1) / 2.0).cast("long"))
        .select("event_type", F.col("value").alias("med_val"))
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "abs_dev", F.abs(F.col("value") - F.col("med_val"))
    )
    wd = Window.partitionBy("event_type").orderBy("abs_dev", "event_id")
    mad = (
        dev.withColumn("rn", F.row_number().over(wd))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.floor((F.col("cnt") + 1) / 2.0).cast("long"))
        .select("event_type", F.col("abs_dev").alias("mad_val"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("abs_dev") > 5.0 * F.col("mad_val"))
        .select("event_type", "event_id", "value", "med_val", "mad_val")
    )


@register(
    "customer_rfm_segments",
    """
    WITH per_cust AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        FROM orders GROUP BY o_custkey
    ), scored AS (
        SELECT o_custkey,
               NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_quartile,
               NTILE(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f_quartile,
               NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_quartile
        FROM per_cust
    )
    SELECT r_quartile, f_quartile, m_quartile,
           COUNT(*) AS n_customers,
           CASE WHEN r_quartile = 1 AND f_quartile = 1 AND m_quartile = 1
                THEN 'champion'
                WHEN r_quartile >= 3 AND f_quartile >= 3 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    GROUP BY r_quartile, f_quartile, m_quartile
    """,
    ops=["rfm", "window-ntile", "A3"],
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary
    quartiles (ntile with unique tiebreakers ⇒ deterministic), rolled
    into a segment census — the standard customer-analytics shape on
    top of the warehouse. The global ntile orders run over the
    per-customer AGGREGATE (|customers| rows), not the fact table —
    declared report-scale here; at billions of customers swap the
    exact ntile for approx-quantile boundary computation (mergeable
    sketch) + map-side bucketing, trading oracle-exactness for a
    partitionable plan."""
    o = _t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec2("o_totalprice")).cast("double").alias("monetary"),
    )
    scored = per.select(
        "o_custkey",
        F.ntile(4)
        .over(Window.orderBy(F.col("last_order").desc(), "o_custkey"))
        .alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("n_orders").desc(), "o_custkey"))
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
        .alias("m_quartile"),
    )
    seg = (
        F.when(
            (F.col("r_quartile") == 1)
            & (F.col("f_quartile") == 1)
            & (F.col("m_quartile") == 1),
            F.lit("champion"),
        )
        .when(
            (F.col("r_quartile") >= 3) & (F.col("f_quartile") >= 3),
            F.lit("at_risk"),
        )
        .otherwise(F.lit("regular"))
    )
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.max(seg).alias("segment"),
    )


@register(
    "hot_key_share_report",
    """
    WITH per AS (
        SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
    ), tot AS (
        SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM per
    ), top AS (
        SELECT user_id, CAST(n_rows AS BIGINT) AS n_rows
        FROM per ORDER BY n_rows DESC, user_id LIMIT 20
    )
    SELECT user_id, n_rows, n_rows / total AS share
    FROM top, tot
    """,
    ops=["skew-diagnosis", "A3"],
)
def hot_key_share_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis as a first-class query: the 20 heaviest join/agg
    keys with their share of total rows — the report that decides
    whether a key needs salting (operators/skew.py) before AQE's
    skew-join can't help (hot-key AGGREGATION). One aggregation +
    TakeOrdered + a 1-row total broadcast."""
    e = _t(spark, sf_dir, "events")
    top = skew.key_histogram(e, ["user_id"], top_n=20).withColumn(
        "n_rows", F.col("n_rows").cast("long")
    )
    tot = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum("n").cast("long").alias("total"))
    )
    return top.crossJoin(F.broadcast(tot)).select(
        "user_id", "n_rows", (F.col("n_rows") / F.col("total")).alias("share")
    )


@register(
    "top_orders_with_ties",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
    ops=["window-rank", "§2.8"],
)
def top_orders_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per priority WITH tie inclusion: rank() (gaps on ties)
    instead of row_number, so equal-priced orders all surface — the
    tie-aware twin of top3_orders_per_priority. Ranking on the DECIMAL
    cast keeps tie groups engine-identical."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        _dec2("o_totalprice").desc()
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "incremental_join_maintenance",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    ops=["ivm-join", "cdc-snapshot-diff"],
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN view maintenance, algebra proven by the
    oracle: orders and lineitem are each split into an old snapshot
    and an insert-only delta; the maintained result = old⋈old appended
    with (ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB). Aggregating the maintained
    rows must hash-match the plain full join — the refresh that costs
    O(|Δ|) instead of re-joining 100 TB."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    old_o = o.filter(F.col("o_orderkey") % 5 != 0)
    delta_o = o.filter(F.col("o_orderkey") % 5 == 0)
    old_l = l.filter(F.col("o_orderkey") % 7 != 0)
    delta_l = l.filter(F.col("o_orderkey") % 7 == 0)
    base = old_o.join(old_l, "o_orderkey")
    delta = cdc.incremental_join_insert_only(
        old_o, delta_o, old_l, delta_l, on=["o_orderkey"]
    )
    maintained = base.unionByName(delta)
    return maintained.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(_dec2("l_extendedprice")).cast("double").alias("revenue"),
    )


@register(
    "orders_seasonality_yoy",
    """
    WITH m AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mon,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY yr, mon
    )
    SELECT yr, mon, n_orders, revenue,
           lag(revenue) OVER (PARTITION BY mon ORDER BY yr) AS revenue_prev_year,
           CASE WHEN lag(revenue) OVER (PARTITION BY mon ORDER BY yr) IS NOT NULL
                THEN revenue / lag(revenue) OVER (PARTITION BY mon ORDER BY yr) - 1.0
           END AS yoy_growth
    FROM m
    """,
    ops=["time-series", "window-lag-lead", "A3"],
)
def orders_seasonality_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonality with year-over-year growth. The YoY lag is
    PARTITIONED BY calendar month (12 partitions, lag 1 year within
    each) instead of an unpartitioned lag-12 over the month series —
    same numbers, no single-partition window, scales to any history
    length."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mon")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec2("o_totalprice")).cast("double").alias("revenue"),
    )
    w = Window.partitionBy("mon").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return m.select(
        "yr",
        "mon",
        "n_orders",
        "revenue",
        prev.alias("revenue_prev_year"),
        F.when(prev.isNotNull(), F.col("revenue") / prev - 1.0).alias(
            "yoy_growth"
        ),
    )


@register(
    "shipping_delay_profile",
    """
    WITH d AS (
        SELECT o.o_orderpriority,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days,
               l.l_orderkey, l.l_linenumber
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), ranked AS (
        SELECT o_orderpriority, delay_days,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY delay_days, l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
        FROM d
    ), med AS (
        SELECT o_orderpriority, delay_days AS median_delay
        FROM ranked WHERE rn = CAST(FLOOR((cnt + 1) / 2.0) AS BIGINT)
    ), agg AS (
        SELECT o_orderpriority,
               COUNT(*) AS n_lines,
               CAST(MIN(delay_days) AS BIGINT) AS min_delay,
               CAST(MAX(delay_days) AS BIGINT) AS max_delay,
               CAST(SUM(delay_days) AS BIGINT) AS total_delay_days
        FROM d GROUP BY o_orderpriority
    )
    SELECT a.o_orderpriority, a.n_lines, a.min_delay, a.max_delay,
           a.total_delay_days,
           CAST(m.median_delay AS BIGINT) AS median_delay
    FROM agg a JOIN med m USING (o_orderpriority)
    """,
    ops=["time-series", "J1", "robust-stats"],
)
def shipping_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency profile per priority: min/max/total plus
    the discrete median delay (a real data element — engine-identical).
    The logistics SLA report: one broadcast-dim join, one agg, one
    partitioned median window."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_orderpriority"
    )
    d = l.join(o, "l_orderkey").select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
        "l_orderkey",
        "l_linenumber",
    )
    wr = Window.partitionBy("o_orderpriority").orderBy(
        "delay_days", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("o_orderpriority")
    med = (
        d.withColumn("rn", F.row_number().over(wr))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.floor((F.col("cnt") + 1) / 2.0).cast("long"))
        .select(
            "o_orderpriority",
            F.col("delay_days").cast("long").alias("median_delay"),
        )
    )
    agg = d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("delay_days").cast("long").alias("min_delay"),
        F.max("delay_days").cast("long").alias("max_delay"),
        F.sum("delay_days").cast("long").alias("total_delay_days"),
    )
    return agg.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "n_lines",
        "min_delay",
        "max_delay",
        "total_delay_days",
        "median_delay",
    )


@register(
    "user_inactivity_gaps",
    """
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
    FROM g
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    ops=["time-series", "window-lag-lead"],
)
def user_inactivity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap profile (count / max / total in exact
    epoch micros): the churn-risk signal behind sessionization — one
    partitioned lag window + one aggregation, integer time arithmetic
    end to end."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = e.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.sum("gap_us").cast("long").alias("total_gap_us"),
    )


# =====================================================================
# Round-5 extensions: time-series regularization, corpus mixing,
# length-bucketed batching, cross-source contamination, schema
# evolution — each a scale-shaped op a 100 TB training pipeline needs.
# =====================================================================


@register(
    "events_resample_ffill",
    """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS v
        FROM events GROUP BY user_id, day
    ), grid AS (
        SELECT user_id,
               mn + CAST(unnest(generate_series(0, date_diff('day', mn, mx)))
                         AS INTEGER) AS day
        FROM (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx
              FROM daily GROUP BY user_id)
    )
    SELECT g.user_id, g.day,
           CAST(LAST_VALUE(d.v IGNORE NULLS) OVER (
                PARTITION BY g.user_id ORDER BY g.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS value_ffill,
           d.day IS NOT NULL AS is_observed
    FROM grid g LEFT JOIN daily d
      ON d.user_id = g.user_id AND d.day = g.day
    """,
    ops=["timeseries-resample", "window-rolling"],
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular events → regular per-user daily grid with forward
    fill (operators.timeseries): per-user span exploded via
    sequence() (bounded fan-out, no range join), one window per user
    carrying the last observed daily total across gap days. The grid
    shape every state-of-the-world join and feature pipeline wants."""
    e = _t(spark, sf_dir, "events")
    return timeseries.resample_ffill_daily(e, "user_id", "ts", "value")


# Target corpus composition for the mixing queries: deliberately
# non-uniform over 4 of the 20 sources so every derived rate differs.
_MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}

_MIX_WEIGHT_CASE = (
    "CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3 "
    "WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1 END"
)

_MIX_PLAN_CTE = f"""
    counts AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST({_MIX_WEIGHT_CASE} AS DOUBLE) AS weight
        FROM documents
        WHERE {_MIX_WEIGHT_CASE} IS NOT NULL
        GROUP BY source
    ), feas AS (
        SELECT MIN(CAST(n_docs AS DOUBLE) / weight) AS feasible FROM counts
    ), plan AS (
        SELECT source, n_docs, weight,
               CAST(FLOOR(weight * feasible) AS BIGINT) AS n_target,
               FLOOR(weight * feasible) / n_docs AS rate
        FROM counts CROSS JOIN feas
    )
"""


@register(
    "corpus_mix_plan",
    f"""
    WITH {_MIX_PLAN_CTE}
    SELECT source, n_docs, weight, n_target, rate FROM plan
    """,
    ops=["sampling-mix", "A3"],
)
def corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing plan (operators.mixing): per-source sampling rates
    hitting a target composition at the maximum feasible corpus size
    (bounded by the scarcest source / its share). Tiny per-source
    aggregate crossed back as a broadcast scalar — the corpus itself
    is never shuffled for planning."""
    d = _t(spark, sf_dir, "documents")
    return mixing.mix_plan(d, _MIX_WEIGHTS)


@register(
    "corpus_mix_apply",
    f"""
    WITH {_MIX_PLAN_CTE}, kept AS (
        SELECT d.source, d.n_chars
        FROM documents d JOIN plan p USING (source)
        WHERE CAST(('0x'||substring(md5('mix0:'||CAST(d.doc_id AS VARCHAR)),1,8))
                   AS BIGINT)
              < CAST(FLOOR(p.rate * 4294967296.0) AS BIGINT)
    )
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM kept GROUP BY source
    """,
    ops=["sampling-mix", "sampling-hash"],
)
def corpus_mix_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized mix: the plan's per-source rate becomes an exact
    integer md5 keep-threshold (operators.sampling), applied as a pure
    map-side filter behind a broadcast plan join — deterministic,
    epoch-stable, zero corpus shuffle at any scale."""
    d = _t(spark, sf_dir, "documents")
    kept = mixing.mix_apply(d, _MIX_WEIGHTS)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "length_bucketed_batching",
    """
    WITH t AS (
        SELECT len(string_split(lower(text), ' ')) AS n FROM documents
    ), b AS (
        SELECT n,
               CASE WHEN n <= 1 THEN 1
                    ELSE (CAST(1 AS BIGINT) << length(bin(n - 1))) END AS bucket
        FROM t
    )
    SELECT bucket, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(bucket - n) AS BIGINT) AS pad_tokens,
           CAST(SUM(bucket - n) AS DOUBLE)
             / CAST(COUNT(*) * bucket AS DOUBLE) AS waste_frac
    FROM b GROUP BY bucket
    """,
    ops=["packing-buckets", "text-tokens"],
)
def length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report (operators.packing): docs
    grouped into smallest-power-of-two token buckets, with exact
    pad-to-bucket waste per bucket — the decision input for batching
    plans that bound padding waste to 2x instead of pad-to-global-max.
    Bucket exponent via integer bit length (length(bin(n-1))), no
    float log2 boundary semantics."""
    d = _t(spark, sf_dir, "documents")
    toks = text.token_stats(d).select("doc_id", "n_tokens")
    return packing.length_bucket_stats(toks, "n_tokens")


@register(
    "cross_source_ngram_overlap",
    f"""
    WITH {_SHINGLES_CTE}, ssh AS (
        SELECT DISTINCT d.source, s.shingle
        FROM sh s JOIN documents d USING (doc_id)
    ), sizes AS (
        SELECT source, COUNT(*) AS n FROM ssh GROUP BY source
    ), shared AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_shared
        FROM ssh a JOIN ssh b
          ON a.shingle = b.shingle AND a.source < b.source
        GROUP BY source_a, source_b
    )
    SELECT s.source_a, s.source_b, s.n_shared,
           sa.n AS n_a, sb.n AS n_b,
           CAST(s.n_shared AS DOUBLE)
             / CAST(sa.n + sb.n - s.n_shared AS DOUBLE) AS jaccard
    FROM shared s
    JOIN sizes sa ON sa.source = s.source_a
    JOIN sizes sb ON sb.source = s.source_b
    """,
    ops=["dedup-ngram", "contamination"],
)
def cross_source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination map: 3-gram shingle-set Jaccard for
    every source pair sharing at least one shingle. The shingle
    relation collapses to DISTINCT (source, shingle) first, so the
    self-join's per-shingle fan-out is bounded by the number of
    sources, never by document frequency — the same Σdf² discipline as
    the df-capped document-pair joins (operators.dedup)."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    sh = dedup.ngram_set(d, n=3)
    ssh = (
        d.select("doc_id", "source")
        .join(sh, "doc_id")
        .select("source", "shingle")
        .distinct()
    )
    sizes = ssh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    shared = (
        ssh.alias("a")
        .join(
            ssh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"),
                                     F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"),
                                     F.col("n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a", "source_b", "n_shared", "n_a", "n_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


@register(
    "schema_evolution_union",
    """
    WITH merged AS (
        SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(o_totalprice) AS n_with_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM merged GROUP BY o_orderstatus
    """,
    ops=["S5", "schema-evolution"],
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read path, proven end-to-end: two parquet
    batches written with DIFFERENT schemas (the second adds a column),
    read back as one table via mergeSchema — old-batch rows surface
    NULL for the added column, aggregates treat them as missing. The
    lakehouse column-add migration, no table rewrite."""

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = scratch_dir("schema_evo", sf_dir, clean=True)
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus"
    ).write.mode("overwrite").parquet(f"{root}/batch=1")
    o.filter(F.col("o_orderkey") % 2 == 1).write.mode("overwrite").parquet(
        f"{root}/batch=2"
    )
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_with_price"),
        F.sum(_dec2("o_totalprice")).cast("double").alias("revenue"),
    )


@register(
    "winsorized_event_stats",
    """
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM events
    ), bounds AS (
        SELECT event_type,
               MIN(CASE WHEN rn = GREATEST(CAST(CEIL(0.01 * cnt) AS BIGINT), 1)
                        THEN value END) AS p01,
               MIN(CASE WHEN rn = GREATEST(CAST(CEIL(0.99 * cnt) AS BIGINT), 1)
                        THEN value END) AS p99
        FROM ranked GROUP BY event_type
    )
    SELECT e.event_type, b.p01, b.p99,
           CAST(COUNT(CASE WHEN e.value < b.p01 THEN 1 END) AS BIGINT)
               AS n_clipped_low,
           CAST(COUNT(CASE WHEN e.value > b.p99 THEN 1 END) AS BIGINT)
               AS n_clipped_high,
           CAST(SUM(CAST(FLOOR(LEAST(GREATEST(e.value, b.p01), b.p99)
                                * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_clipped_fp6,
           COUNT(*) AS n_events
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type, b.p01, b.p99
    """,
    ops=["robust-stats", "cleaning-winsorize"],
)
def winsorized_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier capping (winsorization) for training-data cleaning:
    per-type p01/p99 as NEAREST-RANK order statistics (real data
    elements with a unique tiebreaker — engine-identical, no
    interpolation semantics), values clamped into [p01, p99], clipped
    counts and the clamped sum reported. Same discrete-order-statistic
    discipline as events_anomaly_mad; clamped-sum in fixed-point
    BIGINT (convention 7). One window pass + a broadcast of the tiny
    per-type bounds — the fact table never shuffles twice."""
    e = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = e.withColumn("rn", F.row_number().over(wr)).withColumn(
        "cnt", F.count(F.lit(1)).over(wc)
    )
    rank_at = lambda p: F.greatest(  # noqa: E731
        F.ceil(F.lit(p) * F.col("cnt")).cast("long"), F.lit(1)
    )
    bounds = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == rank_at(0.01), F.col("value"))).alias(
            "p01"
        ),
        F.min(F.when(F.col("rn") == rank_at(0.99), F.col("value"))).alias(
            "p99"
        ),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        e.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "p01", "p99")
        .agg(
            F.count(F.when(F.col("value") < F.col("p01"), 1))
            .cast("long")
            .alias("n_clipped_low"),
            F.count(F.when(F.col("value") > F.col("p99"), 1))
            .cast("long")
            .alias("n_clipped_high"),
            F.sum(F.floor(clipped * 1000000).cast("long"))
            .cast("long")
            .alias("sum_clipped_fp6"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def _pagerank_oracle(iterations: int = 10) -> str:
    """Unrolled fixed-point PageRank as pure SQL: one (contrib, rank)
    CTE pair per iteration, all-integer arithmetic (DuckDB ``//`` ≡
    Spark ``div`` on positives), mirroring operators.graph exactly."""
    init = "(1000000000000 // (SELECT COUNT(*) FROM nodes))"
    ctes = [
        f"""
    edges AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY src, dst
    ), outw AS (
        SELECT src, SUM(w) AS ow FROM edges GROUP BY src
    ), ew AS (
        SELECT e.src, e.dst, e.w, o.ow FROM edges e JOIN outw o ON e.src = o.src
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), it0 AS (
        SELECT node, {init} AS r FROM nodes
    )"""
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""
    c{k} AS (
        SELECT e.dst, SUM((p.r * e.w) // e.ow) AS c
        FROM it{k - 1} p JOIN ew e ON e.src = p.node GROUP BY e.dst
    ), it{k} AS (
        SELECT n.node,
               (15 * {init}) // 100 + (85 * COALESCE(c.c, 0)) // 100 AS r
        FROM nodes n LEFT JOIN c{k} c ON c.dst = n.node
    )""")
    return f"""
    WITH {",".join(ctes)}
    SELECT n_name, CAST(r AS BIGINT) AS rank_fp
    FROM it{iterations} JOIN nation ON node = n_nationkey
    """


@register(
    "nation_trade_pagerank",
    _pagerank_oracle(10),
    ops=["graph-pagerank", "iterative"],
)
def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph (supplier nation →
    customer nation, edge weight = lineitem count), 10 iterations of
    EXACT fixed-point integer arithmetic (operators.graph) — ranks are
    bit-identical on any engine and any partitioning because float
    summation order never enters. The iterative-join shape that
    complements connected components: per iteration one hash join +
    one aggregation, shuffle-aligned on the node key, lineage cut by
    checkpoint every 4 rounds with exact storage freeing."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    pr = graph.pagerank_fixed_point(edges, iterations=10)
    return pr.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        pr.node == F.col("n_nationkey"),
    ).select("n_name", "rank_fp")


@register(
    "rolling_median_daily_revenue",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        FROM orders GROUP BY day
    ), expanded AS (
        SELECT d.day + CAST(g.i AS INTEGER) AS anchor, d.day, d.v
        FROM daily d CROSS JOIN generate_series(0, 6) AS g(i)
    ), valid AS (
        SELECT e.anchor, e.day, e.v
        FROM expanded e JOIN daily a ON a.day = e.anchor
    ), ranked AS (
        SELECT anchor, v,
               ROW_NUMBER() OVER (PARTITION BY anchor
                                  ORDER BY v, day) AS rn,
               COUNT(*) OVER (PARTITION BY anchor) AS cnt
        FROM valid
    )
    SELECT anchor AS day, CAST(v AS DOUBLE) AS median_rev_7d, cnt AS n_days
    FROM ranked WHERE rn = CAST(FLOOR((cnt + 1) / 2.0) AS BIGINT)
    """,
    ops=["window-rolling", "robust-stats"],
)
def rolling_median_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day discrete median of daily revenue — a rolling
    NON-algebraic aggregate done scale-right: the window is the same
    bounded explode(sequence(day, day+6)) expansion as
    rolling_distinct_users (equi-join, no BroadcastNestedLoopJoin),
    and the median is a nearest-rank order statistic with a unique
    tiebreaker (engine-identical, no interpolation). Exact DECIMAL
    daily sums; the per-anchor sort touches ≤7 rows."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(_dec2("o_totalprice")).alias("v")
    )
    anchors = daily.select(F.col("day").alias("anchor"))
    expanded = daily.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("anchor"),
        "day",
        "v",
    ).join(anchors, "anchor", "left_semi")
    wr = Window.partitionBy("anchor").orderBy("v", "day")
    wc = Window.partitionBy("anchor")
    return (
        expanded.withColumn("rn", F.row_number().over(wr))
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.floor((F.col("cnt") + 1) / 2.0).cast("long"))
        .select(
            F.col("anchor").alias("day"),
            F.col("v").cast("double").alias("median_rev_7d"),
            F.col("cnt").alias("n_days"),
        )
    )


@register(
    "corpus_build_e2e",
    f"""
    WITH {_MIX_PLAN_CTE}, mixed AS (
        SELECT d.doc_id, d.source, d.text
        FROM documents d JOIN plan p USING (source)
        WHERE CAST(('0x'||substring(md5('mix0:'||CAST(d.doc_id AS VARCHAR)),1,8))
                   AS BIGINT)
              < CAST(FLOOR(p.rate * 4294967296.0) AS BIGINT)
    ), surv AS (
        SELECT MIN(doc_id) AS doc_id FROM mixed GROUP BY md5(text)
    ), kept AS (
        SELECT m.source, len(string_split(lower(m.text), ' ')) AS n_tokens
        FROM mixed m JOIN surv s ON s.doc_id = m.doc_id
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM kept WHERE n_tokens >= 5
    GROUP BY source
    """,
    ops=["sampling-mix", "dedup-exact", "text-tokens", "pipeline"],
)
def corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 operators composed as ONE lazy plan — the minimal
    real corpus build: target-composition mix (exact md5 thresholds)
    → exact dedup (first-wins by content hash) → token-count quality
    floor → per-source budget stats. No intermediate materialization;
    Catalyst sees the whole chain and the corpus shuffles once (for
    the dedup hash-groupBy)."""
    d = _t(spark, sf_dir, "documents")
    mixed = mixing.mix_apply(d, _MIX_WEIGHTS).select(
        "doc_id", "source", "text"
    )
    surv = dedup.exact_dedup(mixed).select(F.col("keep_id").alias("doc_id"))
    kept = mixed.join(surv, "doc_id", "left_semi").select(
        "source", F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tokens")
    )
    return (
        kept.filter(F.col("n_tokens") >= 5)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


@register(
    "bucketed_colocated_revenue",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o_orderpriority
    """,
    ops=["bucketing", "J1", "A3"],
)
def bucketed_colocated_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over BUCKETED warehouse tables — the repeated-join
    100 TB layout: both sides bucketed (and sorted) on the join key at
    write time, so the sort-merge join reads co-located buckets with NO
    shuffle exchange on either side (the property the bucketing unit
    tests assert from the physical plan; here it flows through the
    correctness gate end-to-end). Written as external tables under a
    temp path with run-unique names; the merge hint keeps the tiny test
    scale from broadcasting away the thing being demonstrated."""
    import uuid as _uuid

    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    wh = scratch_dir("bucketed", sf_dir, clean=True)
    sfx = _uuid.uuid4().hex[:8]
    t_l, t_o = f"sg_bkt_lineitem_{sfx}", f"sg_bkt_orders_{sfx}"
    (
        l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", f"{wh}/lineitem").saveAsTable(t_l)
    )
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{wh}/orders").saveAsTable(t_o)
    )
    return (
        spark.table(t_l)
        .hint("merge")
        .join(
            spark.table(t_o),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_dec2("l_extendedprice")).cast("double").alias("revenue"),
        )
    )


@register(
    "scd2_point_in_time_join",
    """
    WITH snap1 AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ), snap2 AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2))
                    + CASE WHEN o_orderkey % 10 = 0 THEN 5 ELSE 0 END
                    AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
    ), v1 AS (
        SELECT *, md5(o_orderstatus || chr(31) || CAST(price AS VARCHAR)) AS row_hash,
               1 AS valid_from, CAST(NULL AS INTEGER) AS valid_to
        FROM snap1
    ), v2 AS (
        SELECT *, md5(o_orderstatus || chr(31) || CAST(price AS VARCHAR)) AS row_hash
        FROM snap2
    ), changed AS (
        SELECT c.o_orderkey FROM v1 c
        LEFT JOIN v2 i ON c.o_orderkey = i.o_orderkey
        WHERE i.row_hash IS NULL OR i.row_hash != c.row_hash
    ), closed AS (
        SELECT o_orderkey, price, valid_from, 2 AS valid_to
        FROM v1 WHERE o_orderkey IN (SELECT o_orderkey FROM changed)
    ), still_open AS (
        SELECT o_orderkey, price, valid_from, valid_to FROM v1
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changed)
    ), new_rows AS (
        SELECT i.o_orderkey, i.price, 2 AS valid_from,
               CAST(NULL AS INTEGER) AS valid_to
        FROM v2 i
        WHERE NOT EXISTS (SELECT 1 FROM v1 c
                          WHERE c.o_orderkey = i.o_orderkey
                            AND c.row_hash = i.row_hash)
    ), hist AS (
        SELECT * FROM closed UNION ALL SELECT * FROM still_open
        UNION ALL SELECT * FROM new_rows
    ), as_of AS (
        SELECT o_orderkey, price,
               unnest(generate_series(valid_from,
                                      COALESCE(valid_to - 1, 2))) AS version
        FROM hist
    ), facts AS (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_linenumber % 2 = 1 THEN 1 ELSE 2 END AS version
        FROM lineitem
    )
    SELECT f.version,
           COUNT(*) AS n_lines,
           CAST(SUM(a.price) AS DOUBLE) AS total_asof_price
    FROM facts f JOIN as_of a
      ON a.o_orderkey = f.l_orderkey AND a.version = f.version
    GROUP BY f.version
    """,
    ops=["scd2", "point-in-time-join", "J1"],
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact joined to an SCD2 dimension AS OF the fact's transaction
    version — the canonical warehouse point-in-time lookup, done as a
    pure EQUI-join: each history row explodes to the (bounded, ≤
    n_versions) versions it covers, so facts hash-join on (key,
    version) instead of probing a BETWEEN range predicate (which Spark
    would execute as a nested loop). Every lineitem (odd line numbers
    stamped version 1, even ones version 2) picks up its order's price
    as of that version; version-2 facts see the perturbed prices.
    History built by the same operators/history.py merge as
    scd2_price_history."""
    from ..operators import history as H

    o = _t(spark, sf_dir, "orders")
    snap1 = o.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_orderkey", "o_orderstatus", _dec2("o_totalprice").alias("price"))
    snap2 = o.filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    ).select(
        "o_orderkey",
        "o_orderstatus",
        (
            _dec2("o_totalprice")
            + F.when(F.col("o_orderkey") % 10 == 0, 5).otherwise(0)
        )
        .cast(DEC2)
        .alias("price"),
    )
    hist = H.apply_changes(
        H.snapshot_to_scd2(snap1, ["o_orderkey"], ["o_orderstatus", "price"], 1),
        snap2,
        ["o_orderkey"],
        ["o_orderstatus", "price"],
        2,
    )
    asof = hist.select(
        "o_orderkey",
        "price",
        F.explode(
            F.sequence(
                F.col("valid_from"),
                F.coalesce(F.col("valid_to") - 1, F.lit(2)),
            )
        ).alias("version"),
    )
    l = _t(spark, sf_dir, "lineitem")
    facts = l.select(
        F.col("l_orderkey"),
        F.when(F.col("l_linenumber") % 2 == 1, 1).otherwise(2).alias("version"),
    )
    return (
        facts.join(
            asof,
            (facts.l_orderkey == asof.o_orderkey)
            & (facts.version == asof.version),
        )
        .groupBy(facts.version)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("price").cast("double").alias("total_asof_price"),
        )
    )


@register(
    "chunk_dup_profile",
    """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS words
        FROM documents
    ), ch AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, CAST(ceil(len(words) / 5.0) AS BIGINT)),
                   j -> array_to_string(words[(j*5+1):(j*5+5)], ' ')
               )) AS chunk
        FROM w WHERE len(words) > 0
    ), freq AS (
        SELECT chunk, COUNT(*) AS n FROM ch GROUP BY chunk
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS dup_chunk_fraction
    FROM ch c JOIN freq f USING (chunk)
    GROUP BY c.doc_id
    """,
    ops=["text-chunk-dup", "dedup-exact", "A3"],
)
def chunk_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-chunk fraction (RefinedWeb/C4 "dup line
    fraction" quality signal over 5-word chunks): map-side chunking,
    one hash shuffle on chunk text for corpus frequencies, one rollup
    on doc_id. No pairwise comparison — O(total words) at any corpus
    size (operators.text.chunk_dup_stats)."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return text.chunk_dup_stats(d, chunk_words=5)


@register(
    "corpus_bigram_lift",
    """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS words
        FROM documents
    ), uni AS (
        SELECT unnest(words) AS tok FROM w
    ), bge AS (
        SELECT p.w1 AS w1, p.w2 AS w2 FROM (
            SELECT unnest(list_transform(
                       range(0, len(words) - 1),
                       i -> struct_pack(w1 := words[i+1], w2 := words[i+2])
                   )) AS p
            FROM w WHERE len(words) >= 2)
    ), uc AS (
        SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok
    ), nu AS (SELECT COUNT(*) AS n_uni FROM uni),
       nb AS (SELECT COUNT(*) AS n_bi FROM bge),
       bc AS (
        SELECT w1, w2, COUNT(*) AS n_pair FROM bge
        GROUP BY w1, w2 HAVING COUNT(*) >= 3
    )
    SELECT bc.w1, bc.w2, bc.n_pair, ua.c AS n_w1, ub.c AS n_w2,
           CAST(bc.n_pair AS DOUBLE) * nu.n_uni * nu.n_uni
               / nb.n_bi / ua.c / ub.c AS lift
    FROM bc
    JOIN uc ua ON ua.tok = bc.w1
    JOIN uc ub ON ub.tok = bc.w2
    CROSS JOIN nu CROSS JOIN nb
    ORDER BY lift DESC, w1, w2 LIMIT 25
    """,
    ops=["text-collocation", "A3", "W2"],
)
def corpus_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 collocations by lift (= exp(PMI), same ranking, but
    exactly-rounded IEEE arithmetic only — no cross-engine libm ln
    drift; see operators.text.bigram_lift). Two hash aggregations plus
    two broadcast scalar totals; the ranked set is vocabulary-sized."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return text.bigram_lift(d, min_pair_count=3, k=25)


@register(
    "nation_trade_triangles",
    """
    WITH raw AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ), e AS (
        SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        FROM raw WHERE src <> dst
    ), tri AS (
        SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
        FROM e ab JOIN e bc ON bc.lo = ab.hi
        WHERE EXISTS (SELECT 1 FROM e ac
                      WHERE ac.lo = ab.lo AND ac.hi = bc.hi)
    ), corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT n_name, COUNT(*) AS n_triangles
    FROM corners JOIN nation ON node = n_nationkey
    GROUP BY n_name
    """,
    ops=["graph-triangles", "J1", "A3"],
)
def nation_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle participation in the undirected nation
    trade graph (an edge = any lineitem shipped between the two
    nations). Canonical a<b<c enumeration — wedge self-join closed by
    a LEFT SEMI probe — so each triangle counts exactly once; two hash
    joins, no cartesian (operators.graph.triangle_counts)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_nationkey").alias("src"),
                F.col("c_nationkey").alias("dst"))
    )
    tc = graph.triangle_counts(edges)
    return tc.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        tc.node == F.col("n_nationkey"),
    ).select("n_name", "n_triangles")


@register(
    "ewma_daily_revenue",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS daily_rev
        FROM orders GROUP BY day
    ), lagged AS (
        SELECT day, daily_rev,
               lag(daily_rev, 1) OVER w AS l1,
               lag(daily_rev, 2) OVER w AS l2,
               lag(daily_rev, 3) OVER w AS l3,
               lag(daily_rev, 4) OVER w AS l4,
               lag(daily_rev, 5) OVER w AS l5,
               lag(daily_rev, 6) OVER w AS l6
        FROM daily
        WINDOW w AS (PARTITION BY year(day) ORDER BY day)
    )
    SELECT day, daily_rev,
           (daily_rev
            + COALESCE(l1, CAST(0.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
            + COALESCE(l2, CAST(0.0 AS DOUBLE)) * CAST(0.25 AS DOUBLE)
            + COALESCE(l3, CAST(0.0 AS DOUBLE)) * CAST(0.125 AS DOUBLE)
            + COALESCE(l4, CAST(0.0 AS DOUBLE)) * CAST(0.0625 AS DOUBLE)
            + COALESCE(l5, CAST(0.0 AS DOUBLE)) * CAST(0.03125 AS DOUBLE)
            + COALESCE(l6, CAST(0.0 AS DOUBLE)) * CAST(0.015625 AS DOUBLE))
           / (CAST(1.0 AS DOUBLE)
            + CASE WHEN l1 IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END
            + CASE WHEN l2 IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(0.25 AS DOUBLE) END
            + CASE WHEN l3 IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(0.125 AS DOUBLE) END
            + CASE WHEN l4 IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(0.0625 AS DOUBLE) END
            + CASE WHEN l5 IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(0.03125 AS DOUBLE) END
            + CASE WHEN l6 IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST(0.015625 AS DOUBLE) END)
               AS ewma_7,
           CAST(1 + CASE WHEN l1 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN l2 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN l3 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN l4 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN l5 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN l6 IS NULL THEN 0 ELSE 1 END AS INTEGER)
               AS n_obs
    FROM lagged
    """,
    ops=["window-ewma", "timeseries", "A3"],
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted daily revenue (decay 1/2 over the 7 most
    recent trading days, yearly reset so the window parallelizes by
    calendar-year partition). The weights are exact binary fractions
    and the numerator/denominator are fixed-order lag-chain sums, so
    the smoothed series is bit-identical on any engine — the float-
    determinism discipline of operators.timeseries.ewma_lag_chain."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(_dec2("o_totalprice")).cast("double").alias("daily_rev")
    )
    daily = daily.withColumn("__yr", F.year("day"))
    out = timeseries.ewma_lag_chain(
        daily, "__yr", "day", "daily_rev", span=7
    )
    return out.select(
        "day", "daily_rev", F.col("ewma").alias("ewma_7"), "n_obs"
    )


@register(
    "inverted_index_postings",
    """
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS tok
        FROM documents
    )
    SELECT tok, COUNT(*) AS cf,
           COUNT(DISTINCT doc_id) AS df,
           array_to_string(list_sort(list(DISTINCT doc_id))[1:20], ',')
               AS postings_head
    FROM toks GROUP BY tok
    """,
    ops=["text-index", "A3"],
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (term → cf, df, sorted postings head):
    one hash aggregation on the term key, posting lists capped at 20
    ids before stringification so the row stays bounded
    (operators.text.inverted_index)."""
    d = _t(spark, sf_dir, "documents", fanout=True)
    return text.inverted_index(d, postings_cap=20)


@register(
    "nation_price_qty_corr",
    """
    WITH sums AS (
        SELECT s.s_nationkey,
               COUNT(*) AS n_lines,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS sx,
               SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS sy,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * CAST(l.l_extendedprice AS DECIMAL(18,2))) AS sxx,
               SUM(CAST(l.l_quantity AS DECIMAL(18,2))
                   * CAST(l.l_quantity AS DECIMAL(18,2))) AS syy,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * CAST(l.l_quantity AS DECIMAL(18,2))) AS sxy
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_nationkey
    )
    SELECT n_name, n_lines,
           CAST(FLOOR(
               (CAST(n_lines AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n_lines AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n_lines AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               * 1000000.0) AS BIGINT) AS corr_fp6
    FROM sums JOIN nation ON s_nationkey = n_nationkey
    """,
    ops=["A3", "stats-corr", "J1"],
)
def nation_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Pearson correlation of line price vs quantity — NOT
    F.corr, whose double accumulation order floats with partitioning:
    the five moment sums are exact DECIMAL aggregates (order-free),
    and the correlation is one fixed-order double expression over
    them. The big decimal sums exceed double's 53-bit mantissa, and
    engines legitimately differ in how they round decimal→double
    (single vs two-step rounding, ~1e-17 relative), so the score is
    emitted as floor(corr·10^6) — the repo's fixed-point convention
    for inherently conversion-lossy floats."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    x = _dec2("l_extendedprice")
    y = _dec2("l_quantity")
    sums = (
        l.join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
               F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
    )
    n_d = F.col("n_lines").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return (
        sums.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name", "n_lines",
            F.floor(
                (n_d * sxy - sx * sy)
                / (F.sqrt(n_d * sxx - sx * sx)
                   * F.sqrt(n_d * syy - sy * sy))
                * 1000000.0
            ).cast("long").alias("corr_fp6"),
        )
    )


@register(
    "nation_revenue_trend",
    """
    WITH yearly AS (
        SELECT c.c_nationkey,
               CAST(year(o.o_orderdate) AS BIGINT) AS yr,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, yr
    ), sums AS (
        SELECT c_nationkey,
               COUNT(*) AS n_years,
               SUM(yr) AS sx,
               SUM(yr * yr) AS sxx,
               SUM(rev) AS sy,
               SUM(CAST(yr AS DECIMAL(18,2)) * rev) AS sxy
        FROM yearly GROUP BY c_nationkey
    )
    SELECT n_name, n_years,
           CAST(FLOOR(
               (CAST(n_years AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n_years AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * 100.0) AS BIGINT) AS slope_cents_per_year
    FROM sums JOIN nation ON c_nationkey = n_nationkey
    """,
    ops=["A3", "stats-ols", "J1"],
)
def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS slope of yearly revenue vs year — the trend line
    a dashboard fits, under the same exact-moment-sum discipline as
    nation_price_qty_corr: integer/decimal sums (order-free), one
    fixed-order double expression at the end, emitted as fixed-point
    cents/year so decimal→double conversion rounding at large scale
    factors can never surface."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    yearly = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_nationkey",
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(F.sum(_dec2("o_totalprice")).alias("rev"))
    )
    sums = yearly.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_years"),
        F.sum("yr").alias("sx"),
        F.sum(F.col("yr") * F.col("yr")).alias("sxx"),
        F.sum("rev").alias("sy"),
        F.sum(F.col("yr").cast(DEC2) * F.col("rev")).alias("sxy"),
    )
    n_d = F.col("n_years").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    return (
        sums.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name", "n_years",
            F.floor(
                (n_d * sxy - sx * sy) / (n_d * sxx - sx * sx) * 100.0
            ).cast("long").alias("slope_cents_per_year"),
        )
    )


@register(
    "revenue_gini_by_nation",
    """
    WITH x AS (
        SELECT c.c_nationkey,
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
               ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
                                  ORDER BY CAST(o.o_totalprice AS DECIMAL(18,2)),
                                           o.o_orderkey) AS r
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), sums AS (
        SELECT c_nationkey,
               COUNT(*) AS n_orders,
               SUM(price) AS sx,
               SUM(CAST(r AS DECIMAL(18,2)) * price) AS srx
        FROM x GROUP BY c_nationkey
    )
    SELECT n_name, n_orders,
           CAST(FLOOR(
               ((CAST(2 AS DOUBLE) * CAST(srx AS DOUBLE))
                  / (CAST(n_orders AS DOUBLE) * CAST(sx AS DOUBLE))
                - (CAST(n_orders AS DOUBLE) + CAST(1 AS DOUBLE))
                  / CAST(n_orders AS DOUBLE))
               * 1000000.0) AS BIGINT) AS gini_fp6
    FROM sums JOIN nation ON c_nationkey = n_nationkey
    """,
    ops=["A3", "stats-gini", "W2"],
)
def revenue_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of order value per customer nation, via the
    rank formula G = 2·Σr·x / (n·Σx) − (n+1)/n: ranks come from a
    per-nation window (partition-parallel, never global), Σr·x and Σx
    are exact DECIMAL sums (the sum is invariant under tie ordering,
    so the deterministic tiebreak only pins the plan, not the value),
    and the score surfaces as floor(G·10^6) under the fixed-point
    convention for decimal→double-rounding-sensitive outputs."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    price = _dec2("o_totalprice")
    x = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_nationkey",
            price.alias("price"),
            F.row_number()
            .over(
                Window.partitionBy("c_nationkey")
                .orderBy(price, F.col("o_orderkey"))
            )
            .alias("r"),
        )
    )
    sums = x.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").alias("sx"),
        F.sum(F.col("r").cast(DEC2) * F.col("price")).alias("srx"),
    )
    n_d = F.col("n_orders").cast("double")
    sx = F.col("sx").cast("double")
    srx = F.col("srx").cast("double")
    two = F.lit(2).cast("double")
    one = F.lit(1).cast("double")
    gini_fp6 = F.floor(
        ((two * srx) / (n_d * sx) - (n_d + one) / n_d) * 1000000.0
    ).cast("long")
    return (
        sums.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "n_orders", gini_fp6.alias("gini_fp6"))
    )


@register(
    "lang_source_chisq_cells",
    """
    WITH o AS (
        SELECT lang, source, COUNT(*) AS n_obs
        FROM documents GROUP BY lang, source
    ), rt AS (SELECT lang, SUM(n_obs) AS row_tot FROM o GROUP BY lang),
       ct AS (SELECT source, SUM(n_obs) AS col_tot FROM o GROUP BY source),
       tot AS (SELECT SUM(n_obs) AS n FROM o)
    SELECT o.lang, o.source, o.n_obs,
           CAST(rt.row_tot * ct.col_tot AS DOUBLE) / CAST(tot.n AS DOUBLE)
               AS expected,
           (CAST(o.n_obs AS DOUBLE)
              - CAST(rt.row_tot * ct.col_tot AS DOUBLE)
                / CAST(tot.n AS DOUBLE))
           * (CAST(o.n_obs AS DOUBLE)
              - CAST(rt.row_tot * ct.col_tot AS DOUBLE)
                / CAST(tot.n AS DOUBLE))
           / (CAST(rt.row_tot * ct.col_tot AS DOUBLE) / CAST(tot.n AS DOUBLE))
               AS chisq_contribution
    FROM o
    JOIN rt ON rt.lang = o.lang
    JOIN ct ON ct.source = o.source
    CROSS JOIN tot
    """,
    ops=["A3", "stats-chisq"],
)
def lang_source_chisq_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for the lang × source
    contingency table: observed count, expected under independence,
    and the per-cell (O−E)²/E contribution. Per-cell expressions are
    fixed-order exactly-rounded doubles over exact integer marginals —
    no cross-cell float sum, so no accumulation-order hazard; the
    statistic itself is the (exact) integer-weighted sum a consumer
    takes over these cells."""
    d = _t(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_obs"))
    rt = o.groupBy("lang").agg(F.sum("n_obs").alias("row_tot"))
    ct = o.groupBy("source").agg(F.sum("n_obs").alias("col_tot"))
    tot = o.agg(F.sum("n_obs").alias("n"))
    e = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col(
        "n"
    ).cast("double")
    diff = F.col("n_obs").cast("double") - e
    return (
        o.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang", "source", "n_obs",
            e.alias("expected"),
            (diff * diff / e).alias("chisq_contribution"),
        )
    )


@register(
    "quality_quantile_align",
    """
    WITH per_source AS (
        SELECT source,
               quantile_cont(n_chars,
                   [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs,
               COUNT(*) AS n_docs
        FROM documents GROUP BY source
    ), src AS (
        SELECT source, n_docs, u.decile AS decile, u.val AS source_q FROM (
            SELECT source, n_docs,
                   unnest(list_transform(range(0, 9),
                       i -> struct_pack(decile := CAST(i + 1 AS INTEGER),
                                        val := qs[i+1]))) AS u
            FROM per_source)
    ), gq AS (
        SELECT u.decile AS decile, u.val AS global_q FROM (
            SELECT unnest(list_transform(range(0, 9),
                       i -> struct_pack(decile := CAST(i + 1 AS INTEGER),
                                        val := qs[i+1]))) AS u
            FROM (SELECT quantile_cont(n_chars,
                      [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
                  FROM documents))
    )
    SELECT s.source, s.n_docs, s.decile AS decile, s.source_q, gl.global_q,
           s.source_q / gl.global_q AS align_ratio
    FROM src s JOIN gq gl ON s.decile = gl.decile
    """,
    ops=["percentile", "A3", "stats-quantile-align"],
)
def quality_quantile_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile alignment of document length per source against the
    global corpus (the diagnostic behind quantile normalization: the
    ratio tells how to rescale a source's distribution onto the
    corpus). Exact interpolated percentiles (Spark ``percentile`` ≡
    DuckDB ``quantile_cont`` on the same doubles, the proven
    quantiles_order_value equivalence); the global decile row is a
    9-value broadcast join."""
    d = _t(spark, sf_dir, "documents")
    qs = [i / 10.0 for i in range(1, 10)]
    nc = F.col("n_chars").cast("double")
    per_source = d.groupBy("source").agg(
        F.percentile(nc, qs).alias("qs"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    glob = d.agg(F.percentile(nc, qs).alias("qs"))
    src = per_source.select(
        "source", "n_docs",
        F.posexplode("qs").alias("pos", "source_q"),
    )
    g = glob.select(F.posexplode("qs").alias("pos", "global_q"))
    return (
        src.join(F.broadcast(g), "pos")
        .select(
            "source", "n_docs",
            (F.col("pos") + 1).cast("int").alias("decile"),
            "source_q", "global_q",
            (F.col("source_q") / F.col("global_q")).alias("align_ratio"),
        )
    )


__all__ = [n for n in globals() if not n.startswith("__")]
