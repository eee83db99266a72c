"""Sequence packing — assembling documents into fixed token-budget
training sequences.

The last step of every LLM data pipeline: concatenate documents into
contiguous sequences of ~context-length tokens. The sequential greedy
packer (first-fit into the open bin) is inherently serial; the
scale-correct distributed formulation is CONTIGUOUS START-OFFSET
packing: fix a deterministic document order, compute each document's
running start offset, and assign it to bin ``start_offset div budget``.
Equivalent quality for corpus-scale packing (bins are overfull by at
most one document boundary), and it is one partitioned window — no
sequential state, no driver loop.

Partitioning by a shard column (language, source, split) is not a
compromise: real pipelines pack per shard anyway (mono-lingual
sequences, per-split separation), and it is exactly what makes the
cumulative sum distributed — each shard's window sorts locally after
one hash shuffle. A global (unsharded) order would serialize into a
single partition; for that case, pre-shard by hash bucket first.

No counterpart in the reference (its unit of load is the row:
crime_immigration_etl.py:315-331); this is a north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_contiguous(
    df: DataFrame,
    budget: int,
    tokens_col: str,
    shard_col: str,
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign every row a sequence number within its shard such that
    consecutive documents fill ``budget`` tokens per sequence.

    ``seq_no = (cumulative_tokens - own_tokens) div budget`` — the bin
    containing the document's start offset. Exact integer arithmetic
    end-to-end (portable to any SQL engine); deterministic given the
    (shard, order) pair. Documents longer than ``budget`` own their
    start bin; downstream chunking splits them.

    Adds ``seq_no`` and ``seq_offset`` (start offset within the shard).
    """
    w = Window.partitionBy(shard_col).orderBy(order_col)
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("long")
    return df.withColumn("seq_offset", start).withColumn(
        "seq_no", F.expr(f"seq_offset div {int(budget)}")
    )


def packing_stats(
    packed: DataFrame, tokens_col: str, shard_col: str
) -> DataFrame:
    """Per-shard packing summary: sequences produced, tokens, and the
    mean fill ratio (tokens per sequence / budget is derivable; exact
    integer sums only, so the summary is oracle-checkable).

    ``n_sequences`` counts DISTINCT bins actually produced: a document
    longer than the budget spans several bins, making the next doc's
    bin index skip numbers — max(seq_no)+1 would count those empty
    bins as sequences (ADVICE r2)."""
    return packed.groupBy(shard_col).agg(
        F.countDistinct("seq_no").cast("long").alias("n_sequences"),
        F.sum(tokens_col).cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def pack_payloads(
    packed: DataFrame,
    text_col: str,
    shard_col: str,
    order_col: str = "doc_id",
    sep: str = " ",
) -> DataFrame:
    """Materialize the packed sequences: concatenate each sequence's
    documents in deterministic ``order_col`` order.

    ``collect_list`` order is partition-dependent, so the documents are
    collected as (order, text) structs and ``array_sort``-ed before the
    join — the portable way to get an ordered string_agg in Spark. One
    shuffle on (shard, seq_no); sequences are budget-bounded (~one
    context window), so groups are small and skew-free by construction.
    """
    docs = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(text_col).alias("t")))
    )
    return (
        packed.groupBy(shard_col, "seq_no")
        .agg(docs.alias("docs"))
        .select(
            shard_col,
            "seq_no",
            F.concat_ws(sep, F.transform("docs", lambda d: d["t"])).alias("payload"),
            F.size("docs").alias("n_docs"),
        )
    )


def pow2_length_bucket(tokens_col: str) -> F.Column:
    """Smallest power of two >= token count — the standard
    length-bucketed batching key (batch docs of similar length so the
    pad-to-longest waste is bounded by 2x, instead of padding every
    batch to the global max).

    Exact integer construction, portable to SQL: the bucket exponent is
    the bit length of (n - 1), read as ``length(bin(n - 1))`` — no
    float log2, whose boundary behavior at exact powers of two would be
    engine-dependent.
    """
    n = F.col(tokens_col)
    # SQL-expr form: pyspark's F.shiftleft only accepts a literal bit
    # count, but the bucket exponent is per-row
    pow2 = F.expr(f"shiftleft(1L, length(bin({tokens_col} - 1)))")
    return F.when(n <= 1, F.lit(1)).otherwise(pow2).cast("long")


def length_bucket_stats(
    df: DataFrame, tokens_col: str = "n_tokens"
) -> DataFrame:
    """Padding-waste report per power-of-two length bucket: how much of
    each batch bucket is real tokens vs pad-to-bucket waste. The
    decision input for choosing bucket boundaries in a batching plan —
    one hash aggregation, exact integer sums.
    """
    bucket = pow2_length_bucket(tokens_col)
    n = F.col(tokens_col)
    return (
        df.select(bucket.alias("bucket"), n.alias("__n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("long").alias("total_tokens"),
            F.sum(F.col("bucket") - F.col("__n"))
            .cast("long")
            .alias("pad_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "total_tokens",
            "pad_tokens",
            (
                F.col("pad_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket")).cast("double")
            ).alias("waste_frac"),
        )
    )


def packing_length_sweep(
    df: DataFrame,
    lengths: list[int],
    tokens_col: str,
    shard_col: str,
    order_col: str = "doc_id",
) -> DataFrame:
    """The max_len PLANNING question: for each candidate sequence
    length, what does contiguous packing cost in (a) tail padding (the
    final partial sequence per shard) and (b) document fragmentation
    (docs straddling a sequence boundary get split across training
    sequences)? Bigger budgets pad more per shard tail but fragment
    fewer documents — this sweep quantifies both sides so the trainer
    can pick the knee.

    One window pass computes the start offsets; the candidate lengths
    are exploded AFTER the (shard-count-sized) aggregation inputs are
    formed, so the sweep costs one scan + two small shuffles however
    many lengths are probed. Exact integer arithmetic throughout.

    Returns one row per max_len: doc/token totals, sequences produced,
    pad tokens + pad fraction, boundary-straddling docs, and the extra
    fragments splitting creates."""
    w = Window.partitionBy(shard_col).orderBy(order_col)
    off = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("long")
    base = df.select(
        F.col(shard_col).alias("shard"),
        F.col(tokens_col).cast("long").alias("tok"),
        off.alias("off"),
    )
    swept = base.withColumn(
        "max_len",
        F.explode(F.array(*[F.lit(int(n)).cast("long") for n in lengths])),
    )
    start_bin = F.expr("off div max_len")
    # A zero-token doc sitting exactly on a boundary has
    # (off-1) div max_len < start_bin; greatest(..., 0) keeps such
    # degenerate docs from contributing NEGATIVE fragments (it spans
    # no tokens, so it neither straddles nor fragments).
    end_bin = F.expr("greatest((off + tok - 1) div max_len, off div max_len)")
    per_shard = (
        swept.groupBy("max_len", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").cast("long").alias("total_tokens"),
            F.max(F.col("off") + F.col("tok")).cast("long").alias(
                "stream_len"
            ),
            F.sum((end_bin > start_bin).cast("long")).alias(
                "n_boundary_docs"
            ),
            F.sum(end_bin - start_bin).cast("long").alias(
                "n_extra_fragments"
            ),
        )
        .withColumn(
            "n_seqs", F.expr("(stream_len + max_len - 1) div max_len")
        )
        .withColumn(
            "pad", F.col("n_seqs") * F.col("max_len") - F.col("stream_len")
        )
    )
    return (
        per_shard.groupBy("max_len")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_tokens").cast("long").alias("total_tokens"),
            F.sum("n_seqs").cast("long").alias("n_seqs"),
            F.sum("pad").cast("long").alias("pad_tokens"),
            F.sum("n_boundary_docs").cast("long").alias("n_boundary_docs"),
            F.sum("n_extra_fragments")
            .cast("long")
            .alias("n_extra_fragments"),
        )
        .select(
            "max_len",
            "n_docs",
            "total_tokens",
            "n_seqs",
            "pad_tokens",
            (
                F.col("pad_tokens").cast("double")
                / (F.col("n_seqs") * F.col("max_len")).cast("double")
            ).alias("pad_frac"),
            "n_boundary_docs",
            "n_extra_fragments",
        )
    )
