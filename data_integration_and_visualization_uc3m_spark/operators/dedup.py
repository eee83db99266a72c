"""Deduplication operators — exact and near-duplicate (SURVEY.md §2.6 +
the training-data-pipeline extensions).

The reference's dedup surface is keyed ``drop_duplicates``
(``crime_immigration_etl.py:199-203,335-368``); the 100 TB extension adds
document-level exact and near-dup detection, all built on one portable
primitive: ``md5`` (identical across Spark and the DuckDB oracle, so
every operator here is oracle-checkable — no engine-specific hashes).

Scale design:
- exact dedup = hash-groupBy on the content hash (one shuffle on md5,
  uniformly distributed ⇒ no skew);
- MinHash/LSH = shingle → per-seed min-hash → band → bucket-join;
  candidate verification only within buckets (the classic
  Broder/Indyk-Motwani construction, public literature);
- SimHash = per-token hash bits summed per document (Charikar);
- n-gram Jaccard = token-set self-join restricted to shared tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# --- keyed dedup (reference surface) --------------------------------------


def keyed_dedup_first_wins(df: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """A1 — key-scoped distinct with deterministic first-wins pick
    (``drop_duplicates(subset=...)`` keeps file order in pandas;
    Spark needs the explicit ordering — SURVEY §7.4.3).

    ``order_by``: Columns (may carry .desc()) or column-name strings.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# --- document-level exact dedup -------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup via hash-groupBy: keep the lowest id per
    distinct content hash. md5 is computed map-side; the shuffle key is
    the 128-bit hash, so distribution is uniform regardless of content
    skew. Returns the surviving rows' ids + the group size."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def tokens(text_col) -> "F.Column":
    """Whitespace tokenization of lower-cased text — the shared
    normalization for all near-dup operators (kept trivially portable to
    the SQL oracle: lower + split on single spaces)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(c), " ")


def token_set(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Explode documents to distinct (id, token) pairs — the base relation
    for Jaccard and MinHash. One explode + distinct (shuffle on id+token)."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )


def ngram_set(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram (shingle) relation per document.

    Built with sequence+transform over the token array — stays inside
    codegen, no UDF. n-grams are space-joined strings.
    """
    toks = tokens(text_col)
    ngrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select(F.col(id_col), F.explode(ngrams).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )


def jaccard_pairs(
    sets_df: DataFrame,
    id_col: str = "doc_id",
    item_col: str = "token",
    threshold: float = 0.5,
) -> DataFrame:
    """n-gram/token Jaccard near-dup pairs.

    Self-join restricted to shared items (the only pairs with non-zero
    intersection), count intersections, then |A∪B| = |A|+|B|−|A∩B|.
    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.

    Scale: the join key is the item (token/shingle); hot items explode
    the candidate space — at 100 TB, drop stop-shingles (document
    frequency cap) before the self-join, which is also what keeps the
    LSH variant cheap. Jaccard is returned as an exact rational
    (intersection / union counts), so oracle comparison is exact.
    """
    sizes = sets_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = sets_df.select(F.col(id_col).alias("id_a"), F.col(item_col))
    b = sets_df.select(F.col(id_col).alias("id_b"), F.col(item_col))
    inter = (
        a.join(b, on=item_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "size_a", "size_b", "jaccard")
    )


# --- MinHash + LSH ---------------------------------------------------------


def minhash_signatures(
    sets_df: DataFrame,
    num_hashes: int = 16,
    id_col: str = "doc_id",
    item_col: str = "token",
) -> DataFrame:
    """MinHash signatures via seeded md5 (portable, oracle-checkable).

    hash_i(item) = md5(i || ':' || item); signature_i = min over items.
    md5's 128 bits are far past the collision needs of minhash, and the
    string min is a valid total order. One explode by num_hashes (cheap:
    items × num_hashes rows, all map-side until the final min-agg, which
    combines partially per partition).

    Output: (id, seed, minhash).
    """
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return (
        sets_df.select(
            F.col(id_col), F.explode(seeds).alias("seed"), F.col(item_col)
        )
        .select(
            id_col,
            "seed",
            F.md5(F.concat_ws(":", F.col("seed"), F.col(item_col))).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: group the signature into ``bands`` bands of
    ``rows_per_band`` hashes, hash each band, and emit candidate pairs
    that share any band bucket. Probability a pair with Jaccard s becomes
    a candidate: 1 − (1 − s^r)^b (standard S-curve).

    Scale: the bucket-join replaces the all-pairs O(n²) comparison with
    per-bucket joins; bucket sizes are bounded by near-dup cluster sizes.
    """
    # canonical band string: lpad(seed) so lexicographic sort == seed
    # order — the same canonicalization the SQL oracle's string_agg
    # (ORDER BY item) produces, making buckets engine-portable.
    item = F.concat_ws(
        "@", F.lpad(F.col("seed").cast("string"), 2, "0"), F.col("minhash")
    )
    banded = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(F.concat_ws("|", F.array_sort(F.collect_list(item)))).alias("bucket")
        )
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# --- SimHash ---------------------------------------------------------------


def simhash(
    df: DataFrame, bits: int = 32, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Charikar SimHash over whitespace tokens, md5-parity bit source.

    Bit b of token t = parity of hex digit b of md5(t) (each hex digit
    contributes one parity bit; 32 hex digits ⇒ up to 32-bit simhash).
    Document bit b = sign of Σ_tokens (±1). Fully built-in (explode +
    conditional sum + bit-shift dot), and exactly reproducible in ANSI
    SQL for the oracle.

    Output: (id, simhash as BIGINT). Near-dup = small Hamming distance;
    pair generation at scale goes through band-buckets on bit slices
    (same LSH idea as MinHash).
    """
    assert bits <= 32
    tok = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
        .withColumn("h", F.md5("token"))
    )
    pos = F.explode(F.sequence(F.lit(1), F.lit(bits))).alias("bit_pos")
    bit_contrib = (
        tok.select(id_col, "h", pos)
        .withColumn(
            "contrib",
            F.when(
                F.substr(F.col("h"), F.col("bit_pos"), F.lit(1)).isin(
                    "1", "3", "5", "7", "9", "b", "d", "f"
                ),
                1,
            ).otherwise(-1),
        )
        .groupBy(id_col, "bit_pos")
        .agg(F.sum("contrib").alias("s"))
    )
    # shiftleft with a Column shift amount needs the SQL form (the
    # PySpark wrapper only takes a Python int).
    bit_value = F.expr("shiftleft(CAST(1 AS BIGINT), bit_pos - 1)")
    return bit_contrib.groupBy(id_col).agg(
        F.sum(F.when(F.col("s") > 0, bit_value).otherwise(F.lit(0).cast("long")))
        .cast("long")
        .alias("simhash")
    )
