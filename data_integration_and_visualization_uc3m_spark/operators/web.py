"""URL / domain-level web-corpus curation.

The standard web-corpus pipelines (C4, RefinedWeb, FineWeb) all begin
with URL hygiene before any text-level dedup: canonicalize the crawl
URL (scheme/host case, tracking params, fragments, trailing slashes),
collapse exact re-crawls of the same canonical URL, and profile the
per-domain distribution so head domains can be capped. The reference
corpus (SURVEY.md §2) has no URL column, and neither does the
``documents`` testdata table, so :func:`with_synthetic_urls` derives a
deterministic *dirty* URL per document — six independent residue
classes of ``doc_id`` toggle the classic crawl-noise variants — which
makes the canonicalizer's behavior observable and oracle-checkable.

Everything here is pure column expressions (``lower`` /
``regexp_replace`` / ``regexp_extract`` + one hash-partitioned
``groupBy``), so the whole family stays inside whole-stage codegen and
scales as a single shuffle on the canonical-URL key — at 100 TB the
canonical key is near-uniform (it embeds the host), so no salting is
needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Canonicalization rewrite chain, applied in order. Each entry is
# (pattern, replacement); patterns are RE2/Java-regex compatible so the
# identical strings run in Spark and in the DuckDB oracle (with the 'g'
# flag there — Spark's regexp_replace is always global).
CANONICAL_REWRITES: tuple[tuple[str, str], ...] = (
    (r"^http://", "https://"),          # force https
    (r"^https://www\.", "https://"),    # strip the www subdomain
    (r"#.*$", ""),                      # drop the fragment
    (r"utm_[a-z_]+=[^&#]*&?", ""),      # drop tracking params (+ their '&')
    (r"[?&]+$", ""),                    # dangling separators left by ^
    (r"/+$", ""),                       # trailing slash(es)
)


def with_synthetic_urls(
    df: DataFrame,
    id_col: str = "doc_id",
    out_col: str = "raw_url",
    n_groups: int = 97,
    n_hosts: int = 10,
) -> DataFrame:
    """Derive a deterministic dirty URL per row for corpora that lack
    one. ``doc_id % n_groups`` picks the canonical page (host + path),
    so every residue class is an exact re-crawl group; the remaining
    residues of ``doc_id`` toggle crawl-noise variants (http vs https,
    ``www.``, host case, trailing slash, utm params, fragment) so raw
    forms differ *within* a group. Pure concat/CASE — codegen'd."""
    i = F.col(id_col)
    g = i % n_groups
    host = F.concat(
        F.lit("site"), (g % n_hosts).cast("string"), F.lit(".example.org")
    )
    url = F.concat(
        F.when(i % 2 == 0, F.lit("http")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(i % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(i % 5 == 0, F.upper(host)).otherwise(host),
        F.lit("/docs/"),
        g.cast("string"),
        F.when(i % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            i % 6 == 0, F.lit("?utm_source=rss&utm_medium=feed")
        ).otherwise(F.lit("")),
        F.when(i % 8 == 0, F.lit("#section-1")).otherwise(F.lit("")),
    )
    return df.withColumn(out_col, url)


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL column: lowercase, then the
    :data:`CANONICAL_REWRITES` chain. Column-expression only."""
    out = F.lower(col)
    for pat, rep in CANONICAL_REWRITES:
        out = F.regexp_replace(out, pat, rep)
    return out


def canonicalize_urls(
    df: DataFrame, url_col: str = "raw_url", out_col: str = "canonical_url"
) -> DataFrame:
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def url_host(col: Column) -> Column:
    """Host component of an (already canonical) URL."""
    return F.regexp_extract(col, r"^https://([^/]+)", 1)


def url_dedup_stats(
    df: DataFrame,
    canonical_col: str = "canonical_url",
    raw_col: str = "raw_url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact re-crawl groups: one row per canonical URL with the group
    size, the number of distinct raw spellings observed, and the
    deterministic survivor (min id). One shuffle on the canonical key."""
    return df.groupBy(canonical_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(raw_col).alias("n_raw_variants"),
        F.min(id_col).alias("survivor_doc_id"),
    )


def domain_profile(
    df: DataFrame, canonical_col: str = "canonical_url"
) -> DataFrame:
    """Per-domain crawl profile: document count, distinct canonical
    URLs, exact docs-per-URL ratio, and each domain's share of the
    corpus — the inputs a head-domain cap policy reads. The corpus
    total comes from an unpartitioned window over the (tiny,
    domain-count-sized) aggregate, not over the raw rows."""
    per = (
        df.withColumn("_host", url_host(F.col(canonical_col)))
        .groupBy(F.col("_host").alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(canonical_col).alias("n_urls"),
        )
    )
    from pyspark.sql import Window

    total = F.sum("n_docs").over(Window.partitionBy())
    return per.select(
        "host",
        "n_docs",
        "n_urls",
        (F.col("n_docs").cast("double") / F.col("n_urls").cast("double")).alias(
            "docs_per_url"
        ),
        (F.col("n_docs").cast("double") / total.cast("double")).alias(
            "corpus_share"
        ),
    )
