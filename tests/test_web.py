"""URL canonicalization / re-crawl dedup / domain profile (operators/web.py)."""

import pyspark.sql.functions as F
import pytest

from data_integration_and_visualization_uc3m_spark.operators import web


@pytest.mark.parametrize(
    "raw,canonical",
    [
        # the classic crawl-noise variants all converge
        ("http://WWW.Example.org/a/", "https://example.org/a"),
        ("https://example.org/a#frag", "https://example.org/a"),
        ("https://example.org/a?utm_source=x", "https://example.org/a"),
        ("https://example.org/a?utm_source=x&utm_medium=y",
         "https://example.org/a"),
        # non-utm params survive, wherever the utm param sits
        ("https://example.org/a?utm_source=x&id=7",
         "https://example.org/a?id=7"),
        ("https://example.org/a?id=7&utm_source=x",
         "https://example.org/a?id=7"),
        # already-canonical input is a fixed point
        ("https://example.org/a?id=7", "https://example.org/a?id=7"),
        # bare host with trailing slash
        ("http://www.example.org/", "https://example.org"),
        # www as part of the path is untouched
        ("https://example.org/www.thing", "https://example.org/www.thing"),
    ],
)
def test_canonical_url_cases(spark, raw, canonical):
    df = spark.createDataFrame([(raw,)], ["raw_url"])
    got = web.canonicalize_urls(df).first().canonical_url
    assert got == canonical


def test_canonicalize_is_idempotent(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    once = web.canonicalize_urls(web.with_synthetic_urls(df))
    twice = once.withColumn(
        "again", web.canonical_url(F.col("canonical_url"))
    )
    assert twice.filter(F.col("again") != F.col("canonical_url")).count() == 0


def test_url_dedup_groups_and_survivor(spark):
    n, groups = 500, 97
    df = spark.range(0, n).withColumnRenamed("id", "doc_id")
    urls = web.canonicalize_urls(web.with_synthetic_urls(df))
    stats = web.url_dedup_stats(urls).collect()
    assert len(stats) == groups  # one canonical page per residue class
    assert sum(r.n_docs for r in stats) == n
    by_url = {r.canonical_url: r for r in stats}
    # doc_id=0 hits every dirty variant; its group is residue class 0
    r0 = by_url["https://site0.example.org/docs/0"]
    assert r0.survivor_doc_id == 0 and r0.n_docs == 6  # 0,97,...,485
    assert r0.n_raw_variants > 1  # dirty spellings differ in-group


def test_domain_profile_shares_sum_to_one(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    urls = web.canonicalize_urls(web.with_synthetic_urls(df))
    prof = web.domain_profile(urls).collect()
    assert len(prof) == 10
    assert abs(sum(r.corpus_share for r in prof) - 1.0) < 1e-12
    assert all(r.docs_per_url >= 1.0 and r.n_urls <= r.n_docs for r in prof)
