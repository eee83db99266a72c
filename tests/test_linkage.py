"""Entity-resolution fuzzy matching (operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_visualization_uc3m_spark.operators import linkage


def names(spark, rows):
    return spark.createDataFrame([(i, n) for i, n in enumerate(rows)], "id long, name string")


def test_fuzzy_name_pairs_matches_quadratic_truth(spark):
    import itertools

    rows = [
        "red widget", "red widgit", "red widge",  # cluster of typos
        "blue bolt", "blue bolts",
        "completely other thing",
        "red widget",  # duplicate value → multiplicity 2
    ]
    df = names(spark, rows)
    got = {
        (r.name_a, r.name_b): (r.distance, r.n_rows_a, r.n_rows_b)
        for r in linkage.fuzzy_name_pairs(df, "name", max_distance=2).collect()
    }

    # quadratic ground truth in Python
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    vocab = sorted(set(rows))
    truth = {
        (a, b): lev(a, b)
        for a, b in itertools.combinations(vocab, 2)
        if lev(a, b) <= 2
    }
    assert set(got) == set(truth)
    for pair, d in truth.items():
        assert got[pair][0] == d
    # multiplicity surfaced: 'red widget' appears twice
    (d, na, nb) = got[("red widge", "red widget")]
    assert nb == 2


def test_fuzzy_name_pairs_blocking_is_lossless_at_band_edges(spark):
    # length diff exactly == max_distance must still pair (adjacent or
    # same bucket by construction)
    df = names(spark, ["abcd", "abcdef", "zzzz"])
    got = {(r.name_a, r.name_b) for r in linkage.fuzzy_name_pairs(df, "name", max_distance=2).collect()}
    assert ("abcd", "abcdef") in got  # distance 2, length diff 2
    assert all("zzzz" not in p for p in got)


def test_sorted_neighborhood_window_semantics(spark):
    """Only values within `window` sort positions pair; duplicates of
    a value collapse to one vocabulary row first."""
    from data_integration_and_visualization_uc3m_spark.operators import linkage

    rows = [("aa",), ("aa",), ("ab",), ("ac",), ("zz",)]
    df = spark.createDataFrame(rows, "name string")
    got = {
        (r["name_a"], r["name_b"]): (r["distance"], r["n_rows_a"], r["n_rows_b"])
        for r in linkage.sorted_neighborhood_pairs(
            df, "name", window=2, max_distance=None
        ).collect()
    }
    # sort order: aa, ab, ac, zz — window 2 successors
    assert set(got) == {("aa", "ab"), ("aa", "ac"), ("ab", "ac"),
                        ("ab", "zz"), ("ac", "zz")}
    assert got[("aa", "ab")] == (1, 2, 1)  # aa multiplicity carried
    # distance cap filters
    capped = linkage.sorted_neighborhood_pairs(
        df, "name", window=2, max_distance=1
    ).collect()
    assert all(r["distance"] <= 1 for r in capped)
