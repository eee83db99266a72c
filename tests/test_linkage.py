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


def test_multipass_blocked_pairs_union_dedup_and_cap(spark):
    """Multi-pass blocking (VERDICT r10): pairs missed by one key are
    caught by the other, pairs found by both passes dedup to one, and
    a block whose candidate volume exceeds max_block_pairs is EXCLUDED
    from pair generation while blocking_audit counts it."""
    from data_integration_and_visualization_uc3m_spark.operators.linkage import (
        blocking_audit,
        multipass_blocked_pairs,
    )

    # left: 3 rows in hot block nk=1 (plus suffix keys), 1 in nk=2
    left = spark.createDataFrame(
        [(10, 1, "aa"), (11, 1, "bb"), (12, 1, "cc"), (13, 2, "aa")],
        "lid long, lnk long, ldd string",
    )
    right = spark.createDataFrame(
        [(20, 1, "aa"), (21, 1, "zz"), (22, 2, "zz")],
        "rid long, rnk long, rdd string",
    )
    passes = [("lnk", "rnk"), ("ldd", "rdd")]

    # cap 5: block nk=1 has 3*2=6 candidate pairs -> excluded; block
    # nk=2 (1*1) and dd blocks (aa: 2*1=2) survive
    got = sorted(
        (r["lid"], r["rid"])
        for r in multipass_blocked_pairs(
            left, right, passes, "lid", "rid", max_block_pairs=5
        ).collect()
    )
    # nation pass: only (13,22) [nk=2]; dd pass: aa block -> (10,20),
    # (13,20). The nk=1 pairs appear ONLY if caught by a dd block.
    assert got == [(10, 20), (13, 20), (13, 22)]

    audit = {
        r["pass_idx"]: r
        for r in blocking_audit(
            left, right, passes, max_block_pairs=5
        ).collect()
    }
    assert audit[1]["n_blocks"] == 2          # nk=1, nk=2 matched
    assert audit[1]["max_block_pairs_seen"] == 6
    assert audit[1]["n_oversized"] == 1
    assert audit[2]["n_blocks"] == 1          # only "aa" matches
    assert audit[2]["max_block_pairs_seen"] == 2
    assert audit[2]["n_oversized"] == 0

    # with a permissive cap, the union dedups the double-found pair
    # (13,22)? no — (13,22) found only by nation; (10,20) found by dd
    # only; (20's nk=1 block now included) -> pair (10,20) found by
    # BOTH nation and dd passes must appear exactly once
    all_pairs = multipass_blocked_pairs(
        left, right, passes, "lid", "rid", max_block_pairs=1000
    ).collect()
    assert len(all_pairs) == len({(r["lid"], r["rid"]) for r in all_pairs})
    assert (10, 20) in {(r["lid"], r["rid"]) for r in all_pairs}
