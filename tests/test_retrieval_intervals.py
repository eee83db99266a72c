"""Round-5 additions: BM25 retrieval, banded interval-overlap join,
CUSUM changepoint statistic, equi-depth bucketing."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from data_integration_and_visualization_uc3m_spark.operators import (
    joins,
    slicing,
    text,
    timeseries,
)


# ---------------------------------------------------------------- BM25
def test_bm25_matches_hand_computation(spark):
    docs = [
        (1, "a b a c"),
        (2, "a a a a a a"),
        (3, "c c b"),
        (4, "d d d d"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in text.bm25_scores(df, ["a", "b"]).collect()
    }
    # doc 4 has no query term: absent
    assert set(out) == {1, 2, 3}
    n_docs, avgdl = 4, (4 + 6 + 3 + 4) / 4
    tfs = {1: {"a": 2, "b": 1}, 2: {"a": 6}, 3: {"b": 1}}
    dls = {1: 4, 2: 6, 3: 3}
    dfs = {"a": 2, "b": 2}
    for doc, terms in tfs.items():
        expect = 0
        for t, tf in terms.items():
            idf = math.log(
                (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0
            )
            s = (
                idf
                * (tf * 2.2)
                / (tf + 1.2 * (0.25 + 0.75 * (dls[doc] / avgdl)))
            )
            expect += math.floor(s * 1e9)
        assert out[doc]["bm25_fp9"] == expect
        assert out[doc]["dl"] == dls[doc]
        assert out[doc]["n_hit_terms"] == len(terms)


def test_bm25_rare_term_outscores_common_at_equal_tf(spark):
    # 'rare' appears in 1 doc, 'common' in all → higher idf for rare
    docs = [
        (1, "rare x x x"),
        (2, "common x x x"),
        (3, "common y y y"),
        (4, "common z z z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r["bm25_fp9"]
        for r in text.bm25_scores(df, ["rare", "common"]).collect()
    }
    assert out[1] > out[2]


def test_bpe_encode_stats_hand_case(spark):
    # corpus: 'aaab' x3, 'ab' x1 in src1; 'b' x2 in src2
    docs = [
        (1, "aaab aaab", "s1"),
        (2, "aaab ab", "s1"),
        (3, "b b", "s2"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    # merge 1: (a,a) freq 6 -> aaab = [aa,a,b], ab unchanged
    # merge 2: candidates aa+a(3), a+b(4 from aaab3+ab1)... wait: after
    # merge1 'aaab'=⟨aa⟩⟨a⟩⟨b⟩ pairs: (aa,a)x3,(a,b)x3+1=4 -> merge (a,b)
    out = {
        r["source"]: r
        for r in text.bpe_encode_stats(df, n_merges=2, group_col="source").collect()
    }
    # s1: words aaab x3 (->[aa,a? no: after (a,b) merge aaab=⟨aa⟩⟨ab⟩ 2 toks)
    #     ab x1 -> ⟨ab⟩ 1 tok. n_words=4, n_chars=3*4+2=14, n_tokens=3*2+1=7
    assert out["s1"]["n_words"] == 4
    assert out["s1"]["n_chars"] == 14
    assert out["s1"]["n_tokens"] == 7
    # s2: 'b' x2 -> 1 token each
    assert out["s2"]["n_words"] == 2
    assert out["s2"]["n_chars"] == 2
    assert out["s2"]["n_tokens"] == 2
    assert out["s2"]["fertility_fp6"] == 1_000_000


# ------------------------------------------- banded interval overlap
def _brute_pairs(ivs):
    out = {}
    for i, (ia, sa, ea) in enumerate(ivs):
        for ib, sb, eb in ivs[i + 1 :]:
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            if sa < eb and sb < ea:
                out[(lo, hi)] = min(ea, eb) - max(sa, sb)
    return out


def test_interval_overlap_matches_bruteforce_random(spark):
    rng = random.Random(7)
    ivs = []
    for i in range(120):
        s = rng.randrange(0, 5000)
        ivs.append((i, s, s + rng.randrange(0, 900)))
    df = spark.createDataFrame(ivs, "iid long, s long, e long")
    got = {
        (r["a_id"], r["b_id"]): r["overlap"]
        for r in joins.interval_overlap_pairs(df, "iid", "s", "e", cell=250).collect()
    }
    assert got == _brute_pairs(ivs)  # exactly-once emission + measures


def test_interval_overlap_touching_endpoints_excluded(spark):
    # [0,10] and [10,20] touch at a point: strict overlap excludes them
    df = spark.createDataFrame(
        [(1, 0, 10), (2, 10, 20), (3, 5, 12)], "iid long, s long, e long"
    )
    got = {
        (r["a_id"], r["b_id"]): r["overlap"]
        for r in joins.interval_overlap_pairs(df, "iid", "s", "e", cell=4).collect()
    }
    assert got == {(1, 3): 5, (2, 3): 2}


def test_interval_overlap_partition_keyed(spark):
    # identical spans under different keys never pair across keys
    rows = [
        ("k1", 1, 0, 10),
        ("k1", 2, 5, 15),
        ("k2", 3, 0, 10),
        ("k2", 4, 20, 30),
    ]
    df = spark.createDataFrame(rows, "grp string, iid long, s long, e long")
    got = {
        (r["grp"], r["a_id"], r["b_id"]): r["overlap"]
        for r in joins.interval_overlap_pairs(
            df, "iid", "s", "e", cell=4, partition_cols=["grp"]
        ).collect()
    }
    assert got == {("k1", 1, 2): 5}


def test_interval_overlap_cell_cap_drops_hot_cells(spark):
    # 5 intervals all covering cell 0; cap 4 drops that cell's pairs
    df = spark.createDataFrame(
        [(i, 0, 5) for i in range(5)] + [(9, 100, 110), (10, 105, 120)],
        "iid long, s long, e long",
    )
    got = joins.interval_overlap_pairs(
        df, "iid", "s", "e", cell=50, max_per_cell=4
    ).collect()
    assert {(r["a_id"], r["b_id"]) for r in got} == {(9, 10)}


# ----------------------------------------------------------- CUSUM
def test_cusum_matches_recursion(spark):
    vals = [10, 12, 8, 30, 31, 29, 5, 40]
    rows = [("k", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t int, x double").select(
        "k", "t", F.col("x").cast("decimal(18,2)").alias("x")
    )
    out = {
        r["t"]: float(r["cusum_scaled"])
        for r in timeseries.cusum_above_mean(df, ["k"], "t", "x").collect()
    }
    n, mean = len(vals), sum(vals) / len(vals)
    s = 0.0
    for t, v in enumerate(vals):
        s = max(0.0, s + (v - mean))
        assert abs(out[t] - n * s) < 1e-6
    # statistic is non-negative everywhere
    assert all(v >= 0 for v in out.values())


def test_cusum_flat_series_is_zero(spark):
    rows = [("k", i, 7.0) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, t int, x double").select(
        "k", "t", F.col("x").cast("decimal(18,2)").alias("x")
    )
    out = timeseries.cusum_above_mean(df, ["k"], "t", "x").collect()
    assert all(float(r["cusum_scaled"]) == 0.0 for r in out)


# ----------------------------------------------------- global rank
def test_global_rank_matches_single_window(spark):
    rng = random.Random(11)
    rows = [(i, rng.randrange(50)) for i in range(500)]  # heavy dups
    df = spark.createDataFrame(rows, "id long, v int")
    got = {
        r["id"]: r["global_rank"]
        for r in slicing.global_rank(
            df, [F.col("v"), F.col("id")], num_partitions=7
        ).collect()
    }
    expect = {
        i: rank + 1
        for rank, (i, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == expect


# ------------------------------------------------------- equi-depth
def test_equidepth_bucket_sizes_differ_by_at_most_one(spark):
    rng = random.Random(3)
    rows = [("g", i, rng.randrange(1000)) for i in range(47)] + [
        ("h", i, rng.randrange(1000)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, id int, v int")
    b = slicing.equidepth_buckets(
        df, ["g"], [F.col("v"), F.col("id")], 10, "bkt"
    )
    sizes = {
        (r["g"], r["bkt"]): r["n"]
        for r in b.groupBy("g", "bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for g, total in (("g", 47), ("h", 20)):
        ns = [sizes[(g, k)] for k in range(10)]
        assert sum(ns) == total
        assert max(ns) - min(ns) <= 1
    # buckets are order-monotone in v (max of bucket k <= min of k+1)
    rows = b.filter(F.col("g") == "g").collect()
    by_b = {}
    for r in rows:
        by_b.setdefault(r["bkt"], []).append(r["v"])
    for k in range(9):
        assert max(by_b[k]) <= min(by_b[k + 1])


def test_global_prefix_sum_matches_sorted_cumsum(spark):
    rng = random.Random(5)
    rows = [(i, rng.randrange(1, 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v int")
    got = {
        r["id"]: r["ps"]
        for r in slicing.global_prefix_sum(
            df, [F.col("id")], "v", "ps", num_partitions=9
        ).collect()
    }
    cum = 0
    for i, v in sorted(rows):
        cum += v
        assert got[i] == cum


def test_two_sample_ks_hand_case(spark):
    from data_integration_and_visualization_uc3m_spark.operators import corpus_stats

    rows = (
        [("g", "A", v) for v in [1, 2, 2, 3]]
        + [("g", "B", v) for v in [2, 3, 3, 4, 4]]
        + [("h", "A", v) for v in [5]]  # h has no B side: dropped
    )
    df = spark.createDataFrame(rows, "grp string, side string, x int")
    out = corpus_stats.two_sample_ks(
        df, ["grp"], "side", "A", "B", "x"
    ).collect()
    assert len(out) == 1 and out[0]["grp"] == "g"
    r = out[0]
    # ECDF counts over pooled values [1,2,3,4]:
    #  ca: 1,3,4,4 ; cb: 0,1,3,5 ; n_a=4, n_b=5
    # |ca*5 - cb*4|: 5, 11, 8, 0 -> d_num=11, D=11/20=0.55
    assert (r["n_a"], r["n_b"], r["d_num"], r["d_fp6"]) == (4, 5, 11, 550000)


def test_two_sample_ks_identical_distributions_zero(spark):
    from data_integration_and_visualization_uc3m_spark.operators import corpus_stats

    rows = [("g", s, v) for s in ("A", "B") for v in [1, 2, 3, 3, 7]]
    df = spark.createDataFrame(rows, "grp string, side string, x int")
    r = corpus_stats.two_sample_ks(df, ["grp"], "side", "A", "B", "x").collect()[0]
    assert r["d_num"] == 0 and r["d_fp6"] == 0


def test_pps_systematic_sample_properties(spark):
    from data_integration_and_visualization_uc3m_spark.operators import sampling

    rng = random.Random(13)
    rows = [(i, rng.randrange(1, 40)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, w int")
    k = 25
    got = sampling.pps_systematic_sample(df, [F.col("id")], "w", k).collect()
    total = sum(w for _, w in rows)
    stride = total // k
    # exact reference: items containing a stride multiple
    cum, expect = 0, set()
    for i, w in sorted(rows):
        prev, cum = cum, cum + w
        if cum // stride > prev // stride:
            expect.add(i)
    assert {r["id"] for r in got} == expect
    # draw count is ~k (within 1 of total//stride)
    assert abs(len(got) - k) <= 1
    # heavy items are always selected
    heavy = spark.createDataFrame(
        [(1, 5), (2, 1000), (3, 5), (4, 5)], "id long, w int"
    )
    hs = {r["id"] for r in sampling.pps_systematic_sample(
        heavy, [F.col("id")], "w", 4
    ).collect()}
    assert 2 in hs


def test_grid_nn_matches_bruteforce_within_radius(spark):
    rng = random.Random(17)
    pts = [(i, rng.randrange(0, 1000), rng.randrange(0, 1000)) for i in range(80)]
    prs = [(i, rng.randrange(0, 1000), rng.randrange(0, 1000)) for i in range(30)]
    cell = 200
    P = spark.createDataFrame(pts, "id long, x long, y long")
    Q = spark.createDataFrame(prs, "id long, x long, y long")
    got = {
        r["probe_id"]: (r["point_id"], r["d2"])
        for r in joins.grid_nearest_neighbor(P, Q, cell).collect()
    }
    for qid, qx, qy in prs:
        # brute force restricted to the 3x3 neighborhood contract
        cands = [
            (((px - qx) ** 2 + (py - qy) ** 2), pid)
            for pid, px, py in pts
            if abs(px // cell - qx // cell) <= 1
            and abs(py // cell - qy // cell) <= 1
        ]
        if cands:
            d2, pid = min(cands)
            assert got[qid] == (pid, d2)
        else:
            assert qid not in got
