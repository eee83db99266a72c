"""Unit tests for operators.corpus_stats and operators.linalg.

Oracle coverage for the same code paths lives in the registered
queries (`corpus_ngram_diversity`, `corpus_zipf_slope`,
`doc_char_entropy`, `doc_bigram_logprob`, `embedding_gram_power`,
`embedding_lloyd_step`); these tests pin the hand-checkable
invariants on tiny crafted inputs.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_integration_and_visualization_uc3m_spark.operators import corpus_stats, linalg


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---------------------------------------------------------------- corpus_stats


def test_ngram_diversity_hand_computed(spark):
    d = _docs(
        spark,
        [
            (1, "a", "x y x y"),  # uni: 4 toks {x,y}; bi: 3 {xy, yx}
            (2, "a", "x x"),  # uni: 2 toks {x}; bi: 1 {xx}
        ],
    )
    row = corpus_stats.ngram_diversity(d, group_col="source").collect()[0]
    assert row.n_tokens == 6 and row.n_distinct_uni == 2
    assert row.n_bigrams == 4 and row.n_distinct_bi == 3
    assert row.distinct1_fp6 == math.floor(2 / 6 * 1e6)
    assert row.distinct2_fp6 == math.floor(3 / 4 * 1e6)


def test_char_entropy_limits(spark):
    d = _docs(spark, [(1, "a", "aaaa"), (2, "a", "abcd")])
    out = {
        r.doc_id: r for r in corpus_stats.char_entropy(d).collect()
    }
    # constant string: H = 0 exactly
    assert out[1].entropy_fp6 == 0
    # 4 distinct chars: H = ln(4)
    assert abs(out[2].entropy_fp6 / 1e6 - math.log(4)) < 1e-5
    assert out[2].n_chars_counted == 4


def test_zipf_slope_is_negative_on_skewed_counts(spark):
    # freq 8,4,2,1 over ranks 1..4 — strictly decreasing → slope < 0
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    d = _docs(spark, [(1, "s", text)])
    row = corpus_stats.zipf_slope(d, top_n=10).collect()[0]
    assert row.n_terms == 4
    assert row.zipf_slope_fp6 < 0


def test_bigram_logprob_deterministic_certain_bigrams(spark):
    # every w1 has exactly one continuation ⇒ P(w2|w1)=1 ⇒ logprob 0
    d = _docs(spark, [(1, "s", "a b c"), (2, "s", "a b c")])
    for r in corpus_stats.bigram_logprob(d).collect():
        assert r.sum_logp_fp9 == 0 and r.avg_logp_fp6 == 0
        assert r.n_bigrams == 2


def test_bigram_logprob_split_continuation(spark):
    # after 'a': b twice, c twice ⇒ P = 1/2 for each doc's bigram
    d = _docs(spark, [(1, "s", "a b"), (2, "s", "a b"), (3, "s", "a c"), (4, "s", "a c")])
    rows = corpus_stats.bigram_logprob(d).collect()
    expect = math.floor(math.log(2e0 / 4e0) * 1e9)  # ln(1/2) fp9
    for r in rows:
        assert r.sum_logp_fp9 == math.floor((math.log(2.0) - math.log(4.0)) * 1e9)


# --------------------------------------------------------------------- linalg


def _embs(spark, vecs, labels=None):
    rows = [
        (i, [float(x) for x in v], (labels[i] if labels else 0))
        for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_gram_fixed_point_matches_numpy(spark):
    import numpy as np

    vecs = [[1.0, 2.0, -0.5], [0.25, -1.0, 3.0], [0.5, 0.5, 0.5]]
    g = linalg.gram_fixed_point(_embs(spark, vecs), scale=10_000).collect()
    m = np.array(vecs, dtype=np.float64)
    want = np.zeros((3, 3), dtype=np.int64)
    for row in m:
        want += np.floor(np.outer(row, row) * 10_000).astype(np.int64)
    got = {(r.i, r.j): r.g for r in g}
    assert len(got) == 9
    for i in range(3):
        for j in range(3):
            assert got[(i, j)] == want[i, j]


def test_gram_partition_invariance(spark):
    vecs = [[float(k % 5) - 2.0, float(k % 3), 0.1 * k] for k in range(40)]
    e = _embs(spark, vecs)
    one = {(r.i, r.j): r.g for r in linalg.gram_fixed_point(e.coalesce(1)).collect()}
    many = {(r.i, r.j): r.g for r in linalg.gram_fixed_point(e.repartition(7)).collect()}
    assert one == many


def test_power_iteration_dominant_direction(spark):
    # vectors aligned with axis 0 ⇒ v1 heaviest at i=0, rayleigh ≈ g00-ish
    vecs = [[10.0, 0.1, 0.1]] * 6 + [[0.1, 1.0, 0.1]] * 2
    gram = linalg.gram_fixed_point(_embs(spark, vecs))
    out = linalg.power_iteration_once(gram).collect()
    assert len(out) == 3
    by_i = {r.i: r for r in out}
    assert by_i[0].v1 > by_i[1].v1 and by_i[0].v1 > by_i[2].v1
    r6 = {r.rayleigh_fp6 for r in out}
    assert len(r6) == 1 and r6.pop() > 0


def test_lloyd_step_separable_clusters(spark):
    # two tight blobs labelled correctly: nobody moves, inertia small
    vecs = [[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]]
    labels = [0, 0, 1, 1]
    out = {r.new_label: r for r in linalg.lloyd_step(_embs(spark, vecs, labels)).collect()}
    assert set(out) == {0, 1}
    assert out[0].n_points == 2 and out[1].n_points == 2
    # per-blob inertia: 2 * (0.05^2)*2dims? — blob spread 0.1 on one axis:
    # centroid at 0.05 ⇒ each point d2 = 0.05^2 = 0.0025 ⇒ fp8 = 250000
    assert out[0].inertia_fp8 == 2 * 250_000


def test_lloyd_step_reassigns_mislabelled_point(spark):
    # one far outlier labelled into blob 0 still lands with blob 1
    vecs = [[0.0, 0.0], [0.2, 0.0], [5.0, 5.0], [5.2, 5.0], [4.9, 5.1]]
    labels = [0, 0, 1, 1, 0]  # last point mislabelled
    out = {r.new_label: r for r in linalg.lloyd_step(_embs(spark, vecs, labels)).collect()}
    assert out[1].n_points == 3 and out[0].n_points == 2


def test_char_entropy_skips_empty_docs(spark):
    d = _docs(spark, [(1, "a", ""), (2, "a", "xy")])
    out = corpus_stats.char_entropy(d).collect()
    assert [r.doc_id for r in out] == [2]


def test_zipf_slope_excludes_single_term_vocab(spark):
    d = _docs(spark, [(1, "solo", "w w w w"), (2, "multi", "a a b")])
    rows = {r.source: r for r in corpus_stats.zipf_slope(d).collect()}
    assert "solo" not in rows and "multi" in rows


def test_gram_skips_null_vectors(spark):
    rows = [(0, [1.0, 2.0], 0), (1, None, 0), (2, [0.5, -1.0], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    g = {(r.i, r.j): r.g for r in linalg.gram_fixed_point(df, scale=100).collect()}
    import numpy as np

    m = np.array([[1.0, 2.0], [0.5, -1.0]])
    want = sum(np.floor(np.outer(r, r) * 100).astype(int) for r in m)
    assert g[(0, 0)] == want[0][0] and g[(1, 0)] == want[1][0]
