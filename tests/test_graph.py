"""operators.graph — fixed-point PageRank."""

from data_integration_and_visualization_uc3m_spark.operators import graph


def _reference_pagerank(edges, iterations, damping_pct=85):
    """Plain-Python-int mirror of the operator (exact arithmetic)."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    ow = {}
    for s, _, w in edges:
        ow[s] = ow.get(s, 0) + w
    n = len(nodes)
    init = graph.SCALE // n
    base = (100 - damping_pct) * init // 100
    r = {u: init for u in nodes}
    for _ in range(iterations):
        contrib = {u: 0 for u in nodes}
        for s, d, w in edges:
            contrib[d] += (r[s] * w) // ow[s]
        r = {u: base + (damping_pct * contrib[u]) // 100 for u in nodes}
    return r


def test_pagerank_symmetric_two_cycle_is_stationary(spark):
    e = spark.createDataFrame([(1, 2, 1), (2, 1, 1)], "src long, dst long, w long")
    got = {r.node: r.rank_fp for r in graph.pagerank_fixed_point(e, iterations=5).collect()}
    # the uniform distribution is the exact fixed point here
    assert got == {1: graph.SCALE // 2, 2: graph.SCALE // 2}


def test_pagerank_matches_integer_reference(spark):
    edges = [
        (1, 2, 3), (1, 3, 1),      # 1 splits mass 3:1
        (2, 3, 1),                 # chain into 3
        (3, 1, 2),                 # cycle back
        (4, 3, 5),                 # 4 is a source (gets base only)
    ]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    for iters in (1, 2, 7):
        got = {
            r.node: r.rank_fp
            for r in graph.pagerank_fixed_point(e, iterations=iters).collect()
        }
        assert got == _reference_pagerank(edges, iters), f"iterations={iters}"


def test_pagerank_weighted_split_respects_weights(spark):
    # 1 -> 2 with w=9 and 1 -> 3 with w=1: node 2 receives 9x node 3's
    # contribution share
    e = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1)], "src long, dst long, w long"
    )
    got = {r.node: r.rank_fp for r in graph.pagerank_fixed_point(e, iterations=1).collect()}
    init = graph.SCALE // 3
    base = 15 * init // 100
    assert got[2] == base + 85 * ((init * 9) // 10) // 100
    assert got[3] == base + 85 * ((init * 1) // 10) // 100
    assert got[1] == base


def test_pagerank_empty_edges_returns_empty(spark):
    e = spark.createDataFrame([], "src long, dst long, w long")
    out = graph.pagerank_fixed_point(e, iterations=3)
    assert out.columns == ["node", "rank_fp"]
    assert out.count() == 0


def test_pagerank_rejects_zero_iterations(spark):
    import pytest

    e = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="iterations"):
        graph.pagerank_fixed_point(e, iterations=0)


# ---------------------------------------------------------------- triangles


def test_triangle_counts_k4(spark):
    # K4: every node sits in C(3,2)=3 triangles
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in graph.triangle_counts(e).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_square_has_none(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    assert graph.triangle_counts(e).count() == 0


def test_triangle_counts_direction_and_duplicates_invariant(spark):
    # one triangle 1-2-3 plus a pendant edge; edges arrive in both
    # directions, duplicated, and with a self-loop — all must collapse
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3), (3, 3), (3, 4)],
        "src long, dst long",
    )
    got = {r.node: r.n_triangles for r in graph.triangle_counts(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_k_core_fixed_rounds_peels_cascade(spark):
    from pyspark.sql import functions as F

    from data_integration_and_visualization_uc3m_spark.operators import graph

    # triangle 1-2-3 (2-core) + pendant chain 3-4, 4-5 (peels in cascade)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "lo long, hi long"
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    got = {r.node: r.deg for r in graph.k_core_fixed_rounds(edges, k=2, rounds=4).collect()}
    # 5 peels (deg 1) → 4 drops to deg 1 → peels → triangle survives
    assert got == {1: 2, 2: 2, 3: 2}
    # checkpoint hygiene: only the final round's checkpoint may linger
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, f"leaked {after - before} persistent RDDs"


def test_label_propagation_two_triangles_bridge(spark):
    """Two weighted triangles joined by one weak bridge: each triangle
    converges to its own min label; the bridge does not flip labels."""
    from data_integration_and_visualization_uc3m_spark.operators import graph

    edges = [
        (1, 2, 10), (2, 3, 10), (1, 3, 10),      # triangle A
        (4, 5, 10), (5, 6, 10), (4, 6, 10),      # triangle B
        (3, 4, 1),                               # weak bridge
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {
        r["node"]: r["label"]
        for r in graph.label_propagation_rounds(df, rounds=3).collect()
    }
    assert out[1] == out[2] == out[3]
    assert out[4] == out[5] == out[6]
    assert out[1] != out[4]


def test_label_propagation_tiebreak_min_label(spark):
    """Equal-weight neighbor labels: the smallest label wins."""
    from data_integration_and_visualization_uc3m_spark.operators import graph

    # node 3 sees labels 1 and 2 with equal weight after round 1 start
    edges = [(1, 3, 5), (2, 3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {
        r["node"]: r["label"]
        for r in graph.label_propagation_rounds(df, rounds=1).collect()
    }
    assert out[3] == 1  # min of {1, 2}
    # leaves adopt their only neighbor's initial label
    assert out[1] == 3 and out[2] == 3


def test_modularity_two_triangles(spark):
    """Perfect 2-community split on two disconnected triangles:
    contributions are equal and positive; sum T^2*Q = 2*(T*W_c - d_c^2)
    with T=12, W_c=6, d_c=6 -> contrib 36 each, Q = 72/144 = 0.5."""
    from data_integration_and_visualization_uc3m_spark.operators import graph

    edges = [(1, 2, 1), (2, 3, 1), (1, 3, 1),
             (4, 5, 1), (5, 6, 1), (4, 6, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    labels = graph.label_propagation_rounds(df, rounds=3)
    out = {r["label"]: r for r in
           graph.community_modularity_terms(df, labels).collect()}
    assert len(out) == 2
    for r in out.values():
        assert (r["w_in"], r["degree"], r["contrib_scaled"]) == (6, 6, 36)


def test_modularity_single_community_is_zero(spark):
    """Everything in one community: Q = W/T - (d/T)^2 = 1 - 1 = 0."""
    from data_integration_and_visualization_uc3m_spark.operators import graph

    edges = [(1, 2, 3), (2, 3, 1), (1, 3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    labels = df.sparkSession.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "node long, label long"
    )
    out = graph.community_modularity_terms(df, labels).collect()
    assert len(out) == 1 and out[0]["contrib_scaled"] == 0


def test_lpa_shared_relation_stays_staged(spark):
    """Regression pin for the r12 no-op-persist bug: label propagation
    persisted its symmetrized edge relation and unpersisted it BEFORE
    the returned lazy plan executed, so every reference re-derived the
    whole upstream pipeline (42 fact scans in the modularity query's
    plan). With the localCheckpoint fix, a consumer referencing both
    the LPA labels and the raw edges must carry at most the caller's
    own scans — the iterative subtree reads a pinned RDD, visible as
    Scan ExistingRDD and the ABSENCE of repeated source scans."""
    import io
    import re
    from contextlib import redirect_stdout

    from data_integration_and_visualization_uc3m_spark.operators import graph
    from pyspark.sql import functions as F

    from data_integration_and_visualization_uc3m_spark.queries import REGISTRY

    df = REGISTRY["trade_community_modularity"].fn(
        spark, "/root/testdata/sf0.001"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    # the staged edges + und checkpoints mean the four-table fact
    # pipeline runs ONCE: its parquet scans must not appear in the
    # final plan at all (everything downstream reads pinned RDDs).
    # The no-op-persist regression showed 42 scans PER TABLE here.
    for t in ("lineitem", "orders", "customer", "supplier"):
        n = len(re.findall(rf"\(\d+\) Scan parquet[\s\S]{{0,400}}?{t}\.parquet",
                           plan))
        assert n <= 1, f"{t}: {n} parquet scans in modularity plan"
    # result sanity on a tiny literal graph: every touched node gets a
    # label drawn from the node universe (synchronous LPA can
    # oscillate on a 2-cycle — 3<->4 here — so community COUNT is not
    # a stable invariant; determinism and domain are)
    edges = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 3), (2, 0, 2), (3, 4, 7)],
        "src long, dst long, w long",
    )
    labels = graph.label_propagation_rounds(edges, rounds=2)
    rows = {(r.node, r.label) for r in labels.collect()}
    assert {n for n, _ in rows} == {0, 1, 2, 3, 4}
    assert {l for _, l in rows} <= {0, 1, 2, 3, 4}
    rows2 = {(r.node, r.label)
             for r in graph.label_propagation_rounds(edges, rounds=2)
             .collect()}
    assert rows == rows2  # deterministic under re-run
