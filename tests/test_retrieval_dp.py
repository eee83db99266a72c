"""Semantic tests for the round-9 additions: the retrieval ranking-
metric harness (recall/MRR/MAP/nDCG over an int8 ANN arm) and the
seeded differential-privacy release (quantized-Laplace mechanism with
contribution bounding). Oracle parity proves cross-engine equality;
these pin the METRIC SEMANTICS themselves."""

from __future__ import annotations

import pytest

from data_integration_and_visualization_uc3m_spark.queries import (
    _DCG_W,
    _DP_CAP_CENTS,
    _DP_EPS,
    _IDCG,
    _dp_noise_rows,
    dp_nation_order_stats,
    retrieval_ranking_metrics,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def metrics(spark):
    return {r["qid"]: r.asDict()
            for r in retrieval_ranking_metrics(spark, SF).collect()}


def test_metric_bounds(metrics):
    assert metrics  # at least one nonzero-norm query vector
    for m in metrics.values():
        assert 0 <= m["n_hits"] <= 10
        assert m["recall_micro"] == m["n_hits"] * 100000
        assert 0 <= m["mrr_micro"] <= 1_000_000
        assert 0 <= m["ap_micro"] <= 1_000_000
        assert 0 <= m["ndcg_micro"] <= 1_000_000
        # rank_first=0 encodes "no hit"; otherwise 1/rank_first in micro
        if m["rank_first"] == 0:
            assert m["n_hits"] == 0 and m["mrr_micro"] == 0
        else:
            assert m["mrr_micro"] == 1_000_000 // m["rank_first"]


def test_perfect_agreement_implies_perfect_metrics(metrics):
    # whenever the int8 arm reproduces the full truth set, every
    # metric must sit at its maximum (AP floor-rounding loses <10 micro)
    for m in metrics.values():
        if m["n_hits"] == 10 and m["rank_first"] == 1:
            assert m["recall_micro"] == 1_000_000
            assert m["mrr_micro"] == 1_000_000
            if m["ndcg_micro"] == 1_000_000:
                assert m["ap_micro"] >= 999_990


def test_dcg_weight_table_shape():
    assert len(_DCG_W) == 10
    assert _DCG_W[0] == 1_000_000  # 1/log2(2)
    assert _DCG_W == sorted(_DCG_W, reverse=True)  # discount decreases
    assert _IDCG == sum(_DCG_W)


def test_dp_noise_table_is_symmetric_laplace():
    rows = _dp_noise_rows()
    assert len(rows) == len(_DP_EPS) * 256
    by_eps = {}
    for label, b, nc, ns in rows:
        by_eps.setdefault(label, {})[b] = (nc, ns)
    for label, eps in _DP_EPS:
        t = by_eps[label]
        # quantile function is monotone nondecreasing in the bucket
        ncs = [t[b][0] for b in range(256)]
        assert ncs == sorted(ncs)
        # mid-bucket symmetry: Q(u) = -Q(1-u)
        for b in range(256):
            assert t[b][0] == -t[255 - b][0]
            assert t[b][1] == -t[255 - b][1]
        # lower epsilon => wider noise (tail quantile magnitude)
    wide = max(abs(v[0]) for v in by_eps["eps_0_5"].values())
    narrow = max(abs(v[0]) for v in by_eps["eps_2_0"].values())
    assert wide > narrow


def test_dp_release_reproducible_and_bounded(spark):
    a = {(r["nation_name"], r["eps_label"]): r.asDict()
         for r in dp_nation_order_stats(spark, SF).collect()}
    b = {(r["nation_name"], r["eps_label"]): r.asDict()
         for r in dp_nation_order_stats(spark, SF).collect()}
    assert a == b  # seeded: identical across invocations
    assert len(a) > 0 and len(a) % len(_DP_EPS) == 0
    max_nc = max(abs(nc) for _, _, nc, _ in _dp_noise_rows())
    max_ns = max(abs(ns) for _, _, _, ns in _dp_noise_rows())
    for m in a.values():
        assert abs(m["dp_n_orders"] - m["n_orders"]) <= max_nc
        assert abs(m["dp_revenue_cents"] - m["revenue_cents"]) <= max_ns
        # contribution bound: clamped revenue can't exceed cap * count
        assert m["revenue_cents"] <= _DP_CAP_CENTS * m["n_orders"]


def test_ranking_metrics_plan_uses_window_group_limit(spark):
    """Scale-shape pin: the per-query top-k must compile to
    WindowGroupLimit (partial per-partition top-k BEFORE the qid
    shuffle) — if a refactor degrades it to a full window sort, this
    catches the regression before it costs anything at scale."""
    df = retrieval_ranking_metrics(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
