"""Round-5 extension operators: time-series resample/ffill, corpus
mixing, length-bucketed batching."""

from pyspark.sql import functions as F

from data_integration_and_visualization_uc3m_spark.operators import (
    mixing,
    packing,
    timeseries,
)


def test_resample_ffill_fills_gaps_and_flags_observed(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5.0),
            (1, "2024-01-01 12:00:00", 7.0),   # same day, aggregates to 12
            (1, "2024-01-04 09:00:00", 3.0),   # two-day gap before this
            (2, "2024-02-10 00:00:00", 1.0),   # single-day span
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = timeseries.resample_ffill_daily(df, "user_id", "ts", "value")
    rows = {
        (r.user_id, str(r.day)): (r.value_ffill, r.is_observed)
        for r in out.collect()
    }
    assert rows == {
        (1, "2024-01-01"): (12.0, True),
        (1, "2024-01-02"): (12.0, False),   # carried forward
        (1, "2024-01-03"): (12.0, False),
        (1, "2024-01-04"): (3.0, True),
        (2, "2024-02-10"): (1.0, True),
    }
    # grid day one is always observed => no NULL fill anywhere
    assert out.filter(F.col("value_ffill").isNull()).count() == 0


def test_mix_plan_scarcest_source_bounds_corpus(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", 10) for i in range(30)]      # s0:15, s1:15
        + [(100 + i, "s2", 10) for i in range(4)],     # s2: 4 (scarce)
        "doc_id long, source string, n_chars long",
    )
    # target 50/25/25: feasible = min(15/.5, 15/.25, 4/.25) = 16
    plan = {
        r.source: r
        for r in mixing.mix_plan(
            docs, {"s0": 0.5, "s1": 0.25, "s2": 0.25}
        ).collect()
    }
    assert plan["s0"].n_target == 8
    assert plan["s1"].n_target == 4
    assert plan["s2"].n_target == 4          # scarce source fully used
    assert plan["s2"].rate == 1.0
    # unknown sources are excluded from the plan entirely
    docs2 = docs.union(
        spark.createDataFrame([(999, "sX", 1)], docs.schema)
    )
    assert "sX" not in {
        r.source
        for r in mixing.mix_plan(
            docs2, {"s0": 0.5, "s1": 0.25, "s2": 0.25}
        ).collect()
    }


def test_mix_apply_deterministic_and_rate_bounded(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", 10) for i in range(200)],
        "doc_id long, source string, n_chars long",
    )
    weights = {"s0": 0.7, "s1": 0.3}
    kept1 = sorted(r.doc_id for r in mixing.mix_apply(docs, weights).collect())
    kept2 = sorted(r.doc_id for r in mixing.mix_apply(docs, weights).collect())
    assert kept1 == kept2                       # reproducible, no RNG state
    per_src = (
        mixing.mix_apply(docs, weights)
        .groupBy("source")
        .count()
        .collect()
    )
    plan = {
        r.source: r.n_target
        for r in mixing.mix_plan(docs, weights).collect()
    }
    for r in per_src:
        # hash sampling is rate-accurate in expectation, not exact-n;
        # sanity-bound it around the planned target
        assert abs(r["count"] - plan[r.source]) <= 0.25 * plan[r.source] + 5


def test_pow2_length_bucket_boundaries(spark):
    df = spark.createDataFrame(
        [(n,) for n in [1, 2, 3, 4, 5, 63, 64, 65, 1000]], "n_tokens long"
    )
    got = {
        r.n_tokens: r.bucket
        for r in df.select(
            "n_tokens", packing.pow2_length_bucket("n_tokens").alias("bucket")
        ).collect()
    }
    assert got == {1: 1, 2: 2, 3: 4, 4: 4, 5: 8, 63: 64, 64: 64, 65: 128, 1000: 1024}


def test_length_bucket_stats_waste_math(spark):
    df = spark.createDataFrame([(3,), (4,), (5,)], "n_tokens long")
    rows = {
        r.bucket: r for r in packing.length_bucket_stats(df).collect()
    }
    # bucket 4: docs {3,4} -> pad 1+0 = 1, capacity 8
    assert rows[4].n_docs == 2
    assert rows[4].total_tokens == 7
    assert rows[4].pad_tokens == 1
    assert rows[4].waste_frac == 1 / 8
    # bucket 8: doc {5} -> pad 3 of 8
    assert rows[8].pad_tokens == 3
    assert rows[8].waste_frac == 3 / 8


def test_mix_plan_rejects_degenerate_weights(spark):
    import pytest

    docs = spark.createDataFrame(
        [(1, "s0", 1)], "doc_id long, source string, n_chars long"
    )
    with pytest.raises(ValueError, match="at least one source"):
        mixing.mix_plan(docs, {})
    with pytest.raises(ValueError, match="must be > 0"):
        mixing.mix_plan(docs, {"s0": 0.0})
    with pytest.raises(ValueError, match="must be > 0"):
        mixing.mix_plan(docs, {"s0": -0.5})


def test_pow2_length_bucket_invariant_exhaustive(spark):
    # bucket is the SMALLEST power of two >= n: bucket/2 < n <= bucket
    # (n=1 -> 1). Checked for every n in [1, 4200] in one job.
    df = spark.range(1, 4201).withColumnRenamed("id", "n_tokens")
    bad = (
        df.select("n_tokens", packing.pow2_length_bucket("n_tokens").alias("b"))
        .filter(
            ~(
                (F.col("b") >= F.col("n_tokens"))
                & ((F.col("b") == 1) | (F.col("b") / 2 < F.col("n_tokens")))
                & (F.log2("b") == F.floor(F.log2("b")))
            )
        )
        .count()
    )
    assert bad == 0


# ---------------------------------------------------------- ewma lag chain


def test_ewma_lag_chain_exact_values(spark):
    from data_integration_and_visualization_uc3m_spark.operators import timeseries

    rows = [("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 40.0)]
    df = spark.createDataFrame(rows, "key string, t int, v double")
    out = {
        r.t: (r.ewma, r.n_obs)
        for r in timeseries.ewma_lag_chain(df, "key", "t", "v", span=3).collect()
    }
    assert out[1] == (10.0, 1)
    assert out[2] == ((20.0 + 10.0 * 0.5) / 1.5, 2)
    assert out[3] == ((40.0 + 20.0 * 0.5 + 10.0 * 0.25) / 1.75, 3)


def test_ewma_lag_chain_resets_per_key(spark):
    from data_integration_and_visualization_uc3m_spark.operators import timeseries

    rows = [("a", 1, 5.0), ("a", 2, 5.0), ("b", 1, 7.0)]
    df = spark.createDataFrame(rows, "key string, t int, v double")
    out = {
        (r.key, r.t): (r.ewma, r.n_obs)
        for r in timeseries.ewma_lag_chain(df, "key", "t", "v", span=4).collect()
    }
    assert out[("b", 1)] == (7.0, 1)  # no bleed from key a
    assert out[("a", 2)] == (5.0, 2)  # constant series stays constant


# ------------------------------------------------- exact-moment statistics


def test_nation_corr_perfectly_linear_is_one(spark, tmp_path):
    """y = 2x exactly -> corr_fp6 == 1_000_000 for the synthetic nation."""
    import pyspark.sql.functions as F
    from data_integration_and_visualization_uc3m_spark import queries as Q

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, 1, float(i + 1), float(2 * (i + 1))) for i in range(10)],
        "l_orderkey long, l_suppkey long, l_quantity double, l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 7)], "s_suppkey long, s_nationkey int"
    ).write.parquet(f"{sf}/supplier.parquet")
    spark.createDataFrame(
        [(7, "LINEARIA")], "n_nationkey int, n_name string"
    ).write.parquet(f"{sf}/nation.parquet")
    out = Q.REGISTRY["nation_price_qty_corr"].fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0].n_lines == 10
    assert out[0].corr_fp6 == 1_000_000


def test_spearman_monotone_invariance(spark, tmp_path):
    """Spearman is rank-based: y = x^3 (monotone but wildly nonlinear)
    gives exactly rho = 1, where Pearson on the same data falls well
    below 1 — the property that motivates the robust sibling."""
    from data_integration_and_visualization_uc3m_spark import queries as Q

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, 1, float(i + 1), float((i + 1) ** 3)) for i in range(10)],
        "l_orderkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double",
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 7)], "s_suppkey long, s_nationkey int"
    ).write.parquet(f"{sf}/supplier.parquet")
    spark.createDataFrame(
        [(7, "CUBICA")], "n_nationkey int, n_name string"
    ).write.parquet(f"{sf}/nation.parquet")
    rho = Q.REGISTRY["spearman_price_qty_by_nation"].fn(spark, sf).collect()
    assert len(rho) == 1 and rho[0].spearman_fp6 == 1_000_000
    pearson = Q.REGISTRY["nation_price_qty_corr"].fn(spark, sf).collect()
    assert pearson[0].corr_fp6 < 1_000_000


def test_nation_trend_exact_slope(spark, tmp_path):
    """Revenue rises exactly 100.00/customer-year -> slope 10000 cents."""
    from data_integration_and_visualization_uc3m_spark import queries as Q

    sf = str(tmp_path)
    rows = [
        (y * 10 + 1, 1, f"{1000 + 100 * (y - 2018)}.00", f"{y}-06-01 00:00:00")
        for y in (2018, 2019, 2020, 2021)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice string, o_orderdate string"
    ).selectExpr(
        "o_orderkey", "o_custkey",
        "CAST(o_totalprice AS DOUBLE) AS o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(1, 3)], "c_custkey long, c_nationkey int"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(3, "TRENDLAND")], "n_nationkey int, n_name string"
    ).write.parquet(f"{sf}/nation.parquet")
    out = Q.REGISTRY["nation_revenue_trend"].fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0].n_years == 4
    assert out[0].slope_cents_per_year == 10_000


def test_gini_equal_values_is_zero(spark, tmp_path):
    from data_integration_and_visualization_uc3m_spark import queries as Q

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, 1, 100.0, "2020-01-01 00:00:00") for i in range(8)],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(1, 3)], "c_custkey long, c_nationkey int"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(3, "EQUALIA")], "n_nationkey int, n_name string"
    ).write.parquet(f"{sf}/nation.parquet")
    out = Q.REGISTRY["revenue_gini_by_nation"].fn(spark, sf).collect()
    assert len(out) == 1 and out[0].gini_fp6 == 0


def test_chisq_cells_zero_under_independence(spark, tmp_path):
    from data_integration_and_visualization_uc3m_spark import queries as Q

    sf = str(tmp_path)
    # perfectly independent 2x2 layout: every (lang, source) cell = 5
    rows = [
        (100 * li + 10 * si + k, "t", lang, src, 1)
        for li, lang in enumerate(["en", "de"])
        for si, src in enumerate(["a", "b"])
        for k in range(5)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    out = Q.REGISTRY["lang_source_chisq_cells"].fn(spark, sf).collect()
    assert len(out) == 4
    for r in out:
        assert r.n_obs == 5 and r.expected == 5.0 and r.chisq_contribution == 0.0


def test_quantile_align_single_source_ratio_one(spark, tmp_path):
    from data_integration_and_visualization_uc3m_spark import queries as Q

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, "t", "en", "only", 10 * (i + 1)) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    out = Q.REGISTRY["quality_quantile_align"].fn(spark, sf).collect()
    assert len(out) == 9  # 9 deciles, one source
    for r in out:
        assert r.source_q == r.global_q and r.align_ratio == 1.0


def test_holt_linear_hand_computed(spark):
    from data_integration_and_visualization_uc3m_spark.operators import timeseries

    # y = 10, 14, 18 with alpha=0.5, beta=0.25:
    # t1: L=10, T=0
    # t2: L=.5*14+.5*10=12,   T=.25*2+0=0.5
    # t3: L=.5*18+.5*12.5=15.25, T=.25*3.25+.75*.5=1.1875
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 14.0), ("a", 3, 18.0)],
        "k string, t int, y double",
    )
    row = timeseries.holt_linear_pandas(
        df, "k", "t", "y", alpha=0.5, beta=0.25, horizon=2
    ).collect()[0]
    assert row.n_obs == 3
    assert row.level_fp6 == 15_250_000
    assert row.trend_fp6 == 1_187_500
    assert row.forecast_fp6 == int((15.25 + 2 * 1.1875) * 1e6)


def test_holt_linear_single_obs_and_partitioning(spark):
    from data_integration_and_visualization_uc3m_spark.operators import timeseries

    # one row per (key, t) — the operator's input contract
    rows = [("g%d" % g, t, float((g * 7 + t * 3) % 11)) for g in range(3) for t in range(15)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    a = sorted(map(tuple, timeseries.holt_linear_pandas(df.coalesce(1), "k", "t", "y").collect()))
    b = sorted(map(tuple, timeseries.holt_linear_pandas(df.repartition(6), "k", "t", "y").collect()))
    assert a == b
    single = spark.createDataFrame([("s", 1, 4.0)], "k string, t int, y double")
    r = timeseries.holt_linear_pandas(single, "k", "t", "y").collect()[0]
    assert (r.n_obs, r.level_fp6, r.trend_fp6) == (1, 4_000_000, 0)


def test_mannwhitney_dominance_and_ties(spark, tmp_path):
    """Known answers: an arm fully above the baseline gives U1 = n1*n2
    and rank-biserial +1; an identical arm gives U1 = n1*n2/2 and 0."""
    from data_integration_and_visualization_uc3m_spark import queries as Q

    sf = str(tmp_path)
    rows = (
        [(i, "2020-01-01 00:00:00", 1, "view", float(v), "{}")
         for i, v in enumerate([1.0, 2.0, 3.0])]
        + [(10 + i, "2020-01-01 00:00:00", 1, "click", float(v), "{}")
           for i, v in enumerate([4.0, 5.0, 6.0])]      # dominates
        + [(20 + i, "2020-01-01 00:00:00", 1, "error", float(v), "{}")
           for i, v in enumerate([1.0, 2.0, 3.0])]      # identical
    )
    spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "cast(ts as timestamp) ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.event_type: r
        for r in Q.REGISTRY["mannwhitney_value_by_event_type"].fn(
            spark, sf
        ).collect()
    }
    click = got["click"]
    assert (click.n1, click.n2) == (3, 3)
    assert click.u1_x2 == 2 * 9 and click.rank_biserial == 1.0
    error = got["error"]  # identical distributions, all ties
    assert error.u1_x2 == 9  # 2*U1 = n1*n2 -> U1 = 4.5
    assert error.rank_biserial == 0.0


def test_wilcoxon_signed_rank_known_answers(spark, tmp_path):
    """Hand-checked: one user where purchase dominates (d=+8), one
    where view dominates (|d|=18), one exact tie (excluded), one
    unpaired user (excluded)."""
    from data_integration_and_visualization_uc3m_spark import queries as Q

    sf = str(tmp_path)
    rows = [
        (1, 1, "view", 1.0), (2, 1, "view", 1.0), (3, 1, "purchase", 5.0),
        (4, 2, "view", 10.0), (5, 2, "purchase", 1.0),
        (6, 2, "purchase", 1.0),
        (7, 3, "view", 2.0), (8, 3, "purchase", 2.0),
        (9, 4, "view", 9.0),
    ]
    spark.createDataFrame(
        [(i, "2020-01-01 00:00:00", u, t, v, "{}") for i, u, t, v in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "cast(ts as timestamp) ts", "user_id", "event_type",
        "value", "props",
    ).write.parquet(f"{sf}/events.parquet")
    out = Q.REGISTRY["wilcoxon_signed_rank_purchase_vs_view"].fn(
        spark, sf
    ).collect()
    assert len(out) == 1
    r = out[0]
    # d1 = 5*2 - 2*1 = +8 (rank 1, dr 2); d2 = 2*1 - 10*2 = -18 (rank 2,
    # dr 4); tie and unpaired users drop out
    assert (r.n_pairs, r.w_plus_x2, r.w_minus_x2) == (2, 2, 4)
    assert abs(r.signed_rank_effect - (2 - 4) / 6) < 1e-15
