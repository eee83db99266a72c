"""Salted aggregation/join preserve semantics under a hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_visualization_uc3m_spark.operators import skew


def skewed_df(spark):
    # one hot key (90% of rows) + a tail
    rows = [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)]
    return spark.createDataFrame(rows, "k string, v int")


def test_salted_agg_matches_plain(spark):
    df = skewed_df(spark)
    plain = {
        (r.k): (r.s, r.n, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n, r.mx)
        for r in skew.salted_agg(
            df,
            ["k"],
            {
                "s": (F.sum("v"), "sum"),
                "n": (F.count(F.lit(1)), "sum"),
                "mx": (F.max("v"), "max"),
            },
            salt_buckets=7,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    probe = skewed_df(spark)
    build = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "k string, tag string"
    )
    plain = sorted(map(tuple, probe.join(build, "k").collect()))
    salted = sorted(
        map(tuple, skew.salted_join(probe, build, ["k"], salt_buckets=5).collect())
    )
    assert plain == salted


def test_skyline_two_phase_exact(spark):
    from data_integration_and_visualization_uc3m_spark.operators.skyline import skyline

    rows = [
        (1, 10.0, 5), (2, 10.0, 5),   # tied pair — both survive
        (3, 9.0, 6),                  # incomparable with (10,5) — survives
        (4, 9.0, 5),                  # dominated by 3 (and by 1)
        (5, 1.0, 1),                  # dominated by everyone
        (6, 11.0, 1),                 # best acctbal — survives
    ]
    df = spark.createDataFrame(rows, "id long, bal double, n int").repartition(3)
    got = sorted(r.id for r in skyline(df, [("bal", "max"), ("n", "max")]).collect())
    assert got == [1, 2, 3, 6]


def test_key_histogram_orders_heaviest_first(spark):
    got = skew.key_histogram(skewed_df(spark), ["k"], top_n=3).collect()
    assert got[0].k == "hot" and got[0].n_rows == 900
