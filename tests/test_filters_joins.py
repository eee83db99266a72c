"""F1-F8 predicates and J1-J4 joins — incl. the fallback-to-input corner
(FIXTURES §F6.4) and cardinality validation (§F3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_and_visualization_uc3m_spark.operators import cleaning, filters, joins


def test_valid_code_length_iso3(spark):
    df = spark.createDataFrame(
        [("ESP",), ("ES",), ("",), (None,), ("EU27",)], "code string"
    )
    got = [r.code for r in df.filter(filters.valid_code_length("code", 3)).collect()]
    assert got == ["ESP"]


def test_anti_join_exclude_data_driven(spark):
    rows = spark.createDataFrame([("ESP",), ("WLD",), ("EUU",)], "countryiso3code string")
    excl = spark.createDataFrame([("WLD",), ("EUU",)], "countryiso3code string")
    got = filters.anti_join_exclude(rows, excl, "countryiso3code").collect()
    assert [r.countryiso3code for r in got] == ["ESP"]


def test_non_null_nested(spark):
    df = spark.createDataFrame(
        [((None, None), 1), (("id", "val"), 2), (None, 3)],
        "country struct<id:string,value:string>, n int",
    )
    got = df.filter(filters.non_null_nested("country", "value")).collect()
    assert [r.n for r in got] == [2]


def test_conjunctive_slice(spark):
    df = spark.createDataFrame(
        [("Total", 2019, 5.0), ("Total", 2017, 5.0), ("Theft", 2019, 5.0)],
        "cat string, yr int, v double",
    )
    out = filters.conjunctive_slice(
        df, [F.col("cat") == "Total", F.col("yr") >= 2018, F.col("v") > 0]
    )
    assert out.count() == 1


def test_lookup_join_fallback_unmatched_passes_through(spark):
    # FIXTURES §F6.4: unknown alias must keep its input, not become null
    df = spark.createDataFrame([(" España ",), ("Narnia",)], "name string")
    lookup = spark.createDataFrame([("españa", "spain")], "alias string, canonical string")
    out = joins.lookup_join_with_fallback(
        df, lookup, cleaning.normalize_string("name"), "canonical"
    )
    got = {r.name: r.canonical for r in out.collect()}
    assert got[" España "] == "spain"
    assert got["Narnia"] == "narnia"  # fallback = normalized input


def test_validated_join_raises_on_duplicate_dim(spark):
    fact = spark.createDataFrame([("ESP", 2019, 10.0)], "k string, y int, v double")
    dim = spark.createDataFrame(
        [("ESP", 2019, 100), ("ESP", 2019, 200)], "k string, y int, pop long"
    )
    with pytest.raises(joins.CardinalityViolation):
        joins.validated_join(fact, dim, on=["k", "y"])


def test_validated_join_inner_semifilters(spark):
    fact = spark.createDataFrame(
        [("ESP", 2019, 1.0), ("XXX", 2019, 2.0)], "k string, y int, v double"
    )
    dim = spark.createDataFrame([("ESP", 2019, 100)], "k string, y int, pop long")
    out = joins.validated_join(fact, dim, on=["k", "y"])
    assert [r.k for r in out.collect()] == ["ESP"]


def test_asof_join_latest_prior_and_ties(spark):
    clicks = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 25), (3, 200, 5)], "event_id long, user_id long, ts long"
    )
    purchases = spark.createDataFrame(
        [(100, 8), (100, 20), (100, 25), (200, 9)], "user_id long, ts long"
    )
    out = joins.asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["ts"]
    )
    got = {r.event_id: r.asof_ts for r in out.collect()}
    # click@10 → purchase@8; click@25 → purchase@25 (<= tie included);
    # click@5 → no prior purchase → null
    assert got == {1: 8, 2: 25, 3: None}


def test_semi_and_anti_join(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    keys = spark.createDataFrame([(2,), (3,)], "k int")
    assert sorted(r.k for r in joins.semi_join(df, keys, ["k"]).collect()) == [2, 3]
    assert [r.k for r in joins.anti_join(df, keys, ["k"]).collect()] == [1]
