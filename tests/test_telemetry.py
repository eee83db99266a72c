"""Observed-metrics telemetry (operators/telemetry.py): quality
counters collected during the load action itself — no second scan."""

import pyspark.sql.functions as F

from data_integration_and_visualization_uc3m_spark.operators import telemetry, validate


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "ESP", 47.5),
            (2, None, -3.0),
            (3, "FRA", 250.0),
            (4, "DEU", None),
            (5, None, 10.0),
        ],
        "id long, code string, rate double",
    )


def test_load_with_metrics_counts_match_validate_ops(spark, tmp_path):
    """The observed counters equal the dedicated V1/V4 violation
    relations computed the slow way — same numbers, one scan."""
    df = _frame(spark)
    path = str(tmp_path / "out")
    got = telemetry.load_with_metrics(
        df,
        path,
        not_null_cols=["code", "rate"],
        range_checks={"rate": (0.0, 100.0)},
    )
    assert got["n_rows"] == 5
    assert (
        got["n_null_code"]
        == validate.not_null_violations(df, ["code"]).count()
    )
    assert got["n_null_rate"] == 1
    # range breach counts nulls as breaches (documented): -3, 250, null
    assert got["n_out_of_range_rate"] == 3
    # and the write really happened, with all rows
    assert spark.read.parquet(path).count() == 5


def test_observe_placement_semantics(spark):
    """Metrics see exactly the rows flowing through the observe node:
    upstream filters excluded, downstream filters don't shrink them."""
    df = _frame(spark).filter(F.col("id") != 1)  # upstream of observe
    instrumented, obs = telemetry.observed_quality(df, ["code"])
    out = instrumented.filter(F.col("rate") > 0)  # downstream
    assert out.count() == 2  # (3, FRA, 250), (5, None, 10)
    metrics = dict(obs.get)
    assert metrics["n_rows"] == 4  # id=1 excluded, downstream filter not
    assert metrics["n_null_code"] == 2


def test_observed_quality_is_plan_transparent(spark):
    df = _frame(spark)
    instrumented, _ = telemetry.observed_quality(df, ["code"])
    assert instrumented.schema == df.schema
    assert sorted(map(tuple, instrumented.collect())) == sorted(
        map(tuple, df.collect())
    )
