"""Property-based spot checks (SURVEY §5.5) — driven through Spark on
small generated batches (hypothesis generates, one Spark job verifies
per property)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from data_integration_and_visualization_uc3m_spark.operators import cleaning, upsert

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=30
)


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_normalize_idempotent_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    once = [r.n for r in df.select(cleaning.normalize_string("v").alias("n")).collect()]
    twice = [
        r.n
        for r in df.select(
            cleaning.normalize_string(cleaning.normalize_string("v")).alias("n")
        ).collect()
    ]
    assert once == twice


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_coercion_never_throws_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    out = df.select(cleaning.coerce_numeric("v").alias("n")).collect()
    assert len(out) == len(values)  # null-on-garbage, never an exception


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=20
    )
)
def test_upsert_output_keys_unique_property(spark, rows):
    df = spark.createDataFrame(rows, "k int, v int")
    target = spark.createDataFrame([(0, -1)], "k int, v int")
    out = upsert.upsert_ignore(target, df, keys=["k"], order_by=["v"])
    keys = [r.k for r in out.collect()]
    assert len(keys) == len(set(keys))
