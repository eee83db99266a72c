"""SCD2 history tracking (MERGE emulation)."""

from __future__ import annotations

from data_integration_and_visualization_uc3m_spark.operators import history as H


def test_scd2_lifecycle(spark):
    snap1 = spark.createDataFrame(
        [("A", 10), ("B", 20), ("C", 30)], "k string, v int"
    )
    hist = H.snapshot_to_scd2(snap1, ["k"], ["v"], version=1)

    # v2: A unchanged, B changed, C deleted, D new
    snap2 = spark.createDataFrame([("A", 10), ("B", 99), ("D", 40)], "k string, v int")
    merged = H.apply_changes(hist, snap2, ["k"], ["v"], version=2)

    rows = {(r.k, r.valid_from, r.valid_to): r.v for r in merged.collect()}
    assert rows == {
        ("A", 1, None): 10,   # untouched, still current
        ("B", 1, 2): 20,      # old version closed at v2
        ("B", 2, None): 99,   # new version open
        ("C", 1, 2): 30,      # deleted → closed, no successor
        ("D", 2, None): 40,   # brand new
    }
    current = {r.k: r.v for r in H.current_view(merged).collect()}
    assert current == {"A": 10, "B": 99, "D": 40}


def test_scd2_idempotent_reapply(spark):
    snap = spark.createDataFrame([("A", 1)], "k string, v int")
    hist = H.snapshot_to_scd2(snap, ["k"], ["v"], version=1)
    again = H.apply_changes(hist, snap, ["k"], ["v"], version=2)
    # same snapshot re-applied ⇒ no new versions, nothing closed
    assert sorted(map(tuple, hist.collect())) == sorted(map(tuple, again.collect()))


def test_table_history_versions_and_counts(spark, tmp_path):
    import os

    from data_integration_and_visualization_uc3m_spark.operators import upsert

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    df1 = spark.createDataFrame([(i, i) for i in range(6)], "k int, v int")
    df2 = spark.createDataFrame([(i, i) for i in range(6, 9)], "k int, v int")
    upsert.write_upsert_parquet(root, df1, ["k"])
    upsert.write_upsert_parquet(root, df2, ["k"])
    upsert.delete_keys_parquet(
        root, spark.createDataFrame([(0,), (7,)], "k int"), ["k"]
    )
    hist = sorted(
        (r.version, r.n_rows)
        for r in upsert.table_history(spark, root).collect()
    )
    assert hist == [(0, 6), (1, 9), (2, 7)]
