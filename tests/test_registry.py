"""Registry self-checks: every oracle parses in DuckDB and projects the
same column names as the Spark side (the driver's compare hashes by
column name — a rename typo fails the gate even with correct values)."""

from __future__ import annotations

import duckdb
import pytest

from data_integration_and_visualization_uc3m_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_registry_nonempty_and_named():
    assert len(REGISTRY) >= 50
    assert all(q.name == name for name, q in REGISTRY.items())


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_columns_match_spark(name, spark, duck):
    from pyspark.sql.types import ArrayType, MapType

    q = REGISTRY[name]
    sdf = q.fn(spark, SF)
    # No registered query may emit a TOP-LEVEL array/map column: the
    # driver's canonicalizer sorts result rows via pandas and crashes on
    # numpy arrays (r9 red: feature_hash_embeddings, "unhashable type:
    # numpy.ndarray"). Stringify (concat_ws) or explode instead; keep
    # array-returning operators internal.
    bad = [
        f.name for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]
    assert not bad, (
        f"{name}: top-level array/map columns {bad} are un-hashable by "
        "the driver's pandas canonicalizer — stringify or explode"
    )
    if q.oracle is None:
        assert sdf.columns  # rows-only entries still have a schema
        return
    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(duck_cols), (
        f"{name}: spark={sorted(sdf.columns)} oracle={sorted(duck_cols)}"
    )


def test_no_oracle_emits_int128_columns(duck):
    """Bind-only type guard (r11 red class): DuckDB promotes uncast
    ``//`` and SUM(BIGINT) results to HUGEINT; the driver hashes the
    oracle-side representation, so an int128 output column hash-
    mismatches Spark's int64 even when every value is equal — and the
    value-comparing parity tool can't see it. Binding (``con.sql``,
    no execution) exposes declared output types for all oracles in
    seconds. Convention: CAST every final-select column to BIGINT."""
    bad = {}
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        if q.oracle is None:
            continue
        rel = duck.sql(q.oracle)
        leaks = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT")
        ]
        if leaks:
            bad[name] = leaks
    assert not bad, f"int128 oracle output columns (CAST to BIGINT): {bad}"


def test_rotation_lists_reference_real_queries():
    # a typo in the rotation bookkeeping would silently waste a slot of
    # the driver's bounded correctness window
    from data_integration_and_visualization_uc3m_spark.queries import (
        _NEW_PARITY_ONLY,
        _PRIOR_VERIFIED,
        _PRIORITY,
        all_queries,
    )

    assert set(_PRIOR_VERIFIED) <= set(REGISTRY)
    assert set(_PRIORITY) <= set(REGISTRY)
    # a typo'd _NEW_PARITY_ONLY name silently loses its front-of-queue
    # slot (the _rotated() filter drops unknown names)
    assert set(_NEW_PARITY_ONLY) <= set(REGISTRY)
    assert not set(_NEW_PARITY_ONLY) & set(_PRIORITY)
    rotated = list(all_queries())
    assert sorted(rotated) == sorted(REGISTRY)  # permutation, no loss
    # the check window leads with priority (which MAY deliberately
    # re-check prior-verified names whose operators changed), then
    # never-verified queries; already-green names fill the tail
    assert rotated[: len(_PRIORITY)] == list(_PRIORITY)
    n_back = len(_PRIOR_VERIFIED - set(_PRIORITY))
    assert all(n in _PRIOR_VERIFIED for n in rotated[-n_back:])
    mid = rotated[len(_PRIORITY):len(rotated) - n_back]
    assert not set(mid) & _PRIOR_VERIFIED  # unverified block is pure
