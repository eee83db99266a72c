"""Bucketed warehouse tables → co-located (shuffle-free) joins.

The 100 TB story for repeated fact-fact joins: bucket both tables on
the join key at write time; subsequent joins read co-located buckets
and skip the shuffle entirely. This test proves the property from the
physical plan (no Exchange on either join side)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from data_integration_and_visualization_uc3m_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Warehouse layout rule: partition by the query-pruning key so
    reads skip irrelevant files (K6 scale note). Proven from the plan:
    the lang filter lands in PartitionFilters, not the row scan."""
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").parquet(out)
    pruned = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:1500]
    n_en = docs.filter(F.col("lang") == "en").count()
    assert pruned.count() == n_en


def test_bucketed_join_has_no_shuffle(spark):
    suffix = uuid.uuid4().hex[:8]
    t_line, t_ord = f"b_lineitem_{suffix}", f"b_orders_{suffix}"
    l = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    try:
        (
            l.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(t_line)
        )
        (
            o.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(t_ord)
        )
        # force sort-merge (the tiny test tables would broadcast, which
        # proves nothing about bucketing) and check NO shuffle exchange
        joined = spark.table(t_line).hint("merge").join(
            spark.table(t_ord),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "hashpartitioning" not in plan, plan[:2000]
        # and the result is still correct
        assert joined.count() == l.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_line}")
        spark.sql(f"DROP TABLE IF EXISTS {t_ord}")
