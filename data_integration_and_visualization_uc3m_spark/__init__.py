"""data_integration_and_visualization_uc3m_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference project ``filo14/data-integration-and-visualization-uc3m`` (a
pandas → PostgreSQL star-schema ETL with a map-visualization query surface),
re-expressed as idiomatic Spark:

- lazy DataFrame / Spark SQL plans instead of eager pandas
  (reference: ``crime_immigration_etl.py:153-311``),
- broadcast lookup joins instead of per-row dict lookups
  (reference: ``crime_immigration_etl.py:16-34``),
- explicit validation operators (uniqueness, FK integrity, range checks)
  instead of Postgres DDL constraints (reference: ``database/initdb/schema.sql``),
- an anti-join idempotent upsert instead of ``ON CONFLICT DO NOTHING``
  (reference: ``crime_immigration_etl.py:335-368``),
- plus the large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) the 100 TB north star needs.

Layout:
    session     SparkSession factory tuned for scale (AQE, pushdown, Arrow)
    schemas     StructType registry (star schema + testdata tables)
    operators/  transform / join / dedup / validate / similarity / text ops
    sources/    parquet/CSV/XLSX/paginated-API ingest
    sinks/      parquet/CSV/JDBC egress, idempotent upsert sink
    plans/      the reference pipeline re-expressed as one lazy DAG
    streaming/  Structured Streaming over the events table
    queries     the harness-facing query registry (+ DuckDB oracle SQL)
"""

__version__ = "0.1.0"
