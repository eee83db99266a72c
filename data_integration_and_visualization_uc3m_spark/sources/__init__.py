"""Ingest edges (SURVEY.md §2.1): parquet/CSV readers with declared
schemas, the XLSX pandas bridge, the paginated-API scan, and static
table generators."""
