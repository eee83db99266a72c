"""Egress edges (SURVEY.md §2.2): parquet warehouse snapshots, CSV for
the viz layer, JDBC relational sink config."""
