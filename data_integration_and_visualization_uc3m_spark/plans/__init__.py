"""End-to-end pipeline plans (the reference's ETL re-expressed as one
lazy DataFrame DAG — SURVEY.md §3)."""
