"""GWAS warehouse domain layer: the reference's app/ETL/admin surfaces
re-expressed over a parquet lakehouse (SURVEY.md §3, §7.4-7.6)."""
