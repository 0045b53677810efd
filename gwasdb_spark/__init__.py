"""gwasdb_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query semantics, data model and operator
surface of the reference GWAS summary-statistics warehouse
(MerrimanLab/gwasDB — see SURVEY.md), built Spark-first:

- DataFrame / Spark SQL logical plans, Catalyst optimization, Parquet storage
  partitioned for genome-region pruning (SURVEY.md §1.4, §4).
- The full dplyr/dbplyr/SQL operator inventory (SURVEY.md §2) as a library of
  named, oracle-checked queries (`gwasdb_spark.plans`).
- The reference's ETL lifecycle (SURVEY.md §3 entry-point 2) as a single
  DataFrame DAG (`gwasdb_spark.gwas.ingest`).
- Large-scale training-data-pipeline extensions: dedup, similarity search,
  text analysis, multimodal plumbing, streaming (`operators/`, `streaming/`).
"""

from gwasdb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
