"""Query-plan library: SURVEY.md §2's operator inventory as named queries.

Every operator the reference uses is re-expressed here as an idiomatic
DataFrame/SQL plan over the driver's test tables, each paired with an ANSI
SQL oracle (DuckDB-runnable) for hash-checked correctness. Import order
populates the registry.
"""

from gwasdb_spark.plans.base import QUERIES, Query, query, oracle_map, query_map

# Populate the registry (import side effects).
from gwasdb_spark.plans import relational as _relational  # noqa: F401
from gwasdb_spark.plans import extensions as _extensions  # noqa: F401

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
