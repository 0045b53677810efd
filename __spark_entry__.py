"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ``gwasdb_spark`` package; this module only
adapts them to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's ±10 kb
    locus-window query (gwasDB/app.R:149-154) re-expressed over the test
    star schema — anchor lookup, windowed range predicate, denormalizing
    broadcast joins (SURVEY.md §3 entry-point 1)."""
    from gwasdb_spark.plans import QUERIES

    return QUERIES["p08_locus_window"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from gwasdb_spark.plans import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from gwasdb_spark.plans import oracle_map

    return oracle_map()
