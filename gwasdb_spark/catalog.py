"""Table catalog over the driver's parquet test data.

Mirrors the reference's lazy remote-table access (`tbl(con, name)` —
gwasDB/app.R:33,82,132): `table(spark, sf_dir, name)` returns a lazy
DataFrame scan node; nothing executes until an action. Scans are columnar
parquet with Catalyst predicate pushdown + column pruning, replacing the
reference's Postgres b-tree access path (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one parquet table (SURVEY.md S2: lazy table ref).

    `events.ts` is physically TIMESTAMP(NANOS), which Spark's parquet reader
    rejects; we read it as long nanos (legacy conf, runtime-settable) and
    convert with exact integer division — `div`, not `/`: epoch-nanos exceed
    double's 2^53 integer range, so float division could drift by 1 µs.
    DuckDB truncates nanos→micros identically, keeping oracles comparable.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so the same plans are
    reachable through SQL text (SURVEY.md §3 entry-point 3: the engine
    accepts both DataFrame-API and SQL-text entry)."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            table(spark, sf_dir, name).createOrReplaceTempView(name)
