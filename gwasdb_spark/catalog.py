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
from pyspark.sql import types as T

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


def parquet_data_file(path: str) -> str:
    """Resolve `path` to one concrete parquet data file (for footer
    inspection): a file path passes through; a directory yields its first
    `*.parquet` member (Spark-written datasets are directories)."""
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
    return path


def events_ts_is_nanos(path: str) -> bool:
    """True when the parquet footer stores `ts` as INT64 TIMESTAMP(NANOS)
    or raw int64 — the physical shapes Spark's native reader can't map to
    a timestamp column and that need the legacy long-nanos shim.
    INT96 (Spark's legacy timestamp physical type) also surfaces as
    timestamp[ns] in pyarrow but Spark reads it natively — it must NOT
    take the shim. Footer-only check (pyarrow metadata read, no data IO);
    the driver has regenerated testdata with a different physical unit
    between rounds, so the read path must branch on what's actually on
    disk, never assume."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(parquet_data_file(path))
    idx = f.schema_arrow.get_field_index("ts")
    if f.schema.column(idx).physical_type == "INT96":
        return False
    t = f.schema_arrow.field("ts").type
    # raw int64 (no `unit`) is the nanosAsLong rendering of TIMESTAMP(NANOS)
    return getattr(t, "unit", "ns") == "ns"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one parquet table (SURVEY.md S2: lazy table ref).

    `events.ts` is type-adaptive: when the footer says TIMESTAMP(NANOS)
    (which Spark's parquet reader rejects) we read long nanos (legacy conf)
    and convert with exact integer division — `div`, not `/`: epoch-nanos
    exceed double's 2^53 integer range, so float division could drift by
    1 µs. When the footer is already micros/millis, Spark reads the column
    natively; an NTZ read is cast to instant TIMESTAMP (session tz is UTC,
    so the cast is wall-clock-exact) — the engine contract is that `ts` is
    always an instant timestamp, which watermarks, `unix_micros`, and every
    event-time operator require. DuckDB oracles read the same naive values,
    so formatted/collected results compare exactly."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if events_ts_is_nanos(path):
            # Scope the legacy conf to THIS read: it is consulted during
            # schema inference (the eager part of spark.read), and the
            # resolved relation keeps its own conf snapshot, so restoring
            # immediately after does not break later execution of the
            # returned lazy frame (verified on genuine TIMESTAMP(NANOS)
            # files). Without the restore a genuine nanos column in some
            # OTHER table read later in the session would silently arrive
            # as raw longs.
            conf_key = "spark.sql.legacy.parquet.nanosAsLong"
            prior = spark.conf.get(conf_key, None)
            spark.conf.set(conf_key, "true")
            try:
                df = spark.read.parquet(path)
            finally:
                if prior is None:
                    spark.conf.unset(conf_key)
                else:
                    spark.conf.set(conf_key, prior)
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so the same plans are
    reachable through SQL text (SURVEY.md §3 entry-point 3: the engine
    accepts both DataFrame-API and SQL-text entry)."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            table(spark, sf_dir, name).createOrReplaceTempView(name)
