"""Table maintenance: small-file compaction.

Streaming appends (foreachBatch) and incremental loads accumulate files
far smaller than a scan-efficient target; at 100 TB a table with 10^7
kilobyte-files spends more time in scheduling + footer reads than in
data. Compaction rewrites a parquet table to ~target-sized files,
preserving hive partitioning, with the same write-then-swap pattern the
gold build uses (Delta's OPTIMIZE is the transactional equivalent).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet table at `path` into ceil(size/target) files
    (per partition directory when hive-partitioned), optionally re-sorting
    rows within files to restore min/max skipping after many unsorted
    appends. Returns {files_before, files_after, bytes}.

    Atomicity caveat: plain-parquet swap is rename-based (same as
    build_combined); concurrent readers mid-swap see the old OR new
    listing. Delta/Iceberg make this a metadata commit."""
    part_cols = sorted(
        {e.split("=")[0] for e in os.listdir(path) if "=" in e and not e.startswith("_")}
    )
    df = spark.read.parquet(path)
    n_bytes = _dir_bytes(path)
    files_before = sum(
        1 for root, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(n_bytes / target_file_bytes))

    out = df
    if part_cols:
        # spread rows of each partition dir across its own writers
        out = out.repartition(max(n_files, len(part_cols)), *[F.col(c) for c in part_cols])
    else:
        out = out.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)

    tmp = path.rstrip("/") + "__compact_tmp"
    writer = out.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(tmp)
    bak = path.rstrip("/") + "__compact_old"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)

    files_after = sum(
        1 for root, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    return {"files_before": files_before, "files_after": files_after, "bytes": n_bytes}
