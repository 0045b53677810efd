"""Compaction: fewer files, identical data, partitioning preserved."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gwasdb_spark.operators.maintenance import compact_table


def test_compact_unpartitioned(spark, tmp_path):
    p = str(tmp_path / "t")
    src = spark.range(10000).select("id", (F.col("id") % 7).alias("g"))
    src.repartition(50).write.parquet(p)  # 50 tiny files
    before = {tuple(r) for r in spark.read.parquet(p).collect()}
    stats = compact_table(spark, p, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] >= 50
    assert stats["files_after"] < stats["files_before"]
    after = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert after == before


def test_compact_partitioned_preserves_layout(spark, tmp_path):
    p = str(tmp_path / "tp")
    src = spark.range(5000).select(
        (F.col("id") % 4).alias("chr"), F.col("id").alias("pos")
    )
    src.repartition(40).write.partitionBy("chr").parquet(p)
    before = {tuple(r) for r in spark.read.parquet(p).collect()}
    stats = compact_table(spark, p, sort_within_by=["pos"])
    assert stats["files_after"] < stats["files_before"]
    assert any(e.startswith("chr=") for e in os.listdir(p))  # layout kept
    after = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert after == before
