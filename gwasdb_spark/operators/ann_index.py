"""Persisted cell-partitioned ANN index with INCREMENTAL maintenance.

x136 proved the serve path (probe-cell partition pruning); this module
adds the maintenance path a 100 TB deployment actually runs: vectors
arrive/change in batches, and the index must absorb them by rewriting
ONLY the touched cell partitions — the x62 LSM postings discipline
applied to IVF cells. Nobody rebuilds a corpus-scale index per batch.

Layout on disk (both parquet, partitioned by `cell`):

- `<base>/index`    — (vec_id, embedding, cell): the servable index.
- `<base>/manifest` — (vec_id, cell): the primary-key sidecar. An
  updated vector's OLD row lives in the cell its OLD embedding mapped
  to, which the new embedding cannot reveal — the manifest is how the
  upsert finds those rows without scanning the whole index. It carries
  two ints per vector (~0.01% of index bytes at embedding dim 64), and
  is itself maintained with the same touched-partition rewrites.

Upsert contract (exercised by x153_ann_index_upsert and the
stress_scale `annupsert` gate):

1. Assign each update row its cell (same deterministic rule as build).
2. Touched cells = old cells of replaced vec_ids (manifest semi-join)
   ∪ new cells of the batch — a ≤ n_cells driver list by contract.
3. Read ONLY the touched partitions (static IN-filter → partition
   pruning), drop rows whose vec_id is in the batch, union the new
   rows, and write back with dynamic partition overwrite — untouched
   cells' files are never opened, never rewritten (the stress gate
   asserts their mtimes are bit-stable).
4. Result is bit-equal to a full rebuild over (old \\ batch) ∪ batch.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def axis_cell(embedding: Column) -> Column:
    """Deterministic cell id: 1-based index of the vector's max
    component (the SQL-expressible stand-in for learned IVF centroids;
    swap this for a broadcast-codebook argmin to get the learned
    variant — nothing else in the build/upsert path changes)."""
    return F.array_position(embedding, F.array_max(embedding)).cast("int")


def _index_path(base: str) -> str:
    return os.path.join(base, "index")


def _manifest_path(base: str) -> str:
    return os.path.join(base, "manifest")


def build_cell_index(vectors: DataFrame, base: str) -> None:
    """Full build: partition the corpus by cell, plus the manifest."""
    assigned = vectors.select(
        "vec_id", "embedding", axis_cell(F.col("embedding")).alias("cell")
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        _index_path(base)
    )
    assigned.select("vec_id", "cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(_manifest_path(base))


def read_cell_index(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.parquet(_index_path(base))


def upsert_cell_index(
    spark: SparkSession, base: str, updates: DataFrame
) -> dict:
    """Absorb a batch of (vec_id, embedding) rows — replacements and
    additions — rewriting only the touched cell partitions. Returns
    {"touched_cells": [...], "n_updates": n} for observability.

    Idempotent: re-running the same batch replaces the same rows with
    the same values (the st16 at-least-once discipline)."""
    updates = updates.select(
        "vec_id", "embedding", axis_cell(F.col("embedding")).alias("cell")
    )
    # The batch is a bounded object by contract (one micro-batch /
    # ingest slice, not the corpus); its ids broadcast.
    upd_ids = updates.select("vec_id")
    new_cells = {
        r["cell"] for r in updates.select("cell").distinct().collect()
    }
    manifest = spark.read.parquet(_manifest_path(base))
    old_cells = {
        r["cell"]
        for r in manifest.join(F.broadcast(upd_ids), "vec_id")
        .select("cell")
        .distinct()
        .collect()
    }
    touched = sorted(new_cells | old_cells)  # ≤ n_cells by construction

    index = spark.read.parquet(_index_path(base))
    kept = index.filter(F.col("cell").isin(touched)).join(
        F.broadcast(upd_ids), "vec_id", "left_anti"
    )
    merged = kept.unionByName(updates).localCheckpoint(eager=True)
    # localCheckpoint BEFORE the overwrite: the merged relation reads
    # the very partitions the write replaces — without a materialization
    # boundary the overwrite would race its own input scan.
    man_kept = manifest.filter(F.col("cell").isin(touched)).join(
        F.broadcast(upd_ids), "vec_id", "left_anti"
    )
    man_merged = man_kept.unionByName(
        updates.select("vec_id", "cell")
    ).localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("cell").parquet(
            _index_path(base)
        )
        man_merged.write.mode("overwrite").partitionBy("cell").parquet(
            _manifest_path(base)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # Dynamic overwrite only replaces partitions PRESENT in the written
    # data — a touched cell whose rows were all removed (every resident
    # replaced into other cells) writes nothing and its stale files
    # would silently survive. Drop emptied partitions explicitly.
    import shutil

    surviving = {
        r["cell"] for r in merged.select("cell").distinct().collect()
    }
    for c in touched:
        if c in surviving:
            continue
        for root in (_index_path(base), _manifest_path(base)):
            part = os.path.join(root, f"cell={c}")
            if os.path.isdir(part):
                shutil.rmtree(part)
    return {
        "touched_cells": [int(c) for c in touched],
        "n_updates": updates.count(),
    }


def delete_from_cell_index(
    spark: SparkSession, base: str, vec_ids: DataFrame
) -> dict:
    """Remove a batch of vec_ids from the index — the PII-takedown path
    (pairs with x31's scrub: a 100 TB embedding store must honor
    deletions, not just upserts). Same touched-only discipline as the
    upsert: the manifest finds the victims' cells, ONLY those
    partitions are read and rewritten (dynamic partition overwrite),
    a cell whose last resident leaves is dropped from BOTH index and
    manifest (the emptied-partition lesson the upsert already
    learned), and untouched cells' files stay byte-stable. Deleting an
    absent id is a no-op — idempotent under at-least-once replay
    (the st16 discipline). Returns {"touched_cells", "n_deleted"}."""
    import shutil

    ids = vec_ids.select("vec_id")
    manifest = spark.read.parquet(_manifest_path(base))
    victims = manifest.join(F.broadcast(ids), "vec_id")
    touched = sorted(
        r["cell"] for r in victims.select("cell").distinct().collect()
    )
    if not touched:  # nothing to delete anywhere: zero IO
        return {"touched_cells": [], "n_deleted": 0}
    n_deleted = victims.count()

    index = spark.read.parquet(_index_path(base))
    kept = (
        index.filter(F.col("cell").isin(touched))
        .join(F.broadcast(ids), "vec_id", "left_anti")
        .localCheckpoint(eager=True)  # the write replaces its own input
    )
    man_kept = (
        manifest.filter(F.col("cell").isin(touched))
        .join(F.broadcast(ids), "vec_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        kept.write.mode("overwrite").partitionBy("cell").parquet(
            _index_path(base)
        )
        man_kept.write.mode("overwrite").partitionBy("cell").parquet(
            _manifest_path(base)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    surviving = {r["cell"] for r in kept.select("cell").distinct().collect()}
    for c in touched:
        if c in surviving:
            continue
        for root in (_index_path(base), _manifest_path(base)):
            part = os.path.join(root, f"cell={c}")
            if os.path.isdir(part):
                shutil.rmtree(part)
    return {"touched_cells": [int(c) for c in touched], "n_deleted": n_deleted}
