"""Slowly-changing-dimension maintenance (SCD type 2) as one declarative
plan.

The reference's warehouse keeps mutable dimension rows (UPDATE in place,
R/postgres_process.Rmd DML surface — see gwas/dml.py for the M1-M3
mapping); the warehouse-scale alternative every lakehouse uses is SCD2:
never update, instead close the current version (valid_to = effective ts)
and append the new one. This module is the batch MERGE-shaped operator:
without Delta in the container (ROADMAP.md) the output is a full new
dimension snapshot the caller swap-writes, which is exactly how the
rename-swap DML layer persists results.

Scale shape: one equi-join of the current slice against the (small) change
batch plus two anti/semi splits — all on the dimension key, one shuffle
total; history rows pass through untouched (no join fan-out). At 100 TB
the change batch is broadcast and the dimension is never rewritten more
than once per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    eff_col: str = "eff_ts",
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension; returns the new snapshot.

    `dim` carries key_cols + attr_cols + (valid_from, valid_to,
    is_current); `changes` carries key_cols + attr_cols + eff_col (the
    new attribute values effective at eff_col). Semantics:

    - history rows (is_current = false) pass through unchanged;
    - current rows whose key has a change WITH a differing attribute
      tuple are CLOSED: valid_to = eff, is_current = false;
    - a new current row is appended for each such change;
    - no-op changes (identical attribute tuple) are dropped — the
      dimension is unchanged for those keys (standard SCD2 idempotence).

    Deterministic: pure set algebra on exact values, no timestamps
    generated inside (the caller stamps eff_col), so a SQL oracle can
    reproduce the snapshot bit-for-bit."""
    cur = dim.filter(F.col(IS_CURRENT))
    hist = dim.filter(~F.col(IS_CURRENT))

    # changes that actually change something: join current attrs, keep
    # rows where any attribute differs (null-safe)
    cur_attrs = cur.select(
        *key_cols, *[F.col(a).alias(f"__cur_{a}") for a in attr_cols]
    )
    diff_cond = None
    for a in attr_cols:
        c = ~F.col(a).eqNullSafe(F.col(f"__cur_{a}"))
        diff_cond = c if diff_cond is None else (diff_cond | c)
    real = (
        changes.join(F.broadcast(cur_attrs), key_cols)
        .filter(diff_cond)
        .select(*key_cols, *attr_cols, eff_col)
    )

    closed = (
        cur.join(F.broadcast(real.select(*key_cols, eff_col)), key_cols)
        .withColumn(VALID_TO, F.col(eff_col))
        .withColumn(IS_CURRENT, F.lit(False))
        .drop(eff_col)
    )
    untouched = cur.join(real.select(*key_cols), key_cols, "left_anti")
    fresh = real.select(
        *key_cols,
        *attr_cols,
        F.col(eff_col).alias(VALID_FROM),
        F.lit(None).cast(dim.schema[VALID_TO].dataType).alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )
    cols = dim.columns
    return (
        hist.select(*cols)
        .unionByName(untouched.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(fresh.select(*cols))
    )
