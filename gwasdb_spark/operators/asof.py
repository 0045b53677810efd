"""As-of (backward temporal) join as a composition of built-in operators.

Spark has no ASOF JOIN; the naive theta-join (`l.ts >= r.ts` + keep max)
explodes to O(|L|·|R|) per key before pruning. The scalable composition is
union + ordered window:

  1. tag both sides and union them on (keys, ts),
  2. one window per key ordered by (ts, side) carries the right side's
     columns forward with last(ignorenulls=True),
  3. keep only left rows.

Cost: ONE shuffle of |L|+|R| skinny rows (the window's hash partition by
key) — the same price as a regular equi-join of the two inputs, with no
pair blow-up. Ties (left.ts == right.ts) match the right row, mirroring
DuckDB/pandas `ASOF ... ON l.ts >= r.ts` semantics (the oracle for
x14_asof_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains the `value_cols` of the most
    recent right row (right.ts <= left.ts) with equal `by_cols`; null when
    no prior right row exists.

    `tiebreak_col` orders right rows that share (by, ts) — pass the right
    side's unique id to make the pick deterministic.

    The carried columns travel inside ONE struct payload that is non-null
    for every right row (even when all its value fields are null), so
    `last(ignorenulls=True)` distinguishes "no prior right row" (payload
    null → all asof_* null) from "matched a right row whose value is null"
    (payload non-null, field null → that null propagates) — matching
    DuckDB/pandas ASOF semantics exactly."""
    lcols = [c for c in left.columns]
    payload_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in value_cols]
    )
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        F.lit(None).cast(payload_type).alias("__r_payload"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in by_cols + [ts_col] else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        (F.col(tiebreak_col).cast("long") if tiebreak_col else F.lit(0).cast("long")).alias("__tie"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r_payload"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = F.last(F.col("__r_payload"), ignorenulls=True).over(w)
    carried = unioned.select(
        *lcols,
        "__side",
        *[carry.getField(c).alias(f"asof_{c}") for c in value_cols],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
