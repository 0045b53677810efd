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
    side's unique id to make the pick deterministic."""
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in by_cols + [ts_col] else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        (F.col(tiebreak_col).cast("long") if tiebreak_col else F.lit(0).cast("long")).alias("__tie"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
