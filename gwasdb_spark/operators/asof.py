"""As-of (temporal) join as a composition of built-in operators.

Spark has no ASOF JOIN; the naive theta-join (`l.ts >= r.ts` + keep max)
explodes to O(|L|·|R|) per key before pruning. The scalable composition is
union + ordered window:

  1. tag both sides and union them on (keys, ts),
  2. one window per key ordered by (ts, side) carries the right side's
     columns across with last/first(ignorenulls=True),
  3. keep only left rows.

Cost: ONE shuffle of |L|+|R| skinny rows (the window's hash partition by
key) — the same price as a regular equi-join of the two inputs, with no
pair blow-up. All three pandas.merge_asof directions are supported:

- backward: most recent right row with r.ts <= l.ts (ties match — mirrors
  DuckDB `ASOF ... ON l.ts >= r.ts`, the oracle for x14_asof_join),
- forward: earliest right row with r.ts >= l.ts (ties match),
- nearest: the closer of the two; equidistant → backward (pandas
  semantics, pinned by the merge_asof property test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window


def _tag_union(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    tiebreak_col: str | None,
) -> tuple[DataFrame, list[str]]:
    """Union left rows (payload null) with right rows (payload struct
    carrying value_cols plus the right row's ts as __ts).

    The payload struct is non-null for EVERY right row — even when all
    its value fields are null — so ignorenulls-carries distinguish "no
    matching right row" (payload null → all asof_* null) from "matched a
    right row whose value is null" (field null propagates), matching
    DuckDB/pandas semantics exactly."""
    lcols = list(left.columns)
    payload_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in value_cols]
        + [StructField("__ts", right.schema[ts_col].dataType, True)]
    )
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        F.lit(None).cast(payload_type).alias("__r_payload"),
    )
    r_tagged = right.select(
        *[
            F.col(c)
            if c in by_cols + [ts_col]
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        (
            F.col(tiebreak_col).cast("long") if tiebreak_col else F.lit(0).cast("long")
        ).alias("__tie"),
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            F.col(ts_col).alias("__ts"),
        ).alias("__r_payload"),
    )
    return l_tagged.unionByName(r_tagged), lcols


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    tiebreak_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row gains `value_cols` (as asof_*) of
    the matching right row with equal `by_cols`; null when none exists.

    direction='backward' matches the most recent right row with
    r.ts <= l.ts; 'forward' the earliest with r.ts >= l.ts; 'nearest'
    the closer of the two (equidistant → backward). `tiebreak_col`
    orders right rows that share (by, ts) — pass the right side's unique
    id to make the pick deterministic (backward keeps the LAST such row,
    forward the FIRST, mirroring the carry direction).

    One shuffle regardless of direction; 'nearest' evaluates two window
    frames (preceding + following) over the same partitioning — still a
    single exchange."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction!r}")
    unioned, lcols = _tag_union(left, right, ts_col, by_cols, value_cols, tiebreak_col)

    # backward: right rows sort BEFORE the left row at equal ts (side 0<1)
    # so the preceding-inclusive frame sees ties; among tied right rows the
    # LAST (highest __tie) wins via last().
    w_back = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: left rows sort BEFORE right rows at equal ts (side desc) so
    # the following-inclusive frame sees ties; first() takes the lowest
    # __tie among tied right rows.
    w_fwd = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").desc(), F.col("__tie").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    back = F.last(F.col("__r_payload"), ignorenulls=True).over(w_back)
    fwd = F.first(F.col("__r_payload"), ignorenulls=True).over(w_fwd)

    if direction == "backward":
        chosen = back
    elif direction == "forward":
        chosen = fwd
    else:
        dist_back = F.col(ts_col).cast("double") - back.getField("__ts").cast("double")
        dist_fwd = fwd.getField("__ts").cast("double") - F.col(ts_col).cast("double")
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(dist_back <= dist_fwd, back)  # equidistant -> backward
            .otherwise(fwd)
        )

    carried = unioned.select(
        *lcols,
        "__side",
        *[chosen.getField(c).alias(f"asof_{c}") for c in value_cols],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Backward as-of join (see `asof_join`; kept as the named entry point
    the x14 oracle and the GWAS pipeline cite)."""
    return asof_join(
        left, right, ts_col, by_cols, value_cols, tiebreak_col, "backward"
    )
