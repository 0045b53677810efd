"""Skew mitigation: salted equi-join.

AQE's skew-join handles sort-merge spills at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in our session defaults), but a
hot key that is 30% of a 100 TB fact table still lands on one reducer
FAMILY before AQE splits it, and broadcast isn't available when the build
side is large. Salting is the planned-ahead fix: split every fact key into
`salts` sub-keys and replicate the build side once per salt, so the hot
key's rows spread across `salts` reducers by construction.

Result-identical to the plain join (asserted in tests/test_skew.py): the
salt is derived deterministically from the whole fact row, and the build
side carries every salt value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join `fact ⋈ dim ON key` with an added salt sub-key.

    fact side: salt = xxhash64(whole row) mod salts — deterministic, and
    uniform even when `key` itself is constant (the skew case).
    dim side: exploded ×salts (dim is the smaller side by contract; its
    replication factor is the knob you pay for reducer spread).

    `how` supports inner/left (fact-preserving joins; a right/full join
    would need the salt on the other side)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salts)
    ).cast("int")
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salts)]))
    )
    return fact_s.join(dim_s, [key, "__salt"], how).drop("__salt")


def skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 20,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Heavy-hitter diagnostic for a prospective join/agg key — the
    measurement that decides between a plain shuffle, AQE skew-split, and
    `salted_join`, and sizes the salt factor when salting wins.

    Per top-`top_n` key (exact counts, count-desc/key-asc order):
    n_rows, share of the table, skew_ratio (key rows ÷ ideal uniform
    rows-per-key), and suggested_salts = ⌈n_rows / target_rows_per_task⌉
    (1 ⇒ no salting needed).

    Scale: one partial-aggregated groupBy on the key (map-side combine
    collapses each partition to its distinct keys) followed by a bounded
    TakeOrdered head — the full key distribution is never sorted globally
    or collected. Totals ride as a broadcast 1-row aggregate, in-plan."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = df.agg(
        F.count(F.lit(1)).cast("double").alias("total_rows"),
    )
    n_keys = counts.agg(F.count(F.lit(1)).cast("double").alias("n_keys"))
    return (
        counts.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_n)
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_keys))
        .select(
            "key",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_rows") / F.col("total_rows")).alias("share"),
            (F.col("n_rows") * F.col("n_keys") / F.col("total_rows")).alias(
                "skew_ratio"
            ),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("n_rows") / F.lit(float(target_rows_per_task))),
            )
            .cast("long")
            .alias("suggested_salts"),
        )
    )
