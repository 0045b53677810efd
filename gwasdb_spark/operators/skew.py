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
