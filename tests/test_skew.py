"""salted_join must be result-identical to the plain join, including on a
pathologically skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from gwasdb_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join_on_skew(spark):
    # 10k fact rows, 95% on one key — the case AQE only fixes after the fact
    fact = spark.range(10000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 50)
        .cast("long").alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("attr")
    )
    plain = {(r.k, r.payload, r.attr) for r in fact.join(dim, "k").collect()}
    salted = {(r.k, r.payload, r.attr) for r in salted_join(fact, dim, "k").collect()}
    assert salted == plain
    left_plain = fact.join(dim, "k", "left").count()
    left_salted = salted_join(fact, dim, "k", how="left").count()
    assert left_plain == left_salted


def test_salted_join_rejects_right(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    try:
        salted_join(df, df, "k", how="right")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
