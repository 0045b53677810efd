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


def test_skew_report_flags_hot_key(spark):
    from gwasdb_spark.operators.skew import skew_report

    # 3 keys: 'hot' 80 rows, 'warm' 15, 'cold' 5 -> 100 rows total.
    rows = [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    rep = {
        r["key"]: r
        for r in skew_report(df, "k", top_n=2, target_rows_per_task=30).collect()
    }
    assert list(rep) == ["hot", "warm"]  # top-2 only, count-desc order
    hot = rep["hot"]
    assert hot["n_rows"] == 80
    assert hot["share"] == 0.8
    assert hot["skew_ratio"] == 2.4  # 80 * 3 keys / 100 rows
    assert hot["suggested_salts"] == 3  # ceil(80 / 30)
    assert rep["warm"]["suggested_salts"] == 1
