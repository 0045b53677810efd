"""Sketch aggregates vs exact answers: HLL++ distinct counts within rsd
bounds, approximate percentiles within rank tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from gwasdb_spark.plans import QUERIES

from tests.conftest import SF_DIR


def test_sketches_within_error_bounds(spark):
    approx = {r.event_type: r for r in QUERIES["x13_sketch_aggregates"].fn(spark, SF_DIR).collect()}
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.expr("percentile(value, 0.40)").alias("p40"),
            F.expr("percentile(value, 0.60)").alias("p60"),
            F.expr("percentile(value, 0.85)").alias("p85"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        x = exact[et]
        # HLL++ at rsd=0.01: generous 5% guard band
        assert abs(a.approx_users - x.users) <= max(1, 0.05 * x.users), et
        # percentile_approx is nearest-rank (not interpolated): bound by
        # RANK, not value — approx pNN must land inside a rank bracket
        assert x.p40 <= a.p50 <= x.p60, et
        assert x.p85 <= a.p95 <= x.vmax, et
