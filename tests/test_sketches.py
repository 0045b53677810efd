"""Sketch aggregates vs exact answers: HLL++ distinct counts within rsd
bounds, approximate percentiles within rank tolerance.

x13 itself now EMITS the bound-check contract (per-group booleans the
DuckDB oracle pins to TRUE — r11 verdict #5); these tests keep pinning
the raw sketch outputs underneath it: exact-twin equality for
percentiles below the accuracy threshold, 3-sigma + determinism for
HLL, and all-flags-true across every test SF.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gwasdb_spark.plans import QUERIES

from tests.conftest import SF_DIR


def _raw_sketches(spark, sf_dir):
    """The sketch estimates x13 computes internally (same expressions,
    same accuracy knobs), keyed by event_type."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000).alias(
                "value_pcts"
            ),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("value_pcts")[0].alias("p50"),
            F.col("value_pcts")[1].alias("p95"),
            F.col("value_pcts")[2].alias("p99"),
        )
        .collect()
    }


def test_sketches_within_error_bounds(spark):
    approx = _raw_sketches(spark, SF_DIR)
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


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_percentile_approx_exact_twin_below_accuracy(spark, sf_dir):
    """EXACT-twin pin (r9 verdict #5): percentile_approx(accuracy=10k)
    degrades to the exact ceil(p*n) nearest-rank statistic whenever a
    group holds fewer than `accuracy` rows (the quantile summary never
    compresses, rank error < 1) — x13's groups at sf0.01 are ~2k rows,
    so its percentile outputs are pinned by EQUALITY, not bands."""
    approx = _raw_sketches(spark, sf_dir)
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    vals = {
        r.event_type: np.sort(
            np.array([x for x in r.vs if x is not None], dtype=np.float64)
        )
        for r in e.groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    for et, a in approx.items():
        v = vals[et]
        n = len(v)
        assert n < 10_000, "fixture outgrew the exactness precondition"
        for p, got in [(0.5, a.p50), (0.95, a.p95), (0.99, a.p99)]:
            expect = float(v[int(np.ceil(p * n)) - 1])
            assert got == expect, (et, p, got, expect)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_hll_within_3_sigma_and_deterministic(spark, sf_dir):
    """HLL++ at rsd=0.01 must land within 3 sigma (3%) of exact — a
    3x-tighter band than the original 5% guard — and be run-to-run
    DETERMINISTIC (the sketch hashes values, no RNG), so the x13 driver
    row cannot flap."""
    a1 = {et: r.approx_users for et, r in _raw_sketches(spark, sf_dir).items()}
    a2 = {et: r.approx_users for et, r in _raw_sketches(spark, sf_dir).items()}
    assert a1 == a2
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r.u
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    for et, got in a1.items():
        assert abs(got - exact[et]) <= max(1, 0.03 * exact[et]), (
            et, got, exact[et],
        )


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_x13_contract_flags_true_at_every_sf(spark, sf_dir):
    """The adjudicated bound-check contract holds at every test scale —
    including sf0.1, where groups exceed the percentile accuracy
    threshold and the sketch genuinely approximates (the regime the
    ±2%-rank band exists for)."""
    rows = QUERIES["x13_sketch_aggregates"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.hll_ok and r.p50_ok and r.p95_ok and r.p99_ok, r
        assert r.n_events >= r.n_users_exact > 0, r
