"""Bucketed range join: result parity with the nested-loop formulation,
boundary semantics, and the plan-shape contract (equi-join, no
BroadcastNestedLoopJoin)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from gwasdb_spark.operators.range_join import range_join_bucketed

from tests.conftest import slow_gate


def _ts(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


@slow_gate  # slow parity twin (VERDICT r13 #1): the bucketed range join serves oracle-adjudicated queries; this is the nested-loop parity twin
def test_matches_nested_loop_and_boundaries(spark):
    left = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(10)), (3, _ts(59, 59))],
        "lid long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(0)),        # == left 1 ts (inclusive lower)
            (101, _ts(5)),        # == left 1 ts + gap (inclusive upper)
            (102, _ts(5, 1)),     # 1s past the gap: no match
            (103, _ts(12)),       # inside left 2's window, crosses bucket
            (104, _ts(59, 59)),   # exact match at the end
        ],
        "rid long, rts timestamp",
    )
    got = {
        (r.lid, r.rid)
        for r in range_join_bucketed(left, right, "lts", "rts", 300).collect()
    }
    naive = {
        (r.lid, r.rid)
        for r in left.join(
            right,
            (F.col("rts") >= F.col("lts"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 5 MINUTES")),
        ).collect()
    }
    assert got == naive
    assert (1, 100) in got and (1, 101) in got and (1, 102) not in got
    assert (2, 103) in got and (3, 104) in got


def test_plan_is_equi_join_not_nested_loop(spark):
    left = spark.range(10).select(
        F.col("id").alias("lid"),
        F.timestamp_micros(F.col("id") * 60_000_000).alias("lts"),
    )
    right = spark.range(10).select(
        F.col("id").alias("rid"),
        F.timestamp_micros(F.col("id") * 60_000_000 + 30_000_000).alias("rts"),
    )
    plan = (
        range_join_bucketed(left, right, "lts", "rts", 300)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "__bucket" in plan
