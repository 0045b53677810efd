"""As-of join semantics on crafted data: no-prior-row nulls, equal-ts
inclusion, per-key isolation."""

from __future__ import annotations

import datetime as dt

from gwasdb_spark.operators.asof import asof_join_backward


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(5)), (2, 1, _ts(10)), (3, 1, _ts(20)), (4, 2, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 1, _ts(10), 1.5), (101, 1, _ts(15), 2.5), (102, 2, _ts(11), 9.9)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: r.asof_value
        for r in asof_join_backward(
            left, right, "ts", ["user_id"], ["value"], tiebreak_col="event_id"
        ).collect()
    }
    assert out[1] is None          # before any right row
    assert out[2] == 1.5           # equal ts matches (>= semantics)
    assert out[3] == 2.5           # most recent prior
    assert out[4] is None          # user 2's error is later than the click


def test_asof_matched_null_value_propagates(spark):
    """A matched right row whose value column is NULL must yield NULL —
    not fall back to an older right row's value. (The struct-payload carry
    distinguishes 'no prior row' from 'prior row with null value'.)"""
    left = spark.createDataFrame(
        [(1, 1, _ts(12)), (2, 1, _ts(22))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 1, _ts(10), 1.5), (101, 1, _ts(20), None)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: r.asof_value
        for r in asof_join_backward(
            left, right, "ts", ["user_id"], ["value"], tiebreak_col="event_id"
        ).collect()
    }
    assert out[1] == 1.5   # matches the ts=10 row
    assert out[2] is None  # matches the ts=20 row; its NULL value propagates
