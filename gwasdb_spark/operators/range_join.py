"""Bucketed range join: time/number range predicates WITHOUT an equi-key.

Spark plans a pure range condition (`r.ts BETWEEN l.ts AND l.ts + g`) as
BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, and only viable at all
when one side fits in a broadcast. The classic fix is to MANUFACTURE an
equi-key: quantize the range dimension into buckets of width >= the max
gap. A left row in bucket b can only match right rows in buckets
{b, b+1}, so exploding the left side into those two probe buckets turns
the join into a plain hash/sort-merge equi-join on bucket id:

    shuffle volume O(2|L| + |R|)  +  exact range filter after the match.

Same trick as DuckDB's IEJoin prep / Databricks' range-join hints, as a
composition: no new join operator, just a derived column Catalyst can
hash on. Output is identical to the nested-loop join (asserted in
tests/test_range_join.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Inner-join rows where right_ts ∈ [left_ts, left_ts + max_gap].

    Both frames' other columns pass through (names must not collide).
    Buckets are `floor(epoch_us / gap_us)`; the left side probes its own
    bucket and the next (a right match beyond bucket b+1 would be more
    than `max_gap` away). Exact bounds re-checked post-join."""
    gap_us = max_gap_seconds * 1_000_000

    def bucket(ts: str) -> Column:
        return (F.unix_micros(F.col(ts)) / gap_us).cast("long")

    l_b = left.withColumn(
        "__bucket", F.explode(F.array(bucket(left_ts), bucket(left_ts) + 1))
    )
    r_b = right.withColumn("__bucket", bucket(right_ts))
    return (
        l_b.join(r_b, "__bucket")
        .filter(
            (F.col(right_ts) >= F.col(left_ts))
            & (
                F.unix_micros(F.col(right_ts))
                <= F.unix_micros(F.col(left_ts)) + gap_us
            )
        )
        .drop("__bucket")
        # no dedup needed: each right row has exactly ONE bucket value, so
        # a (left, right) pair can satisfy the equi-join through at most
        # one of the left row's two probe buckets
    )
