"""Structured Streaming semantics beyond the oracle gate (st03-st05 are
hash-checked against DuckDB in test_queries_oracle): session_window parity
with the lag-based batch sessionizer, and the production foreachBatch sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gwasdb_spark.plans import QUERIES
from gwasdb_spark.streaming.events import (
    foreach_batch_append,
    read_events_stream,
    run_available_now,
    session_window_stream,
)

from tests.conftest import SF_DIR


def test_session_window_matches_batch_sessionizer(spark):
    """Native session_window (gap semantics) must count exactly the sessions
    the batch lag-window formulation finds: same 30-min gap rule."""
    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    out = run_available_now(session_window_stream(stream), "complete")
    streamed = {
        (r.user_id): (r.n_sessions, r.n_events)
        for r in out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .collect()
    }
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in QUERIES["st02_sessionize"].fn(spark, SF_DIR).collect()
    }
    assert streamed == batch


def test_foreach_batch_append_sink(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    q = foreach_batch_append(stream.select("event_id", "user_id"), out_dir, ckpt)
    q.awaitTermination()
    written = spark.read.parquet(out_dir)
    n_src = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).count()
    assert written.count() == n_src
    assert written.select("event_id").distinct().count() == n_src
