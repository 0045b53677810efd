"""Per-user gap sessionization on transformWithStateInPandas — Spark 4's
successor to applyInPandasWithState (the ROADMAP migration item).

Same semantics as streaming/sessions.py (30-minute inactivity gap, exact
integer-microsecond arithmetic, cumulative counts per touched user each
micro-batch); the two implementations are asserted equal in
tests/test_streaming_tws.py, and st08 shares st04's batch-SQL oracle.

Why migrate: transformWithState's handle gives composable, individually
evolvable state primitives (value/list/map state, TTL, timers) instead of
one monolithic state tuple — at scale that means:
- state TTL (`ttlDurationMs`) GC's churned users without hand-rolled
  timeout plumbing;
- timers can finalize + emit a user's sessions on inactivity (the
  update-mode upsert then becomes an append-mode event);
- list/map state is incrementally updatable without rewriting the whole
  per-key blob each batch (RocksDB state store does point writes).

State per key stays three scalars — O(#active users), independent of
stream length, exactly like the applyInPandasWithState version.

CONTAINER CONSTRAINT (verified 2026-08-13): transformWithState*'s Python
state-API client speaks protobuf to the JVM state server
(pyspark/sql/streaming/proto/StateMessage_pb2 imports google.protobuf at
stream start), and the `protobuf` package is not installed here (no
pip/network). `tws_available()` gates the runtime path; the
tests/test_streaming_tws.py equivalence test self-activates the moment
protobuf appears. Until then st04 (applyInPandasWithState) remains the
production sessionizer.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from gwasdb_spark.streaming.sessions import GAP_US, OUTPUT_SCHEMA

# last_us uses -1 as the "no prior event" sentinel: ValueState round-trips
# a typed row, and a NULL bigint would come back as NaN through pandas.
STATE_SCHEMA = "n_events bigint, n_sessions bigint, last_us bigint"


def tws_available() -> bool:
    """True when the transformWithState Python state client can run
    (google.protobuf importable). Checked up front so a missing dependency
    fails at build time with a clear message, not mid-stream in the
    state-server handshake."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class SessionizeProcessor(StatefulProcessor):
    """Fold each micro-batch's events per user into (n_events, n_sessions,
    last_us) ValueState; emit the cumulative row. Identical arithmetic to
    sessions._sessionize_group."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("session_counts", STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n_events, n_sessions, last_us = self._state.get()
        else:
            n_events, n_sessions, last_us = 0, 0, -1
        chunks = [pdf["ts"] for pdf in rows]
        ts_us = (
            (pd.concat(chunks).astype("int64") // 1000).sort_values().to_numpy()
            if chunks
            else []
        )
        if len(ts_us):
            if last_us < 0 or ts_us[0] - last_us > GAP_US:
                n_sessions += 1
            n_sessions += int((ts_us[1:] - ts_us[:-1] > GAP_US).sum())
            n_events += len(ts_us)
            last_us = max(last_us, int(ts_us[-1]))
        self._state.update((n_events, n_sessions, last_us))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n_events], "n_sessions": [n_sessions]}
        )

    def close(self) -> None:
        pass


def sessionize_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user session counts via transformWithStateInPandas.
    Update output mode; timeMode='none' (state lives for the run — a
    churning-user deployment adds ttlDurationMs on the ValueState or an
    inactivity timer to finalize and GC)."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the `protobuf` package for "
            "Spark's Python state-API client; it is absent in this "
            "container (no pip/network). Use "
            "streaming.sessions.sessionize_stateful (applyInPandasWithState) "
            "— identical semantics, asserted in tests/test_streaming_tws.py."
        )
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionizeProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )
