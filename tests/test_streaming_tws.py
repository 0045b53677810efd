"""transformWithStateInPandas sessionizer (streaming/sessions_tws.py).

The container lacks `protobuf`, which Spark's transformWithState Python
state-API client requires (verified: stream start crashes importing
pyspark.sql.streaming.proto.StateMessage_pb2). The equivalence test
self-activates when protobuf appears; until then we pin the gate behavior
and the processor's pure fold arithmetic (which needs no state server).
"""

from __future__ import annotations

import pandas as pd
import pytest

from gwasdb_spark.streaming.sessions_tws import (
    SessionizeProcessor,
    sessionize_tws,
    tws_available,
)

TWS_OK = tws_available()


def test_gate_raises_clearly_without_protobuf(spark):
    if TWS_OK:
        pytest.skip("protobuf present — gate inactive")
    events = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "user_id long, ts string")
    with pytest.raises(NotImplementedError, match="protobuf"):
        sessionize_tws(events.selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts"))


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state


def _run_batches(batches):
    """Drive the processor's fold directly (no state server needed)."""
    p = SessionizeProcessor()
    h = _FakeHandle()
    p.init(h)
    out = None
    for ts_list in batches:
        pdf = pd.DataFrame({"ts": pd.to_datetime(ts_list)})
        out = list(p.handleInputRows((7,), iter([pdf]), None))[-1]
    return out.iloc[0]["n_events"], out.iloc[0]["n_sessions"], h.state._v


def test_processor_fold_matches_gap_semantics():
    # Two sessions split by a >30min gap, folded across three micro-batches;
    # the second batch arrives inside session 1, the third opens session 2.
    n_events, n_sessions, state = _run_batches(
        [
            ["2024-01-01 00:00:00", "2024-01-01 00:10:00"],
            ["2024-01-01 00:20:00"],
            ["2024-01-01 01:10:00", "2024-01-01 01:15:00"],
        ]
    )
    assert (n_events, n_sessions) == (5, 2)
    assert state[2] == int(pd.Timestamp("2024-01-01 01:15:00").value // 1000)


def test_processor_late_batch_does_not_rewind_clock():
    # A late micro-batch older than carried last_us folds into the current
    # session and must not rewind the gap clock (same trade-off as st04).
    n_events, n_sessions, state = _run_batches(
        [
            ["2024-01-01 02:00:00"],
            ["2024-01-01 01:59:00"],  # late, within gap of last_us
            ["2024-01-01 02:20:00"],
        ]
    )
    assert (n_events, n_sessions) == (3, 1)


@pytest.mark.skipif(not TWS_OK, reason="protobuf absent in container")
def test_tws_matches_applyinpandaswithstate(spark, tmp_path):
    from pyspark.sql import functions as F

    from gwasdb_spark.streaming.events import read_events_stream, run_available_now
    from gwasdb_spark.streaming.sessions import sessionize_stateful

    stream = read_events_stream(spark, "/root/testdata/sf0.001/events.parquet")
    a = (
        run_available_now(sessionize_tws(stream), "update")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("n_sessions").alias("n_sessions"))
    )
    stream2 = read_events_stream(spark, "/root/testdata/sf0.001/events.parquet")
    b = (
        run_available_now(sessionize_stateful(stream2), "update")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("n_sessions").alias("n_sessions"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
