"""Custom stateful streaming operator: per-user gap sessionization via
applyInPandasWithState.

This is the engine's demonstration of arbitrary stateful processing — the
case Structured Streaming's built-ins (window/session_window aggregations)
genuinely can't express: user-defined per-key state with user-defined
merge logic, carried across micro-batches.

Semantics match the batch sessionizer st02 (30-minute inactivity gap,
exact integer-microsecond arithmetic): for each user, emit cumulative
(n_events, n_sessions) after every micro-batch. State per key is three
scalars — O(#active users), independent of stream length.

Scale notes:
- applyInPandasWithState groups by key and ships Arrow batches to Python;
  the per-key payload here is tiny (counts + last timestamp), so executor
  memory is bounded by #keys per partition, not events.
- Within a micro-batch, rows for a key are sorted in pandas (micro-batch
  sized, not stream sized). Cross-batch ordering is handled by the carried
  last_ts state. Late events older than the carried last_ts are counted
  into the current session rather than re-splitting history — the
  documented (and bounded-state) trade-off; exact retroactive splitting
  would require keeping per-event history.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 1800 * 1_000_000

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, n_sessions bigint"
STATE_SCHEMA = "n_events bigint, n_sessions bigint, last_us bigint"


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    """Fold this micro-batch's events for one user into (n_events,
    n_sessions, last_us) state; emit the cumulative row."""
    if state.exists:
        n_events, n_sessions, last_us = state.get
    else:
        n_events, n_sessions, last_us = 0, 0, None
    # Arrow hands the group as chunked DataFrames with no cross-chunk
    # ordering guarantee: concat then sort once (micro-batch sized).
    chunks = [pdf["ts"] for pdf in pdfs]
    ts_us = (
        (pd.concat(chunks).astype("int64") // 1000).sort_values().to_numpy()
        if chunks
        else []
    )
    if len(ts_us):
        # Vectorized gap count: boundary vs carried state + internal gaps.
        if last_us is None or ts_us[0] - last_us > GAP_US:
            n_sessions += 1
        n_sessions += int((ts_us[1:] - ts_us[:-1] > GAP_US).sum())
        n_events += len(ts_us)
        # max(): a late micro-batch must not rewind the gap clock.
        last_us = int(ts_us[-1]) if last_us is None else max(last_us, int(ts_us[-1]))
    state.update((n_events, n_sessions, last_us))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n_events], "n_sessions": [n_sessions]}
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Streaming per-user session counts with custom state. Update output
    mode: each micro-batch emits the latest cumulative row per touched
    user; downstream sinks upsert on user_id.

    NoTimeout: state lives for the run. A production deployment with
    churning users sets EventTimeTimeout + a watermark and finalizes a
    user's sessions when the timeout fires (state GC)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
