"""Schema-drift canary: the driver regenerates /root/testdata between
rounds and has already changed a physical type once (events.ts
TIMESTAMP(NANOS) → TIMESTAMP_MICROS, the round-2 regression). This test
holds NO query logic — it just asserts the engine can scan and fully
project every column of every table that exists on disk, so a physical
re-type fails loudly here instead of inside 50 queries."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gwasdb_spark.catalog import TESTDATA_TABLES, table

from tests.conftest import SF_DIR


@pytest.mark.parametrize("name", TESTDATA_TABLES)
def test_scan_and_project_every_column(spark, name):
    path = os.path.join(SF_DIR, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{name} not present in {SF_DIR}")
    df = table(spark, SF_DIR, name)
    # full projection of every column, forced through an action
    row = df.select([F.col(c) for c in df.columns]).limit(1).collect()
    assert len(row) <= 1  # empty table is fine; analysis error is not


def test_events_ts_is_a_timestamp(spark):
    """The engine contract: whatever the physical unit on disk, the
    catalog exposes events.ts as a (NTZ or instant) timestamp column."""
    df = table(spark, SF_DIR, "events")
    dt = df.schema["ts"].dataType
    assert isinstance(dt, (T.TimestampType, T.TimestampNTZType)), dt
    # and event-time arithmetic analyzes (the exact failure mode of r02)
    df.select((F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t1")).limit(
        1
    ).collect()
