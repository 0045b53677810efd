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


def test_watermark_drops_late_events(spark, tmp_path):
    """Semantics contract of the watermarked rollup: once the watermark has
    advanced past a window's close + lateness AND that advance has been
    committed (watermark commits lag the batch whose data advanced it by
    one micro-batch — verified via numRowsDroppedByWatermark), late events
    for the window are DROPPED, not merged. Three micro-batches
    (maxFilesPerTrigger=1, file-source order by mtime): batch 0 advances
    event time 5h ahead; batch 1 commits that watermark; batch 2 replays
    an hour-0 event now beyond the 10-minute horizon."""
    import os
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from gwasdb_spark.streaming.events import (
        hourly_rollup_stream,
        read_events_stream,
        run_available_now,
    )

    d = str(tmp_path / "stream_in")
    os.makedirs(d)

    def write_events(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        # match the physical layout: ts as int64 nanos
        pdf["ts"] = pdf["ts"].astype("int64")
        pdf.to_parquet(os.path.join(d, name))

    H = 3_600_000_000_000  # 1h in ns
    base = 1_700_000_000 * 1_000_000_000
    write_events(
        "a.parquet",
        [
            (1, base + 0 * H, 1, "click", 1.0, "{}"),  # hour 0
            (2, base + 5 * H, 1, "click", 1.0, "{}"),  # hour 5 → advances watermark
        ],
    )
    time.sleep(1.1)  # file source orders batches by mtime
    write_events("b.parquet", [(5, base + 5 * H + 30_000_000_000, 1, "click", 1.0, "{}")])
    time.sleep(1.1)
    write_events(
        "c.parquet",
        [
            (3, base + 60_000_000_000, 1, "click", 100.0, "{}"),  # hour 0: LATE
            (4, base + 5 * H + 60_000_000_000, 1, "click", 1.0, "{}"),  # on time
        ],
    )
    stream = read_events_stream(spark, d)
    out = run_available_now(hourly_rollup_stream(stream), "update")
    rows = out.groupBy("hour", "event_type").agg(F.max("n_events").alias("n")).collect()
    by_hour = {r.hour: r.n for r in rows}
    hours = sorted(by_hour)
    assert by_hour[hours[0]] == 1, by_hour  # late event 3 dropped, not merged
    assert by_hour[hours[1]] == 3, by_hour  # on-time events merged


def test_left_outer_join_emits_nulls_on_watermark_eviction(spark, tmp_path):
    """LEFT OUTER stream-stream interval join contract: an unmatched click
    emits its null row ONLY via watermark eviction — once later arrivals
    push BOTH filtered streams' watermarks past the click's interval (the
    final no-data micro-batch commits the advance and flushes state). A
    matched click emits its pair inline and never a null row."""
    import os
    import time

    import pandas as pd

    from gwasdb_spark.streaming.events import (
        click_error_left_outer_stream,
        read_events_stream,
        run_available_now,
    )

    d = str(tmp_path / "stream_in")
    os.makedirs(d)

    def write_events(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pdf["ts"].astype("int64")
        pdf.to_parquet(os.path.join(d, name))

    M = 60_000_000_000  # 1 min in ns
    base = 1_700_000_000 * 1_000_000_000
    # batch 0: user 1 clicks, no error within 10 min (user 2's error is
    # another user's); user 2's error seeds the error-side watermark
    write_events(
        "a.parquet",
        [
            (1, base, 1, "click", 1.0, "{}"),
            (2, base + 1 * M, 2, "error", 1.0, "{}"),
        ],
    )
    time.sleep(1.1)
    # batch 1: one hour later, user 9 click + error pair — matches inline
    # AND advances both watermarks an hour past user 1's interval
    write_events(
        "b.parquet",
        [
            (3, base + 60 * M, 9, "click", 1.0, "{}"),
            (4, base + 61 * M, 9, "error", 1.0, "{}"),
        ],
    )
    clicks = read_events_stream(spark, d).filter(F.col("event_type") == "click")
    errors = read_events_stream(spark, d).filter(F.col("event_type") == "error")
    out = run_available_now(
        click_error_left_outer_stream(clicks, errors), "append"
    ).collect()
    got = {(r.user_id, r.click_id, r.error_id) for r in out}
    # user 1: null row via eviction; user 9: inline match, no null row;
    # user 9's own eviction never fires (watermark ends before its
    # interval closes) but the match already emitted
    assert got == {(1, 1, None), (9, 3, 4)}, got


def test_foreach_batch_dim_refresh(spark, tmp_path):
    """The broadcast-refresh enrichment must pick up a changed dimension
    at the next micro-batch: two availableNow runs share one checkpoint
    (so batch 1 is not replayed); the dimension snapshot is swapped
    between them; rows from each run carry the dimension AS OF their
    batch."""
    import os
    import pandas as pd

    from gwasdb_spark.streaming.events import foreach_batch_enrich_append

    d = str(tmp_path / "in"); os.makedirs(d)
    dim_path = str(tmp_path / "dim")
    out = str(tmp_path / "out"); ckpt = str(tmp_path / "ckpt")

    def write_events(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pdf["ts"].astype("int64")
        pdf.to_parquet(os.path.join(d, name))

    def write_dim(tier):
        spark.createDataFrame(
            [(1, tier)], "user_id long, tier string"
        ).write.mode("overwrite").parquet(dim_path)

    base = 1_700_000_000 * 1_000_000_000
    write_dim("bronze")
    write_events("a.parquet", [(1, base, 1, "click", 1.0, "{}")])
    q = foreach_batch_enrich_append(
        read_events_stream(spark, d).select("event_id", "user_id"),
        dim_path, "user_id", out, ckpt,
    )
    q.awaitTermination()

    write_dim("gold")  # dimension changes between batches
    write_events("b.parquet", [(2, base + 10**9, 1, "click", 1.0, "{}")])
    q = foreach_batch_enrich_append(
        read_events_stream(spark, d).select("event_id", "user_id"),
        dim_path, "user_id", out, ckpt,
    )
    q.awaitTermination()

    got = {r.event_id: r.tier for r in spark.read.parquet(out).collect()}
    assert got == {1: "bronze", 2: "gold"}, got


def test_foreach_batch_upsert_rollup_matches_batch(spark, tmp_path):
    """Incremental rollup maintenance: after replaying the event stream
    in micro-batches through the update-mode aggregation + dynamic
    partition overwrite sink, the serving table must equal the one-shot
    batch rollup (st01) key for key — including keys updated across
    multiple batches (cumulative row wins, not a duplicate)."""
    import os

    from gwasdb_spark.streaming.events import (
        foreach_batch_upsert_rollup,
        hourly_rollup_stream,
    )

    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    q = foreach_batch_upsert_rollup(hourly_rollup_stream(stream), out, ckpt)
    q.awaitTermination()

    served = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        # partition-column type inference reads the hour dir name back as
        # a timestamp; normalize to st01's string form
        for r in spark.read.parquet(out)
        .withColumn("hour", F.col("hour").cast("string"))
        .collect()
    }
    batch = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in QUERIES["st01_hourly_rollup"].fn(spark, SF_DIR).collect()
    }
    assert served == batch
    # partition layout is (hour, event_type) — key-grain replaceability
    hours = [e for e in os.listdir(out) if e.startswith("hour=")]
    assert hours and all(
        any(s.startswith("event_type=") for s in os.listdir(os.path.join(out, h)))
        for h in hours
    )


def test_foreach_batch_exactly_once_survives_replay(spark, tmp_path):
    """Exactly-once contract of the stage-then-rename sink: re-running the
    stream with a WIPED checkpoint (the worst case — every batch_id
    replays from scratch) must not duplicate a single row, because each
    batch_id's committed directory makes its replay a no-op. The plain
    append sink duplicates under the same scenario."""
    import shutil

    from gwasdb_spark.streaming.events import foreach_batch_exactly_once

    from gwasdb_spark.catalog import table

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # checkpoint reuse pins the source path, so stage a STABLE stream dir
    # (read_events_stream would mint a fresh tempdir per call for a bare file)
    src = str(tmp_path / "src")
    os.makedirs(src)
    os.symlink(f"{SF_DIR}/events.parquet", os.path.join(src, "events.parquet"))
    n_src = table(spark, SF_DIR, "events").count()

    q = foreach_batch_exactly_once(
        read_events_stream(spark, src).select("event_id", "user_id"), out_dir, ckpt
    )
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == n_src

    # same checkpoint: no new data, nothing written
    q = foreach_batch_exactly_once(
        read_events_stream(spark, src).select("event_id", "user_id"), out_dir, ckpt
    )
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == n_src

    # wiped checkpoint: every micro-batch replays with the same ids —
    # the commit markers must absorb them all
    shutil.rmtree(ckpt)
    q = foreach_batch_exactly_once(
        read_events_stream(spark, src).select("event_id", "user_id"), out_dir, ckpt
    )
    q.awaitTermination()
    written = spark.read.parquet(out_dir)
    assert written.count() == n_src
    assert written.select("event_id").distinct().count() == n_src


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Exactly-once across RESTARTS: an AvailableNow run drains the
    directory, a second run with the SAME checkpoint after new files
    arrive processes only the delta — the file-source offset log is the
    recovery contract a 100 TB ingest depends on."""
    import os

    from gwasdb_spark.catalog import table as cat_table
    from gwasdb_spark.streaming.events import (
        foreach_batch_append,
        read_events_stream,
    )

    src_dir = str(tmp_path / "incoming")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)

    ev = cat_table(spark, SF_DIR, "events").select("event_id", "ts", "user_id")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "half_a"))
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "half_b"))

    def _files(d):
        return [
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        ]

    os.link(_files(str(tmp_path / "half_a"))[0], os.path.join(src_dir, "a.parquet"))
    q = foreach_batch_append(read_events_stream(spark, src_dir), out_dir, ckpt)
    q.awaitTermination()
    n_even = spark.read.parquet(out_dir).count()
    assert n_even == ev.filter(F.col("event_id") % 2 == 0).count()

    # new file arrives; resume from the same checkpoint
    os.link(_files(str(tmp_path / "half_b"))[0], os.path.join(src_dir, "b.parquet"))
    q2 = foreach_batch_append(read_events_stream(spark, src_dir), out_dir, ckpt)
    q2.awaitTermination()
    out = spark.read.parquet(out_dir)
    assert out.count() == ev.count()                      # a processed once
    assert out.select("event_id").distinct().count() == ev.count()


def test_contamination_gate_retry_is_idempotent(spark, tmp_path):
    """st16's foreachBatch sink under the at-least-once failure mode:
    the same micro-batch delivered twice (retry after a partial write)
    must leave exactly one copy of its ledger rows — the batch_id
    partition is overwritten, never blind-appended (r7 ADVICE item)."""
    from gwasdb_spark.plans.curation_ops import contamination_gate

    sink = str(tmp_path / "ledger")
    train_h = spark.createDataFrame([(h,) for h in range(5)], "h long")
    batch = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n o p"), (2, "short doc")],
        "doc_id bigint, text string",
    )
    gate = contamination_gate(train_h, sink)
    gate(batch, 7)
    once = sorted(spark.read.parquet(sink).drop("batch_id").collect())
    gate(batch, 7)  # the retry
    twice = sorted(spark.read.parquet(sink).drop("batch_id").collect())
    assert twice == once
    # a DIFFERENT batch id appends alongside, untouched by the retry
    other = spark.createDataFrame(
        [(3, "x y z")], "doc_id bigint, text string"
    )
    gate(other, 8)
    gate(batch, 7)  # retry batch 7 again after batch 8 landed
    led = spark.read.parquet(sink)
    assert led.filter(F.col("batch_id") == 8).count() == 1
    assert sorted(
        led.filter(F.col("batch_id") == 7).drop("batch_id").collect()
    ) == once
