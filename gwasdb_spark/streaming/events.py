"""Structured Streaming over the events table.

The reference has NO stream processing (SURVEY.md §2.10 — Shiny reactivity
is interactive re-execution, not streaming); this module is the engine
extension the north-star asks for: watermarked event-time aggregation,
streaming dedup, and a custom stateful operator (sessions.py).

Design for scale:
- file source → the same partitioned parquet/Delta layout as batch; each
  micro-batch is a normal distributed job, so everything said about
  shuffles/pruning in the batch operators applies per batch.
- watermarks bound state: the hourly rollup keeps only open windows within
  the lateness horizon; dropDuplicatesWithinWatermark evicts seen-key state
  past the horizon (unbounded-state streaming dedup is a memory leak at
  100 TB/day).
- memory-sink runners are TEST/VERIFY harness conveniences (driver-sized
  results only); the production sink is `foreach_batch_append` →
  partitioned parquet (Delta MERGE where available).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gwasdb_spark.plans.helpers import cents, hour_str, money

# Legacy physical schema for TIMESTAMP(NANOS) files only (Spark's parquet
# reader rejects nanos) — read as long nanos and convert exactly, matching
# gwasdb_spark.catalog.table (same integer `div`, no float drift). Used
# only when the footer actually says nanos; micros/millis files stream
# with their natively-inferred schema.
EVENTS_NANOS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events parquet path (file or directory).

    `maxFilesPerTrigger=1` keeps micro-batches bounded when pointed at a
    directory that accumulates files — the backpressure knob for the file
    source. The file source requires a DIRECTORY; a bare file path is
    wrapped in a temp dir via symlink (test-data convenience — production
    streams always watch an ingest directory).

    The `ts` physical unit is detected from the parquet footer (shared
    helper with catalog.table): TIMESTAMP(NANOS) takes the legacy
    long+convert path; anything Spark reads natively streams with the
    batch-inferred schema — readStream requires an explicit schema, and
    deriving it from a one-off batch read keeps the two paths identical."""
    from gwasdb_spark.catalog import events_ts_is_nanos, parquet_data_file

    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(path, os.path.join(d, os.path.basename(path)))
        path = d
    data_file = parquet_data_file(path)
    if events_ts_is_nanos(data_file):
        # Deliberately session-scoped (unlike catalog.table's read-scoped
        # set): a streaming query clones the session conf at .start(), so
        # the conf must still be set when the caller starts the stream —
        # there is no post-read point to restore it at.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(EVENTS_NANOS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    schema = spark.read.parquet(data_file).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    # Watermarks demand instant TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_
    # TYPE on NTZ); session tz is UTC so NTZ→instant→formatted round-trips
    # to the same wall-clock values the batch oracles see.
    if isinstance(raw.schema["ts"].dataType, T.TimestampNTZType):
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_rollup_stream(events: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """Watermarked event-time hourly rollup — the streaming twin of
    st01_hourly_rollup (same grouping, same exact-cents money sums).

    The watermark bounds aggregation state to windows newer than
    max(event time) - lateness; later events are dropped, earlier ones
    merge into their still-open window."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum(cents(F.col("value")))).alias("total_value"),
        )
        .select(
            hour_str(F.col("w.start")).alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes",
                          lateness: str = "10 minutes") -> DataFrame:
    """Gap-based session windows per user (Spark's native session_window) —
    the declarative streaming twin of st02's lag-based batch sessionizer.
    State per (user, open session) only; watermark closes sessions whose
    gap has passed the lateness horizon."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def dedup_stream(events: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state:
    dropDuplicatesWithinWatermark evicts seen keys older than the
    watermark horizon, so state is O(arrival rate × lateness), not O(total
    stream) — the only viable form at sustained ingest scale."""
    return events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(sdf: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame over all currently-available input
    (Trigger.AvailableNow) into a memory sink and return the final result
    as a BATCH DataFrame.

    Harness-only: memory sinks materialize on the driver. Production runs
    use a continuous trigger + foreach_batch_append."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def foreach_batch_append(sdf: DataFrame, out_dir: str, checkpoint_dir: str):
    """Production-shaped sink: idempotent-by-checkpoint micro-batch append
    to partitioned parquet. With Delta available this body becomes a MERGE
    on the natural key; plain parquet gets at-least-once append semantics
    (exactly-once requires the transactional commit log)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_exactly_once(sdf: DataFrame, out_dir: str, checkpoint_dir: str):
    """Exactly-once micro-batch append WITHOUT a transactional table
    format: stage-then-rename keyed by the deterministic batch_id.

    Structured Streaming replays a micro-batch with the SAME batch_id
    after failure, so exactly-once = make the write idempotent per
    batch_id:
    1. a replayed, already-committed batch_id is a no-op (the `_SUCCESS`
       marker in its final directory is the commit record);
    2. otherwise write to `out_dir/_staging/batch_id=N` (underscore-
       prefixed → invisible to Spark's file listing) and atomically
       rename into `out_dir/batch_id=N`.

    A crash before the rename leaves only staging garbage (overwritten on
    replay); after the rename, the replay hits the no-op branch. Readers
    (`spark.read.parquet(out_dir)`) only ever see fully-committed batch
    directories. This is the upgrade of foreach_batch_append's
    at-least-once contract, with the same caveat flipped: rename is the
    commit primitive, so the target must be a filesystem with atomic
    rename (HDFS/local; on S3 the rename becomes a manifest commit —
    which is what Delta/Iceberg provide natively).
    """
    import shutil

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(out_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(final, "_SUCCESS")):
            return  # replayed batch already committed
        staging = os.path.join(out_dir, "_staging", f"batch_id={batch_id}")
        if os.path.exists(staging):
            shutil.rmtree(staging)  # partial write from a crashed attempt
        batch_df.write.mode("overwrite").parquet(staging)
        if os.path.exists(final):
            shutil.rmtree(final)  # committed-but-unmarked partial: replace
        os.rename(staging, final)

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_upsert_rollup(
    rollup_updates: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_cols: tuple[str, ...] = ("hour", "event_type"),
):
    """Continuous-aggregate maintenance: an UPDATE-mode streaming
    aggregation emits the new cumulative row for every (hour, event_type)
    key a micro-batch touched; dynamic partition overwrite replaces
    exactly those keys' directories in the serving table — a key-grain
    upsert on plain parquet (Delta MERGE is the transactional twin).

    The serving table is always directly queryable (no final merge step)
    and the write cost per batch is proportional to TOUCHED keys, not
    table size — the timescale-style hypertable rollup shape."""

    def _up(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # Dynamic partition overwrite as a per-writer option — no
        # session-conf mutation for other threads to observe (ADVICE r13).
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(out_dir)
        )

    return (
        rollup_updates.writeStream.foreachBatch(_up)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_enrich_append(
    sdf: DataFrame,
    dim_path: str,
    join_key: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Stream⋈slowly-changing-dimension enrichment — the foreachBatch
    broadcast-refresh pattern. A plain stream-static join binds the
    dimension ONCE at query start; re-reading it inside foreachBatch
    re-resolves files every micro-batch, so dimension updates (new
    parquet snapshot dropped at `dim_path`) take effect at the next
    batch boundary without restarting the stream.

    The dimension is broadcast per batch (dims are fixed-size by nature);
    left join keeps stream rows whose key has no dim row yet."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        dim = spark.read.parquet(dim_path)
        (
            batch_df.join(F.broadcast(dim), join_key, "left")
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        sdf.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dir_with_flush(
    path: str,
    margin: str = "30 minutes",
    sentinel_types: tuple[str, ...] = ("__flush__",),
) -> str:
    """Harness: a temp directory holding the events file plus one
    sentinel event PER TYPE in `sentinel_types`, stamped max(ts) + margin,
    all with user_id = event_id = -1.

    Outer-join null rows and final windows emit only once the watermark
    PASSES their interval; a live production stream advances the
    watermark naturally with new arrivals, but a bounded replay ends at
    max(ts) and would hold tail state forever. The sentinel is the
    replay's end-of-stream nudge.

    The watermark operator sits AFTER any event_type filter, so a
    sentinel only advances a filtered stream's watermark if it SURVIVES
    that stream's filter (measured: a '__flush__'-typed sentinel never
    reaches the click/error watermark nodes and the tail click's outer
    row is held forever). Pass the exact types the query filters on
    (e.g. ("click", "error")) and drop `user_id < 0` rows downstream.
    Written with its own (later) mtime so the file source's mod-time
    ordering puts it in the final micro-batch."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    m = re.fullmatch(r"(\d+)\s*minutes?", margin.strip())
    if not m:
        raise ValueError(f"margin must look like 'N minutes', got {margin!r}")

    d = tempfile.mkdtemp(prefix="events_stream_flush_")
    os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
    t = pq.read_table(path, columns=["ts"])
    # The sentinel's ts column must match the source file's PHYSICAL type —
    # margin arithmetic happens in that type's own unit (raw int64 = nanos).
    ts_type = t.schema.field("ts").type
    unit = getattr(ts_type, "unit", "ns")
    per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    margin_units = int(m.group(1)) * 60 * per_sec
    max_units = int(pa.compute.max(t.column("ts").cast(pa.int64())).as_py())
    n = len(sentinel_types)
    sentinel_ts = pa.array([max_units + margin_units] * n, pa.int64()).cast(ts_type)
    sentinel = pa.table(
        {
            "event_id": pa.array([-1] * n, pa.int64()),
            "ts": sentinel_ts,
            "user_id": pa.array([-1] * n, pa.int64()),
            "event_type": pa.array(list(sentinel_types), pa.string()),
            "value": pa.array([0.0] * n, pa.float64()),
            "props": pa.array([None] * n, pa.string()),
        }
    )
    pq.write_table(sentinel, os.path.join(d, "zz_flush_sentinel.parquet"))
    return d


def click_error_funnel_stream(
    clicks: DataFrame, errors: DataFrame, within: str = "10 minutes",
    lateness: str = "10 minutes",
) -> DataFrame:
    """Stream-stream interval join: for each user, pair every click with
    the errors that follow it within `within` — the funnel/attribution
    shape. Both sides carry watermarks and the join condition bounds the
    time range, so each side's buffered state is evicted once the other
    side's watermark passes the interval (bounded state; an unbounded
    stream-stream join is a memory leak by construction)."""
    c = (
        clicks.withWatermark("ts", lateness)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    e = (
        errors.withWatermark("ts", lateness)
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
        )
    )
    return c.join(
        e,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"), "click_id", "error_id",
        "click_ts", "error_ts",
    )


def click_error_left_outer_stream(
    clicks: DataFrame, errors: DataFrame, within: str = "10 minutes",
    lateness: str = "10 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: EVERY click emits — paired
    with each error that follows within `within`, or with null error
    columns once the error-side watermark has passed the click's interval
    and no error arrived (the "clicks with NO error" funnel question,
    answerable by filtering error_id IS NULL downstream).

    Same bounded-state shape as the inner join; the null rows are
    watermark-EVICTION output, so a bounded replay must push the
    watermark past the last click's interval before the stream drains
    (`stream_dir_with_flush`) — a live stream does this naturally."""
    c = (
        clicks.withWatermark("ts", lateness)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    e = (
        errors.withWatermark("ts", lateness)
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
        )
    )
    return c.join(
        e,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"), "click_id", "error_id",
        "click_ts", "error_ts",
    )


def sliding_rate_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    lateness: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event rates: overlapping windows (each event lands
    in window/slide of them) per event type — the rate/SLA monitor shape.
    Spark expands the window memberships at evaluation (no row
    duplication upstream); watermark bounds open-window state to the
    lateness horizon × overlap factor."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum(cents(F.col("value")))).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def foreach_batch_acid_append(table_path: str):
    """Exactly-once micro-batch sink into an AcidTable — the streaming
    half of the transactional layer (Delta's txn-version pattern,
    native over the parquet log): each batch commits as ONE atomic
    append stamped 'append(batch N)'; on restart/replay the sink scans
    the committed history first and re-delivered batch ids become
    NO-OPS, so at-least-once delivery from the source turns into
    exactly-once table contents. The id check + append is not atomic
    against a SECOND concurrent sink writing the same table (single
    writer per (stream, table) is the contract, as with Delta's
    txnAppId); a crash between commit and source checkpoint is healed
    by the same replay path. Returns the foreachBatch callable."""
    from gwasdb_spark.acid import AcidTable

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        t = AcidTable(spark, table_path)
        if t.latest_version() < 0:
            # seed an EMPTY v0 so every delivered batch goes through the
            # same stamped-append path (create is not id-stamped)
            AcidTable.create(spark, table_path, batch_df.limit(0))
            t = AcidTable(spark, table_path)
        seen = {
            h["op"]
            for h in t.history()
            if h["op"].startswith("append(batch ")
        }
        if f"append(batch {batch_id})" in seen:
            return  # re-delivered batch: exactly-once no-op
        t.append(batch_df, op=f"append(batch {batch_id})")

    return _write
