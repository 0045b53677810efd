"""Compaction: fewer files, identical data, partitioning preserved."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gwasdb_spark.operators.maintenance import compact_table

from tests.conftest import SF_DIR


def test_compact_unpartitioned(spark, tmp_path):
    p = str(tmp_path / "t")
    src = spark.range(10000).select("id", (F.col("id") % 7).alias("g"))
    src.repartition(50).write.parquet(p)  # 50 tiny files
    before = {tuple(r) for r in spark.read.parquet(p).collect()}
    stats = compact_table(spark, p, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] >= 50
    assert stats["files_after"] < stats["files_before"]
    after = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert after == before


def test_compact_splits_oversized_partition(spark, tmp_path):
    """A partition dir bigger than target_file_bytes must split into
    multiple files (salted repartition), not collapse to one giant file."""
    p = str(tmp_path / "big")
    src = spark.range(200_000).select(
        (F.col("id") % 2).alias("chr"),
        F.col("id").alias("pos"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    src.repartition(30).write.partitionBy("chr").parquet(p)
    before = {tuple(r) for r in spark.read.parquet(p).collect()}
    stats = compact_table(spark, p, target_file_bytes=2 * 1024 * 1024)
    for d in os.listdir(p):
        if d.startswith("chr="):
            n = sum(1 for f in os.listdir(os.path.join(p, d)) if f.endswith(".parquet"))
            assert n >= 2, f"{d}: expected a multi-file split, got {n}"
    assert stats["files_after"] < stats["files_before"]
    after = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert after == before


def test_compact_multilevel_partitioning(spark, tmp_path):
    """Nested hive layout (chr=../qc=..) survives compaction; both levels
    are rediscovered by the recursive partition walk."""
    p = str(tmp_path / "nested")
    src = spark.range(4000).select(
        (F.col("id") % 3).alias("chr"),
        (F.col("id") % 2).alias("qc"),
        F.col("id").alias("pos"),
    )
    src.repartition(24).write.partitionBy("chr", "qc").parquet(p)
    before = {tuple(r) for r in spark.read.parquet(p).collect()}
    stats = compact_table(spark, p)
    assert stats["files_after"] < stats["files_before"]
    top = [e for e in os.listdir(p) if e.startswith("chr=")]
    assert top and all(
        any(s.startswith("qc=") for s in os.listdir(os.path.join(p, d))) for d in top
    )
    after = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert after == before


def test_compact_partitioned_preserves_layout(spark, tmp_path):
    p = str(tmp_path / "tp")
    src = spark.range(5000).select(
        (F.col("id") % 4).alias("chr"), F.col("id").alias("pos")
    )
    src.repartition(40).write.partitionBy("chr").parquet(p)
    before = {tuple(r) for r in spark.read.parquet(p).collect()}
    stats = compact_table(spark, p, sort_within_by=["pos"])
    assert stats["files_after"] < stats["files_before"]
    assert any(e.startswith("chr=") for e in os.listdir(p))  # layout kept
    after = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert after == before


def test_streaming_append_then_compact_preserves_pruning(spark, tmp_path):
    """The lifecycle compact_table exists for: a foreachBatch streaming
    append accumulates small files into a hive-partitioned table;
    compaction must shrink the file count WITHOUT breaking the partition
    pruning + pushed range filter the flagship window query relies on,
    and without changing a single row."""
    from gwasdb_spark.streaming.events import (
        foreach_batch_append,
        read_events_stream,
    )

    out_dir = str(tmp_path / "events_tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )

    def _write(batch_df, batch_id):
        batch_df.write.mode("append").partitionBy("event_type").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # amplify small files with two more appends (replayed micro-batches);
    # catalog.table handles the ts physical-unit branch
    from gwasdb_spark.catalog import table as cat_table

    src = cat_table(spark, SF_DIR, "events")
    for _ in range(2):
        src.selectExpr(
            "event_id + 1000000 as event_id", "user_id", "event_type",
            "ts", "value",
        ).repartition(8).write.mode("append").partitionBy("event_type").parquet(out_dir)

    before = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    stats = compact_table(spark, out_dir)
    assert stats["files_after"] < stats["files_before"]
    after = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert after == before

    window = (
        spark.read.parquet(out_dir)
        .filter(
            (F.col("event_type") == "click")
            & (F.col("value") > 10.0)
        )
        .select("event_id", "value")
    )
    plan = window._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("event_type" in ln for ln in pf), pf
    assert any(
        "GreaterThan(value" in ln for ln in plan.splitlines() if "PushedFilters" in ln
    ), plan


def test_bucketed_join_is_shuffle_free(spark):
    """Same-bucketed tables on the join key must sort-merge join with NO
    exchange on either side — the co-located fact⋈fact layout. Broadcast
    is disabled for the assertion so the SMJ path is actually planned."""
    from gwasdb_spark.operators.maintenance import bucketed_join, write_bucketed

    o = spark.range(0, 10_000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_flag"),
    )
    l = spark.range(0, 30_000).select(
        (F.col("id") % 10_000).alias("l_orderkey"),
        (F.col("id") % 100).alias("l_qty"),
    )
    write_bucketed(o, "bkt_orders_t", "o_orderkey", n_buckets=8)
    write_bucketed(l, "bkt_lineitem_t", "l_orderkey", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(
            spark, "bkt_orders_t", "bkt_lineitem_t", "o_orderkey", "l_orderkey"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the result is the plain join's result
        assert j.count() == 30_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders_t")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem_t")


def test_scd2_apply_semantics_and_idempotence(spark):
    """SCD2: a change closes the current row and appends a new version;
    history is untouched; re-applying the identical change batch is a
    no-op (the differing-attributes filter drops it)."""
    from gwasdb_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "A", "d0", "d1", False),   # history row
            (1, "B", "d1", None, True),    # current, will change
            (2, "C", "d0", None, True),    # current, untouched
        ],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    chg = spark.createDataFrame([(1, "Z", "d2")], "k long, attr string, eff string")

    v2 = scd2_apply(dim, chg, ["k"], ["attr"], eff_col="eff")
    rows = {(r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
            for r in v2.collect()}
    assert rows == {
        (1, "A", "d0", "d1", False),
        (1, "B", "d1", "d2", False),   # closed at eff
        (1, "Z", "d2", None, True),    # new current
        (2, "C", "d0", None, True),
    }

    v3 = scd2_apply(v2, chg, ["k"], ["attr"], eff_col="eff")
    assert {tuple(r) for r in v3.collect()} == {tuple(r) for r in v2.collect()}


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered files must give row-group stats pruning on BOTH
    interleaved columns: for a (chr, pos) box probe, strictly fewer row
    groups overlap than in a layout sorted by an unrelated key (name
    order ~ random w.r.t. chr/pos, which leaves every row group's
    [min,max] spanning nearly the full domain)."""
    import pyarrow.parquet as pq

    from gwasdb_spark.operators.maintenance import write_zordered

    m = spark.range(40_000).select(
        F.format_string("rs%09d", (F.col("id") * 48271) % 40_000).alias("name"),
        (F.col("id") % 22 + 1).cast("int").alias("chr"),
        (1 + (F.col("id") * 997) % 1_000_000).cast("long").alias("pos"),
    ).withColumn("pos_kb", F.expr("pos div 256").cast("int"))

    zpath, npath = str(tmp_path / "z"), str(tmp_path / "byname")
    write_zordered(m, zpath, ["chr", "pos_kb"], bits=12, n_files=8)
    (
        m.repartitionByRange(8, "name").sortWithinPartitions("name")
        .write.parquet(npath)
    )

    def overlapping_row_groups(path):
        total = hits = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for rg in range(md.num_row_groups):
                    total += 1
                    cs = md.row_group(rg).column(sch["chr"]).statistics
                    ps = md.row_group(rg).column(sch["pos"]).statistics
                    if cs.min <= 5 <= cs.max and ps.min <= 500_000 and ps.max >= 400_000:
                        hits += 1
        return hits, total

    z_hits, z_total = overlapping_row_groups(zpath)
    n_hits, n_total = overlapping_row_groups(npath)
    # name-ordered layout: essentially every row group overlaps the box
    assert n_hits >= n_total - 1
    # z-ordered: most row groups are skippable on the combined predicate
    assert z_hits < n_hits
    assert z_hits <= z_total // 2, (z_hits, z_total)


def test_snapshot_diff_statuses(spark):
    from gwasdb_spark.operators.maintenance import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")],
        "id long, t string, u string",
    )
    new = spark.createDataFrame(
        [(2, "b", "y"), (3, "CHANGED", "z"), (4, "d", "w")],
        "id long, t string, u string",
    )
    out = {r["id"]: r["status"] for r in snapshot_diff(old, new, "id", ["t", "u"]).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
