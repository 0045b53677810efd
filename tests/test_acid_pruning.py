"""File-group skipping in the ACID table (r9 verdict #2): manifests
carry per-group min/max/null stats, and DML with a sargable Pred reads
and rewrites ONLY the groups whose stats admit a match. The two load-
bearing contracts:

1. EQUIVALENCE — a pruned DML commits the exact same table as the
   full-snapshot rewrite (sorted-row equality against an unpruned twin
   table fed the identical statements).
2. UNTOUCHED MEANS UNTOUCHED — groups the predicate cannot reach keep
   their files byte-identical and mtime-stable (the x153 annupsert
   discipline; at 100 TB this is a 1-row UPDATE costing one file group
   instead of a full table rewrite).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from gwasdb_spark.acid import AcidTable
from gwasdb_spark.acid import predicates as P


def _ranged_table(spark, tmp_path, name="tbl"):
    """Three file groups with disjoint id ranges: create [0,100),
    append [100,200), append [200,300)."""

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            (F.col("id") % 7).cast("double").alias("val"),
            F.concat(F.lit("u"), (F.col("id") % 10)).alias("tag"),
        )

    t = AcidTable.create(spark, os.path.join(str(tmp_path), name), batch(0, 100))
    t.append(batch(100, 200))
    t.append(batch(200, 300))
    return t


def _rows(t, version=None):
    return sorted(
        (r["id"], r["val"], r["tag"]) for r in t.read(version).collect()
    )


def _mtimes(t):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(t._data, "*", "*.parquet"))
    }


def _last_op(t):
    return t._manifest(t.latest_version())["op"]


def test_manifest_carries_group_stats(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    m = t._manifest(2)
    assert set(m["stats"]) == set(m["file_groups"])
    boxes = sorted(st["id"][:2] for st in m["stats"].values())
    assert boxes == [[0, 99], [100, 199], [200, 299]]
    for st in m["stats"].values():
        assert st["id"][2] == 0 and st["id"][3] == 100  # nulls, rows
        assert st["tag"][0].startswith("u")  # string stats too


def test_pruned_delete_touches_only_matching_group(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    before = _mtimes(t)
    t.delete_where(P.And(P.Ge("id", 100), P.Lt("id", 150)))
    assert _last_op(t) == "delete(pruned 1/3)"
    # groups [0,100) and [200,300) never opened, never rewritten
    survivors = {p: m for p, m in before.items() if os.path.exists(p)}
    m2 = t._manifest(2)
    m3 = t._manifest(3)
    carried = set(m2["file_groups"]) & set(m3["file_groups"])
    assert len(carried) == 2
    for p, m in survivors.items():
        if any(f"/{g}/" in p for g in carried):
            assert os.path.getmtime(p) == m, f"pruned delete rewrote {p}"
    assert _rows(t) == sorted(
        (i, float(i % 7), f"u{i % 10}")
        for i in range(300)
        if not (100 <= i < 150)
    )


def test_pruned_dml_equals_full_rewrite(spark, tmp_path):
    """The same statements through the pruned (Pred) and full (Column)
    paths commit identical tables, version for version."""
    a = _ranged_table(spark, tmp_path, "pruned")
    b = _ranged_table(spark, tmp_path, "full")
    stmts = [
        ("del", P.And(P.Ge("id", 100), P.Lt("id", 150))),
        ("upd", P.Lt("id", 40)),
        ("del", P.Or(P.Eq("tag", "u3"), P.Gt("id", 280))),
        ("upd", P.Between("val", 5.0, 6.0)),
    ]
    for kind, pred in stmts:
        if kind == "del":
            a.delete_where(pred)
            b.delete_where(pred.to_column())
        else:
            a.update_set(pred, {"val": F.col("val") + 100.0})
            b.update_set(pred.to_column(), {"val": F.col("val") + 100.0})
    for v in range(a.latest_version() + 1):
        assert _rows(a, v) == _rows(b, v), f"diverged at version {v}"


def test_prune_all_is_metadata_only_commit(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    before = _mtimes(t)
    groups_before = t._manifest(2)["file_groups"]
    v = t.delete_where(P.Gt("id", 10_000))  # matches nothing, anywhere
    assert v == 3 and _last_op(t) == "delete(pruned 0/3)"
    assert t._manifest(3)["file_groups"] == groups_before
    assert _mtimes(t) == before  # zero data IO
    assert len(_rows(t)) == 300


def test_delete_emptying_a_group_drops_it(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    t.delete_where(P.And(P.Ge("id", 200), P.Le("id", 299)))
    m = t._manifest(3)
    assert len(m["file_groups"]) == 2  # no 0-row group carried
    assert _rows(t) == sorted(
        (i, float(i % 7), f"u{i % 10}") for i in range(200)
    )


def test_pruned_merge_inserts_and_updates(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    before = _mtimes(t)
    src = spark.createDataFrame(
        [(150, -1.0, "xx"), (400, -2.0, "yy")],
        "id long, val double, tag string",
    )
    t.merge(src, ["id"])
    # source box [150, 400] overlaps groups 2 and 3 only; group 1
    # ([0,100)) is carried verbatim
    assert _last_op(t) == "merge(pruned 2/3)"
    m3 = t._manifest(3)
    carried = set(t._manifest(2)["file_groups"]) & set(m3["file_groups"])
    assert len(carried) == 1
    for p, m in before.items():
        if any(f"/{g}/" in p for g in carried):
            assert os.path.getmtime(p) == m
    rows = dict((r[0], (r[1], r[2])) for r in _rows(t))
    assert rows[150] == (-1.0, "xx") and rows[400] == (-2.0, "yy")
    assert len(rows) == 301


def test_merge_outside_every_group_still_inserts(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    src = spark.createDataFrame(
        [(900, 9.0, "new")], "id long, val double, tag string"
    )
    t.merge(src, ["id"])
    assert _last_op(t) == "merge(pruned 0/3)"
    assert (900, 9.0, "new") in _rows(t) and len(_rows(t)) == 301


def test_null_predicates_use_null_counts(spark, tmp_path):
    df_nn = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, tag string"
    )
    df_n = spark.createDataFrame(
        [(3, None), (4, "d")], "id long, tag string"
    )
    t = AcidTable.create(spark, os.path.join(str(tmp_path), "n"), df_nn)
    t.append(df_n)
    t.delete_where(P.IsNull("tag"))
    assert _last_op(t) == "delete(pruned 1/2)"
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 4]


def test_stats_survive_json_roundtrip(spark, tmp_path):
    """Manifest stats are plain JSON on disk — re-open the table cold
    and prune from the parsed file alone."""
    t = _ranged_table(spark, tmp_path)
    cold = AcidTable(spark, t.path)
    with open(cold._manifest_path(2)) as fh:
        m = json.load(fh)
    assert all(isinstance(v["id"][0], int) for v in m["stats"].values())
    cold.delete_where(P.Lt("id", 50))
    assert _last_op(cold) == "delete(pruned 1/3)"


def test_compact_merges_small_groups_only(spark, tmp_path):
    from gwasdb_spark.acid import AcidTable

    t = AcidTable.create(
        spark,
        os.path.join(str(tmp_path), "cmp"),
        spark.range(0, 100_000).selectExpr("id", "id * 2 AS v"),  # big
    )
    for lo in (0, 1, 2):  # three tiny streaming-shaped appends
        t.append(spark.range(lo * 10, lo * 10 + 10).selectExpr("id", "id AS v"))
    before = _mtimes(t)
    big = [
        g
        for g, st in t._manifest(3)["stats"].items()
        if st["id"][3] >= 100_000
    ]
    rows_before = sorted(r["id"] for r in t.read().collect())
    v = t.compact(small_rows=1000)
    m = t._manifest(v)
    assert m["op"] == "compact(pruned 3/4)"
    assert len(m["file_groups"]) == 2  # big + one merged
    assert set(big) < set(m["file_groups"])
    for p, mt in before.items():
        if any(f"/{g}/" in p for g in big):
            assert os.path.getmtime(p) == mt, "compact rewrote the big group"
    assert sorted(r["id"] for r in t.read().collect()) == rows_before
    # idempotent-ish: nothing left to merge
    assert t.compact(small_rows=1000) == v


def test_cluster_by_disjoint_boxes_enable_pruning(spark, tmp_path):
    from gwasdb_spark.acid import AcidTable
    from gwasdb_spark.acid import predicates as P

    # interleaved ingest: every group spans the whole id range
    def slice_mod(k):
        return spark.range(0, 4000).filter(F.col("id") % 4 == k).selectExpr(
            "id", "id % 7 AS v"
        )

    t = AcidTable.create(spark, os.path.join(str(tmp_path), "cl"), slice_mod(0))
    for k in (1, 2, 3):
        t.append(slice_mod(k))
    rows_before = sorted(r["id"] for r in t.read().collect())
    # pre-cluster: a range delete would touch every group
    pred = P.Between("id", 100, 200)
    m3 = t._manifest(3)
    assert all(
        pred.may_match(m3["stats"][g]) for g in m3["file_groups"]
    ), "interleaved ingest must defeat pruning (fixture precondition)"
    v = t.cluster_by("id", 4)
    m = t._manifest(v)
    assert m["op"] == "cluster(id, 4)"
    assert sorted(r["id"] for r in t.read().collect()) == rows_before
    boxes = sorted(st["id"][:2] for st in m["stats"].values())
    for (lo1, hi1), (lo2, hi2) in zip(boxes, boxes[1:]):
        assert hi1 < lo2, f"overlapping boxes {boxes}"
    t.delete_where(pred)
    assert t._manifest(v + 1)["op"] == "delete(pruned 1/4)"
    assert sorted(r["id"] for r in t.read().collect()) == [
        i for i in rows_before if not (100 <= i <= 200)
    ]


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """cluster_by_zorder keeps every group's bounding box compact in
    BOTH interleaved dimensions: a probe on the SECOND column alone —
    the 1-D clustering failure mode, where x-clustered groups carry
    full-range y stats — must scan fewer groups than the 1-D layout,
    and the layout change must be logically a no-op."""
    from gwasdb_spark.acid import AcidTable
    from gwasdb_spark.acid import predicates as P

    # 64x64 grid; interleaved ingest defeats pruning in both twins
    def slice_mod(k):
        return (
            spark.range(0, 4096)
            .filter(F.col("id") % 4 == k)
            .selectExpr("id % 64 AS x", "id div 64 AS y", "id AS payload")
        )

    linear = AcidTable.create(
        spark, os.path.join(str(tmp_path), "lin"), slice_mod(0)
    )
    zord = AcidTable.create(
        spark, os.path.join(str(tmp_path), "zo"), slice_mod(0)
    )
    for k in (1, 2, 3):
        linear.append(slice_mod(k))
        zord.append(slice_mod(k))
    rows_before = sorted(r["payload"] for r in zord.read().collect())

    linear.cluster_by("x", 16)
    v = zord.cluster_by_zorder(["x", "y"], n_groups=16, tiles=16)
    m = zord._manifest(v)
    assert m["op"].startswith("zorder(x,y,")
    assert sorted(r["payload"] for r in zord.read().collect()) == rows_before

    probe = P.Between("y", 8, 15)  # orthogonal to the 1-D cluster key
    lin_scanned, lin_total = linear.scan_groups(probe)
    zo_scanned, zo_total = zord.scan_groups(probe)
    assert lin_scanned == lin_total, "1-D layout cannot prune on y"
    assert zo_scanned < zo_total, "z-order must prune on y"
    assert zo_scanned < lin_scanned

    # a 2-D box delete is pruned, exact, and leaves the complement intact
    box = P.And(P.Between("x", 0, 63), P.Between("y", 8, 15))
    zord.delete_where(box)
    op = zord._manifest(zord.latest_version())["op"]
    scanned = int(op.split("pruned ")[1].split("/")[0])
    assert scanned < zo_total
    kept = sorted(r["payload"] for r in zord.read().collect())
    assert kept == [p for p in rows_before if not (8 <= p // 64 <= 15)]
