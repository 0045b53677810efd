"""CHECK constraints and bloom-filter skipping in the ACID table
(r9 verdict "missing #4" — Delta CHECK constraints and bloom-filter
metadata, re-implemented natively since the container ships no jar).

Load-bearing contracts:

1. REJECTED MEANS UNCHANGED — a write violating a CHECK aborts with
   CheckViolation, commits NO version, and leaves no orphan group in
   a manifest (the violating group's files are removed).
2. NULL PASSES — SQL CHECK semantics: only FALSE rows violate.
3. BLOOM SOUNDNESS — no false negatives: every value written to a
   group is admitted by its bloom; pruning on a bloom NO commits the
   identical table as the unpruned twin.
4. BLOOM SKIPPING — a point DELETE on an interleaved key (min/max
   useless) touches only bloom-admitting groups; untouched groups'
   files stay mtime-stable.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from gwasdb_spark.acid import AcidTable, CheckViolation
from gwasdb_spark.acid import bloom as B
from gwasdb_spark.acid import predicates as P


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 7).cast("double").alias("val"),
        F.concat(F.lit("u"), (F.col("id") % 10)).alias("tag"),
    )


def _rows(t, version=None):
    return sorted(
        (r["id"], r["val"], r["tag"]) for r in t.read(version).collect()
    )


def _mtimes(t):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(t._data, "*", "*.parquet"))
    }


# ------------------------------------------------------------- checks --


def test_check_rejects_violating_append_atomically(spark, tmp_path):
    t = AcidTable.create(
        spark,
        os.path.join(str(tmp_path), "chk"),
        _batch(spark, 0, 50),
        checks={"val_nonneg": "val >= 0"},
    )
    v_before = t.latest_version()
    rows_before = _rows(t)
    bad = _batch(spark, 50, 60).withColumn(
        "val", F.when(F.col("id") == 55, -1.0).otherwise(F.col("val"))
    )
    with pytest.raises(CheckViolation, match="val_nonneg"):
        t.append(bad)
    assert t.latest_version() == v_before, "violating append committed"
    assert _rows(t) == rows_before
    # no manifest names a group that does not exist; no orphan group is
    # named by any manifest
    m = t._manifest(v_before)
    for g in m["file_groups"]:
        assert os.path.isdir(os.path.join(t._data, g))


def test_check_valid_append_and_update_pass(spark, tmp_path):
    t = AcidTable.create(
        spark,
        os.path.join(str(tmp_path), "chk2"),
        _batch(spark, 0, 50),
        checks={"val_nonneg": "val >= 0"},
    )
    t.append(_batch(spark, 50, 100))
    assert len(_rows(t)) == 100
    # an UPDATE whose transform violates the check aborts too
    with pytest.raises(CheckViolation):
        t.update_set(
            P.Lt("id", 10), {"val": F.col("val") - F.lit(100.0)}
        )
    assert len(_rows(t)) == 100
    # and a compliant update commits
    v = t.update_set(P.Lt("id", 10), {"val": F.col("val") + F.lit(1.0)})
    assert t.latest_version() == v


def test_check_null_rows_pass(spark, tmp_path):
    t = AcidTable.create(
        spark,
        os.path.join(str(tmp_path), "chk3"),
        _batch(spark, 0, 10),
        checks={"val_nonneg": "val >= 0"},
    )
    # NULL val → CHECK is UNKNOWN → passes (SQL semantics)
    nulls = _batch(spark, 10, 15).withColumn(
        "val", F.lit(None).cast("double")
    )
    t.append(nulls)
    assert len(_rows(t)) == 15


def test_add_check_validates_snapshot_and_drop_restores(spark, tmp_path):
    t = AcidTable.create(
        spark, os.path.join(str(tmp_path), "chk4"), _batch(spark, 0, 50)
    )
    # existing data violates → refuse, no version committed
    v0 = t.latest_version()
    with pytest.raises(CheckViolation, match="val_small"):
        t.add_check("val_small", "val < 3")
    assert t.latest_version() == v0
    # a satisfiable constraint lands as a metadata-only version
    v1 = t.add_check("val_nonneg", "val >= 0")
    assert v1 == v0 + 1
    assert t._manifest(v1)["file_groups"] == t._manifest(v0)["file_groups"]
    assert t.checks() == {"val_nonneg": "val >= 0"}
    with pytest.raises(ValueError):
        t.add_check("val_nonneg", "val >= 0")
    # enforcement active → drop → the same write passes
    bad = _batch(spark, 50, 55).withColumn("val", F.lit(-1.0))
    with pytest.raises(CheckViolation):
        t.append(bad)
    t.drop_check("val_nonneg")
    assert t.checks() == {}
    t.append(bad)
    assert len(_rows(t)) == 55


def test_checks_survive_reopen_and_merge(spark, tmp_path):
    path = os.path.join(str(tmp_path), "chk5")
    AcidTable.create(
        spark, path, _batch(spark, 0, 50), checks={"pos": "id >= 0"}
    )
    t2 = AcidTable(spark, path)  # fresh handle, metadata from the log
    assert t2.checks() == {"pos": "id >= 0"}
    src = _batch(spark, 45, 55).withColumn(
        "id", F.when(F.col("id") == 50, -50).otherwise(F.col("id"))
    )
    with pytest.raises(CheckViolation):
        t2.merge(src, ["id"])
    assert len(_rows(t2)) == 50  # merge aborted atomically


# -------------------------------------------------------------- bloom --


def test_bloom_position_parity_jvm_vs_python(spark):
    """The JVM build-side hash and the Python probe-side hash must
    agree bit-for-bit or skipping silently breaks."""
    vals = [0, 1, 42, 10**12, "x", "u7", "", "snp_rs12345"]
    m = 1 << 14
    df = spark.createDataFrame(
        [(str(v),) for v in vals], "v string"
    ).select(
        "v",
        F.array(
            *[B._position_col("v", s, m) for s in range(B.BLOOM_K)]
        ).alias("pos"),
    )
    jvm = {r["v"]: list(r["pos"]) for r in df.collect()}
    for v in vals:
        assert jvm[str(v)] == B.python_positions(v, m), v


def test_bloom_no_false_negatives(spark, tmp_path):
    t = AcidTable.create(
        spark,
        os.path.join(str(tmp_path), "bl"),
        _batch(spark, 0, 500),
        bloom_cols=["id", "tag"],
    )
    g = t._manifest(0)["file_groups"][0]
    side = B.read_sidecar(os.path.join(t._data, g))
    assert set(side) == {"id", "tag"}
    for v in range(0, 500, 37):
        assert B.may_contain(side["id"], v)
    for v in [f"u{d}" for d in range(10)]:
        assert B.may_contain(side["tag"], v)
    # a value far outside: overwhelmingly rejected (deterministic here)
    assert not B.may_contain(side["id"], 10**9 + 7)


def test_bloom_prunes_interleaved_point_delete(spark, tmp_path):
    """Round-robin groups: every group's [min,max] on id spans the
    whole range, so min/max alone prunes nothing — the bloom must."""
    path = os.path.join(str(tmp_path), "bl2")

    def slice_mod(r):
        return _batch(spark, 0, 300).filter(F.col("id") % 3 == r)

    t = AcidTable.create(spark, path, slice_mod(0), bloom_cols=["id"])
    t.append(slice_mod(1))
    t.append(slice_mod(2))
    # twin without blooms, fed the identical statement
    twin = AcidTable.create(
        spark, os.path.join(str(tmp_path), "bl2t"), slice_mod(0)
    )
    twin.append(slice_mod(1))
    twin.append(slice_mod(2))

    before = _mtimes(t)
    t.delete_where(P.Eq("id", 77))  # 77 % 3 == 2 → third group only
    twin.delete_where(P.Eq("id", 77))
    assert _rows(t) == _rows(twin), "bloom pruning changed the result"
    op = t._manifest(t.latest_version())["op"]
    assert op == "delete(pruned 1/3)", op
    after = _mtimes(t)
    untouched = [p for p in before if p in after]
    assert len(untouched) >= 2 * len(before) // 3
    assert all(before[p] == after[p] for p in untouched)


def test_bloom_isin_and_conjunct_pruning(spark, tmp_path):
    path = os.path.join(str(tmp_path), "bl3")

    def slice_mod(r):
        return _batch(spark, 0, 300).filter(F.col("id") % 3 == r)

    t = AcidTable.create(spark, path, slice_mod(0), bloom_cols=["id"])
    t.append(slice_mod(1))
    t.append(slice_mod(2))
    # IsIn hitting residues {0, 1} → groups 0 and 1 touched, group 2 not
    t.delete_where(P.IsIn("id", [30, 31]))
    op = t._manifest(t.latest_version())["op"]
    assert op == "delete(pruned 2/3)", op
    # the delete rewrote its two touched groups into ONE new group
    # (which got a fresh bloom sidecar) → table now holds 2 groups.
    # And(Eq on bloom col, range on other) still prunes via the Eq:
    # id 90 (residue 0) lives in the rewritten group only.
    t.update_set(
        P.And(P.Eq("id", 90), P.Ge("val", 0.0)),
        {"val": F.lit(99.0)},
    )
    op = t._manifest(t.latest_version())["op"]
    assert op == "update(pruned 1/2)", op
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[90] == 99.0 and 30 not in got and 31 not in got


def test_bloom_sidecars_rebuilt_by_compact_and_cluster(spark, tmp_path):
    path = os.path.join(str(tmp_path), "bl4")
    t = AcidTable.create(
        spark, path, _batch(spark, 0, 100), bloom_cols=["id"]
    )
    t.append(_batch(spark, 100, 200))
    t.compact(small_rows=10**6)  # both groups are "small" → one group
    m = t._manifest(t.latest_version())
    assert len(m["file_groups"]) == 1
    side = B.read_sidecar(os.path.join(t._data, m["file_groups"][0]))
    assert "id" in side and B.may_contain(side["id"], 150)
    t.cluster_by("id", n_groups=4)
    m = t._manifest(t.latest_version())
    assert len(m["file_groups"]) >= 2
    for g in m["file_groups"]:
        assert "id" in B.read_sidecar(os.path.join(t._data, g))
    # skipping still works on the clustered layout
    t.delete_where(P.Eq("id", 150))
    op = t._manifest(t.latest_version())["op"]
    assert op.startswith("delete(pruned 1/"), op
