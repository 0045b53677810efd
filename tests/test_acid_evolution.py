"""Schema evolution and serving-path skipping in the ACID table.

- `append(df, merge_schema=True)` widens the manifest schema with the
  batch's new columns: ZERO data IO on existing groups, which
  null-fill the new columns at read time (Delta mergeSchema).
- Shared columns must keep their exact type; new columns without the
  opt-in raise SchemaMismatch and commit nothing.
- `read_where(Pred)` lists only stat/bloom-admitting groups to Spark
  (the serving twin of pruned DML); `scan_groups` pins the count.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from gwasdb_spark.acid import AcidTable
from gwasdb_spark.acid import predicates as P
from gwasdb_spark.acid.table_log import SchemaMismatch


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("val")
    )


def _mtimes(t):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(t._data, "*", "*.parquet"))
    }


def test_merge_schema_append_widens_with_zero_rewrite(spark, tmp_path):
    t = AcidTable.create(
        spark, os.path.join(str(tmp_path), "ev"), _batch(spark, 0, 100)
    )
    before = _mtimes(t)
    wide = _batch(spark, 100, 150).withColumn(
        "src", F.concat(F.lit("s"), F.col("id") % 3)
    )
    t.append(wide, merge_schema=True)
    after = _mtimes(t)
    # evolution is metadata + one new group: old files untouched
    assert all(after[p] == m for p, m in before.items())
    got = t.read()
    assert got.columns == ["id", "val", "src"]
    rows = {r["id"]: r["src"] for r in got.collect()}
    assert len(rows) == 150
    assert rows[5] is None and rows[120] == "s0"
    # time travel preserves each version's OWN schema
    assert t.read(0).columns == ["id", "val"]


def test_schema_mismatch_rejected_without_optin(spark, tmp_path):
    t = AcidTable.create(
        spark, os.path.join(str(tmp_path), "ev2"), _batch(spark, 0, 50)
    )
    v0 = t.latest_version()
    wide = _batch(spark, 50, 60).withColumn("extra", F.lit(1))
    with pytest.raises(SchemaMismatch, match="extra"):
        t.append(wide)
    assert t.latest_version() == v0
    # a type change is rejected even WITH the opt-in
    retyped = _batch(spark, 50, 60).withColumn(
        "val", F.col("val").cast("string")
    )
    with pytest.raises(SchemaMismatch, match="val"):
        t.append(retyped, merge_schema=True)
    assert t.latest_version() == v0


def test_append_missing_column_null_fills(spark, tmp_path):
    t = AcidTable.create(
        spark, os.path.join(str(tmp_path), "ev3"), _batch(spark, 0, 50)
    )
    t.append(spark.range(50, 60).select("id"))  # no val column
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert len(got) == 60 and got[55] is None and got[3] == 3.0


def test_dml_over_evolved_table_keeps_wide_schema(spark, tmp_path):
    """A pruned DML touching only a PRE-evolution group must not
    narrow the table: the touched group is read under the manifest
    schema (null-filled), so its rewrite keeps the wide shape."""
    t = AcidTable.create(
        spark, os.path.join(str(tmp_path), "ev4"), _batch(spark, 0, 100)
    )
    t.append(
        _batch(spark, 100, 200).withColumn("src", F.lit("new")),
        merge_schema=True,
    )
    t.delete_where(P.Lt("id", 10))  # touches only the old group
    got = t.read()
    assert got.columns == ["id", "val", "src"]
    assert got.count() == 190
    assert got.filter(F.col("id") < 10).count() == 0
    # the old group's survivors still read src as NULL
    assert got.filter((F.col("id") == 50) & F.col("src").isNull()).count() == 1


def test_read_where_prunes_and_matches_full_filter(spark, tmp_path):
    t = AcidTable.create(
        spark, os.path.join(str(tmp_path), "rw"), _batch(spark, 0, 100)
    )
    t.append(_batch(spark, 100, 200))
    t.append(_batch(spark, 200, 300))
    pred = P.And(P.Ge("id", 120), P.Lt("id", 130))
    assert t.scan_groups(pred) == (1, 3)
    a = sorted(r["id"] for r in t.read_where(pred).collect())
    b = sorted(
        r["id"] for r in t.read().filter(pred.to_column()).collect()
    )
    assert a == b == list(range(120, 130))
    # all-pruned lookup: empty frame, right schema, no files listed
    none = t.read_where(P.Eq("id", 10**9))
    assert none.columns == ["id", "val"] and none.count() == 0
    # plain Column fallback still answers
    assert t.read_where(F.col("id") == 5).count() == 1


def test_read_where_uses_bloom(spark, tmp_path):
    def slice_mod(r):
        return _batch(spark, 0, 300).filter(F.col("id") % 3 == r)

    t = AcidTable.create(
        spark,
        os.path.join(str(tmp_path), "rwb"),
        slice_mod(0),
        bloom_cols=["id"],
    )
    t.append(slice_mod(1))
    t.append(slice_mod(2))
    # min/max is blind here (interleaved); the bloom prunes to 1 group
    assert t.scan_groups(P.Eq("id", 77)) == (1, 3)
    assert [r["id"] for r in t.read_where(P.Eq("id", 77)).collect()] == [77]
