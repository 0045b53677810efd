"""Multi-table atomic commit (acid/multi_commit.py — r12 verdict #3):
the reference's gwas + no_gwas_result QC split is ONE transaction
(R/wrangle_data.Rmd:365,376-381). Pins: (1) happy path commits both
tables in one marker link; (2) every pre-marker crash point leaves
BOTH tables at their old snapshots and recovery aborts cleanly;
(3) the post-marker crash point leaves both tables COMMITTED and
recovery just finalizes; (4) pending transactions block concurrent
single-table writers instead of reordering around them; (5) a CHECK
violation in either table aborts the whole statement; (6) explicit
time travel into a pending slot refuses."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gwasdb_spark.acid import AcidTable, CheckViolation, CommitConflict
from gwasdb_spark.acid.multi_commit import InjectedCrash, MultiTableTxn


def _mk_tables(spark, tmp_path, checks=None):
    gwas = AcidTable.create(
        spark, os.path.join(str(tmp_path), "gwas"),
        spark.range(5).select("id", F.lit("seed").alias("src")),
        checks=checks,
    )
    nog = AcidTable.create(
        spark, os.path.join(str(tmp_path), "no_gwas"),
        spark.range(100, 102).select("id", F.lit("seed").alias("src")),
        checks=checks,
    )
    return gwas, nog


def _batches(spark):
    keep = spark.range(10, 15).select("id", F.lit("b1").alias("src"))
    drop = spark.range(110, 113).select("id", F.lit("b1").alias("src"))
    return keep, drop


def test_happy_path_commits_both(spark, tmp_path):
    gwas, nog = _mk_tables(spark, tmp_path)
    txn = MultiTableTxn(spark, os.path.join(str(tmp_path), "txn"))
    keep, drop = _batches(spark)
    out = txn.commit_appends([(gwas, keep), (nog, drop)], op="qc_split")
    assert out == {gwas.path: 1, nog.path: 1}
    assert gwas.latest_version() == 1 and nog.latest_version() == 1
    assert gwas.read().count() == 10 and nog.read().count() == 5
    assert [h["op"] for h in gwas.history()] == ["create", "qc_split"]
    # intent reaped, marker retained (manifests reference it)
    names = os.listdir(txn.root)
    assert not any(n.endswith(".intent.json") for n in names)
    assert sum(1 for n in names if n.endswith(".commit")) == 1


@pytest.mark.parametrize(
    "failpoint", ["stage", "intent", "manifest1", "manifests"]
)
def test_pre_marker_crash_leaves_both_tables_old(spark, tmp_path, failpoint):
    gwas, nog = _mk_tables(spark, tmp_path)
    txn = MultiTableTxn(spark, os.path.join(str(tmp_path), "txn"))
    keep, drop = _batches(spark)
    with pytest.raises(InjectedCrash):
        txn.commit_appends(
            [(gwas, keep), (nog, drop)], failpoint=failpoint
        )
    # INVARIANT: no reader anywhere sees half the QC decision
    assert gwas.latest_version() == 0 and nog.latest_version() == 0
    assert gwas.read().count() == 5 and nog.read().count() == 2

    aborted_expected = failpoint in ("intent", "manifest1", "manifests")
    rep = txn.recover()
    assert rep["aborted"] == (1 if aborted_expected else 0)
    # post-recovery the log is unblocked: the same txn lands cleanly
    out = txn.commit_appends([(gwas, keep), (nog, drop)])
    assert out == {gwas.path: 1, nog.path: 1}
    assert gwas.read().count() == 10 and nog.read().count() == 5


def test_post_marker_crash_is_committed(spark, tmp_path):
    gwas, nog = _mk_tables(spark, tmp_path)
    txn = MultiTableTxn(spark, os.path.join(str(tmp_path), "txn"))
    keep, drop = _batches(spark)
    with pytest.raises(InjectedCrash):
        txn.commit_appends([(gwas, keep), (nog, drop)], failpoint="marker")
    # the marker linked: BOTH tables are committed despite the crash
    assert gwas.latest_version() == 1 and nog.latest_version() == 1
    assert gwas.read().count() == 10 and nog.read().count() == 5
    rep = txn.recover()
    assert rep == {"finalized": 1, "aborted": 0}
    assert not any(
        n.endswith(".intent.json") for n in os.listdir(txn.root)
    )


def test_pending_txn_blocks_single_table_writers(spark, tmp_path):
    gwas, nog = _mk_tables(spark, tmp_path)
    txn = MultiTableTxn(spark, os.path.join(str(tmp_path), "txn"))
    keep, drop = _batches(spark)
    with pytest.raises(InjectedCrash):
        txn.commit_appends(
            [(gwas, keep), (nog, drop)], failpoint="manifests"
        )
    # slot 1 is physically taken but invisible: a blind append must
    # CONFLICT, not skip over it or base on the pending snapshot
    extra = spark.range(50, 52).select("id", F.lit("x").alias("src"))
    with pytest.raises(CommitConflict):
        gwas.append(extra)
    # explicit time travel into the pending slot refuses
    with pytest.raises(FileNotFoundError):
        gwas.read(1)
    txn.recover()
    assert gwas.append(extra) == 1
    assert gwas.read().count() == 7


def test_check_violation_in_either_table_aborts_both(spark, tmp_path):
    gwas, nog = _mk_tables(spark, tmp_path, checks={"pos": "id >= 0"})
    txn = MultiTableTxn(spark, os.path.join(str(tmp_path), "txn"))
    keep = spark.range(10, 15).select("id", F.lit("b1").alias("src"))
    bad = spark.createDataFrame(
        [(-1, "b1")], "id long, src string"
    )
    with pytest.raises(CheckViolation):
        txn.commit_appends([(gwas, keep), (nog, bad)])
    assert gwas.latest_version() == 0 and nog.latest_version() == 0
    assert gwas.read().count() == 5 and nog.read().count() == 2
    # nothing pending, nothing to recover
    assert txn.recover() == {"finalized": 0, "aborted": 0}


def test_version_race_retries_against_fresh_snapshot(spark, tmp_path):
    """A single-table writer steals the version slot between staging
    and publication: the transaction unwinds its invisible partial
    state and retries on the new snapshot."""
    gwas, nog = _mk_tables(spark, tmp_path)
    txn = MultiTableTxn(spark, os.path.join(str(tmp_path), "txn"))
    keep, drop = _batches(spark)

    real_commit = AcidTable._commit
    fired = {"done": False}

    def racing_commit(self, version, *a, **kw):
        if not fired["done"] and self.path == gwas.path:
            fired["done"] = True
            # the rival lands first, taking the slot
            rival = spark.range(60, 61).select(
                "id", F.lit("rival").alias("src")
            )
            gwas.append(rival)
        return real_commit(self, version, *a, **kw)

    AcidTable._commit = racing_commit
    try:
        out = txn.commit_appends([(gwas, keep), (nog, drop)])
    finally:
        AcidTable._commit = real_commit
    assert out == {gwas.path: 2, nog.path: 1}
    assert gwas.read().count() == 11  # 5 seed + 1 rival + 5 batch
    assert nog.read().count() == 5
    # no litter from the unwound first attempt
    assert not any(
        n.endswith(".intent.json") for n in os.listdir(txn.root)
    )
    assert [h["version"] for h in gwas.history()] == [0, 1, 2]


def test_vacuum_markers_spares_referenced_reaps_inert(spark, tmp_path):
    """Marker GC: a marker referenced by ANY retained manifest
    survives; once AcidTable.vacuum has dropped every manifest naming
    a txn, its marker is reaped. Reaping a live marker would flip a
    committed version invisible — the test proves reads survive GC."""
    gwas, nog = _mk_tables(spark, tmp_path)
    txn = MultiTableTxn(spark, os.path.join(str(tmp_path), "txn"))
    keep, drop = _batches(spark)
    txn.commit_appends([(gwas, keep), (nog, drop)], op="qc1")  # v1
    extra = spark.range(200, 203).select("id", F.lit("b2").alias("src"))
    txn.commit_appends([(gwas, extra), (nog, extra)], op="qc2")  # v2

    # both markers referenced by retained manifests: nothing reaped
    assert txn.vacuum_markers([gwas, nog]) == []
    assert gwas.read(1).count() == 10  # visibility intact

    # vacuum both tables down to the tip only: v1's manifests drop,
    # qc1's marker becomes inert; qc2's is still referenced by v2
    gwas.vacuum(keep_last=1, grace_seconds=0)
    nog.vacuum(keep_last=1, grace_seconds=0)
    reaped = txn.vacuum_markers([gwas, nog])
    assert len(reaped) == 1
    assert gwas.latest_version() == 2 and nog.latest_version() == 2
    assert gwas.read().count() == 13 and nog.read().count() == 8
    # exactly one marker left, and it is qc2's (still referenced)
    markers = [n for n in os.listdir(txn.root) if n.endswith(".commit")]
    assert len(markers) == 1


def test_committed_txns_orders_and_excludes_pending(spark, tmp_path):
    """The changefeed enumeration (m14's spine): committed txns come
    back in commit order with their per-table version maps; a PENDING
    transaction (manifests linked, marker absent) is excluded until it
    commits, and stays excluded after recover() aborts it."""
    gwas, nog = _mk_tables(spark, tmp_path)
    txn = MultiTableTxn(spark, os.path.join(str(tmp_path), "txn"))
    keep, drop = _batches(spark)
    txn.commit_appends([(gwas, keep), (nog, drop)], op="t1")
    txn.commit_appends([(gwas, keep), (nog, drop)], op="t2")
    feed = txn.committed_txns([gwas, nog])
    assert [sorted(e["tables"].values()) for e in feed] == [[1, 1], [2, 2]]
    assert len({e["id"] for e in feed}) == 2
    # a pending txn must not surface in the feed
    with pytest.raises(InjectedCrash):
        txn.commit_appends(
            [(gwas, keep), (nog, drop)], op="t3", failpoint="manifests"
        )
    assert len(txn.committed_txns([gwas, nog])) == 2
    txn.recover()
    assert len(txn.committed_txns([gwas, nog])) == 2


def test_txn_snapshot_divergent_versions(spark, tmp_path):
    """The cut m14 adjudicates, reduced to its engine kernel: after an
    interleaved single-table append the pair's version counters
    diverge, and the naive same-version-number read is WRONG — the
    recorded cut is right. Also pins the refusals: a non-participant
    table and an unknown txn id both raise."""
    gwas, nog = _mk_tables(spark, tmp_path)
    txn = MultiTableTxn(spark, os.path.join(str(tmp_path), "txn"))
    keep, drop = _batches(spark)
    txn.commit_appends([(gwas, keep), (nog, drop)], op="tA")
    # gwas-only correction: gwas v2, no_gwas still v1
    gwas.append(
        spark.range(1000, 1003).select("id", F.lit("fix").alias("src")),
        op="correction",
    )
    txn.commit_appends([(gwas, keep), (nog, drop)], op="tB")
    feed = txn.committed_txns([gwas, nog])
    cut_a = txn.txn_snapshot([gwas, nog], feed[0]["id"])
    cut_b = txn.txn_snapshot([gwas, nog], feed[1]["id"])
    assert cut_a == {gwas.path: 1, nog.path: 1}
    assert cut_b == {gwas.path: 3, nog.path: 2}  # NOT (2, 2)
    # cut A excludes the correction; cut B includes it
    assert gwas.read(cut_a[gwas.path]).filter(
        F.col("src") == "fix"
    ).count() == 0
    assert gwas.read(cut_b[gwas.path]).filter(
        F.col("src") == "fix"
    ).count() == 3
    other = AcidTable.create(
        spark, os.path.join(str(tmp_path), "other"),
        spark.range(3).select("id", F.lit("x").alias("src")),
    )
    with pytest.raises(ValueError, match="did not participate"):
        txn.txn_snapshot([gwas, other], feed[0]["id"])
    with pytest.raises(FileNotFoundError, match="not committed"):
        txn.txn_snapshot([gwas, nog], "deadbeef")
