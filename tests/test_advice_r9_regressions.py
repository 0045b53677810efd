"""Regression fixtures for the round-9 ADVICE items:

1. vacuum: an UNREFERENCED-by-any-manifest data group younger than the
   grace window must survive vacuum (it may be a concurrent writer's
   in-flight group whose commit is about to link); once older than the
   grace it is reapable garbage. Groups named only by pre-cutoff
   manifests stay removable at any age.
2. e15: a malformed props JSON value must become a NULL variant
   (try_parse_json), not crash the job — matching the DuckDB oracle's
   json_extract_string null semantics.
3. x150 stage keying: regenerating the documents parquet at the SAME
   path must change the BPE merge-stage key, so a warm stage can never
   serve a stale tokenizer for new data.
4. bench m03 reset: m03_reset_stage drops the staged AcidTable so a
   timed run replays the full DML sequence.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _mk_table(spark, tmp_path, name="t"):
    from gwasdb_spark.acid import AcidTable

    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    return AcidTable.create(spark, os.path.join(str(tmp_path), name), df)


def test_vacuum_spares_fresh_unreferenced_group(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.append(spark.range(5).selectExpr("id", "id AS v"))
    # Simulate a concurrent writer's in-flight (not-yet-committed) group:
    # a data dir no manifest names, freshly written.
    inflight = os.path.join(t.path, "data", "deadbeefcafe")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "wb") as fh:
        fh.write(b"stub")
    removed = t.vacuum(keep_last=1)
    assert "deadbeefcafe" not in removed
    assert os.path.isdir(inflight), (
        "vacuum deleted a fresh unreferenced group — a racing writer's "
        "imminent commit would reference files that no longer exist"
    )
    # Once older than the grace window it is crash garbage: reapable.
    old = time.time() - 7200
    os.utime(os.path.join(inflight, "part-0.parquet"), (old, old))
    os.utime(inflight, (old, old))
    removed = t.vacuum(keep_last=1, grace_seconds=3600)
    assert "deadbeefcafe" in removed and not os.path.isdir(inflight)


def test_vacuum_still_reaps_committed_history_regardless_of_age(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    t = _mk_table(spark, tmp_path)
    v0_groups = set(t._manifest(0)["file_groups"])
    t.delete_where(F.col("v") < 0)
    # v0's group is named only by the pre-cutoff manifest: removable
    # immediately even though it was written seconds ago.
    removed = t.vacuum(keep_last=1)
    assert v0_groups <= set(removed)


def test_e15_malformed_props_yields_null_variant_not_crash(spark):
    from gwasdb_spark.plans.mining_ops import variant_k_aggregate

    events = spark.createDataFrame(
        [
            ("click", '{"k": 3}'),
            ("click", "{not json"),  # malformed — used to crash parse_json
            ("view", '{"k": "str"}'),  # mistyped k → NULL bigint
            ("view", None),
        ],
        "event_type string, props string",
    )
    rows = {r["event_type"]: r for r in variant_k_aggregate(events).collect()}
    assert rows["click"]["n_with_k"] == 1 and rows["click"]["sum_k"] == 3
    assert rows["view"]["n_with_k"] == 0 and rows["view"]["sum_k"] is None


def _write_docs(sf_dir, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "source": ["fixture"] * len(texts),
            "lang": ["en"] * len(texts),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(sf_dir, "documents.parquet"),
    )


def test_bpe_stage_key_changes_when_corpus_regenerated(tmp_path):
    from gwasdb_spark.plans.mining_ops import _bpe_merges_stage

    sf_dir = str(tmp_path)
    _write_docs(sf_dir, ["alpha beta", "beta gamma"])
    key1 = _bpe_merges_stage(sf_dir)
    assert key1 == _bpe_merges_stage(sf_dir), "key must be stable unchanged"
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    _write_docs(sf_dir, ["alpha beta", "beta gamma"])  # same content, new file
    key2 = _bpe_merges_stage(sf_dir)
    assert key2 != key1, (
        "regenerated corpus at the same path must invalidate the warm "
        "BPE merge stage"
    )


def test_m03_reset_stage_forces_full_replay(spark):
    from gwasdb_spark.acid import AcidTable
    from gwasdb_spark.plans import QUERIES
    from gwasdb_spark.plans.mining_ops import m03_reset_stage, m03_stage

    sf_dir = os.environ.get("GWASDB_TEST_SF_DIR", "/root/testdata/sf0.001")
    QUERIES["m03_acid_timetravel"].fn(spark, sf_dir).collect()
    assert AcidTable(spark, m03_stage(sf_dir)).latest_version() == 3
    m03_reset_stage(sf_dir)
    assert AcidTable(spark, m03_stage(sf_dir)).latest_version() == -1
    # And the replay reconstructs the identical 4-version history.
    out = {
        r["version"]: (r["n_rows"], r["sum_cents"])
        for r in QUERIES["m03_acid_timetravel"].fn(spark, sf_dir).collect()
    }
    assert set(out) == {0, 1, 2, 3}
