"""Multimodal binary plumbing: determinism, batch shapes, frame geometry."""

from __future__ import annotations

from pyspark.sql import functions as F

from gwasdb_spark.multimodal.binary import (
    FEATURE_DIM,
    extract_fake_features,
    resize_images,
    sample_frames,
    to_binary_table,
)

from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_fake_features_deterministic(spark):
    bt = to_binary_table(_docs(spark))
    a = {r.doc_id: tuple(r.feature) for r in extract_fake_features(bt).collect()}
    b = {r.doc_id: tuple(r.feature) for r in extract_fake_features(bt).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert all(0.0 <= x <= 1.0 for v in a.values() for x in v)


def test_resize_payload_sizes(spark):
    bt = to_binary_table(_docs(spark))
    out = resize_images(bt, width=8, height=8)
    sizes = out.select(F.octet_length("payload").alias("n")).distinct().collect()
    assert [r.n for r in sizes] == [64]
    assert out.count() == bt.count()
    # deterministic across runs
    a = {r.doc_id: bytes(r.payload) for r in out.collect()}
    b = {r.doc_id: bytes(r.payload) for r in resize_images(bt, 8, 8).collect()}
    assert a == b


def test_frame_sample_geometry(spark):
    bt = to_binary_table(_docs(spark))
    frames = sample_frames(bt, frame_bytes=64, every_n=4)
    joined = (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.max("frame_idx").alias("max_idx"))
        .join(bt.select("doc_id", "n_bytes"), "doc_id")
        .collect()
    )
    for r in joined:
        n_frames = (r.n_bytes + 63) // 64
        expect = (n_frames + 3) // 4
        assert r.n_sampled == expect, (r.doc_id, r.n_sampled, expect)
        assert r.max_idx % 4 == 0


def test_null_payload_hardening(spark):
    deg = spark.createDataFrame(
        [(1, None), (2, "real text payload"), (3, "")],
        "doc_id long, text string",
    )
    bt = to_binary_table(deg)
    feats = {r.doc_id: (r.feature, r.decode_status)
             for r in extract_fake_features(bt).collect()}
    assert feats[1] == (None, "null_payload")
    assert feats[2][1] == "ok_fake" and len(feats[2][0]) == FEATURE_DIM
    thumbs = {r.doc_id: (r.payload, r.decode_status)
              for r in resize_images(bt).collect()}
    assert thumbs[1] == (None, "null_payload")
    assert len(bytes(thumbs[2][0])) == 64
    # null payloads yield no frames; empty payloads yield no frames
    assert sample_frames(bt).filter("doc_id != 2").count() == 0
    assert sample_frames(bt).filter("doc_id = 2").count() == 1
