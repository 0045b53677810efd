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


def _real_png(width: int, height: int) -> bytes:
    """A fully VALID minimal PNG (correct CRCs, zlib IDAT) built from the
    stdlib alone — what an actual file on disk looks like."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _real_jpeg(width: int, height: int, progressive: bool = False) -> bytes:
    """A structurally real JPEG header stream: SOI, APP0/JFIF, a fat APP1
    (EXIF-shaped) segment the walker must skip by length, a comment, then
    SOF0 or SOF2 with the dims, and EOI."""
    import struct

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    sof = 0xC2 if progressive else 0xC0
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00")
        + seg(0xE1, b"Exif\x00\x00" + b"\xffZ" * 200)  # 0xFF bytes inside
        + seg(0xFE, b"a comment")
        + seg(
            sof,
            struct.pack(">BHHB", 8, height, width, 3)
            + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01",
        )
        + b"\xff\xd9"
    )


def test_parse_image_header_real_files():
    from gwasdb_spark.multimodal.binary import parse_image_header

    assert parse_image_header(_real_png(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_real_jpeg(1024, 768)) == ("jpeg", 1024, 768)
    # progressive JPEG (SOF2) and EXIF segments full of 0xFF bytes
    assert parse_image_header(_real_jpeg(31, 17, progressive=True)) == (
        "jpeg",
        31,
        17,
    )
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert parse_image_header(gif + b"\xf7\x00\x00rest") == ("gif", 320, 200)
    bmp = (
        b"BM" + b"\x00" * 16
        + (800).to_bytes(4, "little")
        + (-600).to_bytes(4, "little", signed=True)  # top-down rows
    )
    assert parse_image_header(bmp) == ("bmp", 800, 600)
    # truncated / garbage / empty
    assert parse_image_header(_real_png(9, 9)[:20]) is None
    assert parse_image_header(b"\xff\xd8\xff") is None  # JPEG cut mid-marker
    assert parse_image_header(b"not an image at all") is None
    assert parse_image_header(b"") is None
    assert parse_image_header(None) is None


def test_media_headers_stage_on_real_files(spark):
    from gwasdb_spark.multimodal.binary import media_headers

    rows = [
        (1, _real_png(12, 34)),
        (2, _real_jpeg(56, 78)),
        (3, b"garbage bytes"),
        (4, None),
    ]
    bt = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in media_headers(bt).collect()}
    assert (got[1].format, got[1].width, got[1].height, got[1].parse_status) == (
        "png", 12, 34, "ok"
    )
    assert (got[2].format, got[2].width, got[2].height, got[2].parse_status) == (
        "jpeg", 56, 78, "ok"
    )
    assert (got[3].format, got[3].parse_status) == (None, "unrecognized")
    assert (got[4].format, got[4].parse_status) == (None, "null_payload")
