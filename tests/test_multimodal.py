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


def _ref_bmp(img):
    """Pure-python/numpy reference encoder (independent of encode_bmp's
    byte plumbing): uncompressed 24-bit bottom-up BMP."""
    import numpy as np

    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    size = 54 + stride * h
    head = bytearray(54)
    head[0:2] = b"BM"
    head[2:6] = size.to_bytes(4, "little")
    head[10:14] = (54).to_bytes(4, "little")
    head[14:18] = (40).to_bytes(4, "little")
    head[18:22] = w.to_bytes(4, "little")
    head[22:26] = h.to_bytes(4, "little")
    head[26:28] = (1).to_bytes(2, "little")
    head[28:30] = (24).to_bytes(2, "little")
    head[34:38] = (stride * h).to_bytes(4, "little")
    head[38:42] = (2835).to_bytes(4, "little")
    head[42:46] = (2835).to_bytes(4, "little")
    body = b""
    for y in range(h - 1, -1, -1):
        row = img[y, :, ::-1].tobytes()
        body += row + b"\x00" * (stride - w * 3)
    return bytes(head) + body


def test_bmp_decode_roundtrip_including_padded_strides():
    import numpy as np

    from gwasdb_spark.multimodal.binary import decode_bmp, encode_bmp

    rng = np.random.default_rng(5)
    for w, h in [(4, 4), (3, 5), (5, 3), (1, 1), (7, 2)]:  # odd widths pad
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        # decode of an INDEPENDENT reference encoding
        assert np.array_equal(decode_bmp(_ref_bmp(img)), img)
        # own-encoder round trip
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_decode_topdown_rows():
    import numpy as np

    from gwasdb_spark.multimodal.binary import decode_bmp

    img = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    buf = bytearray(_ref_bmp(img))
    # flip to top-down: negative height, rows in image order
    buf[22:26] = (-2).to_bytes(4, "little", signed=True)
    stride = 12
    body = b"".join(img[y, :, ::-1].tobytes() for y in range(2))
    buf[54 : 54 + 2 * stride] = body
    assert np.array_equal(decode_bmp(bytes(buf)), img)


def test_bmp_decode_rejects_unsupported():
    from gwasdb_spark.multimodal.binary import decode_bmp

    assert decode_bmp(None) is None
    assert decode_bmp(b"not a bmp") is None
    assert decode_bmp(b"BM" + b"\x00" * 52) is None  # zero dims
    # truncated pixel data
    import numpy as np

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    assert decode_bmp(_ref_bmp(img)[:-5]) is None


def test_resize_nearest_is_floor_index_map():
    import numpy as np

    from gwasdb_spark.multimodal.binary import resize_nearest

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    up = resize_nearest(img, 8, 8)
    for y in range(8):
        for x in range(8):
            assert (up[y, x] == img[(y * 4) // 8, (x * 4) // 8]).all()
    down = resize_nearest(img, 2, 2)
    assert np.array_equal(down, img[[0, 2]][:, [0, 2]])


def test_resize_images_real_path_matches_numpy(spark):
    """End-to-end Spark parity: a real BMP payload through resize_images
    must equal the pure-numpy decode->nearest->encode pipeline
    bit-for-bit, with pixel_sum exact; non-BMP payloads keep the stub
    contract."""
    import numpy as np

    from gwasdb_spark.multimodal.binary import (
        decode_bmp,
        encode_bmp,
        resize_images,
        resize_nearest,
    )

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # padded
    bmp = _ref_bmp(img)
    rows = [
        (1, "image/bmp", len(bmp), "d", bytearray(bmp)),
        (2, "text/plain", 4, "d", bytearray(b"text")),
    ]
    bt = spark.createDataFrame(
        rows,
        "doc_id long, media_type string, n_bytes long, digest string, "
        "payload binary",
    )
    out = {r.doc_id: r for r in resize_images(bt, 8, 8).collect()}
    expect = encode_bmp(resize_nearest(img, 8, 8))
    assert bytes(out[1].payload) == expect
    assert out[1].decode_status == "ok_real"
    assert out[1].pixel_sum == int(
        resize_nearest(img, 8, 8).sum(dtype=np.int64)
    )
    assert out[2].decode_status == "ok_fake"
    assert len(bytes(out[2].payload)) == 64 and out[2].pixel_sum is None
