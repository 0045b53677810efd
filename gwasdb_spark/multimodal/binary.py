"""Opaque-binary multimodal columns over mapInPandas.

Design: media (image/audio/video) travels as a `binary` column plus typed
metadata (media_type, n_bytes, digest). Decode / feature-extract / resize /
frame-sample run as Arrow-batched `mapInPandas` stages — each batch is a
pandas DataFrame whose `payload` column holds raw bytes; the UDF never sees
one row at a time.

The actual media decoders are STUBBED: `decode_image` raises
NotImplementedError (no PIL/ffmpeg in this container), and
`extract_fake_features` substitutes a deterministic digest-derived feature
vector so the full pipeline — schema, batching, partitioning — is testable
end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

BINARY_TABLE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, digest string, payload binary"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, feature array<double>, decode_status string"
)


def to_binary_table(documents: DataFrame) -> DataFrame:
    """Wrap a text corpus as a multimodal binary table (payload = utf-8
    bytes standing in for media blobs)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
        payload.alias("payload"),
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real PIXEL decode for COMPRESSED formats — STUB. Wire
    PIL/torchvision here in a container that ships them; the
    surrounding Spark plumbing is already correct. Uncompressed BMP
    needs no codec and decodes for real via decode_bmp below (round
    10); header METADATA for png/jpeg/gif/bmp parses for real via
    parse_image_header."""
    raise NotImplementedError(
        "compressed-image codecs are not available in this container; "
        "BMP payloads decode via decode_bmp, everything else uses "
        "extract_fake_features' deterministic test path"
    )


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """REAL pixel decode of uncompressed 24-bit BITMAPINFOHEADER BMPs —
    no codec library needed, the pixel data is raw BGR rows: pixel
    array offset at bytes 10:14, dims at 18:26 (negative height =
    top-down row order), bit count 24, compression BI_RGB(0) only,
    rows padded to 4-byte strides, stored bottom-up. Returns an
    (H, W, 3) uint8 array in RGB channel order, or None when the
    payload is not a BMP this decoder supports (caller falls back to
    the stub path)."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    off = int.from_bytes(payload[10:14], "little")
    hdr = int.from_bytes(payload[14:18], "little")
    if hdr < 40:  # BITMAPCOREHEADER etc. — unsupported
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h_raw = int.from_bytes(payload[22:26], "little", signed=True)
    bits = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bits != 24 or comp != 0 or w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    stride = ((w * 3 + 3) // 4) * 4
    if off + stride * h > len(payload):
        return None  # truncated pixel data
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:  # bottom-up storage: flip to top-down image order
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR file order -> RGB


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample: source index =
    floor(target_index * src / dst) — the classic integer mapping, so
    both engines of any parity check agree bit-for-bit."""
    h, w = img.shape[:2]
    iy = (np.arange(height) * h) // height
    ix = (np.arange(width) * w) // width
    return img[iy][:, ix]


def encode_bmp(img: np.ndarray) -> bytes:
    """Re-encode an (H, W, 3) RGB uint8 array as an uncompressed 24-bit
    bottom-up BMP (the exact dialect decode_bmp reads — round-trip
    tested)."""
    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    size = 54 + stride * h
    head = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (stride * h).to_bytes(4, "little")
        + (2835).to_bytes(4, "little")
        + (2835).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    bgr = img[:, :, ::-1]
    pad = b"\x00" * (stride - w * 3)
    body = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    return head + body


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from magic bytes alone — REAL metadata
    extraction, no decoder library required (pixel work stays gated in
    decode_image):

    - PNG: 8-byte signature, then the IHDR chunk is mandated first
      (length + 'IHDR' + width/height as big-endian uint32).
    - JPEG: walk the segment stream from SOI to the first frame header
      SOFn (0xC0-0xCF excluding DHT 0xC4, JPG 0xC8, DAC 0xCC); dims are
      big-endian uint16 after the precision byte. APP0/EXIF/comment
      segments are skipped by their length fields, so real camera files
      parse correctly.
    - GIF: 'GIF87a'/'GIF89a', then the logical-screen size as
      little-endian uint16s.
    - BMP: 'BM', then BITMAPINFOHEADER dims as little-endian int32
      (height may be negative for top-down rows — abs()).

    Returns None for unknown magic or a truncated header."""
    if payload is None:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            return ("png", w, h)
        return None
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 3 < n:
            if payload[i] != 0xFF:
                return None  # desynced segment stream
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seglen < 2:
                return None
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seglen
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) >= 10:
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
            return ("gif", w, h)
        return None
    if payload[:2] == b"BM" and len(payload) >= 26:
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = abs(int.from_bytes(payload[22:26], "little", signed=True))
        return ("bmp", w, h)
    return None


HEADER_SCHEMA = (
    "doc_id long, format string, width int, height int, parse_status string"
)


def media_headers(binary_table: DataFrame) -> DataFrame:
    """Arrow-batched header-metadata extraction over binary payloads —
    the first UNSTUBBED multimodal feature: real format/width/height
    from the payload's own magic bytes (parse_image_header), in the
    same mapInPandas plumbing the stubbed decoders use. At 100 TB this
    is the cheap pre-pass every image pipeline runs before decode:
    route by format, drop monster dimensions, and partition by size
    class while reading only the first bytes of each blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts: list[str | None] = []
            ws: list[int | None] = []
            hs: list[int | None] = []
            sts: list[str] = []
            for p in pdf["payload"]:
                if p is None:
                    fmts.append(None), ws.append(None), hs.append(None)
                    sts.append("null_payload")
                    continue
                parsed = parse_image_header(bytes(p))
                if parsed is None:
                    fmts.append(None), ws.append(None), hs.append(None)
                    sts.append("unrecognized")
                else:
                    fmt, w, h = parsed
                    fmts.append(fmt), ws.append(w), hs.append(h)
                    sts.append("ok")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "parse_status": sts,
                }
            )

    return binary_table.mapInPandas(run, schema=HEADER_SCHEMA)


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in feature: first FEATURE_DIM bytes of sha256,
    scaled to [0,1]. Stable across runs/engines."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_fake_features(binary_table: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each partition streams in as pandas batches; the feature fn
    is applied vectorized per batch. At scale this is the exact shape a real
    decoder uses — only `_fake_feature` changes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            null_mask = pdf["payload"].isna()
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": pdf["payload"].map(
                        lambda p: None if p is None else _fake_feature(p)
                    ),
                    "decode_status": null_mask.map(
                        lambda m: "null_payload" if m else "ok_fake"
                    ),
                }
            )
            yield out

    return binary_table.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "payload binary, decode_status string, pixel_sum long"
)

FRAME_SCHEMA = "doc_id long, frame_idx long, frame_payload binary"


def resize_images(binary_table: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Image thumbnailing over Arrow batches. TWO paths per payload:

    - REAL (round 10): an uncompressed 24-bit BMP decodes for real
      (decode_bmp), nearest-neighbor resamples to (width, height)
      (resize_nearest — deterministic floor index map), and re-encodes
      as a valid BMP (encode_bmp). decode_status 'ok_real'; pixel_sum
      is the exact sum of the thumbnail's RGB bytes — a SQL-computable
      checksum the mm03 oracle recomputes from the pixel-generation
      formula, so the decode→resize path is hash-adjudicated.
    - STUB: compressed formats (no codec in this container) fall back
      to the deterministic digest-derived payload of width*height
      bytes; schema, batch shape, and size accounting stay real.
      decode_status 'ok_fake', pixel_sum NULL. Wire PIL here and the
      fake branch disappears; nothing else changes."""

    def _fake(payload: bytes) -> bytes:
        need = width * height
        out = b""
        seed = hashlib.sha256(payload).digest()
        while len(out) < need:
            out += seed
            seed = hashlib.sha256(seed).digest()
        return out[:need]

    def _one(payload) -> tuple[bytes | None, str, int | None]:
        if payload is None:
            return None, "null_payload", None
        img = decode_bmp(bytes(payload))
        if img is not None:
            thumb = resize_nearest(img, width, height)
            return (
                encode_bmp(thumb),
                "ok_real",
                int(thumb.sum(dtype=np.int64)),
            )
        return _fake(bytes(payload)), "ok_fake", None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            done = pdf["payload"].map(_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "payload": done.map(lambda t: t[0]),
                    "decode_status": done.map(lambda t: t[1]),
                    "pixel_sum": done.map(lambda t: t[2]).astype("object"),
                }
            )

    return binary_table.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    binary_table: DataFrame, frame_bytes: int = 64, every_n: int = 4
) -> DataFrame:
    """Frame sampling over Arrow batches — the 1→many (UDTF-shaped)
    mapInPandas stage: each payload is treated as a sequence of
    `frame_bytes` chunks ("frames"; a real build decodes containers via
    ffmpeg), and every `every_n`-th frame is emitted as its own row.

    Output cardinality = Σ ceil(n_frames/every_n) — the explode happens
    inside the Arrow batch, so no driver involvement and no row-at-a-time
    Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # undecodable media yields no frames
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(payload[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return binary_table.mapInPandas(run, schema=FRAME_SCHEMA)


DISPATCH_SCHEMA = "doc_id long, media_type string, feat_kind string, feat_val double"


def dispatch_features(binary_table: DataFrame) -> DataFrame:
    """Heterogeneous-modality routing inside ONE mapInPandas stage: each
    Arrow batch is split by media_type and every slice takes its own
    (vectorized) feature path — the mixed-corpus shape where image, audio
    and video rows interleave in one table and per-type repartitioning
    would triple the shuffles. Decoders stubbed as elsewhere in this
    module (deterministic sha256-derived stand-ins; frame count is real
    byte arithmetic), so the routing itself is oracle-checkable.

    image/* → 'pixel_mean_stub' (sha256 byte 0 / 255)
    audio/* → 'energy_stub'     (sha256 byte 1 / 255)
    video/* → 'n_frames'        (ceil(n_bytes / 64))
    other   → 'opaque'          (n_bytes)
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _feat(mt: str, payload: bytes | None) -> tuple[str, float | None]:
            if payload is None:
                return ("null_payload", None)
            if mt.startswith("image/"):
                return ("pixel_mean_stub", hashlib.sha256(payload).digest()[0] / 255.0)
            if mt.startswith("audio/"):
                return ("energy_stub", hashlib.sha256(payload).digest()[1] / 255.0)
            if mt.startswith("video/"):
                return ("n_frames", float(-(-len(payload) // 64)))
            return ("opaque", float(len(payload)))

        for pdf in batches:
            # slice per modality: one python dispatch per (batch, type),
            # not per row; the per-slice work is the decoder's
            parts = []
            for mt, sub in pdf.groupby("media_type", sort=False):
                feats = [_feat(mt, p) for p in sub["payload"]]
                parts.append(
                    pd.DataFrame(
                        {
                            "doc_id": sub["doc_id"].to_numpy(),
                            "media_type": mt,
                            "feat_kind": [k for k, _ in feats],
                            "feat_val": [v for _, v in feats],
                        }
                    )
                )
            yield (
                pd.concat(parts, ignore_index=True)
                if parts
                else pd.DataFrame(
                    {"doc_id": [], "media_type": [], "feat_kind": [], "feat_val": []}
                )
            )

    return binary_table.mapInPandas(run, schema=DISPATCH_SCHEMA)


def byte_shingle_near_pairs(
    binary_table: DataFrame,
    gram_bytes: int = 8,
    stride_bytes: int = 4,
    threshold: float = 0.3,
    max_gram_docs: int = 100,
) -> DataFrame:
    """Byte-level near-duplicate pairs over opaque binary payloads —
    mm06's fuzzy sibling: exact digest dedup misses blobs that differ in
    a few bytes (retagged audio, re-serialized containers, EXIF-touched
    images), this catches them WITHOUT decoding. Payloads are shingled
    into overlapping byte 8-grams (stride 4), hashed to 8-byte keys, and
    pushed through the same bounded-bucket pair pipeline as text dedup:
    one exchange keyed by gram hash, per-gram doc lists capped at
    `max_gram_docs` (the quadratic-blowup guard), Jaccard from exact
    per-doc distinct-gram counts. Shuffles carry (long, long) rows —
    payload bytes never leave the scan stage.

    Shingling slices the RAW bytes (binary substring + xxhash64 — no
    hex expansion; byte-slice equality is bijective with the oracle's
    hex-gram equality, so the pair set is identical while the string
    volume halves); at real media sizes (MBs/blob) move the gram
    hashing into an Arrow mapInPandas kernel over the raw bytes, which
    drops in above the same pair pipeline. Returns (id_a < id_b,
    jaccard >= threshold)."""
    from gwasdb_spark.operators.dedup import _pairs_from_groups

    # stop clamps to 1 (not 0): Spark's sequence() errors on a positive
    # step with stop < start; the lone out-of-range position yields a
    # short gram that the length filter below drops, matching the
    # oracle's empty range() for sub-gram payloads.
    positions = F.sequence(
        F.lit(1),
        F.greatest(
            F.octet_length("payload") - (gram_bytes - 1), F.lit(1)
        ),
        F.lit(stride_bytes),
    )
    from gwasdb_spark.operators.dedup import _spread

    # _spread: a few small local files give the scan (and so the gram
    # slice + explode above it) only that many tasks — the x130 lesson;
    # no-op at real input scale where the reader already splits.
    src = _spread(binary_table.filter(F.col("doc_id").isNotNull())).select(
        F.col("doc_id").alias("doc"), "payload"
    )
    # Pair-pipeline grams via explode(positions) + substring — whole-
    # stage codegen end to end (r14, guide §4/§1.2): the previous
    # transform(...)+filter(...) higher-order-function array build is
    # CodegenFallback — interpreted PER ELEMENT (the ~5x penalty
    # operators/dedup.py documents for its shingle path) — and it ran
    # per gram of every payload. Dropping array_distinct is safe on
    # this branch: collect_set(doc) below absorbs within-doc duplicate
    # grams, so the bounded groups (and every downstream row) are
    # identical. The sizes branch keeps the per-row distinct-gram
    # array (its count is the oracle's exact denominator).
    gram = F.col("payload").substr(F.col("p"), F.lit(gram_bytes))
    exploded = (
        src.select("doc", F.explode(positions).alias("p"), "payload")
        .select("doc", gram.alias("g"))
        .where(F.octet_length("g") == gram_bytes)
        .select("doc", F.xxhash64("g").alias("sh"))
        .repartition("sh")
    )
    bounded = (
        exploded.groupBy("sh")
        .agg(F.array_sort(F.collect_set("doc")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= max_gram_docs))
    )
    shared = (
        _pairs_from_groups(bounded)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # Per-doc distinct-gram counts come straight off the per-row gram
    # array — NO explode, NO shuffle, no second pass over the exploded
    # relation (the r7 bench's 4.7 s was dominated by the gram
    # explode + sh-exchange running once per consumer; this leaves the
    # pair-bucket branch as the exchange's only consumer). Counting
    # distinct GRAMS (bytes) rather than distinct hashes also matches
    # the oracle's ground truth exactly — no 2^-64 collision caveat on
    # the denominators. The extra scan of the (tiny) payload column is
    # far cheaper than the 2x gram shuffle it replaces. This branch
    # keeps the higher-order-function array build (a per-row DISTINCT
    # count has no codegen formulation) — one interpreted pass, pinned.
    # Pin the doc-grain counts ((long, int) rows — trivial to hold) so
    # the gram-array build runs once for this relation, not once per
    # join side.
    grams_distinct = F.array_distinct(
        F.filter(
            F.transform(
                positions,
                lambda p: F.substring(F.col("payload"), p, gram_bytes),
            ),
            lambda g: F.octet_length(g) == gram_bytes,
        )
    )
    sizes = src.select(
        "doc", F.size(grams_distinct).alias("n_sh")
    ).localCheckpoint(eager=False)
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    ).cast("double")
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


PCM_ENERGY_SCHEMA = (
    "doc_id long, frame_idx long, n_samples long, energy long, "
    "peak_abs long"
)


def parse_wav_pcm(payload: bytes) -> "np.ndarray | None":
    """Decode a canonical PCM WAV payload to an int16 sample array —
    REAL audio parsing, no codec library required (RIFF is a plain
    chunked container; 16-bit PCM samples are raw little-endian
    int16s, the audio analogue of decode_bmp's raw BGR rows).
    Validates the RIFF/WAVE magic, walks chunks by their length fields
    (real recorders emit LIST/fact chunks before data), requires
    audio-format 1 (PCM) / 16-bit / mono, and returns None for
    anything else — compressed codecs (MP3/AAC/Opus) stay gated behind
    the absent-decoder stub like compressed images do."""
    if payload is None or len(payload) < 44:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt_ok = False
    while i + 8 <= n:
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt " and clen >= 16:
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or channels != 1 or bits != 16:
                return None
            fmt_ok = True
        elif cid == b"data":
            if not fmt_ok:
                return None
            usable = len(body) - (len(body) % 2)
            return np.frombuffer(body[:usable], dtype="<i2")
        i += 8 + clen + (clen % 2)  # chunks are word-aligned
    return None


def pcm_frame_energy(
    binary_table: DataFrame, frame_samples: int = 64
) -> DataFrame:
    """Per-frame PCM energy extraction over Arrow batches — the audio
    feature stage of the multimodal pipeline (mm04 samples frames by
    byte geometry; this DECODES the samples): each WAV payload is
    parsed by parse_wav_pcm, split into `frame_samples`-sample frames,
    and each frame emits (sum of squared samples, peak magnitude) —
    the exact integer statistics VAD/silence-trim/loudness gates run
    on. int16 squares sum in int64 (no overflow below 2^47 samples per
    frame); non-WAV payloads yield no rows, like every decoder gate.
    The explode happens inside the Arrow batch — vectorized numpy per
    payload, no row-at-a-time Python, no driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, energies, peaks = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = parse_wav_pcm(payload)
                if samples is None:
                    continue
                for fi in range(0, len(samples), frame_samples):
                    fr = samples[fi : fi + frame_samples].astype(np.int64)
                    ids.append(doc_id)
                    idxs.append(fi // frame_samples)
                    ns.append(len(fr))
                    energies.append(int((fr * fr).sum()))
                    peaks.append(int(np.abs(fr).max()) if len(fr) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "n_samples": ns,
                    "energy": energies,
                    "peak_abs": peaks,
                }
            )

    return binary_table.mapInPandas(run, schema=PCM_ENERGY_SCHEMA)


SCENE_SCHEMA = (
    "doc_id long, frame_idx long, energy long, is_scene_change boolean"
)


def frame_scene_changes(
    binary_table: DataFrame, frame_bytes: int = 64, threshold: int = 512
) -> DataFrame:
    """Scene-change detection over byte-level frames — the video
    keyframe-selection stage of the multimodal pipeline (mm04 samples
    frames by geometry, mm11 decodes audio samples; this scores frame
    DELTAS): each payload splits into `frame_bytes` frames, a frame's
    energy is its exact byte sum (uint8, summed in int64), and a frame
    is a scene change when |energy - prev_energy| > threshold (frame 0
    always starts a scene). Real decoders would compute per-frame
    histograms or SSIM; byte-sum deltas are the decoder-free stand-in
    with the identical plan shape — per-payload vectorized numpy in
    Arrow batches, the explode inside the batch, no driver
    involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies, changes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n_frames = (len(arr) + frame_bytes - 1) // frame_bytes
                prev = None
                for fi in range(n_frames):
                    e = int(arr[fi * frame_bytes : (fi + 1) * frame_bytes].sum())
                    ids.append(doc_id)
                    idxs.append(fi)
                    energies.append(e)
                    changes.append(prev is None or abs(e - prev) > threshold)
                    prev = e
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "energy": energies,
                    "is_scene_change": changes,
                }
            )

    return binary_table.mapInPandas(run, schema=SCENE_SCHEMA)
