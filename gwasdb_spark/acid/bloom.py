"""Per-file-group bloom filters for point-lookup skipping.

Min/max stats (table_log.py) prune RANGE predicates, but an Eq/IsIn on
a column whose values interleave across file groups (ingest order,
round-robin writes) is invisible to them — every group's [min, max]
spans the probe value and a 1-key DELETE reads the whole table. This is
exactly the gap Delta's bloom-filter indexes and Parquet's column-level
bloom filters cover (both public designs); the container ships neither
jar, so this module supplies the same skipping natively:

- On every group write, for each configured bloom column, build one
  bloom filter over the group's non-null values and store it in a
  sidecar JSON INSIDE the group directory (`.blooms.json` — the dot
  prefix hides it from Spark's parquet file listing, and it shares the
  group's immutability: written by the creating writer before the
  manifest commit ever names the group).
- At DML time, after min/max passes, any Eq/IsIn conjunct on a bloom
  column probes the sidecar; "definitely absent" prunes the group.

Soundness mirrors `predicates.Pred.may_match`: a bloom can only say
NO when no row matches (no false negatives by construction — every
inserted value sets all its k bits), so pruning on NO commits the
identical table. False positives only cost an extra group read.

Construction is distributed and bounded: positions are computed
JVM-side (sha2 + conv — whole-stage codegen, no Python per row),
OR-folded into bytes by a groupBy(byte_index) aggregate, and the
driver collects at most m/8 (byte_index, byte) rows — bounded by the
bloom's own size (the artifact being built), never by row count.

The hash must be computable identically in the JVM (build side) and
in driver Python (probe side), so positions use sha256 of
"{seed}:{canonical string}" — available as `sha2` in Spark and
`hashlib` in Python — rather than xxhash64 (no Python twin in this
container). 15 hex digits (60 bits) are taken per position, far above
any m. Bloom columns are restricted to integer/string types, where
the JVM's CAST(x AS STRING) and Python's str(x) agree byte-for-byte.

Sizing: ~12 bits/row, k=5 → ~0.3% false-positive rate, capped at
2^23 bits (1 MiB) per column per group — at that cap a group holds
~700k rows before fpp drifts up, which is the right trade: the bloom
rides a sidecar read that is already amortized against rewriting the
group.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_K = 5
_BITS_PER_ROW = 12
_MIN_BITS = 1 << 10
_MAX_BITS = 1 << 23

# types whose Spark CAST-to-string equals Python str() — bloom-eligible
_BLOOM_TYPES = ("byte", "short", "integer", "long", "string")

SIDECAR = ".blooms.json"


def size_bits(rows: int) -> int:
    """Smallest power of two ≥ 12·rows, clamped to [2^10, 2^23].
    Power-of-two m keeps `% m` a mask and sizes reproducible."""
    target = max(_MIN_BITS, min(_MAX_BITS, _BITS_PER_ROW * max(rows, 1)))
    m = _MIN_BITS
    while m < target:
        m <<= 1
    return m


def _position_col(col: str, seed: int, m: int):
    """JVM-side bloom position: first 15 hex chars of
    sha256("{seed}:" || CAST(col AS STRING)) as a long, mod m."""
    h = F.sha2(F.concat(F.lit(f"{seed}:"), F.col(col).cast("string")), 256)
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(m)


def python_positions(value, m: int) -> list[int]:
    """Driver-side twin of `_position_col` (parity-tested)."""
    s = str(value)
    return [
        int(
            hashlib.sha256(f"{seed}:{s}".encode("utf-8")).hexdigest()[:15],
            16,
        )
        % m
        for seed in range(BLOOM_K)
    ]


def bloom_eligible_columns(df: DataFrame, requested) -> list[str]:
    by_name = {f.name: f.dataType.typeName() for f in df.schema.fields}
    return [
        c for c in requested if by_name.get(c) in _BLOOM_TYPES
    ]


def build_bloom(df: DataFrame, col: str, rows: int) -> dict:
    """One bloom over the non-null values of `df[col]`.

    Distributed fold: k codegen'd positions per row → (word_index,
    64-bit word) → bit_or per word; the collect is ≤ m/64 rows (the
    bloom's own words), independent of df's size. Words are packed
    little-endian so global bit p lives at byte p>>3, bit p&7 — the
    layout `may_contain` probes."""
    import struct

    m = size_bits(rows)
    pos = F.explode(
        F.array(*[_position_col(col, s, m) for s in range(BLOOM_K)])
    ).alias("pos")
    words_df = (
        df.filter(F.col(col).isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            # python-API shiftleft wants a literal count; the SQL form
            # takes a column
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    buf = bytearray(m // 8)
    for r in words_df.collect():  # bounded by m/64, not by row count
        struct.pack_into("<q", buf, r["word_idx"] * 8, r["word"])
    return {
        "m": m,
        "k": BLOOM_K,
        "b64": base64.b64encode(bytes(buf)).decode("ascii"),
    }


def may_contain(bloom: dict, value) -> bool:
    """True unless the bloom PROVES absence (all-k-bits test)."""
    if value is None:
        return True  # nulls never enter a bloom; null_count stats rule
    m = bloom["m"]
    buf = base64.b64decode(bloom["b64"])
    return all(
        buf[p >> 3] & (1 << (p & 7)) for p in python_positions(value, m)
    )


def write_sidecar(group_dir: str, blooms: dict) -> None:
    path = os.path.join(group_dir, SIDECAR)
    with open(path, "w") as fh:
        json.dump(blooms, fh)
        fh.flush()
        os.fsync(fh.fileno())


def read_sidecar(group_dir: str) -> dict:
    path = os.path.join(group_dir, SIDECAR)
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return json.load(fh)
