#!/usr/bin/env python
"""One OS-process writer for the `acidrace` stress gate.

Runs a fixed, deterministic op schedule against a SHARED AcidTable while
a sibling process runs the same schedule on ITS OWN rows and the parent
runs a vacuum loop. Every op is retried through CommitConflict — under
two live writers, conflicts are the expected steady state, and the OCC
loop (re-read latest manifest, re-derive, re-commit) is exactly what the
gate is exercising across REAL process boundaries (the in-process
monkeypatched interleaves in tests/test_acid_table.py cannot prove the
fsync+os.link commit protocol against a genuinely concurrent JVM).

Schedule (writer w, batch size B): append batches 0..7 (ids disjoint per
writer), then delete own batch 1, update own batch 2 to val=-1, append
nothing more, delete batch 5, update batch 6. Interleaved as
a0 a1 a2 a3 d1 u2 a4 a5 a6 a7 d5 u6 — 12 committed ops. All predicates
touch ONLY this writer's rows, so the final table state is deterministic
no matter how the two schedules interleave: batches {0,2,3,4,6,7} × 2
writers present, batches 2 and 6 at val=-1, the rest at val = id % 7.

Usage: acid_race_worker.py <table_path> <writer_id> <batch_rows>
Prints one JSON line {"writer", "committed", "conflict_retries"} on
success; any uncaught failure exits nonzero (the gate fails).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gwasdb_spark.acid import CommitConflict  # noqa: E402
from gwasdb_spark.acid import AcidTable  # noqa: E402
from gwasdb_spark.acid import predicates as P  # noqa: E402
from gwasdb_spark.session import get_spark  # noqa: E402


def batch_df(spark, writer: int, batch: int, rows: int):
    base = writer * 1_000_000_000 + batch * rows
    return spark.range(base, base + rows).select(
        F.col("id"),
        F.lit(writer).cast("int").alias("writer"),
        F.lit(batch).cast("int").alias("batch"),
        (F.col("id") % 7).cast("double").alias("val"),
    )


def main() -> None:
    path, writer, rows = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    spark = get_spark(f"acid_race_w{writer}", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    t = AcidTable(spark, path)

    def retrying(tag, fn, attempts: int = 60):
        for k in range(attempts):
            try:
                fn()
                return k
            except CommitConflict:
                # stagger by pid so the two writers don't lockstep
                time.sleep(0.05 + (os.getpid() % 7) * 0.01)
        raise RuntimeError(f"writer {writer}: {tag} never committed")

    mine = lambda b: P.And(  # noqa: E731
        P.Eq("writer", writer), P.Eq("batch", b)
    )
    ops = (
        [("append", b) for b in (0, 1, 2, 3)]
        + [("delete", 1), ("update", 2)]
        + [("append", b) for b in (4, 5, 6, 7)]
        + [("delete", 5), ("update", 6)]
    )
    committed, conflicts = [], 0
    for op, b in ops:
        if op == "append":
            fn = lambda: t.append(batch_df(spark, writer, b, rows))  # noqa: E731,B023
        elif op == "delete":
            fn = lambda: t.delete_where(mine(b))  # noqa: E731,B023
        else:
            fn = lambda: t.update_set(mine(b), {"val": F.lit(-1.0)})  # noqa: E731,B023
        conflicts += retrying(f"{op}({b})", fn)
        committed.append([op, b])
    print(
        json.dumps(
            {
                "writer": writer,
                "committed": committed,
                "conflict_retries": conflicts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
