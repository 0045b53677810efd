#!/usr/bin/env python
"""One OS-process coordinator for the `acidmulti` kill gate.

Runs ONE two-table transaction (the m13 QC-split shape: survivors to
`gwas`, rejects to `no_gwas`) against a shared table pair, with an
optional failpoint. On the failpoint's InjectedCrash the process
os._exit(9)s — no cleanup handler, no Spark shutdown, no atexit — so
the on-disk state the parent gate then inspects is exactly what a
kill -9 at that protocol step leaves. The parent asserts the atomicity
invariant (both tables moved or neither), exercises recovery, and
replays the batch cleanly.

Usage: acid_multi_worker.py <base_dir> <batch_no> <failpoint|none>
Prints one JSON line {"batch", "versions"} on a successful commit.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gwasdb_spark.acid import AcidTable  # noqa: E402
from gwasdb_spark.acid.multi_commit import (  # noqa: E402
    InjectedCrash,
    MultiTableTxn,
)
from gwasdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    base, batch, failpoint = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    fp = None if failpoint == "none" else failpoint
    spark = get_spark(f"acid_multi_b{batch}", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    gwas = AcidTable(spark, os.path.join(base, "gwas"))
    nog = AcidTable(spark, os.path.join(base, "no_gwas"))
    txn = MultiTableTxn(spark, os.path.join(base, "txn"))

    lo = batch * 100_000
    rows = spark.range(lo, lo + 1_000).select(
        "id",
        F.lit(batch).cast("int").alias("batch"),
        (F.col("id") % 10 >= 2).alias("qc_pass"),
    )
    keep = rows.filter(F.col("qc_pass")).drop("qc_pass")
    drop = rows.filter(~F.col("qc_pass")).drop("qc_pass")
    try:
        out = txn.commit_appends(
            [(gwas, keep), (nog, drop)], op=f"qc_split(b{batch})",
            failpoint=fp,
        )
    except InjectedCrash:
        os._exit(9)  # the kill: state on disk is the crash window's
    print(json.dumps({"batch": batch, "versions": out}))


if __name__ == "__main__":
    main()
