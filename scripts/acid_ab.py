#!/usr/bin/env python
"""Interleaved same-session A/B of the r12 vs r13+ AcidTable commit path.

VERDICT r13 §wrong 2: the r13 driver bench showed m04/m06/m07/m08
1.5-1.8x slower while sibling rows on the SAME commit-path rewrite
(m05/m09/m11/m12) improved; the judge's untouched-row control said
machine drift, the builder's matched-sentinel pairs said the code got
faster. This script settles it the way the verdict prescribes: ONE
Spark session, the r12 `table_log.py` (git 1717698) and the current one
swapped per rep via the package binding the queries resolve at call
time, reps strictly alternating A/B so machine drift hits both variants
equally. Output: plans/r14/acid_ab.json with every rep, per-variant
min/median, and the sentinel before/after.

Usage: python scripts/acid_ab.py [reps_per_variant] [row,row,...]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = [
    "m04_acid_pruned_dml",
    "m06_acid_bloom_skipping",
    "m07_acid_check_constraints",
    "m08_acid_schema_evolution",
    # positive control: improved in the r13 driver run on the same path
    "m09_acid_zorder",
]
R12_COMMIT = "1717698"
R12_MOD = os.path.join(REPO, "gwasdb_spark", "acid", "_table_log_r12_ab.py")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rows = sys.argv[2].split(",") if len(sys.argv) > 2 else ROWS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # Materialize the r12 variant as a sibling module (absolute imports
    # only — it imports cleanly under its own name).
    src = subprocess.run(
        ["git", "show", f"{R12_COMMIT}:gwasdb_spark/acid/table_log.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    with open(R12_MOD, "w") as fh:
        fh.write(src)

    from gwasdb_spark.session import get_spark

    spark = get_spark("gwasdb_spark_acid_ab")
    spark.sparkContext.setLogLevel("ERROR")

    import gwasdb_spark.acid as acid_pkg
    import gwasdb_spark.acid._table_log_r12_ab as tl_r12
    import gwasdb_spark.acid.table_log as tl_now

    # Exception IDENTITY: queries import exception classes from the
    # CURRENT module (`from gwasdb_spark.acid.table_log import
    # SchemaMismatch`) and catch them; the r12 copy must raise those
    # same class objects or every expected-failure assertion breaks.
    for cls_name in dir(tl_now):
        cur = getattr(tl_now, cls_name)
        if (
            isinstance(cur, type)
            and issubclass(cur, Exception)
            and hasattr(tl_r12, cls_name)
        ):
            setattr(tl_r12, cls_name, cur)
    from gwasdb_spark.plans import QUERIES
    from gwasdb_spark.plans.mining_ops import STAGED_RESETS

    variants = {
        "r12": tl_r12,
        "r14": tl_now,
    }

    def bind(mod) -> None:
        acid_pkg.AcidTable = mod.AcidTable
        acid_pkg.CheckViolation = mod.CheckViolation
        acid_pkg.CommitConflict = mod.CommitConflict

    def consume(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def sentinel() -> float:
        def job():
            t0 = time.perf_counter()
            (
                spark.range(0, 400_000_000, 1, 32)
                .selectExpr("sum(id * 3 + (id % 7)) AS s")
                .write.format("noop").mode("overwrite").save()
            )
            return time.perf_counter() - t0

        job()
        return round(min(job() for _ in range(3)), 3)

    # Warm both variants once on the smallest SF (codegen/JIT parity).
    warm = "/root/testdata/sf0.001"
    for vname, mod in variants.items():
        bind(mod)
        for row in rows:
            reset = STAGED_RESETS.get(row)
            if reset:
                reset(warm)
            try:
                consume(QUERIES[row].fn(spark, warm))
            except Exception as exc:  # noqa: BLE001
                print(f"warmup {vname}/{row}: {exc}", file=sys.stderr)

    s_before = sentinel()
    results: dict = {row: {v: [] for v in variants} for row in rows}
    order = ["r12", "r14"]
    for rep in range(reps):
        # Alternate which variant goes first each rep so slow drifts
        # within a rep pair do not systematically favor one side.
        pair = order if rep % 2 == 0 else order[::-1]
        for vname in pair:
            bind(variants[vname])
            for row in rows:
                reset = STAGED_RESETS.get(row)
                if reset:
                    reset(sf_dir)
                spark.sparkContext.setJobDescription(
                    f"acid_ab rep{rep} {vname} {row}"
                )
                t0 = time.perf_counter()
                consume(QUERIES[row].fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                results[row][vname].append(round(dt, 3))
                print(f"rep{rep} {vname} {row}: {dt:.3f}s", flush=True)
    s_after = sentinel()
    bind(tl_now)  # leave the session on current code

    summary = {}
    for row in rows:
        a, b = results[row]["r12"], results[row]["r14"]
        summary[row] = {
            "r12_reps": a,
            "r14_reps": b,
            "r12_min": min(a),
            "r14_min": min(b),
            "r12_median": round(statistics.median(a), 3),
            "r14_median": round(statistics.median(b), 3),
            "speedup_min": round(min(a) / min(b), 3),
            "speedup_median": round(
                statistics.median(a) / statistics.median(b), 3
            ),
        }
    payload = {
        "method": (
            "one Spark session, per-rep rebinding of gwasdb_spark.acid."
            "AcidTable between r12 (git %s) and the current table_log; "
            "reps alternate variant order; staged tables reset before "
            "every rep (cold replay, the bench's own methodology); "
            "noop-sink consumption" % R12_COMMIT
        ),
        "sf_dir": sf_dir,
        "reps_per_variant": reps,
        "sentinel_scan_before": s_before,
        "sentinel_scan_after": s_after,
        "rows": summary,
    }
    out = os.path.join(REPO, "plans", "r14", "acid_ab.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({"summary": {
        r: {"speedup_median": summary[r]["speedup_median"],
            "speedup_min": summary[r]["speedup_min"]} for r in rows
    }}, indent=1))
    os.remove(R12_MOD)


if __name__ == "__main__":
    main()
