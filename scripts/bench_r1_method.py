#!/usr/bin/env python
"""Like-for-like rerun of the 22 r1 headline queries with the EXACT
r1-era timing method, to close the 2x-gate dispute (r8 verdict #3).

The r1-recorded numbers (BENCH_r01.json) were taken with
`df.count()` consumption and min-of-2 (bench.py as of commit ab523df)
— count() lets Catalyst prune projection-only expression work, so
pure-projection queries (x06/x07/x08/e01) measured far below their
real cost. Current bench.py uses a noop sink (pays full cost) and
min-of-3, which made those four rows read nominally >= 2x the r1
numbers despite identical-or-better plans.

This script reruns the same 22 queries with the r1 method (count(),
min-of-2, sf0.001 warmup) on current code, plus the current-method
sentinel so the run's machine-load context is recorded. The output
table goes into BASELINE.md as the method-consistent r1 comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

R1_QUERIES = {
    "q01_pricing_summary": 0.328,
    "q03_shipping_priority": 0.987,
    "q05_local_supplier_volume": 3.311,
    "p08_locus_window": 1.86,
    "j08_export_view": 1.82,
    "a04_pivot_wide": 0.854,
    "w01_topk_per_group": 0.446,
    "st01_hourly_rollup": 0.254,
    "st02_sessionize": 0.218,
    "st03_stream_hourly_rollup": 1.442,
    "x01_dedup_exact": 0.305,
    "x02_ngram_jaccard_pairs": 2.176,
    "x03_minhash_lsh_pairs": 1.926,
    "x05_ann_cosine_topk": 0.651,
    "x05c_ann_topk_vectorized": 0.436,
    "x06_text_stats": 0.19,
    "x07_lang_id": 0.189,
    "x08_fingerprint": 0.14,
    "x10b_embedding_neardup_lsh": 1.267,
    "x12_bm25_search": 1.627,
    "x14_asof_join": 0.312,
    "e01_json_props": 0.19,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from gwasdb_spark.plans import QUERIES
    from gwasdb_spark.session import get_spark

    spark = get_spark("gwasdb_spark_bench_r1_method")
    spark.sparkContext.setLogLevel("ERROR")

    def consume_r1(df):
        # the r1-era consumption: count(), NOT the noop sink
        return df.count() if df.isStreaming is False else 0

    # r1-era warmup pass
    warm = "/root/testdata/sf0.001"
    for name in R1_QUERIES:
        try:
            consume_r1(QUERIES[name].fn(spark, warm))
        except Exception:
            pass

    # current-method sentinel, recorded for load context only
    def sentinel_once() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 400_000_000, 1, 32)
            .selectExpr("sum(id * 3 + (id % 7)) AS s")
            .write.format("noop").mode("overwrite").save()
        )
        return time.perf_counter() - t0

    sentinel_once()
    sentinel = round(min(sentinel_once() for _ in range(3)), 3)

    rows = {}
    for name, r1_sec in R1_QUERIES.items():
        best = None
        for _ in range(2):  # r1-era min-of-2
            t0 = time.perf_counter()
            consume_r1(QUERIES[name].fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rows[name] = {
            "r1_sec": r1_sec,
            "now_sec": round(best, 3),
            "ratio": round(best / r1_sec, 3),
        }

    ratios = sorted(v["ratio"] for v in rows.values())
    payload = {
        "method": "r1-era: count() consumption, min-of-2, sf0.001 warmup",
        "sf_dir": sf_dir,
        "sentinel_sec_current_method": sentinel,
        "median_ratio": ratios[len(ratios) // 2],
        "max_ratio": ratios[-1],
        "over_2x": [k for k, v in rows.items() if v["ratio"] >= 2.0],
        "queries": rows,
    }
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
