"""Capture `.explain("formatted")` output for named queries into
plans/r13/<query>_<tag>.txt — the optimization round's before/after plan
evidence (guide §1: record the plan shape — Exchange count, join
strategy, PushedFilters/ReadSchema, BatchEvalPython nodes — so every
claimed plan change is checkable without running Spark).

Usage: python scripts/capture_plans.py <tag> <q1> <q2> ...
       python scripts/capture_plans.py <tag> --file <list.txt>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gwasdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    if sys.argv[2] == "--file":
        with open(sys.argv[3]) as fh:
            names = [l.strip() for l in fh if l.strip()]
    else:
        names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    from gwasdb_spark.plans import QUERIES  # noqa: E402

    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not registered")
            continue
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep capturing
            plan = f"CAPTURE FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
