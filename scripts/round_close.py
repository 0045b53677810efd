#!/usr/bin/env python
"""Round-close hygiene gate (r7 verdict #2/#3).

Run before ending a round. Exits non-zero when:

1. Driver artifacts are untracked or modified-but-uncommitted —
   `BENCH_r*.json`, `CORRECTNESS_r*.json`, `bench_full_*.json`. This
   finding recurred in r4, r5, and r7; the gate makes the recurrence
   mechanical to catch instead of checklist-dependent.
2. The bench map about to be committed absorbed machine-load inflation:
   `bench_full_latest.json`'s `sentinel_sec` (a fixed code-independent
   job, see bench.py) drifts >10% from the newest committed
   `bench_full_r*.json` that carries a sentinel. A drifted map records
   phantom regressions (r7's x62) — re-run bench.py on an idle machine
   instead of committing it.

Usage: python scripts/round_close.py   (from anywhere inside the repo)
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = re.compile(r"(BENCH_r\d+\.json|CORRECTNESS_r\d+\.json|bench_full_.*\.json)$")
SENTINEL_DRIFT_MAX = 0.10


def check_artifacts_tracked() -> list[str]:
    out = subprocess.run(
        ["git", "status", "--porcelain"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    bad = []
    for line in out.splitlines():
        status, path = line[:2], line[3:].strip()
        if ARTIFACT.search(path):
            bad.append(f"{status} {path}")
    return bad


def check_sentinel_drift() -> str | None:
    latest_path = os.path.join(REPO, "bench_full_latest.json")
    if not os.path.isfile(latest_path):
        return None  # no fresh bench this round — nothing to gate
    with open(latest_path) as fh:
        latest = json.load(fh)
    cur = latest.get("sentinel_sec")
    if cur is None:
        return "bench_full_latest.json has no sentinel_sec — re-run bench.py"
    prev = None
    prev_name = None
    for p in sorted(
        glob.glob(os.path.join(REPO, "bench_full_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
        reverse=True,
    ):
        with open(p) as fh:
            s = json.load(fh).get("sentinel_sec")
        if s is not None:
            prev, prev_name = s, os.path.basename(p)
            break
    if prev is None:
        return None  # first sentinel-carrying round — baseline established
    drift = abs(cur - prev) / prev
    if drift > SENTINEL_DRIFT_MAX:
        return (
            f"sentinel drift {drift:.0%} vs {prev_name} "
            f"({prev}s -> {cur}s) exceeds {SENTINEL_DRIFT_MAX:.0%} — the map "
            "absorbed machine load; re-run bench.py on an idle machine"
        )
    return None


def main() -> int:
    failures = []
    bad = check_artifacts_tracked()
    if bad:
        failures.append(
            "uncommitted driver artifacts (commit them before round close):\n  "
            + "\n  ".join(bad)
        )
    drift = check_sentinel_drift()
    if drift:
        failures.append(drift)
    if failures:
        print("ROUND-CLOSE GATE FAILED")
        for f in failures:
            print(" -", f)
        return 1
    print("round-close gate: clean (artifacts tracked, sentinel within bounds)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
