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

Usage:
  python scripts/round_close.py            gate (artifacts + sentinel drift)
  python scripts/round_close.py compare [new.json [old.json]]
      estimator-consistent round-over-round comparison (r8 verdict #4):
      per-query ratios are SENTINEL-NORMALIZED (divide out the machine-
      load ratio the two maps' fixed-job sentinels measured) and split
      by estimator DEPTH — only rows whose min covers the same number of
      timed runs on both sides are plan-comparable; a deeper min is
      optimistically lower, so depth-mismatched rows are reported
      separately with the expected bias direction instead of being read
      as regressions (r8's 13 phantom >30% rows). Defaults: new =
      bench_full_latest.json, old = newest committed bench_full_r*.json.
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


def _load_ratio(new: dict, old: dict) -> tuple[float, str]:
    """Machine-load ratio between two bench maps, and which normalizer
    produced it. When BOTH maps carry the per-shape `sentinels` basket
    (bench.py since r12: scan/shuffle/window fixed jobs), the ratio is
    the MEDIAN of the per-shape ratios — one shape moving alone (the
    r11 finding: raw vs scan-adjusted medians 1.4x apart on pure
    sentinel movement) no longer rescales the whole suite. Otherwise
    falls back to the r8-r11 scalar `sentinel_sec` (the scan shape)."""
    b_new, b_old = new.get("sentinels"), old.get("sentinels")
    if b_new and b_old:
        shapes = sorted(set(b_new) & set(b_old))
        ratios = sorted(
            b_new[s] / b_old[s] for s in shapes if b_old.get(s)
        )
        if ratios:
            # statistics.median, not ratios[n//2]: for even-length lists
            # the latter is the UPPER-middle element, which would bias
            # the normalizer high whenever the shared-shape count is
            # even (ADVICE r12).
            import statistics

            return (
                statistics.median(ratios),
                f"basket-median({len(ratios)})",
            )
    s_new, s_old = new.get("sentinel_sec"), old.get("sentinel_sec")
    if s_new and s_old:
        return s_new / s_old, "scan-sentinel"
    return 1.0, "none"


def check_sentinel_drift() -> str | None:
    latest_path = os.path.join(REPO, "bench_full_latest.json")
    if not os.path.isfile(latest_path):
        return None  # no fresh bench this round — nothing to gate
    with open(latest_path) as fh:
        latest = json.load(fh)
    if latest.get("sentinel_sec") is None:
        return "bench_full_latest.json has no sentinel_sec — re-run bench.py"
    if not latest.get("sentinels"):
        # r12 retired the single-scan scalar as the primary normalizer;
        # every map produced from r12 on MUST carry the 3-shape basket
        # (scan/shuffle/window) — a fresh map without it means an old
        # bench.py ran, and committing it would silently degrade every
        # future cross-round comparison back to the fragile scalar.
        return (
            "bench_full_latest.json has no `sentinels` basket — this "
            "bench.py predates the r12 basket normalizer; re-run"
        )
    prev = None
    prev_name = None
    for p in sorted(
        glob.glob(os.path.join(REPO, "bench_full_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
        reverse=True,
    ):
        with open(p) as fh:
            m = json.load(fh)
        if m.get("sentinel_sec") is not None:
            prev, prev_name = m, os.path.basename(p)
            break
    if prev is None:
        return None  # first sentinel-carrying round — baseline established
    ratio, norm = _load_ratio(latest, prev)
    drift = abs(ratio - 1.0)
    if drift > SENTINEL_DRIFT_MAX:
        return (
            f"sentinel drift {drift:.0%} ({norm}) vs {prev_name} "
            f"exceeds {SENTINEL_DRIFT_MAX:.0%} — the map "
            "absorbed machine load; re-run bench.py on an idle machine"
        )
    return None


def _depths(m: dict) -> dict[str, int]:
    if "depth" in m:
        return dict(m["depth"])
    n = m.get("runs_per_query")
    if n is None:
        agg = m.get("aggregation", "")
        match = re.search(r"min-of-(\d+)", agg)
        n = int(match.group(1)) if match else 1
        mruns = re.search(r"min over (\d+) (?:runs|sessions)", agg)
        if mruns:
            n *= int(mruns.group(1))
        elif "session" in agg:
            # pre-r8 merged maps ('min-of-3 x sessions') accumulated
            # minima over an UNRECORDED number of sessions — depth is
            # unknown, only known to exceed one session's worth
            n = -1  # sentinel: unknown-but-deep
    return {k: n for k, v in m["queries"].items() if v is not None}


def _newest_committed_map(exclude: str | None = None) -> str | None:
    paths = sorted(
        glob.glob(os.path.join(REPO, "bench_full_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
        reverse=True,
    )
    for p in paths:
        if exclude and os.path.abspath(p) == os.path.abspath(exclude):
            continue
        return p
    return None


def compare(new_path: str | None, old_path: str | None) -> int:
    new_path = new_path or os.path.join(REPO, "bench_full_latest.json")
    old_path = old_path or _newest_committed_map(exclude=new_path)
    if not old_path or not os.path.isfile(new_path):
        print("compare: need both maps", file=sys.stderr)
        return 2
    new = json.load(open(new_path))
    old = json.load(open(old_path))
    load_ratio, norm_kind = _load_ratio(new, old)
    d_new, d_old = _depths(new), _depths(old)
    shared = [
        k
        for k, v in new["queries"].items()
        if v is not None and old["queries"].get(k) is not None
    ]
    eq, uneq = [], []
    for k in shared:
        raw = new["queries"][k] / old["queries"][k]
        adj = raw / load_ratio
        row = (k, raw, adj, d_new.get(k, 0), d_old.get(k, 0))
        (eq if d_new.get(k) == d_old.get(k) else uneq).append(row)
    print(
        f"compare {os.path.basename(new_path)} vs "
        f"{os.path.basename(old_path)}: "
        f"load ratio {load_ratio:.3f} ({norm_kind}), {len(shared)} shared "
        f"rows, {len(eq)} equal-depth (plan-comparable), {len(uneq)} "
        "depth-mismatched"
    )
    for label, rows in (("EQUAL-DEPTH", eq), ("DEPTH-MISMATCHED", uneq)):
        if not rows:
            continue
        adj_sorted = sorted(r[2] for r in rows)
        med = adj_sorted[len(adj_sorted) // 2]
        print(f"\n{label}: median sentinel-normalized ratio {med:.3f}")
        flagged = [r for r in rows if r[2] > 1.3]
        for k, raw, adj, dn, do in sorted(flagged, key=lambda r: -r[2]):
            note = ""
            if label == "DEPTH-MISMATCHED":
                if do == -1 or (do > dn and dn != -1):
                    bias = (
                        "old map's min is deeper (optimistically low) — "
                        "expected to read slow here"
                    )
                else:
                    bias = (
                        "new map's min is deeper — a real regression "
                        "would be UNDERSTATED here"
                    )
                dd = "unknown-deep" if do == -1 else do
                dnn = "unknown-deep" if dn == -1 else dn
                note = f" [depth {dnn} vs {dd}: {bias}]"
            print(f"  {k}: raw {raw:.2f}x, adj {adj:.2f}x{note}")
        if not flagged:
            print("  no rows over 1.3x (sentinel-normalized)")
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "compare":
        return compare(
            sys.argv[2] if len(sys.argv) > 2 else None,
            sys.argv[3] if len(sys.argv) > 3 else None,
        )
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
