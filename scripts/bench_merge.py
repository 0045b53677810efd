#!/usr/bin/env python
"""Merge bench maps by per-query minimum (the r7 'min over sessions'
rule, made mechanical): each run's min-of-3 still carries machine-load
noise between runs; the committed per-round map takes the min of every
query across the round's runs so cross-round diffs compare plan cost,
not load. The sentinel is merged by MIN too (it estimates the same
thing: the quietest observed machine state).

Estimator depth (r8 verdict #4): a min over more runs is optimistically
DEEPER — comparing a 9-run min against a 3-run min manufactures phantom
regressions. Every merged map therefore records per-query `depth` (the
total individual timed runs behind each min: per-map runs_per_query,
summed over the maps that carried the query), and
`scripts/round_close.py compare` uses it to separate equal-depth
plan-comparable rows from depth-inconsistent ones.

Usage:
  python scripts/bench_merge.py out.json run1.json run2.json [...]
"""

from __future__ import annotations

import json
import re
import sys


def _map_depths(m: dict) -> dict[str, int]:
    """Per-query run depth of one input map: its own `depth` field when
    it is already a merge, else runs_per_query (or the min-of-N parsed
    from `aggregation`) for every query it carries."""
    if "depth" in m:
        return dict(m["depth"])
    n = m.get("runs_per_query")
    if n is None:
        match = re.search(r"min-of-(\d+)", m.get("aggregation", ""))
        n = int(match.group(1)) if match else 1
    return {k: n for k, v in m["queries"].items() if v is not None}


def main() -> int:
    out, *ins = sys.argv[1:]
    if not ins:
        print("need at least one input map", file=sys.stderr)
        return 2
    maps = [json.load(open(p)) for p in ins]
    base = dict(maps[0])
    queries: dict[str, float | None] = {}
    depth: dict[str, int] = {}
    for m in maps:
        d = _map_depths(m)
        for k, v in m["queries"].items():
            depth[k] = depth.get(k, 0) + d.get(k, 0)
            if v is None:
                queries.setdefault(k, None)
            elif queries.get(k) is None:
                queries[k] = v
            else:
                queries[k] = min(queries[k], v)
    base["queries"] = queries
    base["depth"] = depth
    base["value"] = round(
        sum(v for k, v in queries.items() if v is not None and "/" not in k), 3
    )
    sentinels = [m.get("sentinel_sec") for m in maps if m.get("sentinel_sec")]
    if sentinels:
        base["sentinel_sec"] = min(sentinels)
    # per-shape basket (bench.py since r12): min each shape independently
    baskets = [m["sentinels"] for m in maps if m.get("sentinels")]
    if baskets:
        base["sentinels"] = {
            shape: min(b[shape] for b in baskets if shape in b)
            for shape in sorted({s for b in baskets for s in b})
        }
    base["aggregation"] = (
        f"{maps[0].get('aggregation', 'min-of-3')}, min over {len(maps)} runs"
    )
    with open(out, "w") as fh:
        json.dump(base, fh, indent=1, sort_keys=True)
    depths = sorted(set(depth.values()))
    print(f"merged {len(ins)} maps -> {out}: {len(queries)} rows, "
          f"total {base['value']}s, sentinel {base.get('sentinel_sec')}, "
          f"depths {depths}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
