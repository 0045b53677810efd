#!/usr/bin/env python
"""Merge bench maps by per-query minimum (the r7 'min over sessions'
rule, made mechanical): each run's min-of-3 still carries machine-load
noise between runs; the committed per-round map takes the min of every
query across the round's runs so cross-round diffs compare plan cost,
not load. The sentinel is merged by MIN too (it estimates the same
thing: the quietest observed machine state).

Usage:
  python scripts/bench_merge.py out.json run1.json run2.json [...]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out, *ins = sys.argv[1:]
    if not ins:
        print("need at least one input map", file=sys.stderr)
        return 2
    maps = [json.load(open(p)) for p in ins]
    base = dict(maps[0])
    queries: dict[str, float | None] = {}
    for m in maps:
        for k, v in m["queries"].items():
            if v is None:
                queries.setdefault(k, None)
            elif queries.get(k) is None:
                queries[k] = v
            else:
                queries[k] = min(queries[k], v)
    base["queries"] = queries
    base["value"] = round(
        sum(v for k, v in queries.items() if v is not None and "/" not in k), 3
    )
    sentinels = [m.get("sentinel_sec") for m in maps if m.get("sentinel_sec")]
    if sentinels:
        base["sentinel_sec"] = min(sentinels)
    base["aggregation"] = (
        f"{maps[0].get('aggregation', 'min-of-3')}, min over {len(maps)} runs"
    )
    with open(out, "w") as fh:
        json.dump(base, fh, indent=1, sort_keys=True)
    print(f"merged {len(ins)} maps -> {out}: {len(queries)} rows, "
          f"total {base['value']}s, sentinel {base.get('sentinel_sec')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
