#!/usr/bin/env python
"""Diff two bench JSON lines and flag per-query regressions.

Usage:
    python tools/compare_bench.py OLD.json NEW.json [ratio] [floor_sec]

Accepts either a raw `bench.py` output line or a driver BENCH_r0N.json
wrapper (whose `tail` string embeds the line). A query regresses when
new > old * ratio AND new - old > floor_sec (defaults 1.4 / 0.3 —
this box swings ±20% run to run, so smaller deltas are noise; compare
isolated best-of-3 for anything borderline).
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        return {k: float(v) for k, v in d["queries"].items()}
    text = d.get("tail", raw) if isinstance(d, dict) else raw
    m = re.search(r'"queries":\s*\{([^}]*)\}', text)
    # driver tails are often truncated mid-line; fall back to scraping
    # every "name": seconds pair (drops the metric/value/sf keys)
    body = m.group(1) if m else text
    pairs = {k: float(v)
             for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', body)}
    for meta in ("value", "sf", "n", "rc", "cpus", "headline22_total",
                 "total_sec"):
        pairs.pop(meta, None)
    if not pairs:
        raise SystemExit(f"{path}: no queries payload found")
    return pairs


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = load_queries(sys.argv[1])
    new = load_queries(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    common = sorted(set(old) & set(new))
    regs = [(k, old[k], new[k]) for k in common
            if new[k] > old[k] * ratio and new[k] - old[k] > floor]
    for k, a, b in sorted(regs, key=lambda t: t[1] - t[2]):
        print(f"REGRESSION {k}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x)")
    faster = sum(1 for k in common if new[k] <= old[k])
    print(f"{len(common)} comparable, {faster} faster-or-equal, "
          f"{len(regs)} regression(s) beyond {ratio}x+{floor}s")
    return 1 if regs else 0


if __name__ == "__main__":
    raise SystemExit(main())
