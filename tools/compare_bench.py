#!/usr/bin/env python
"""Diff two bench JSON lines and flag per-query regressions,
normalized for machine drift.

Usage:
    python tools/compare_bench.py OLD.json NEW.json [ratio] [floor_sec]

Accepts either a raw `bench.py` output line or a driver BENCH_r0N.json
wrapper (whose `tail` string embeds the line).

Drift normalization (r6 lesson: the tool cried regression three times
on untouched code because the BOX, not the plan, was 1.6-1.7x slower;
r12 lesson: the calibration probes alone moved ~1.07x while untouched
plan-identical queries slowed ~1.77x — contention drift lives in
scheduling overhead the tight probes never feel): every new-side
timing is divided by a drift factor before the thresholds apply. The
factor is the MAX of the median ratio of the fixed-cost `calibration`
probes both artifacts carry (pure range-shuffle + parquet scan-agg —
machine speed, no operator code) and the 75th-percentile per-query
ratio across ALL shared queries (p75, not the median — see
drift_factor's docstring for why); the shuffle-byte gate stays raw
and box-independent, so normalization can never hide a plan that
genuinely picked up a fatter exchange.

Given a driver artifact path BENCH_rNN.json, the loader prefers a
sibling BENCH_LOCAL_rNN.json (the untruncated payload bench.py
persists in-repo) when one exists — the driver's 2000-char tail
truncation eats `shuffle_bytes` and dozens of per-query timings, so
the byte gate is only meaningful on the local artifacts.

A query regresses when new/drift > old * ratio AND new/drift - old >
floor_sec (defaults 1.4 / 0.3 — this box swings ±20% run to run, so
smaller deltas are noise; compare isolated best-of-3 for anything
borderline).

Shuffle-byte deltas (plan cost, box-INDEPENDENT — never normalized):
when both artifacts carry per-query `shuffle_bytes`
[read, write, spilled], a query is also flagged when its read+write
total grew beyond 1.3x + 1 MiB — the reliable signal a plan picked up
an extra or fatter exchange.
"""

from __future__ import annotations

import json
import re
import sys

BYTE_RATIO = 1.3
BYTE_FLOOR = 1 << 20  # 1 MiB
MIN_FALLBACK_QUERIES = 16
META_KEYS = ("value", "sf", "n", "rc", "cpus", "headline22_total",
             "total_sec")


def load_bench(path: str) -> dict:
    """Returns {queries: {name: sec}, calibration: {name: sec},
    shuffle_bytes: {name: [r, w, spill]}} — empty dicts where the
    artifact predates a field. A driver BENCH_rNN.json path is
    upgraded to its sibling BENCH_LOCAL_rNN.json when present (the
    untruncated in-repo artifact)."""
    m = re.search(r"^(.*)BENCH_(r\d+)(\.json)?$", path)
    if m and "LOCAL" not in path:
        local = f"{m.group(1)}BENCH_LOCAL_{m.group(2)}.json"
        try:
            open(local).close()
            print(f"# using untruncated {local}", file=sys.stderr)
            path = local
        except OSError:
            pass
    if not path.endswith(".json"):
        path += ".json"
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        return {
            "queries": {k: float(v) for k, v in d["queries"].items()},
            "calibration": {k: float(v)
                            for k, v in (d.get("calibration") or {}).items()},
            "shuffle_bytes": {k: [int(x) for x in v]
                              for k, v in (d.get("shuffle_bytes") or {}).items()
                              if isinstance(v, (list, tuple)) and len(v) == 3},
        }
    text = d.get("tail", raw) if isinstance(d, dict) else raw
    m = re.search(r'"queries":\s*\{([^}]*)\}', text)
    # driver tails are often truncated mid-line; fall back to scraping
    # every "name": seconds pair (drops the metric/value/sf keys)
    body = m.group(1) if m else text
    pairs = {k: float(v)
             for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', body)}
    calib = {k: pairs.pop(k) for k in list(pairs) if k.startswith("calib_")}
    for meta in META_KEYS:
        pairs.pop(meta, None)
    if not pairs:
        raise SystemExit(f"{path}: no queries payload found")
    return {"queries": pairs, "calibration": calib, "shuffle_bytes": {}}


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def drift_factor(old: dict, new: dict) -> tuple[float, str]:
    """Box-drift estimate: the LARGER of (a) the median new/old ratio
    of the calibration probes and (b) the 75th-percentile per-query
    ratio across all shared queries. Either alone has a proven blind
    spot:

    - Probes alone under-correct (r12 ground truth: probes moved
      ~1.07x while 115/128 plan-identical queries slowed ~1.77x with
      BYTE-IDENTICAL per-query shuffle bytes — the drift lived in
      scheduling/driver contention that two tight fixed-cost jobs
      never feel, and the driver's raw comparison read it as 115
      regressions).
    - p75 alone is just "the slowest one" over a handful of queries
      and would normalize away a real regression, so it only applies
      when >= MIN_FALLBACK_QUERIES queries are shared.

    Taking the max is deliberately conservative AGAINST false
    positives: masking is bounded — p75 hides a real slowdown only if
    more than a quarter of all shared queries regressed at once (the
    summary's faster-or-equal count collapses and says so), and the
    shuffle-byte gate below is box-independent and never normalized,
    so a plan that picked up a fatter exchange is flagged regardless
    of what the time gate was normalized by."""
    shared_cal = sorted(set(old["calibration"]) & set(new["calibration"]))
    cal = None
    if shared_cal:
        cal = _median([new["calibration"][k] / old["calibration"][k]
                       for k in shared_cal if old["calibration"][k] > 0])
    shared_q = [k for k in set(old["queries"]) & set(new["queries"])
                if old["queries"][k] > 0]
    p75 = None
    if len(shared_q) >= MIN_FALLBACK_QUERIES:
        ratios = sorted(new["queries"][k] / old["queries"][k]
                        for k in shared_q)
        p75 = ratios[min(len(ratios) - 1, (len(ratios) * 3) // 4)]
    if cal is not None and p75 is not None:
        if p75 > cal:
            return (p75, f"p75 of {len(shared_q)} shared query ratios "
                    f"(exceeds calibration-probe median {cal:.3f} — "
                    "scheduling-level drift the probes don't feel)")
        return (cal, f"calibration probes ({', '.join(shared_cal)}; "
                f"p75 of shared queries was lower, {p75:.3f})")
    if cal is not None:
        return cal, f"calibration probes ({', '.join(shared_cal)})"
    if p75 is not None:
        return (p75, f"p75 of {len(shared_q)} shared query ratios "
                "(no calibration probes in one artifact)")
    return 1.0, (f"none (fewer than {MIN_FALLBACK_QUERIES} shared "
                 "queries and no calibration probes — raw comparison)")


def compare(old: dict, new: dict, ratio: float = 1.4,
            floor: float = 0.3) -> dict:
    """Pure comparison core (unit-tested directly): returns
    {drift, drift_source, time_regressions, byte_regressions,
    n_common, n_faster}."""
    drift, source = drift_factor(old, new)
    drift = max(drift, 1e-9)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    time_regs = []
    for k in common:
        adj = nq[k] / drift
        if adj > oq[k] * ratio and adj - oq[k] > floor:
            time_regs.append((k, oq[k], nq[k], adj))
    byte_regs = []
    for k in sorted(set(old["shuffle_bytes"]) & set(new["shuffle_bytes"])):
        ob = old["shuffle_bytes"][k][0] + old["shuffle_bytes"][k][1]
        nb = new["shuffle_bytes"][k][0] + new["shuffle_bytes"][k][1]
        if nb > ob * BYTE_RATIO + BYTE_FLOOR:
            byte_regs.append((k, ob, nb))
    return {
        "drift": drift,
        "drift_source": source,
        "time_regressions": time_regs,
        "byte_regressions": byte_regs,
        "n_common": len(common),
        "n_faster": sum(1 for k in common if nq[k] / drift <= oq[k]),
    }


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = load_bench(sys.argv[1])
    new = load_bench(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    r = compare(old, new, ratio, floor)
    print(f"drift factor {r['drift']:.3f} from {r['drift_source']}")
    for k, a, b, adj in sorted(r["time_regressions"],
                               key=lambda t: t[1] - t[3]):
        print(f"REGRESSION {k}: {a:.2f}s -> {b:.2f}s raw "
              f"({adj:.2f}s drift-adjusted, {adj / a:.2f}x)")
    for k, ob, nb in sorted(r["byte_regressions"],
                            key=lambda t: t[1] - t[2]):
        print(f"BYTES-REGRESSION {k}: {ob} -> {nb} shuffle bytes "
              f"({nb / max(ob, 1):.2f}x)")
    print(f"{r['n_common']} comparable, {r['n_faster']} faster-or-equal "
          f"after drift, {len(r['time_regressions'])} time regression(s) "
          f"beyond {ratio}x+{floor}s, "
          f"{len(r['byte_regressions'])} byte regression(s)")
    return 1 if (r["time_regressions"] or r["byte_regressions"]) else 0


if __name__ == "__main__":
    raise SystemExit(main())
