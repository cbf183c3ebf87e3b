#!/usr/bin/env python3
"""Mechanically derive the next driver CORRECTNESS window (VERDICT r6
item 2): with every registry entry driver-checked at least once, the
rotation rule becomes staleness-of-green — lead with entries never
checked (new this round), then rank every other entry by how much its
implementing code has churned SINCE its last green driver row.

Staleness for entry e:
    stale(e) = last_touched_round(modules(e)) - last_green_round(e)

- last_green_round: max round whose CORRECTNESS_r*.json holds a green
  row for e (rows+schema match, no err, hash not False).
- modules(e): the hive_exporter_spark modules the entry's wrapper
  references (token scan of the wrapper source — wrappers are thin,
  so the tokens ARE the dependency list), plus the module defining it.
- last_touched_round: round of the newest commit touching any of
  those module files, where commits are bucketed into rounds by the
  driver's "round N:" marker commits (work after the round-N marker
  belongs to round N+1).

Output: the 50-entry window, never-checked first, then by descending
staleness (ties: oldest green first, then name), ready to paste into
__spark_entry__._PRIORITY. Entries whose staleness <= 0 (code
untouched since their green) fill the tail only if fewer than 50
entries are stale — freshness beats re-proving what nothing changed.

Usage: python tools/rotate_window.py [--json]
"""
from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODULE_TOKENS = {
    "relational": "hive_exporter_spark/operators/relational.py",
    "joins": "hive_exporter_spark/operators/joins.py",
    "core": "hive_exporter_spark/operators/core.py",
    "ingest": "hive_exporter_spark/operators/ingest.py",
    "llm": "hive_exporter_spark/operators/llm.py",
    "multimodal": "hive_exporter_spark/operators/multimodal.py",
    "pipeline": "hive_exporter_spark/operators/pipeline.py",
    "sketches": "hive_exporter_spark/operators/sketches.py",
    "webclean": "hive_exporter_spark/operators/webclean.py",
    "sessions": "hive_exporter_spark/operators/sessions.py",
    "layout": "hive_exporter_spark/operators/layout.py",
    "sinks": "hive_exporter_spark/sinks.py",
    "catalog": "hive_exporter_spark/catalog.py",
    "aggs": "hive_exporter_spark/functions/aggs.py",
    "rand": "hive_exporter_spark/functions/rand.py",
    "vectors": "hive_exporter_spark/functions/vectors.py",
}
WINDOW = 50


def _round_of_commits() -> dict[str, int]:
    """hash -> round number, from the driver's 'round N:' markers."""
    out = subprocess.run(
        ["git", "log", "--reverse", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    rounds: dict[str, int] = {}
    cur = 1
    for line in out.splitlines():
        h, _, subj = line.partition(" ")
        rounds[h] = cur
        m = re.match(r"round (\d+): verdict", subj)
        if m:
            cur = int(m.group(1)) + 1
    return rounds


def _file_round(path: str, rounds: dict[str, int]) -> int:
    out = subprocess.run(
        ["git", "log", "--format=%H", "--", path],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    hashes = [h for h in out.split() if h in rounds]
    # skip the driver's own artifact commits (they touch nothing here)
    return max((rounds[h] for h in hashes), default=0)


def _last_green() -> dict[str, int]:
    green: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", p).group(1))
        for name, row in json.load(open(p)).items():
            hash_ok = (row.get("err") is None and row.get("rows_match")
                       and row.get("schema_match") is not False
                       and row.get("hash_match") is not False)
            # the driver's weaker rows-only pass for no-oracle entries
            rows_ok = (row.get("err") == "no_oracle"
                       and row.get("spark_rows") is not None)
            if hash_ok or rows_ok:
                green[name] = max(green.get(name, 0), rnd)
    return green


def _entry_modules(fn) -> set[str]:
    files = set()
    try:
        src = inspect.getsource(fn)
        own = inspect.getsourcefile(fn) or ""
    except (OSError, TypeError):
        return files
    if own.startswith(REPO) and "hive_exporter_spark" in own:
        files.add(os.path.relpath(own, REPO))
    for tok, path in MODULE_TOKENS.items():
        if re.search(rf"\b{tok}\.", src):
            files.add(path)
    return files


def rank_entries(names, green: dict[str, int], oracles: set[str],
                 touched: dict[str, int]) -> list[dict]:
    """Pure ranking rule (unit-tested): never-checked entries first
    (staleness 99), then descending staleness; oracle-backed entries
    win ties — a window slot spent on a rows-only entry buys the
    weaker check."""
    rows = []
    for name in names:
        g = green.get(name, 0)
        t = touched.get(name, 0)
        rows.append({
            "name": name,
            "last_green": g,
            "last_touched": t,
            "staleness": (t - g) if g else 99,
            "oracle": name in oracles,
        })
    rows.sort(key=lambda r: (-r["staleness"], not r["oracle"],
                             r["last_green"], r["name"]))
    return rows


AGE_BACKSTOP_ROUNDS = 4      # driver-green older than this re-enters
AGE_BACKSTOP_SLOTS = WINDOW // 5   # ...via a bounded tail reservation


def pick_window(rows: list[dict], window: int = WINDOW,
                current_round: int | None = None) -> list[dict]:
    """Stale ORACLE-BACKED entries fill the window; if fewer than
    `window` are stale, top up with the oldest greens — freshness
    beats re-proving what nothing changed. Rows-only entries never
    enter: the driver's check degrades to rows-only on them, wasting
    the hash slot (tests/test_entry_contract.py pins the window as
    fully hash-checkable; the full-registry sweep still runs them).

    AGE BACKSTOP (r10 verdict item 3): the churn rule deliberately
    skips entries whose code is untouched since their green, but a
    6-round-old driver row is a blind spot the rule never clears when
    every window is full of stale entries. Any oracle-backed entry
    whose last driver-green is more than AGE_BACKSTOP_ROUNDS rounds
    old fills the window TAIL (oldest green first), reserving up to
    AGE_BACKSTOP_SLOTS slots from the stale cohort — the window still
    chases churn, but no entry's driver row can age out unboundedly."""
    elig = [r for r in rows if r["oracle"]]
    aged: list[dict] = []
    if current_round is not None:
        aged = [r for r in elig
                if 0 < r["last_green"] < current_round
                - AGE_BACKSTOP_ROUNDS]
        aged.sort(key=lambda r: (r["last_green"], r["name"]))
        aged = aged[:AGE_BACKSTOP_SLOTS]
    aged_names = {r["name"] for r in aged}
    stale = [r for r in elig
             if r["staleness"] > 0 and r["name"] not in aged_names]
    out = stale[:max(0, window - len(aged))] + aged
    if len(out) < window:
        have = {r["name"] for r in out}
        rest = [r for r in elig
                if r["name"] not in have and r["staleness"] <= 0]
        rest.sort(key=lambda r: (r["last_green"], r["name"]))
        out += rest[:window - len(out)]
    return out[:window]


def main() -> int:
    import __spark_entry__ as entry

    qs = entry.queries()
    green = _last_green()
    rounds = _round_of_commits()
    file_round = {p: _file_round(p, rounds)
                  for p in set(MODULE_TOKENS.values())}

    touched = {}
    for name, fn in qs.items():
        mods = _entry_modules(fn)
        touched[name] = max((file_round.get(m, 0) for m in mods),
                            default=0)
    correctness = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    cur_round = max((int(re.search(r"_r(\d+)\.json$", p).group(1))
                     for p in correctness), default=0) + 1
    rows = rank_entries(qs, green, set(entry.oracle_sql()), touched)
    window = pick_window(rows, current_round=cur_round)

    if "--json" in sys.argv:
        print(json.dumps(window, indent=1))
    else:
        for r in window:
            tag = "NEW" if r["last_green"] == 0 else \
                f"green r{r['last_green']} touched r{r['last_touched']}"
            orc = "" if r["oracle"] else "  [rows-only]"
            print(f"{r['name']:44s} {tag}{orc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
