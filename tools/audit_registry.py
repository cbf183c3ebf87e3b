#!/usr/bin/env python
"""Registry-wide plan audit: run `plans.audit_plan` over every
`queries()` entry and tabulate findings.

Usage:
    python tools/audit_registry.py [sf_dir] [--errors-only]

This is the dogfooding harness behind SCALE.md's "plan linter +
registry-wide self-audit" section: every entry's physical plan is
linted for cartesian products, single-partition funnels, repeated
scans, and per-row Python. Error-severity findings are either real
(fix the operator — e.g. the q15 window-argmax funnel this audit
caught) or dismissible with context the plan can't see (windows over
dimension-sized frames); SCALE.md records each dismissal.
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_exporter_spark import plans  # noqa: E402
from hive_exporter_spark.session import build_session  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    errors_only = "--errors-only" in sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod

    spark = build_session("audit-registry")
    counts: collections.Counter = collections.Counter()
    n_err = 0
    for name, fn in entrymod.queries().items():
        try:
            findings = plans.audit_plan(fn(spark, sf))
        except Exception as ex:  # noqa: BLE001 — report, keep auditing
            print(f"error EXCEPTION {name}: {ex}")
            n_err += 1
            continue
        for f in findings:
            counts[(f["rule"], f["severity"])] += 1
            if f["severity"] == "error":
                n_err += 1
            if errors_only and f["severity"] != "error":
                continue
            print(f"{f['severity']:5s} {f['rule']:28s} {name}: "
                  f"{f['detail']}")
    print("findings by (rule, severity):")
    for (rule, sev), n in sorted(counts.items()):
        print(f"  {sev:5s} {rule}: {n}")
    print(f"{n_err} error-severity finding(s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
