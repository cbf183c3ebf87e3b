#!/usr/bin/env python
"""Per-query phase breakdown: where does wall-clock go?

For each query: t_build (Python DataFrame construction), t_plan
(analysis + optimization + physical planning via explainString on a
FRESH frame), t_exec (count() on another fresh frame — includes its
own planning, so exec-only ~= t_exec - t_plan), plus the number of
Spark jobs the action launched (serial driver round-trips: each job is
a scheduling + AQE-replan barrier).

Usage: python tools/profile_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402
from hive_exporter_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(BENCH_QUERIES)
    spark = build_session("profile_queries")
    sc = spark.sparkContext
    queries = entrymod.queries()
    spark.range(1).count()
    print(f"{'query':<42} {'build':>7} {'plan':>7} {'exec':>7} {'jobs':>5}")
    for name in names:
        fn = queries[name]
        # Warm-up once (JIT/codegen/broadcast machinery), mirroring bench.
        try:
            fn(spark, "/root/testdata/sf0.001").count()
        except Exception as e:  # pragma: no cover
            print(f"{name:<42} WARMUP-FAIL {e}")
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        t_plan = time.time() - t0
        tracker = sc.statusTracker()
        before_ids = tracker.getJobIdsForGroup(None) or []
        df2 = fn(spark, sf_dir)
        t0 = time.time()
        df2.count()
        t_exec = time.time() - t0
        after_ids = tracker.getJobIdsForGroup(None) or []
        njobs = len(set(after_ids) - set(before_ids))
        print(f"{name:<42} {t_build:7.3f} {t_plan:7.3f} {t_exec:7.3f} "
              f"{njobs:>5}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
