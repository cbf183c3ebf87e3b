#!/usr/bin/env python
"""Isolated best-of-N wall-clock for a few queries, bench-methodology
(fresh frame per rep, count() action, sf0.001 warmup first), with a
session-warming query so the first listed query is not polluted by
JIT/parquet-reader init.

Usage: python tools/time_queries.py [sf_dir] [reps] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from hive_exporter_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    spark = build_session("time_queries")
    queries = entrymod.queries()
    # Warm the session on an uninvolved scan-agg so the first listed
    # query does not absorb JVM/parquet init.
    queries["q6_forecast_revenue"](spark, sf_dir).count()
    queries["text_stats"](spark, sf_dir).count()
    for name in names:
        fn = queries[name]
        fn(spark, "/root/testdata/sf0.001").count()  # plan-shape warmup
        best, times = None, []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            times.append(round(dt, 3))
            best = dt if best is None or dt < best else best
        print(f"{name:<42} best {best:7.3f}  runs {times}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
