"""HLL sketch rollup tests: estimate accuracy vs exact distinct, and
losslessness of the daily-sketch merge (the pre-aggregation pattern's
correctness contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_exporter_spark.operators.sessions import (
    daily_distinct_users_hll, rolling_distinct_users,
)
from hive_exporter_spark.sources.files import read_table


def test_daily_hll_close_to_exact(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    est = {
        (r["day"], r["event_type"]): r["est_users"]
        for r in daily_distinct_users_hll(ev).collect()
    }
    exact = {
        (r["day"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        assert abs(e - exact[k]) <= max(2, 0.05 * exact[k]), (k, e, exact[k])


def test_rolling_merge_equals_direct_sketch(spark, sf_dir):
    """Merging daily sketches must estimate exactly what a single
    sketch over the whole stream estimates (merge is lossless)."""
    ev = read_table(spark, sf_dir, "events")
    merged = {
        r["event_type"]: r["est_users"]
        for r in rolling_distinct_users(ev).collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
             .cast("long").alias("est"))
        .collect()
    }
    assert merged == direct


def test_rolling_day_counts(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    n_days = ev.select(F.date_trunc("day", "ts")).distinct().count()
    for r in rolling_distinct_users(ev).collect():
        assert r["n_days"] <= n_days
        assert r["est_users"] > 0
