"""Salted-join and range-bucket-join correctness: each strategy must
return exactly what the naive formulation returns (they exist only to
change the physical shape, never the semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_exporter_spark.operators import joins
from hive_exporter_spark.sources.files import read_table


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain_join(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = ev.join(cust, F.col("user_id") == F.col("c_custkey"))
    salted = joins.salted_join(ev, cust, "user_id", "c_custkey")
    cols = ["event_id", "c_mktsegment"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_join_splits_hot_key(spark):
    """A single hot key must land in `salt` distinct shuffle groups:
    every salt value occurs among the hot key's joined rows."""
    hot = spark.range(4000).select(F.lit(7).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(7, "hot")], "dk int, label string")
    out = joins.salted_join(hot, dim, "k", "dk", salt=8)
    assert out.count() == 4000
    salts = (
        hot.withColumn("__salt", F.pmod(F.xxhash64("k", "id"), F.lit(8)))
        .select("__salt").distinct().count()
    )
    assert salts == 8


def test_range_bucket_join_matches_naive(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    windows = (
        ev.select(F.date_trunc("day", "ts").alias("day")).distinct()
        .select(
            (F.col("day") + F.expr("INTERVAL 6 HOURS")).alias("win_start"),
            (F.col("day") + F.expr("INTERVAL 18 HOURS")).alias("win_end"),
        )
    )
    naive = ev.join(
        windows,
        (F.col("ts") >= F.col("win_start")) & (F.col("ts") < F.col("win_end")),
    )
    bucketed = joins.range_bucket_join(
        ev, windows, "ts", "win_start", "win_end", bucket_width=6 * 3600
    )
    cols = ["event_id", "win_start"]
    assert _rows(bucketed, cols) == _rows(naive, cols)


def test_range_bucket_join_is_equi_join(spark, sf_dir):
    """The physical plan must contain a hash-partitioned equi-join on
    the bucket, not a broadcast-nested-loop over the range predicate."""
    from hive_exporter_spark import plans

    ev = read_table(spark, sf_dir, "events")
    windows = ev.select(
        F.date_trunc("day", "ts").alias("win_start"),
        (F.date_trunc("day", "ts") + F.expr("INTERVAL 12 HOURS")).alias("win_end"),
    ).distinct()
    df = joins.range_bucket_join(ev, windows, "ts", "win_start", "win_end")
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_blocked_fuzzy_pairs_semantics(spark):
    from hive_exporter_spark.operators.joins import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [(1, "Acme Corp 01"), (2, "Acme Corp 02"), (3, "Acme Corp 99"),
         (4, "Zeta Ltd. 01")],
        "id long, name string",
    )
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in blocked_fuzzy_pairs(df, "id", "name").collect()}
    # 01~02 differ in one trailing char; 99 is two edits from both;
    # Zeta sits in a different block entirely.
    assert got == {(1, 2): 1}
    wide = {(r["id_a"], r["id_b"])
            for r in blocked_fuzzy_pairs(df, "id", "name", max_dist=2).collect()}
    assert wide == {(1, 2), (1, 3), (2, 3)}
