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
        hot.withColumn("__salt", joins._salt_col(hot, 8))
        .select("__salt").distinct().count()
    )
    assert salts == 8


def test_salted_join_splits_fully_duplicate_rows(spark):
    """Pathological duplicate-heavy key: 4000 IDENTICAL rows must still
    spread across all salt partitions (a pure row-hash would give them
    all the same salt — r1 verdict minor)."""
    dup = spark.range(4000).select(F.lit(7).alias("k"), F.lit("same").alias("v"))
    out = joins.salted_join(dup, spark.createDataFrame([(7, "hot")], "dk int, label string"),
                            "k", "dk", salt=8)
    assert out.count() == 4000
    salts = (
        dup.withColumn("__salt", joins._salt_col(dup, 8))
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


def test_salted_join_same_key_name_both_sides(spark):
    """Identical key column names on both sides must not be ambiguous:
    the join condition qualifies keys per-dataframe (ADVICE r1)."""
    big = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k int, label string")
    out = joins.salted_join(big, dim, "k", "k", salt=4)
    got = sorted((r["v"], r["label"]) for r in out.collect())
    assert got == [("a", "one"), ("b", "one"), ("c", "two")]


def test_range_bucket_join_pre_1970(spark):
    """Negative-epoch timestamps: truncation-toward-zero bucketing would
    put a fact and its containing interval in different buckets; floor()
    keeps them together (ADVICE r1)."""
    facts = spark.createDataFrame(
        [(1, "1969-12-31 23:30:00")], "fid int, ts string"
    ).select("fid", F.col("ts").cast("timestamp").alias("ts"))
    ivs = spark.createDataFrame(
        [("1969-12-31 23:00:00", "1970-01-01 01:00:00")], "s string, e string"
    ).select(F.col("s").cast("timestamp").alias("win_start"),
             F.col("e").cast("timestamp").alias("win_end"))
    out = joins.range_bucket_join(facts, ivs, "ts", "win_start", "win_end",
                                  bucket_width=3600)
    assert out.count() == 1


def test_blocked_fuzzy_pairs_short_names(spark):
    """Names shorter than block_suffix+1 must not all collapse into one
    empty-string block (ADVICE r1): unrelated short names stay apart,
    while identical-prefix shorts still match."""
    df = spark.createDataFrame(
        [(1, "ab"), (2, "xy"), (3, "ac")], "id long, name string"
    )
    got = {(r["id_a"], r["id_b"]) for r in
           blocked_fuzzy_pairs_import(df).collect()}
    # 'ab' and 'ac' share block 'a' and are 1 edit apart; 'xy' is in
    # block 'x' and never compared against them.
    assert got == {(1, 3)}


def blocked_fuzzy_pairs_import(df):
    from hive_exporter_spark.operators.joins import blocked_fuzzy_pairs
    return blocked_fuzzy_pairs(df, "id", "name", max_dist=1, block_suffix=1)


def test_interval_overlap_join_matches_naive(spark, sf_dir):
    """Bucketed interval×interval overlap == the naive theta-join, with
    no duplicate pairs from multi-bucket overlaps."""
    ev = read_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.min("ts").alias("s_start"),
             (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("s_end"))
    )
    windows = (
        ev.select(F.date_trunc("day", "ts").alias("day")).distinct()
        .select((F.col("day") + F.expr("INTERVAL 6 HOURS")).alias("win_start"),
                (F.col("day") + F.expr("INTERVAL 18 HOURS")).alias("win_end"))
    )
    naive = sess.join(
        windows,
        (F.col("s_start") < F.col("win_end")) & (F.col("win_start") < F.col("s_end")),
    )
    bucketed = joins.interval_overlap_join(
        sess, windows, "s_start", "s_end", "win_start", "win_end",
        bucket_width=6 * 3600)
    cols = ["user_id", "day", "win_start"]
    assert _rows(bucketed, cols) == _rows(naive, cols)


def test_interval_overlap_join_long_interval_no_dups(spark):
    """An interval spanning MANY buckets still pairs exactly once with
    each overlapping partner (canonical-bucket dedup)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-03 00:00:00")],
        "lid int, s string, e string",
    ).select("lid", F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 05:00:00", "2024-01-02 07:00:00"),   # overlaps
         (11, "2024-01-02 23:00:00", "2024-01-04 00:00:00"),   # overlaps
         (12, "2024-01-03 00:00:00", "2024-01-05 00:00:00")],  # touches only (half-open: no)
        "rid int, s2 string, e2 string",
    ).select("rid", F.col("s2").cast("timestamp").alias("s2"),
             F.col("e2").cast("timestamp").alias("e2"))
    got = sorted(
        (r["lid"], r["rid"]) for r in joins.interval_overlap_join(
            left, right, "s", "e", "s2", "e2", bucket_width=3600).collect())
    assert got == [(1, 10), (1, 11)]


def test_interval_overlap_join_is_equi_join(spark, sf_dir):
    from hive_exporter_spark import plans

    ev = read_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.min("ts").alias("s_start"),
             (F.max("ts") + F.expr("INTERVAL 1 SECOND")).alias("s_end"))
    )
    windows = (
        ev.select(F.date_trunc("day", "ts").alias("day")).distinct()
        .select((F.col("day") + F.expr("INTERVAL 6 HOURS")).alias("win_start"),
                (F.col("day") + F.expr("INTERVAL 18 HOURS")).alias("win_end"))
    )
    df = joins.interval_overlap_join(sess, windows, "s_start", "s_end",
                                     "win_start", "win_end")
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_blocked_fuzzy_pairs_capped_contract(spark, sf_dir):
    """The capped-screen contract, applied to entity resolution:
    (1) with no block over the cap the output is IDENTICAL to the
    uncapped screen; (2) on a hot block the candidate volume drops
    quadratic -> linear while capped verified pairs stay a subset of
    the uncapped ones; (3) the chain preserves within-block
    connectivity for downstream clustering."""
    # (1) distinct prefixes -> every block is a singleton pair family
    cool = spark.createDataFrame(
        [(2 * i + j, f"name{chr(97 + i)}x{s}") for i in range(8)
         for j, s in enumerate(("a", "b"))],
        "id long, name string")
    a = joins.blocked_fuzzy_pairs(cool, "id", "name").collect()
    b = joins.blocked_fuzzy_pairs_capped(cool, "id", "name").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and a

    # (2)+(3) one adversarial block: 60 records sharing a prefix,
    # names within Levenshtein 1 of each other
    hot = spark.createDataFrame(
        [(i, f"placeholder_account_{chr(97 + i % 4)}") for i in range(60)],
        "id long, name string")
    unc = joins.blocked_fuzzy_pairs(hot, "id", "name")
    cap = joins.blocked_fuzzy_pairs_capped(hot, "id", "name",
                                           block_cap=4)
    n_unc, n_cap = unc.count(), cap.count()
    assert n_cap < n_unc  # quadratic -> linear
    assert n_cap <= 60 - 1
    u = {(r["id_a"], r["id_b"]) for r in unc.collect()}
    c = {(r["id_a"], r["id_b"]) for r in cap.collect()}
    assert c <= u
    # connectivity: union-find over capped pairs keeps the block's
    # verified ids in one component per name-neighborhood
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for x, y in c:
        parent[find(x)] = find(y)
    ids = {i for p in c for i in p}
    comps = {find(i) for i in ids}
    # uncapped graph on this fixture is one clique family; the chain
    # must not shatter it into per-pair fragments
    assert len(comps) <= len({find(i) for i in
                              {i for p in u for i in p}}) + 1
