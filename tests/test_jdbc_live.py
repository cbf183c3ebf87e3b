"""Live JDBC execution against embedded Derby (in the Spark JVM).

Round 1 only option-asserted the JDBC reader; these tests EXECUTE it:
create + populate a real table over JDBC, scan it back (S4 table mode,
S5 query mode), discover bounds on the source DB (S7), range-partition
the scan (S6), push an aggregate down (S8), and run a full
`incremental_append` ingest with a JDBC source — the reference's core
use case (spark_loaders.py:58-109, exercised against live MySQL by
tests/test_incremental_append.py:36-51).

Derby notes: unquoted identifiers fold to uppercase, and Spark's JDBC
writer quotes column names verbatim — so everything is seeded with
UPPERCASE names to keep raw SQL (bounds query, pushdown query)
resolvable. `jdbc:derby:memory:` keeps the DB inside the test JVM;
in local mode executors share it, so partitioned reads work.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_exporter_spark.sources import jdbc
from hive_exporter_spark.sources.files import read_table

URL = "jdbc:derby:memory:livetest;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def seeded(spark, sf_dir):
    """Seed Derby with 100 orders rows (uppercase columns) via the
    Spark JDBC writer; returns the expected rows."""
    src = (
        read_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("OKEY"),
            F.col("o_custkey").alias("CKEY"),
            F.col("o_totalprice").alias("PRICE"),
        )
        .orderBy("OKEY")
        .limit(100)
    )
    (src.write.format("jdbc")
     .option("url", URL).option("driver", DRIVER)
     .option("dbtable", "ORDERS_SRC").mode("overwrite").save())
    return {(r["OKEY"], r["CKEY"]) for r in src.collect()}


def test_s4_table_scan(spark, seeded):
    cfg = jdbc.JdbcSourceConfig(url=URL, driver=DRIVER, table="ORDERS_SRC")
    got = jdbc.reader(spark, cfg).load()
    assert {(r["OKEY"], r["CKEY"]) for r in got.collect()} == seeded


def test_s5_query_scan(spark, seeded):
    cfg = jdbc.JdbcSourceConfig(
        url=URL, driver=DRIVER,
        query="SELECT OKEY, PRICE FROM ORDERS_SRC WHERE OKEY <= 50",
    )
    got = jdbc.reader(spark, cfg).load().collect()
    assert all(r["OKEY"] <= 50 for r in got)
    assert len(got) == sum(1 for k, _ in seeded if k <= 50)


def test_s7_bounds_discovery_on_source(spark, seeded):
    cfg = jdbc.JdbcSourceConfig(url=URL, driver=DRIVER, table="ORDERS_SRC",
                                partition_column="OKEY", num_partitions=4)
    bounded = jdbc.discover_bounds(spark, cfg)
    keys = sorted(k for k, _ in seeded)
    assert bounded.lower_bound == keys[0]
    assert bounded.upper_bound == keys[-1]


def test_s6_range_partitioned_scan(spark, seeded):
    cfg = jdbc.discover_bounds(
        spark,
        jdbc.JdbcSourceConfig(url=URL, driver=DRIVER, table="ORDERS_SRC",
                              partition_column="OKEY", num_partitions=4),
    )
    df = jdbc.reader(spark, cfg).load()
    # Sqoop-style split: numPartitions parallel range queries.
    assert df.rdd.getNumPartitions() == 4
    assert {(r["OKEY"], r["CKEY"]) for r in df.collect()} == seeded


def test_s8_filter_pushdown_reaches_source(spark, seeded):
    """The delta filter must execute ON the database (JDBC WHERE), not
    in Spark — at scale only the delta crosses the wire."""
    cfg = jdbc.JdbcSourceConfig(url=URL, driver=DRIVER, table="ORDERS_SRC")
    df = jdbc.reader(spark, cfg).load().where(F.col("OKEY") > 90)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(OKEY" in plan, plan
    assert df.count() == sum(1 for k, _ in seeded if k > 90)


def test_s8_count_pushdown(spark, seeded):
    cfg = jdbc.JdbcSourceConfig(
        url=URL, driver=DRIVER,
        query="SELECT COUNT(*) AS N FROM ORDERS_SRC",
    )
    row = jdbc.reader(spark, cfg).load().first()
    assert row["N"] == len(seeded)


def test_incremental_append_over_jdbc(spark, sf_dir, tmp_path):
    """End-to-end reference flow: JDBC source -> watermark from the
    destination -> strict-> filter -> tagged partitioned append
    (spark_loaders.py:139-175)."""
    from hive_exporter_spark.catalog import TableName, drop_table, table_exists
    from hive_exporter_spark.operators import ingest

    events = (
        read_table(spark, sf_dir, "events")
        .select(
            F.col("event_id").alias("EID"),
            F.col("user_id").alias("UID"),
            F.col("value").alias("VAL"),
        )
        .orderBy("EID")
    )
    first, second = events.limit(600), events.limit(1000)

    (first.write.format("jdbc")
     .option("url", URL).option("driver", DRIVER)
     .option("dbtable", "EVENTS_SRC").mode("overwrite").save())

    dest = TableName("jdbc_ingest_db", "events_dst")
    if table_exists(spark, dest):
        drop_table(spark, dest)
    cfg = jdbc.JdbcSourceConfig(url=URL, driver=DRIVER, table="EVENTS_SRC")

    r1 = ingest.incremental_append(
        spark, jdbc.reader(spark, cfg).load(), dest, "EID", batch_tag="b1"
    )
    assert (r1.source_count, r1.ingested_count, r1.destination_count) == (600, 600, 600)

    # Second batch arrives at the source; re-ingest picks up ONLY the delta.
    (second.write.format("jdbc")
     .option("url", URL).option("driver", DRIVER)
     .option("dbtable", "EVENTS_SRC").mode("overwrite").save())
    r2 = ingest.incremental_append(
        spark, jdbc.reader(spark, cfg).load(), dest, "EID", batch_tag="b2"
    )
    assert (r2.source_count, r2.ingested_count, r2.destination_count) == (1000, 400, 1000)

    out = spark.table(str(dest))
    assert out.where(F.col("dl_ingest_date") == "b2").count() == 400
    expected = {r["EID"] for r in second.collect()}
    assert {r["EID"] for r in out.collect()} == expected
    drop_table(spark, dest)


def test_jdbc_writer_roundtrip(spark, sf_dir):
    """The writer twin: export a DataFrame to Derby, read it back
    byte-identical through the configured reader."""
    nat = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("NKEY"), F.col("n_name").alias("NNAME"))
    cfg = jdbc.JdbcSourceConfig(url=URL, driver=DRIVER, table="NATION_RT")
    jdbc.writer(nat, cfg, mode="overwrite", batch_size=500).save()
    back = jdbc.reader(spark, cfg).load()
    assert {(r["NKEY"], r["NNAME"]) for r in back.collect()} == \
           {(r["NKEY"], r["NNAME"]) for r in nat.collect()}


def test_incremental_merge_over_jdbc(spark, sf_dir):
    """The reference's upsert flow with a LIVE JDBC source
    (spark_loaders.py:177-265): batch 1 seeds, batch 2 carries one
    modified row (same key, newer last_modified) and one new row; the
    consolidated destination holds exactly latest-per-key."""
    from hive_exporter_spark.catalog import TableName, drop_table, table_exists
    from hive_exporter_spark.operators import ingest

    rows1 = [(1, 100, "v1"), (2, 100, "v1"), (3, 100, "v1")]
    rows2 = [(2, 200, "v2"), (4, 200, "v1")]  # id 2 modified, id 4 new
    schema = "ID INT, LAST_MOD INT, PAYLOAD STRING"
    cfg = jdbc.JdbcSourceConfig(url=URL, driver=DRIVER, table="MERGE_SRC")

    dest = TableName("jdbc_merge_db", "merged_dst")
    for t in (dest, ingest.incremental_table(dest)):
        if table_exists(spark, t):
            drop_table(spark, t)

    jdbc.writer(spark.createDataFrame(rows1, schema), cfg,
                mode="overwrite").save()
    r1 = ingest.incremental_merge(
        spark, jdbc.reader(spark, cfg).load(), dest,
        key_columns=["ID"], last_modified_column="LAST_MOD",
        incremental_column="ID", batch_tag="m1",
    )
    assert r1.ingested_count == 3 and r1.destination_count == 3

    # Source now holds batch 2's rows (union view of the live table).
    jdbc.writer(spark.createDataFrame(rows2, schema), cfg,
                mode="overwrite").save()
    r2 = ingest.incremental_merge(
        spark, jdbc.reader(spark, cfg).load(), dest,
        key_columns=["ID"], last_modified_column="LAST_MOD",
        incremental_column="ID", batch_tag="m2",
    )
    assert r2.ingested_count == 2
    got = {r["ID"]: (r["LAST_MOD"], r["PAYLOAD"])
           for r in spark.table(str(dest)).collect()}
    assert got == {1: (100, "v1"), 2: (200, "v2"),
                   3: (100, "v1"), 4: (200, "v1")}
    for t in (dest, ingest.incremental_table(dest)):
        drop_table(spark, t)


def test_streaming_jdbc_sink(spark, sf_dir):
    """Stream → Derby composition: the events file stream drains into a
    JDBC table via foreachBatch + the batch writer; the table ends up
    holding every event exactly once, epoch-stamped."""
    from hive_exporter_spark.streaming import jdbc_sink_stream, read_events_stream

    cfg = jdbc.JdbcSourceConfig(url=URL, driver=DRIVER, table="EVENTS_STREAMED")
    # Pre-create empty so the appends have a table (fresh every run).
    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("EID"), F.col("event_type").alias("ETYPE"))
    jdbc.writer(ev.limit(0).withColumn("epoch_id", F.lit(0).cast("long")),
                cfg, mode="overwrite").save()

    stream = read_events_stream(spark, sf_dir).select(
        F.col("event_id").alias("EID"), F.col("event_type").alias("ETYPE"))
    q = jdbc_sink_stream(stream, cfg)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = jdbc.reader(spark, cfg).load()
    assert back.count() == ev.count()
    assert back.select("EID").distinct().count() == ev.count()
    assert back.where(F.col("epoch_id").isNull()).count() == 0


def test_reference_merge_narrative_end_to_end(spark, tmp_path):
    """Replay the reference's COMPLETE three-step incremental-merge
    story (/root/reference/tests/test_incremental_merge.py:94-130)
    against a live Derby source and a managed destination, asserting
    counts AND winning values at each step, then close the loop with
    the metadata-exporter flow (snapshot -> SQLite) over the
    destination's catalog entry.

    Step 1: 10 initial rows          -> destination holds 10.
    Step 2: INSERT id=11, NULL last_modified -> 11 rows; the NULL
            version is visible (never consolidated away by accident).
    Step 3: UPDATE id=3 (value 'K', newer last_modified) -> still 11
            rows; id 3's winning value is the update, everything else
            untouched. Exercises S4 (live JDBC scan), the CDC log
            append, latest-per-key consolidation with NULLS-LAST, K6
            safe_overwrite (the consolidation reads what it
            overwrites), and K7 (metastore snapshot sink) in ONE
            narrative.
    """
    from hive_exporter_spark.catalog import (
        TableName, drop_table, snapshot_metadata, snapshot_to_sqlite,
        table_exists,
    )
    from hive_exporter_spark.operators import ingest

    schema = "ID INT, VAL STRING, LAST_MOD TIMESTAMP"
    t0, t1 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
    initial = [(i, chr(ord("A") + i), t0) for i in range(10)]
    inserted = (11, "L", None)
    updated = (3, "K", t1)

    cfg = jdbc.JdbcSourceConfig(url=URL, driver=DRIVER, table="NARRATIVE_SRC")
    dest = TableName("narrative_db", "data")
    for t in (dest, ingest.incremental_table(dest)):
        if table_exists(spark, t):
            drop_table(spark, t)

    def seed(rows):
        df = spark.createDataFrame(
            [(i, v, m) for i, v, m in rows], "ID int, VAL string, LAST_MOD string"
        ).select("ID", "VAL", F.col("LAST_MOD").cast("timestamp"))
        jdbc.writer(df, cfg, mode="overwrite").save()

    def merge(tag):
        return ingest.incremental_merge(
            spark, jdbc.reader(spark, cfg).load(), dest,
            key_columns=["ID"], last_modified_column="LAST_MOD",
            incremental_column="ID", batch_tag=tag,
        )

    # Step 1: initial load.
    seed(initial)
    r1 = merge("m1")
    assert (r1.source_count, r1.ingested_count, r1.destination_count) == (10, 10, 10)

    # Step 2: one new row with NULL last_modified (the reference's
    # explicit NULL-datetime insert).
    seed(initial + [inserted])
    r2 = merge("m2")
    assert (r2.source_count, r2.ingested_count, r2.destination_count) == (11, 1, 11)
    row11 = spark.table(str(dest)).where("ID = 11").collect()
    assert len(row11) == 1 and row11[0]["VAL"] == "L" \
        and row11[0]["LAST_MOD"] is None

    # Step 3: modify id=3 in place (newer last_modified).
    seed([r for r in initial if r[0] != 3] + [inserted, updated])
    r3 = merge("m3")
    assert (r3.source_count, r3.ingested_count, r3.destination_count) == (11, 1, 11)
    out = {r["ID"]: r for r in spark.table(str(dest)).collect()}
    assert set(out) == set(range(10)) | {11}
    assert out[3]["VAL"] == "K" and out[3]["dl_ingest_date"] == "m3"
    # Untouched rows keep their step-1 values and tag.
    assert all(out[i]["VAL"] == chr(ord("A") + i) and
               out[i]["dl_ingest_date"] == "m1"
               for i in range(10) if i != 3)
    # The CDC log holds every version: 10 + 1 + 1.
    assert spark.table(str(ingest.incremental_table(dest))).count() == 12

    # Metadata-exporter epilogue: snapshot the destination's catalog
    # entry into the reference-shaped SQLite sink.
    import sqlite3
    path = str(tmp_path / "meta.db")
    snap = snapshot_metadata(spark, ["narrative_db"], extract_ts=1700000000)
    n = snapshot_to_sqlite(snap, path)
    assert n >= 1
    con = sqlite3.connect(path)
    names = {r[0] for r in con.execute(
        "SELECT tbl_name FROM exported_tables WHERE db_name='narrative_db'")}
    con.close()
    assert "data" in names

    for t in (dest, ingest.incremental_table(dest)):
        drop_table(spark, t)
