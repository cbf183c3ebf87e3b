"""Catalog, export/import round-trip, safe_overwrite, metadata
snapshot, and JDBC option-builder tests."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from hive_exporter_spark.catalog import (
    TableName, database_exists, snapshot_metadata, table_exists,
)
from hive_exporter_spark.sinks import export_tables, import_tables, safe_overwrite
from hive_exporter_spark.sources.jdbc import JdbcSourceConfig


@pytest.fixture()
def db(spark):
    name = f"testdb_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {name}")
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def test_tablename_validation():
    assert str(TableName.parse("db1.tbl_2")) == "db1.tbl_2"
    for bad in ("justtable", "a.b.c", "db.tbl; drop", "db.", ".tbl", "d b.t"):
        with pytest.raises(ValueError):
            TableName.parse(bad)


def test_case_insensitive_existence(spark, db):
    spark.range(3).write.saveAsTable(f"{db}.MyTable")
    assert table_exists(spark, TableName(db, "mytable"))
    assert table_exists(spark, TableName(db.upper(), "MYTABLE"))
    assert not table_exists(spark, TableName(db, "nope"))
    assert database_exists(spark, db.upper())


def test_export_import_roundtrip(spark, db, tmp_path):
    src = TableName(db, "roundtrip")
    spark.range(100).withColumn("v", F.col("id") * 2).write.saveAsTable(str(src))
    out = export_tables(spark, [str(src)], str(tmp_path))
    assert list(out) == [str(src)]
    dest_db = f"{db}_imp"
    try:
        created = import_tables(spark, out.values(), dest_db)
        assert created == [f"{dest_db}.roundtrip"]
        a = spark.table(str(src)).orderBy("id").collect()
        b = spark.table(created[0]).orderBy("id").collect()
        assert a == b
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {dest_db} CASCADE")


def test_safe_overwrite_self_read(spark, db):
    """The hazard case: overwrite a table from a plan that reads it."""
    dest = TableName(db, "selfref")
    spark.range(10).write.saveAsTable(str(dest))
    plan = spark.table(str(dest)).where(F.col("id") < 5)
    safe_overwrite(spark, plan, dest)
    assert spark.table(str(dest)).count() == 5
    # scratch table cleaned up
    assert not table_exists(spark, TableName("spark_scratch", "temp_selfref_persist"))


def test_snapshot_metadata(spark, db):
    spark.range(5).write.saveAsTable(f"{db}.snap_me")
    snap = snapshot_metadata(spark, [db], extract_ts=1700000000)
    rows = snap.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["db_name"], r["tbl_name"], r["extract_ts"]) == (db, "snap_me", 1700000000)
    assert "snap_me" in r["createstmt"]
    assert snap.columns == ["db_name", "tbl_name", "createstmt", "extract_ts"]


def test_snapshot_to_sqlite(spark, db, tmp_path):
    import sqlite3

    from hive_exporter_spark.catalog import snapshot_to_sqlite

    spark.range(5).write.saveAsTable(f"{db}.sq_tbl")
    snap = snapshot_metadata(spark, [db], extract_ts=1700000000)
    path = str(tmp_path / "meta.db")
    assert snapshot_to_sqlite(snap, path) == 1
    con = sqlite3.connect(path)
    rows = con.execute(
        "SELECT db_name, tbl_name, extract_ts FROM exported_tables"
    ).fetchall()
    con.close()
    assert rows == [(db, "sq_tbl", 1700000000)]


def test_jdbc_option_builder():
    cfg = JdbcSourceConfig(
        url="jdbc:mysql://host/db", driver="com.mysql.jdbc.Driver",
        user="u", password="p", table="t", fetch_size=1000,
        query_timeout=60, partition_column="id", num_partitions=4,
        lower_bound=0, upper_bound=99, push_down_aggregate=True,
    )
    opts = cfg.options()
    assert opts["dbtable"] == "t"
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == ("0", "99", "4")
    assert opts["pushDownAggregate"] == "true"
    assert cfg.bounds_query() == (
        "SELECT MIN(id) AS lower_bound, MAX(id) AS upper_bound FROM t"
    )


def test_jdbc_oracle_dialect():
    cfg = JdbcSourceConfig(url="jdbc:oracle:thin:@h:1521/s", table="t")
    opts = cfg.options()
    assert opts["oracle.jdbc.mapDateToTimestamp"] == "false"
    assert "NLS_TIMESTAMP_FORMAT" in opts["sessionInitStatement"]


def test_jdbc_validation():
    with pytest.raises(ValueError):
        JdbcSourceConfig(url="jdbc:mysql://h/d")  # neither table nor query
    with pytest.raises(ValueError):
        JdbcSourceConfig(url="jdbc:mysql://h/d", table="t", query="select 1")
    with pytest.raises(ValueError):
        JdbcSourceConfig(url="jdbc:mysql://h/d", query="select 1",
                         partition_column="id")


def test_compact_table(spark, db):
    from pyspark.sql import functions as F

    from hive_exporter_spark.sinks import compact_table

    (spark.range(10_000).withColumn("v", F.col("id") * 2)
     .repartition(64).write.saveAsTable(f"{db}.frag"))
    tbl = TableName(db, "frag")
    before = (spark.table(f"{db}.frag")
              .select(F.input_file_name().alias("f")).distinct().count())
    assert before >= 32
    total_before = spark.table(f"{db}.frag").agg(F.sum("v")).first()[0]
    after = compact_table(spark, tbl, target_files=4)
    assert after <= 8, after
    assert spark.table(f"{db}.frag").count() == 10_000
    assert spark.table(f"{db}.frag").agg(F.sum("v")).first()[0] == total_before


def test_snapshot_to_sqlite_upsert(spark, db, tmp_path):
    """Upsert mode (reference hive_metadata_exporter.py:85-86): a
    re-export of a subset replaces matching (db, tbl) rows and leaves
    the rest untouched."""
    import sqlite3

    from hive_exporter_spark.catalog import snapshot_to_sqlite

    path = str(tmp_path / "meta_upsert.db")
    first = spark.createDataFrame(
        [("d1", "t1", "CREATE t1 v1", 100), ("d1", "t2", "CREATE t2 v1", 100)],
        "db_name string, tbl_name string, createstmt string, extract_ts long",
    )
    assert snapshot_to_sqlite(first, path) == 2
    refresh = spark.createDataFrame(
        [("d1", "t2", "CREATE t2 v2", 200)],
        "db_name string, tbl_name string, createstmt string, extract_ts long",
    )
    assert snapshot_to_sqlite(refresh, path, mode="upsert") == 1
    con = sqlite3.connect(path)
    rows = sorted(con.execute(
        "SELECT tbl_name, createstmt, extract_ts FROM exported_tables"
    ).fetchall())
    con.close()
    assert rows == [("t1", "CREATE t1 v1", 100), ("t2", "CREATE t2 v2", 200)]


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_export_import_format_matrix(spark, db, tmp_path, fmt):
    """S3/K1/K2 beyond parquet: every built-in format must round-trip
    table contents (csv/json via an explicit import schema, since text
    files don't carry types)."""
    src = TableName(db, f"fmt_{fmt}")
    (spark.range(50)
     .withColumn("v", F.col("id") * 2.5)
     .withColumn("s", F.concat(F.lit("row-"), F.col("id")))
     .write.mode("overwrite").saveAsTable(str(src)))
    out = export_tables(spark, [str(src)], str(tmp_path / fmt), fmt=fmt)
    dest_db = f"{db}_imp_{fmt}"
    schema = None if fmt == "orc" else "id long, v double, s string"
    try:
        created = import_tables(spark, out.values(), dest_db, fmt=fmt,
                                schema=schema)
        a = [tuple(r) for r in spark.table(str(src)).orderBy("id").collect()]
        b = [tuple(r) for r in spark.table(created[0])
             .select("id", "v", "s").orderBy("id").collect()]
        assert a == b
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {dest_db} CASCADE")


def test_export_tables_parallel(spark, db, tmp_path):
    """Thread-pooled export: all tables land, contents intact, same
    return shape as the serial path."""
    names = []
    for i in range(3):
        spark.range(20 + i).write.saveAsTable(f"{db}.par_{i}")
        names.append(f"{db}.par_{i}")
    out = export_tables(spark, names, str(tmp_path), parallelism=3)
    assert sorted(out) == sorted(names)
    for i, name in enumerate(names):
        assert spark.read.parquet(out[name]).count() == 20 + i
