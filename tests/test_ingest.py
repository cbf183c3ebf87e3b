"""Replay of the reference's end-to-end integration narratives
(tests/test_incremental_append.py and test_incremental_merge.py in the
reference) against the local catalog with parquet-backed sources —
no MySQL/Hive cluster, same assertions plus value checks the
reference lacked (SURVEY.md §5)."""

from __future__ import annotations

import uuid
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hive_exporter_spark.catalog import TableName, table_exists
from hive_exporter_spark.operators.ingest import (
    IngestReport, full_refresh, incremental_append, incremental_merge,
    incremental_table,
)

APPEND_SCHEMA = "id int, value string, created timestamp, date string"
MERGE_SCHEMA = ("id int, value string, last_modified timestamp, "
                "created timestamp, date string, deleted int")


@pytest.fixture()
def db(spark):
    name = f"testdb_{uuid.uuid4().hex[:8]}"
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def _append_rows(spark, ids, day="2024-01-01"):
    t = datetime(2024, 1, 1)
    return spark.createDataFrame([(i, f"v{i}", t, day) for i in ids], APPEND_SCHEMA)


def test_full_refresh_reconciles(spark, db):
    dest = TableName(db, "full_tbl")
    rep = full_refresh(spark, _append_rows(spark, range(10)), dest, "b1")
    assert rep == IngestReport(10, 10, 10)
    assert rep.reconciled
    # second refresh replaces, not appends
    rep2 = full_refresh(spark, _append_rows(spark, range(7)), dest, "b2")
    assert rep2.destination_count == 7
    tags = spark.table(str(dest)).select("dl_ingest_date").distinct().collect()
    assert [r[0] for r in tags] == ["b2"]


def test_full_and_merge_output_partition_columns(spark, db):
    """Reference -y/--output-partition-columns: full loads and merge
    consolidation lay the destination out partitioned by the given
    columns (spark_loaders.py:115,168,252-253); values and counts are
    unchanged, and the catalog reports the partitioning."""
    dest = TableName(db, "full_part")
    rep = full_refresh(spark, _append_rows(spark, range(10)), dest, "b1",
                       partition_cols=["date"])
    assert rep.reconciled and rep.destination_count == 10
    ddl = spark.sql(f"DESCRIBE TABLE {dest}").collect()
    assert any("Partition" in (r["col_name"] or "") for r in ddl), ddl

    mdest = TableName(db, "merge_part")
    t = datetime(2024, 1, 1)
    src = spark.createDataFrame(
        [(i, f"v{i}", t, t, "2024-01-01", 0) for i in range(5)],
        MERGE_SCHEMA)
    rep2 = incremental_merge(
        spark, src, mdest, ["id"], "last_modified", "id", "m1",
        partition_cols=["date"])
    assert rep2.destination_count == 5
    ddl2 = spark.sql(f"DESCRIBE TABLE {mdest}").collect()
    assert any("Partition" in (r["col_name"] or "") for r in ddl2), ddl2
    got = {r["id"]: r["value"] for r in spark.table(str(mdest)).collect()}
    assert got == {i: f"v{i}" for i in range(5)}


def test_incremental_append_narrative(spark, db):
    """Reference narrative: ids 0-9 -> count 10; ids 10-19 -> count 20
    (tests/test_incremental_append.py:82-102); re-run with no new rows
    is a no-op; watermark ties are skipped (strict >)."""
    dest = TableName(db, "append_tbl")
    rep1 = incremental_append(spark, _append_rows(spark, range(10)), dest, "id", "b1")
    assert (rep1.ingested_count, rep1.destination_count) == (10, 10)
    rep2 = incremental_append(spark, _append_rows(spark, range(20)), dest, "id", "b2")
    assert (rep2.ingested_count, rep2.destination_count) == (10, 20)
    # no-op run: nothing above the watermark
    rep3 = incremental_append(spark, _append_rows(spark, range(20)), dest, "id", "b3")
    assert (rep3.ingested_count, rep3.destination_count) == (0, 20)
    # batch tags partition the table
    tags = {r[0] for r in spark.table(str(dest)).select("dl_ingest_date").distinct().collect()}
    assert tags == {"b1", "b2"}


def _merge_rows(spark, rows):
    return spark.createDataFrame(rows, MERGE_SCHEMA)


def test_incremental_merge_narrative(spark, db):
    """Reference narrative (tests/test_incremental_merge.py:94-130):
    10 rows -> 10; new row w/ NULL last_modified -> 11; update id=3 ->
    still 11 AND value 'K' wins (the reference only checked counts)."""
    dest = TableName(db, "merge_tbl")
    t0 = datetime(2024, 1, 1)
    base = [(i, chr(65 + i), t0, t0, "2024-01-01", None) for i in range(10)]
    rep1 = incremental_merge(spark, _merge_rows(spark, base), dest,
                             ["id"], "last_modified", "id", "b1",
                             deleted_column="deleted")
    assert rep1.destination_count == 10
    assert table_exists(spark, incremental_table(dest))

    # new row with NULL last_modified must still be ingested (id watermark)
    new_row = [(11, "X", None, t0, "2024-01-02", None)]
    rep2 = incremental_merge(spark, _merge_rows(spark, base + new_row), dest,
                             ["id"], "last_modified", "id", "b2",
                             deleted_column="deleted")
    assert rep2.ingested_count == 1
    assert rep2.destination_count == 11

    # update id=3: last_modified advances past max -> picked up, wins dedup
    t1 = datetime(2024, 2, 1)
    upd = [(3, "K", t1, t1, "2024-02-01", None)]
    rep3 = incremental_merge(spark, _merge_rows(spark, base + new_row + upd), dest,
                             ["id"], "last_modified", "id", "b3",
                             deleted_column="deleted")
    assert rep3.ingested_count == 1
    assert rep3.destination_count == 11
    assert spark.table(str(dest)).where(F.col("id") == 3).first()["value"] == "K"


def test_incremental_merge_soft_delete(spark, db):
    dest = TableName(db, "softdel_tbl")
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    base = [(1, "a", t0, t0, "d", None), (2, "b", t0, t0, "d", None)]
    incremental_merge(spark, _merge_rows(spark, base), dest,
                      ["id"], "last_modified", "id", "b1", deleted_column="deleted")
    tomb = base + [(2, "b", t1, t1, "d", 1)]
    rep = incremental_merge(spark, _merge_rows(spark, tomb), dest,
                            ["id"], "last_modified", "id", "b2",
                            deleted_column="deleted")
    assert rep.destination_count == 1
    assert [r["id"] for r in spark.table(str(dest)).collect()] == [1]


def test_conform_to_schema_handles_drift(spark):
    from hive_exporter_spark.operators.ingest import conform_to_schema

    target = spark.createDataFrame([], "id bigint, value string, score double")
    # drifted source: ID case-flipped + int, score is a stringy number,
    # value missing entirely, extra col present
    src = spark.createDataFrame(
        [(1, "0.5", "junk"), (2, "oops", "junk")],
        "ID int, score string, extra string",
    )
    out = conform_to_schema(src, target)
    assert out.columns == ["id", "value", "score"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "string", "double"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["score"] == 0.5
    assert rows[2]["score"] is None        # try_cast: bad value -> NULL
    assert rows[1]["value"] is None        # missing column -> typed NULL

    import pytest as _pytest
    with _pytest.raises(Exception):
        # strict mode propagates the cast failure
        conform_to_schema(src, target, use_try_cast=False).collect()


def test_read_tolerant_quarantines_bad_rows(spark, tmp_path):
    from hive_exporter_spark.sources.files import read_tolerant

    p = tmp_path / "data.json"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": "b"}\n'
        '{"id": "x", "v": "c"}\n'
    )
    good, bad = read_tolerant(spark, str(p), "id bigint, v string")
    assert sorted((r["id"], r["v"]) for r in good.collect()) == [(1, "a"), (2, "b")]
    quarantined = bad.collect()
    assert len(quarantined) == 2
    raws = {r["raw_record"] for r in quarantined}
    assert "THIS IS NOT JSON" in raws
    # partially-parsed fields survive alongside the raw record
    partial = next(r for r in quarantined if r["raw_record"] != "THIS IS NOT JSON")
    assert partial["v"] == "c" and partial["id"] is None
