"""Catalog layer: table-name parsing/validation, existence probes,
DDL helpers, and metadata snapshots.

Rebuilds (Spark-natively) what the reference did with regex+split and
a jaydebeapi side-channel:
- `db.tbl` validation: reference regex `^.*\\..*$` at
  hive_exporter_spark2.py:37-40 and `split('.')` at
  jdbc_loader_spark2.py:31 — here a value object with strict
  identifier rules (kills the reference's SQL-injection surface,
  SURVEY.md §7.4.9).
- case-insensitive existence checks: spark_loaders.py:148-151,187-192
  (Hive lowercases identifiers).
- metadata snapshot: hive_metadata_exporter.py:32-73 dumped
  SHOW CREATE TABLE over HiveServer2 JDBC into SQLite; here it is a
  plain DataFrame from spark.catalog + SHOW CREATE TABLE, writable to
  any sink.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


@dataclass(frozen=True)
class TableName:
    """Validated two-level `db.tbl` name (reference enforces the
    two-level shape; hive_exporter_spark2.py:37-40)."""

    db: str
    table: str

    @classmethod
    def parse(cls, qualified: str) -> "TableName":
        parts = qualified.split(".")
        if len(parts) != 2:
            raise ValueError(f"expected db.tbl, got {qualified!r}")
        db, table = parts
        for p in (db, table):
            if not _IDENT.match(p):
                raise ValueError(f"invalid identifier {p!r} in {qualified!r}")
        return cls(db, table)

    def __str__(self) -> str:
        return f"{self.db}.{self.table}"


def database_exists(spark: SparkSession, db: str) -> bool:
    """Case-insensitive database probe (spark_loaders.py:148)."""
    return db.lower() in [d.name.lower() for d in spark.catalog.listDatabases()]


def table_exists(spark: SparkSession, name: TableName) -> bool:
    """Case-insensitive table probe (spark_loaders.py:149-151)."""
    if not database_exists(spark, name.db):
        return False
    return name.table.lower() in [
        t.name.lower() for t in spark.catalog.listTables(name.db)
    ]


def create_database(spark: SparkSession, db: str) -> None:
    """O3: CREATE DATABASE IF NOT EXISTS (spark_loaders.py:130)."""
    if not _IDENT.match(db):
        raise ValueError(f"invalid database name {db!r}")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")


def drop_table(spark: SparkSession, name: TableName, if_exists: bool = True) -> None:
    """O4: DROP TABLE [IF EXISTS] (spark_loaders.py:132,262)."""
    clause = "IF EXISTS " if if_exists else ""
    spark.sql(f"DROP TABLE {clause}{name}")


def clone_schema(spark: SparkSession, source_df: DataFrame, dest: TableName,
                 fmt: str = "parquet") -> None:
    """K3: schema-only clone — the reference's `CTAS ... limit 0` trick
    (spark_loaders.py:133). LIMIT 0 folds to an empty scan, so this is
    free DDL regardless of source size."""
    if not table_exists(spark, dest):
        source_df.limit(0).write.format(fmt).saveAsTable(str(dest))


def snapshot_metadata(spark: SparkSession, databases: list[str] | None = None,
                      extract_ts: int = 0) -> DataFrame:
    """Metadata snapshot: one row per table with its SHOW CREATE TABLE
    DDL — the rebuilt hive_metadata_exporter (schema matches its SQLite
    table `exported_tables(db_name, tbl_name, createstmt, extract_ts)`,
    hive_metadata_exporter.py:48-55). Driver-side loop over the
    *catalog* (table count, not data size) is fine at any scale; the
    result is a DataFrame writable to parquet/JDBC/anything.

    `extract_ts` is injected (epoch seconds) — deterministic, per the
    engine-wide injectable-clock rule (SURVEY.md §7.4.6).
    """
    dbs = databases or [d.name for d in spark.catalog.listDatabases()]
    rows = []
    for db in dbs:
        for t in spark.catalog.listTables(db):
            if t.tableType == "TEMPORARY" or t.isTemporary:
                continue
            try:
                stmt = spark.sql(f"SHOW CREATE TABLE {db}.{t.name}").first()[0]
            except Exception as exc:  # view/unsupported provider
                stmt = f"-- unavailable: {exc.__class__.__name__}"
            rows.append((db, t.name, stmt, extract_ts))
    return spark.createDataFrame(
        rows, "db_name string, tbl_name string, createstmt string, extract_ts long"
    )


def snapshot_to_sqlite(snapshot: DataFrame, sqlite_path: str,
                       table: str = "exported_tables",
                       mode: str = "overwrite") -> int:
    """K7 parity: persist a metadata snapshot into a SQLite file with
    the reference's exact table shape (hive_metadata_exporter.py:46-57).
    Metadata is catalog-sized, so a driver-side write through stdlib
    sqlite3 is appropriate — data tables never take this path.

    Modes mirror the reference's two behaviors:
    - ``overwrite``: full delete + insert (fresh snapshot each run).
    - ``upsert``: INSERT OR REPLACE keyed on (db_name, tbl_name) — the
      reference's per-table update path (hive_metadata_exporter.py:85-86)
      that refreshes a subset without discarding rows for tables not in
      this snapshot.
    """
    import sqlite3

    if mode not in ("overwrite", "upsert"):
        raise ValueError(f"mode must be overwrite|upsert, got {mode!r}")
    rows = [(r["db_name"], r["tbl_name"], r["createstmt"], r["extract_ts"])
            for r in snapshot.collect()]
    con = sqlite3.connect(sqlite_path)
    try:
        con.execute(
            f"CREATE TABLE IF NOT EXISTS {table} ("
            "db_name TEXT, tbl_name TEXT, createstmt TEXT, extract_ts INTEGER, "
            "PRIMARY KEY (db_name, tbl_name))"
        )
        if mode == "overwrite":
            con.execute(f"DELETE FROM {table}")
            con.executemany(f"INSERT INTO {table} VALUES (?, ?, ?, ?)", rows)
        else:
            con.executemany(
                f"INSERT OR REPLACE INTO {table} VALUES (?, ?, ?, ?)", rows
            )
        con.commit()
    finally:
        con.close()
    return len(rows)
