"""Live JDBC execution against embedded Derby (S4–S8 executed, not
option-asserted).

The reference's core use case is JDBC ingestion
(`/root/reference/spark_loaders.py:58-109`, exercised by
`tests/test_incremental_append.py:36-51` against a live MySQL). No
network RDBMS exists in this environment, but Spark ships Derby
(derby-10.16.x on the JVM classpath for the Hive metastore), and
`jdbc:derby:memory:` runs a full SQL engine inside the same JVM the
local-mode executors live in — so every code path below performs real
JDBC round trips: CREATE TABLE + INSERT via the Spark JDBC writer,
schema discovery + fetch via the reader, MIN/MAX bounds discovery
pushed to the source DB, and a Sqoop-style range-partitioned parallel
scan.

Scale note: in production the same configs point at MySQL/Postgres/
Oracle URLs; nothing below is Derby-specific except the URL and the
uppercase identifier folding that `discover_bounds` already handles
positionally (sources/jdbc.py:143-145).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_exporter_spark.operators import core
from hive_exporter_spark.sources import jdbc

DERBY_URL = "jdbc:derby:memory:hive_exporter_test;create=true"


def _cfg(**kw) -> jdbc.JdbcSourceConfig:
    return jdbc.JdbcSourceConfig(url=DERBY_URL, **kw)


@pytest.fixture(scope="module")
def seeded(spark):
    """Create + populate EVENTS_SRC in the in-memory Derby via a real
    JDBC write (Spark issues CREATE TABLE from the DataFrame schema,
    then batched INSERTs over the Derby embedded driver).

    Column names are UPPERCASE on purpose: the Spark JDBC writer quotes
    identifiers, and Derby folds unquoted SQL references to uppercase —
    uppercase at create time keeps plain `SELECT id ...` strings (the
    reference's style) resolvable against the quoted columns."""
    rows = [(i, i % 7, float(i) / 4) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "ID long, USER_ID long, VALUE double")
    jdbc.writer(df, _cfg(table="events_src"), mode="overwrite").save()
    return "events_src"


def test_jdbc_table_scan_round_trip(spark, seeded):
    """S4: full-table JDBC scan returns exactly what was written."""
    got = jdbc.reader(spark, _cfg(table=seeded)).load()
    assert got.count() == 100
    # Derby uppercases unquoted identifiers; Spark preserves them as-is.
    by_lower = {c.lower() for c in got.columns}
    assert by_lower == {"id", "user_id", "value"}
    total = got.agg(F.sum(F.col(got.columns[0]))).first()[0]
    assert total == sum(range(1, 101))


def test_jdbc_query_scan_pushes_filter_to_db(spark, seeded):
    """S5: query mode — the WHERE executes on the source DB, only the
    delta crosses the wire (the incremental-append fetch shape,
    reference spark_loaders.py:151-156)."""
    q = f"SELECT id, user_id, value FROM {seeded} WHERE id > 90"
    got = jdbc.reader(spark, _cfg(query=q)).load()
    assert got.count() == 10
    assert got.agg(F.min("ID")).first()[0] == 91


def test_jdbc_bounds_discovery_on_source(spark, seeded):
    """S7: MIN/MAX bounds query executes on Derby itself."""
    cfg = _cfg(table=seeded, partition_column="id", num_partitions=4)
    with_bounds = jdbc.discover_bounds(spark, cfg)
    assert with_bounds.lower_bound == 1
    assert with_bounds.upper_bound == 100


def test_jdbc_range_partitioned_parallel_scan(spark, seeded):
    """S6: Sqoop-style partitioned read — numPartitions JDBC stride
    queries, union of strides == full table, no dupes/gaps."""
    cfg = jdbc.discover_bounds(
        spark, _cfg(table=seeded, partition_column="id", num_partitions=4))
    got = jdbc.reader(spark, cfg).load()
    assert got.rdd.getNumPartitions() == 4
    ids = sorted(r[0] for r in got.select("ID").collect())
    assert ids == list(range(1, 101))


def test_jdbc_count_pushdown(spark, seeded):
    """S8: reconciliation count as a source-side aggregate — one row
    over the wire, not the table (jdbc_loader_spark2.py:33-34)."""
    q = f"SELECT COUNT(*) AS n FROM {seeded}"
    n = jdbc.reader(spark, _cfg(query=q)).load().first()[0]
    assert n == 100


def test_jdbc_incremental_append_end_to_end(spark, seeded, tmp_path):
    """The reference's flagship flow over a REAL JDBC source: first
    batch full-loads, watermark comes from the destination, second
    batch appends only rows past the high-water mark, with the filter
    shipped to the DB as a query-mode WHERE."""
    dest = str(tmp_path / "events_dest")

    first = jdbc.reader(spark, _cfg(
        query=f"SELECT id, user_id, value FROM {seeded} WHERE id <= 60"
    )).load()
    core.tag_batch(first, "batch_1").write.mode("overwrite").parquet(dest)
    assert spark.read.parquet(dest).count() == 60

    hwm = core.high_water_mark(spark.read.parquet(dest), "ID")
    assert hwm == 60
    delta = jdbc.reader(spark, _cfg(
        query=f"SELECT id, user_id, value FROM {seeded} WHERE id > {hwm}"
    )).load()
    core.tag_batch(delta, "batch_2").write.mode("append").parquet(dest)

    final = spark.read.parquet(dest)
    assert final.count() == 100
    assert final.where(F.col(core.INGEST_TAG_COLUMN) == "batch_2").count() == 40
    ids = sorted(r[0] for r in final.select("ID").collect())
    assert ids == list(range(1, 101))


def test_jdbc_writer_appends_back(spark, seeded):
    """Return path: append rows to the Derby table over JDBC and read
    them back (the export-to-RDBMS last hop)."""
    extra = spark.createDataFrame(
        [(1000 + i, 0, 0.0) for i in range(5)],
        "ID long, USER_ID long, VALUE double")
    jdbc.writer(extra, _cfg(table="events_rw"), mode="overwrite").save()
    jdbc.writer(extra.withColumn("ID", F.col("ID") + 10),
                _cfg(table="events_rw")).save()  # default mode=append
    got = jdbc.reader(spark, _cfg(table="events_rw")).load()
    assert got.count() == 10
