"""The three ingestion strategies of the reference, recomposed from
the core operators and sinks (reference spark_loaders.py:113-265):

- full_refresh          (full_ingestion, :113-137)
- incremental_append    (incremental_append_ingestion, :139-175)
- incremental_merge     (incremental_merge_ingestion, :177-265)

Each takes a *source DataFrame* (anything: JDBC relation, file scan,
test fixture) — the reference hard-wired JDBC; decoupling source from
strategy is the main structural change. Each returns an IngestReport
(the reconciliation triple the reference only logged,
jdbc_loader_spark2.py:33-47).

The batch tag (`dl_ingest_date`) is an injected constant per batch —
NOT per-row current_timestamp() — so one batch is one partition
(reference spark_loaders.py:121; SURVEY.md §7.4.6 determinism).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_exporter_spark.catalog import TableName, clone_schema, create_database, drop_table, table_exists
from hive_exporter_spark.operators import core
from hive_exporter_spark.sinks import insert_by_name, safe_overwrite, write_partitioned


@dataclass(frozen=True)
class IngestReport:
    """A2 reconciliation triple, structured."""

    source_count: int
    ingested_count: int
    destination_count: int

    @property
    def reconciled(self) -> bool:
        return self.source_count == self.destination_count


def incremental_table(dest: TableName) -> TableName:
    """`<tbl>_incremental` CDC log table (spark_loaders.py:188)."""
    return TableName(dest.db, f"{dest.table}_incremental")


def conform_to_schema(df: DataFrame, target, use_try_cast: bool = True) -> DataFrame:
    """Align a drifting source to a target schema before insert.

    Long-running incremental pipelines outlive their source schemas:
    columns get added, dropped, or retyped upstream, and the reference's
    by-name insert (`hive_importer_spark2.py` INSERT ... SELECT) simply
    breaks. This resolves the drift declaratively:

    - target column present in the source (case-insensitive, like
      Spark's own by-name resolution): kept, cast to the target type if
      it differs — `try_cast` by default so a bad value becomes NULL
      instead of failing the whole batch mid-write;
    - target column missing: typed NULL placeholder;
    - source column not in the target: dropped.

    Output column order is the target order, so positional writers work
    too. Map-only projection — no shuffle, no Python; Catalyst folds
    the casts into the scan projection.

    `target` is a StructType or a DataFrame (its schema is used).
    """
    schema = target.schema if isinstance(target, DataFrame) else target
    by_lower = {c.lower(): c for c in df.columns}
    cols = []
    for field in schema.fields:
        src = by_lower.get(field.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif df.schema[src].dataType == field.dataType:
            cols.append(F.col(src).alias(field.name))
        elif use_try_cast:
            cols.append(F.col(src).try_cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(src).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def full_refresh(
    spark: SparkSession,
    source: DataFrame,
    dest: TableName,
    batch_tag: str,
    fmt: str = "parquet",
    drop_first: bool = False,
    tag_column: str = core.INGEST_TAG_COLUMN,
    partition_cols: Sequence[str] | None = None,
) -> IngestReport:
    """Full refresh: tag, persist (the source — e.g. a JDBC relation —
    must be scanned exactly once; reference spark_loaders.py:123-126),
    schema-clone, insert-overwrite. `partition_cols` lays the
    destination out partitioned (reference -y/--output-partition-
    columns on full loads, spark_loaders.py:115,168)."""
    source_count = source.count()
    tagged = core.tag_batch(source, batch_tag, tag_column).persist()
    try:
        ingested_count = tagged.count()  # materializes the cache
        create_database(spark, dest.db)
        if drop_first:
            drop_table(spark, dest)
        if partition_cols:
            write_partitioned(tagged, dest, list(partition_cols), fmt,
                              overwrite=True)
        else:
            clone_schema(spark, tagged, dest, fmt)
            insert_by_name(tagged, dest, overwrite=True)
    finally:
        tagged.unpersist()
    return IngestReport(source_count, ingested_count, spark.table(str(dest)).count())


def incremental_append(
    spark: SparkSession,
    source: DataFrame,
    dest: TableName,
    incremental_column: str,
    batch_tag: str,
    partition_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
    tag_column: str = core.INGEST_TAG_COLUMN,
) -> IngestReport:
    """Incremental append for log-like sources: high-water mark from
    the destination itself (sink-derived state — restart-safe with no
    external checkpoint), strict `>` filter, tagged partitioned append
    (reference spark_loaders.py:139-175).

    Scale: the watermark is a single-row aggregate; the filter pushes
    into the source scan (JDBC WHERE / parquet row-group skip), so
    only the delta crosses the wire.
    """
    source_count = source.count()
    exists = table_exists(spark, dest)
    hwm = core.high_water_mark(spark.table(str(dest)), incremental_column) if exists else None
    delta = core.tag_batch(core.newer_than(source, incremental_column, hwm),
                           batch_tag, tag_column).persist()
    try:
        ingested_count = delta.count()
        create_database(spark, dest.db)
        write_partitioned(delta, dest, list(partition_cols or [tag_column]),
                          fmt, overwrite=not exists)
    finally:
        delta.unpersist()
    return IngestReport(source_count, ingested_count, spark.table(str(dest)).count())


def incremental_merge(
    spark: SparkSession,
    source: DataFrame,
    dest: TableName,
    key_columns: Sequence[str],
    last_modified_column: str,
    incremental_column: str,
    batch_tag: str,
    deleted_column: str | None = None,
    fmt: str = "parquet",
    tag_column: str = core.INGEST_TAG_COLUMN,
    scratch_db: str = "spark_scratch",
    partition_cols: Sequence[str] | None = None,
) -> IngestReport:
    """Incremental merge (upsert): filter new-or-modified rows, append
    to the `<tbl>_incremental` CDC log, then consolidate latest-per-key
    into the destination (reference spark_loaders.py:177-265).

    The consolidation re-reads the log table (lineage break,
    :225) and must two-phase through a scratch table because it reads
    what it overwrites (:246-262 → sinks.safe_overwrite). The window
    dedup orders by last_modified DESC with the batch tag and
    incremental column as deterministic tiebreakers (the reference had
    none — tie nondeterminism, SURVEY.md §7.4.4); NULL last_modified
    loses to any non-NULL version (desc => nulls last), as the
    reference's merge test requires.
    """
    source_count = source.count()
    inc_tbl = incremental_table(dest)
    exists = table_exists(spark, inc_tbl)
    last_mod = last_val = None
    if exists:
        log_df = spark.table(str(inc_tbl))
        last_mod = core.high_water_mark(log_df, last_modified_column)
        last_val = core.high_water_mark(log_df, incremental_column)
    delta = core.tag_batch(
        core.newer_or_modified(source, incremental_column, last_val,
                               last_modified_column, last_mod),
        batch_tag, tag_column,
    ).persist()
    try:
        ingested_count = delta.count()
        create_database(spark, dest.db)
        write_partitioned(delta, inc_tbl, [tag_column], fmt, overwrite=not exists)
    finally:
        delta.unpersist()

    # Consolidate from the full log: latest version per key, tombstones out.
    log_df = spark.table(str(inc_tbl))
    consolidated = core.latest_per_key(
        log_df, key_columns, last_modified_column,
        tiebreakers=[tag_column, incremental_column],
    )
    if deleted_column is not None:
        consolidated = core.not_soft_deleted(consolidated, deleted_column)
    safe_overwrite(spark, consolidated, dest, fmt, scratch_db=scratch_db,
                   scratch_suffix=batch_tag, partition_cols=partition_cols)
    return IngestReport(source_count, ingested_count, spark.table(str(dest)).count())
