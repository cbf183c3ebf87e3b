"""Sinks: file export/import and table writes, including the
scratch-table two-phase overwrite the reference needs to avoid
Spark's self-overwrite error (SURVEY.md §2.2).
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_exporter_spark.catalog import (
    TableName, clone_schema, create_database, drop_table, table_exists,
)


# Sensible per-format defaults so csv/json survive a round-trip
# (header for column names; csv needs explicit schema on read anyway).
FORMAT_WRITE_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
}
FORMAT_READ_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "inferSchema": "true"},
}


def export_tables(spark: SparkSession, tables: Iterable[str], out_dir: str,
                  fmt: str = "parquet",
                  options: dict[str, str] | None = None,
                  parallelism: int = 1) -> dict[str, str]:
    """K1: export catalog tables to one directory per table, named
    `db.tbl` (reference hive_exporter_spark2.py:43-51). Unlike the
    reference, any Hadoop-FS URI works, not just `file://` — exports
    run executor-side, so this behaves in cluster deploy mode too.
    Any self-describing or text format Spark writes (parquet/orc/
    json/csv) is accepted; per-format defaults keep csv round-trippable.

    `parallelism > 1` submits table writes from a driver thread pool:
    Spark schedules concurrent jobs, so many SMALL tables (the typical
    metadata-export workload — the reference looped serially, leaving
    the cluster idle between jobs) keep every executor busy. One big
    table already parallelizes via its own partitions; use this knob
    for table COUNT, not table size. Names are validated up front so a
    bad entry fails before any write starts.
    """
    opts = {**FORMAT_WRITE_OPTIONS.get(fmt, {}), **(options or {})}
    parsed = [(q, TableName.parse(q)) for q in tables]

    def _write(qualified: str, name: TableName) -> tuple[str, str]:
        path = os.path.join(out_dir, str(name))
        (spark.table(str(name)).write.format(fmt).options(**opts)
         .mode("overwrite").save(path))
        return qualified, path

    if parallelism <= 1:
        return dict(_write(q, n) for q, n in parsed)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=parallelism) as pool:
        return dict(pool.map(lambda qn: _write(*qn), parsed))


def import_tables(spark: SparkSession, paths: Iterable[str], db: str,
                  fmt: str = "parquet", table_fmt: str = "parquet",
                  options: dict[str, str] | None = None,
                  schema: str | None = None,
                  overwrite: bool = True) -> list[str]:
    """K2: import exported dataset dirs as managed tables; the table
    name is the dir basename's `db.tbl` with the target db override
    (reference hive_importer_spark2.py:27-35). `schema` pins text
    formats (csv/json) whose files don't self-describe types.
    `overwrite=False` reproduces the reference CLI's default: an
    existing table is an error unless -o/--overwrite dropped it
    (hive_importer_spark2.py:22,33-35)."""
    create_database(spark, db)
    opts = {**FORMAT_READ_OPTIONS.get(fmt, {}), **(options or {})}
    created = []
    for path in paths:
        base = os.path.basename(path.rstrip("/"))
        table = base.split(".", 1)[1] if "." in base else base
        dest = TableName(db, table)
        reader = spark.read.format(fmt).options(**opts)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.load(path)
        mode = "overwrite" if overwrite else "errorifexists"
        df.write.format(table_fmt).mode(mode).saveAsTable(str(dest))
        created.append(str(dest))
    return created


def insert_by_name(df: DataFrame, dest: TableName, overwrite: bool = True) -> None:
    """`insertInto` with columns aligned BY NAME first. Spark's
    insertInto is positional (reference spark_loaders.py:134,261 —
    a silent-corruption trap, SURVEY.md §7.4.2); aligning the
    projection to the destination schema first makes it safe."""
    spark = df.sparkSession
    dest_cols = [f.name for f in spark.table(str(dest)).schema.fields]
    df.select(*dest_cols).write.insertInto(str(dest), overwrite=overwrite)


def safe_overwrite(spark: SparkSession, df: DataFrame, dest: TableName,
                   fmt: str = "parquet", scratch_db: str = "spark_scratch",
                   scratch_suffix: str = "persist",
                   partition_cols: Sequence[str] | None = None) -> None:
    """K6: two-phase overwrite for plans that READ the destination
    table (Spark forbids overwriting a path being read — the
    reference's scratch-table dance at spark_loaders.py:246-262).

    Phase 1 materializes the plan into a scratch table (breaking
    lineage to the destination); phase 2 clones the schema if needed
    and insert-overwrites the destination from the scratch table; the
    scratch is dropped. `scratch_suffix` is injectable — the reference
    used a random 6-letter name (spark_loaders.py:246), which breaks
    resumability (SURVEY.md §7.4.6). With `partition_cols` phase 2
    replaces the destination as a PARTITIONED table (reference
    -y/--output-partition-columns on the merge writer,
    spark_loaders.py:252-253) — partition-pruned consolidated reads
    for the price of the same single rewrite.
    """
    create_database(spark, scratch_db)
    scratch = TableName(scratch_db, f"temp_{dest.table}_{scratch_suffix}")
    df.write.format(fmt).mode("overwrite").saveAsTable(str(scratch))
    try:
        materialized = spark.table(str(scratch))
        create_database(spark, dest.db)
        if partition_cols:
            (materialized.write.format(fmt).mode("overwrite")
             .partitionBy(*partition_cols).saveAsTable(str(dest)))
        else:
            clone_schema(spark, materialized, dest, fmt)
            insert_by_name(materialized, dest, overwrite=True)
    finally:
        drop_table(spark, scratch)


def write_partitioned(df: DataFrame, dest: TableName, partition_cols: Sequence[str],
                      fmt: str = "parquet", overwrite: bool = False) -> None:
    """K4/K5: partitioned saveAsTable — overwrite on first write,
    append for subsequent increments (reference spark_loaders.py:
    165-173,215-223). Partitioning by the ingest batch tag gives
    partition pruning on re-reads and batch-level rollback."""
    mode = "overwrite" if overwrite else "append"
    (df.write.format(fmt).mode(mode).partitionBy(*partition_cols)
     .saveAsTable(str(dest)))


def write_bucketed(df: DataFrame, dest: TableName, bucket_cols: Sequence[str],
                   n_buckets: int = 32, sort_cols: Sequence[str] | None = None,
                   fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Bucketed (+ optionally sorted) table write: co-locates rows by
    hash of the bucket columns at write time, so later equi-joins and
    groupBys on those columns need no exchange (and with sort_cols, no
    sort) — see tests/test_bucketing.py for the no-shuffle join plan.

    The 100 TB lever for fact⋈fact joins: bucket both tables on the
    join key at ingest; every downstream join on that key becomes
    shuffle-free. Pick n_buckets ≈ table_size / target_task_input so
    one bucket is one well-sized task."""
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(str(dest))


def compact_table(spark: SparkSession, table: TableName, target_files: int,
                  fmt: str = "parquet", scratch_db: str = "spark_scratch") -> int:
    """Small-files compaction: rewrite a table into `target_files`
    output files (two-phase via safe_overwrite, since the rewrite
    reads the table it replaces). Returns the resulting file count.

    The 100 TB hygiene operator: streaming/incremental appends leave
    one file per batch-partition-task; scan cost and NameNode pressure
    grow with file count, not bytes. Compact on a cadence sized so
    files land near spark.sql.files.maxPartitionBytes (one task per
    file afterwards). Use coalesce-free repartition (round-robin) so
    output files are uniformly sized regardless of input skew."""
    df = spark.table(str(table)).repartition(target_files)
    safe_overwrite(spark, df, table, fmt, scratch_db=scratch_db,
                   scratch_suffix="compact")
    return (spark.table(str(table))
            .select(F.input_file_name().alias("f")).distinct().count())


def write_clustered(df: DataFrame, path: str, cluster_cols: Sequence[str],
                    n_files: int, fmt: str = "parquet") -> None:
    """Range-clustered write: repartitionByRange + sortWithinPartitions
    on `cluster_cols`, so each output file covers a disjoint key range
    and parquet footers carry tight min/max stats.

    The data-skipping layout for 100 TB: a later scan filtered on the
    cluster columns prunes whole files/row-groups from the footer
    stats alone (no partition directories needed, works for
    high-cardinality columns where partitionBy would explode into
    millions of dirs). Range partitioning samples the key distribution
    (rangepartitioning exchange), so skewed keys still yield
    balanced files. The in-file sort makes row-group stats tight, not
    just file stats.
    """
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.format(fmt).mode("overwrite").save(path)
    )


def write_zordered(df: DataFrame, path: str, zorder_cols: Sequence[str],
                   n_files: int, bits: int | None = None,
                   fmt: str = "parquet") -> None:
    """Z-order-clustered write: Morton-interleave `zorder_cols`
    (operators/layout), range-partition into `n_files`, sort within
    partitions, write. Unlike `write_clustered` — which only truly
    clusters its FIRST column — every interleaved column gets tight
    per-file min/max stats, so single-column predicates on ANY of them
    prune files. Use for the 2-3 highest-selectivity scan columns."""
    from hive_exporter_spark.operators.layout import ZORDER_BITS, zorder_layout

    (
        zorder_layout(df, zorder_cols, bits=bits or ZORDER_BITS,
                      n_partitions=n_files)
        .drop("__z")
        .write.format(fmt).mode("overwrite").save(path)
    )


def optimize_table(spark: SparkSession, table: TableName,
                   zorder_cols: Sequence[str], target_files: int,
                   bits: int | None = None, fmt: str = "parquet",
                   scratch_db: str = "spark_scratch") -> int:
    """OPTIMIZE-ZORDER for a managed table: rewrite it compacted into
    ~`target_files` Morton-clustered files (Delta/Iceberg's
    `OPTIMIZE ... ZORDER BY`, for plain tables). Two-phase via
    safe_overwrite since the rewrite reads the table it replaces; the
    scratch hop preserves clustering because the final insert runs one
    task per scratch file. Returns the resulting file count.

    The maintenance companion to `compact_table`: same small-files
    hygiene, plus every `zorder_cols` member gets tight per-file
    min/max stats for scan pruning."""
    from hive_exporter_spark.operators.layout import ZORDER_BITS, zorder_layout

    df = spark.table(str(table))
    laid = zorder_layout(df, zorder_cols, bits=bits or ZORDER_BITS,
                         n_partitions=target_files).drop("__z")
    safe_overwrite(spark, laid, table, fmt, scratch_db=scratch_db,
                   scratch_suffix="optimize")
    return (spark.table(str(table))
            .select(F.input_file_name().alias("f")).distinct().count())


def write_training_shards(documents: DataFrame, path: str,
                          n_shards: int | None = None,
                          fmt: str = "parquet",
                          balanced: bool = True) -> DataFrame:
    """Materialize a training corpus as token-balanced shards plus a
    verifiable manifest — the hand-off artifact between a curation
    pipeline and a trainer's data loader.

    `balanced=True` (snake-ranked `shard_by_tokens`) costs one corpus
    shuffle: the rank itself moves only 16-byte pairs, but joining the
    assignment back onto the full rows shuffles the data once.
    `balanced=False` shards by the md5 coin of doc_id — MAP-ONLY end
    to end (assignment is a pure per-row function), trading per-shard
    token equality for expected-equal sharding; at 100 TB with ~10^7
    docs/shard the relative imbalance is ~1/sqrt(n) and the saved
    shuffle is the whole corpus. Both layouts produce the same
    manifest contract.

    Layout: `<path>/data/shard=K/` (one directory per shard, written
    via the snake-ranked `shard_by_tokens` assignment so no loader
    idles behind a fat shard; partition layout means a loader or a
    re-verification job reads exactly its shard, nothing else) and
    `<path>/_manifest/` holding per-shard row counts, token totals,
    and the order-independent `dataset_fingerprint` lanes. Returns the
    manifest as read back from disk.

    The manifest is computed from the data AS RE-READ from the shard
    files, not from the in-flight DataFrame — it attests to the bytes
    a consumer will actually load, so `verify_training_shards` on an
    intact copy always matches and any post-write corruption or edit
    flips a lane."""
    from hive_exporter_spark.functions.rand import md5_int40
    from hive_exporter_spark.operators.pipeline import (
        N_SHARDS, dataset_fingerprint, shard_by_tokens)

    spark = documents.sparkSession
    n = n_shards if n_shards is not None else N_SHARDS
    if balanced:
        assigned = shard_by_tokens(documents, n)
        data = documents.join(assigned.select("doc_id", "shard"), "doc_id")
    else:
        data = documents.withColumn(
            "shard", (md5_int40("doc_id") % n).cast("int"))
    (data.write.partitionBy("shard").mode("overwrite")
     .format(fmt).save(f"{path}/data"))
    written = spark.read.format(fmt).load(f"{path}/data")
    manifest = (
        dataset_fingerprint(written, ["doc_id", "text"], group_col="shard")
        .join(written.groupBy("shard").agg(
            F.sum(F.size(F.split("text", " "))).alias("n_tokens")), "shard")
        .orderBy("shard")
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return spark.read.parquet(f"{path}/_manifest")


def verify_training_shards(spark: SparkSession, path: str,
                           fmt: str = "parquet") -> DataFrame:
    """Re-fingerprint a shard directory and diff it against its
    manifest: one row per shard with `ok` = every lane (rows, xor,
    modular sum, tokens) matches. One partition-parallel scan at any
    corpus size; a false `ok` names the exact shard to re-fetch —
    this is the integrity gate a trainer runs before burning GPU time
    on a corrupt or stale copy."""
    from hive_exporter_spark.operators.pipeline import dataset_fingerprint

    data = spark.read.format(fmt).load(f"{path}/data")
    actual = (
        dataset_fingerprint(data, ["doc_id", "text"], group_col="shard")
        .join(data.groupBy("shard").agg(
            F.sum(F.size(F.split("text", " "))).alias("n_tokens")), "shard")
    )
    manifest = spark.read.parquet(f"{path}/_manifest")
    m = manifest.select(
        "shard", F.col("n_rows").alias("m_rows"),
        F.col("xor_fp").alias("m_xor"), F.col("sum_fp").alias("m_sum"),
        F.col("n_tokens").alias("m_tokens"))
    return (
        actual.join(m, "shard", "full")
        .select(
            "shard",
            (F.col("n_rows").eqNullSafe(F.col("m_rows"))
             & F.col("xor_fp").eqNullSafe(F.col("m_xor"))
             & F.col("sum_fp").eqNullSafe(F.col("m_sum"))
             & F.col("n_tokens").eqNullSafe(F.col("m_tokens"))).alias("ok"),
            "n_rows", "m_rows", "xor_fp", "m_xor")
        .orderBy("shard")
    )
