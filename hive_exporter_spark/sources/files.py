"""File-dataset sources (reference: S3 `hive_importer_spark2.py:27`).

The reference reads an exported directory with
``spark.read.format(fmt).load('file://' + path)``; the engine
generalizes to any Hadoop-FS URI and any self-describing format.
Parquet is the default at rest (columnar, predicate pushdown + column
pruning reach the scan for free via Catalyst).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-generated TPC-H-ish fixture tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Event-time columns whose parquet physical type has shipped in two
# fixture generations: TIMESTAMP(NANOS) (Spark's vectorized reader
# rejects it unless spark.sql.legacy.parquet.nanosAsLong=true surfaces
# it as epoch-nanos long, which we floor-divide to micros — identical
# truncation to DuckDB's nanos→micros conversion) and TIMESTAMP(MICROS)
# (reads natively as timestamp_ntz). read_table handles both; ts_range
# pushes a scan predicate in either representation.
NANO_TS_COLUMNS = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str, fmt: str = "parquet",
               ts_range: tuple[str | None, str | None] | None = None) -> DataFrame:
    """Scan one fixture table. Lazy; filters/pruning push into the scan.

    `ts_range=(lo, hi)` (ISO timestamps, either end None) range-filters
    the nano-timestamp column BEFORE the long→timestamp conversion.
    Predicates on the converted column sit above a function call and
    can never reach the parquet scan; the equivalent raw-long
    comparison pushes down and prunes row groups by min/max. This is
    the scan-side watermark lever for the events table at scale.
    """
    path = os.path.join(sf_dir, f"{name}.{ 'parquet' if fmt == 'parquet' else fmt }")
    # Self-sufficient under ANY caller's session (not just build_session's):
    # parquet TIMESTAMP(NANOS) columns need the legacy nanos-as-long conf or
    # the vectorized reader throws PARQUET_TYPE_ILLEGAL at the scan. The conf
    # is runtime-settable and per-session sticky; setting it when already set
    # is a no-op.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.format(fmt).load(path)
    for col in NANO_TS_COLUMNS.get(name, ()):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            # TIMESTAMP(NANOS) fixture surfaced as epoch-nanos long: range-
            # filter the raw long (pushes to the scan), then convert.
            if ts_range is not None:
                lo, hi = ts_range
                if lo is not None:
                    df = df.where(F.col(col) >= _iso_to_nanos(lo))
                if hi is not None:
                    df = df.where(F.col(col) < _iso_to_nanos(hi))
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        elif dtype in ("timestamp", "timestamp_ntz") and ts_range is not None:
            # TIMESTAMP(MICROS) fixture reads natively; a literal-vs-column
            # comparison is a plain pushable predicate (PushedFilters shows
            # ts >= ..., row-group min/max skipping applies).
            ts_type = df.schema[col].dataType
            lo, hi = ts_range
            if lo is not None:
                df = df.where(F.col(col) >= F.lit(lo).cast(ts_type))
            if hi is not None:
                df = df.where(F.col(col) < F.lit(hi).cast(ts_type))
    return df


def _iso_to_nanos(iso_ts: str) -> int:
    """Epoch nanoseconds of an ISO timestamp string (UTC)."""
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(iso_ts)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1_000


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a lazy DataFrame keyed by name."""
    return {name: read_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


CORRUPT_COL = "_corrupt_record"


def read_tolerant(spark: SparkSession, path: str, schema, fmt: str = "json",
                  options: dict[str, str] | None = None
                  ) -> tuple[DataFrame, DataFrame]:
    """Quarantine-style semi-structured scan: returns (good, bad).

    At 100 TB of scraped json/csv, malformed rows are a statistical
    certainty and FAILFAST (one bad line kills an 800k-task job) is not
    an option — but silently dropping them (DROPMALFORMED) loses data
    with no audit trail. PERMISSIVE mode + an explicit corrupt-record
    column splits the scan into clean rows and a quarantine stream the
    pipeline can persist for replay/inspection.

    Both returned frames are projections of ONE scan relation; a
    caller persisting both pays one read. The schema must be supplied
    (schema inference would scan twice and race the corrupt column);
    the corrupt column is appended automatically.

    `good` carries the declared columns only. `bad` is the quarantine:
    the raw offending text as `raw_record` plus whatever fields DID
    parse — which also satisfies Spark's rule that a scan may not
    reference *only* the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    if not isinstance(schema, StructType):  # DDL string accepted
        schema = StructType.fromDDL(schema)
    data_fields = list(schema.fields)  # StructType.add mutates; keep a copy
    full = StructType(data_fields + [StructField(CORRUPT_COL, StringType())])
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL,
            **(options or {})}
    df = spark.read.format(fmt).options(**opts).schema(full).load(path)
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record"),
        *[F.col(f.name) for f in data_fields],
    )
    return good, bad
