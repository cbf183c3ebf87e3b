"""JDBC source builder (reference S4–S9, spark_loaders.py:58-109).

Builds a `spark.read.format('jdbc')` reader from a typed config:
- table OR query mode (mutually exclusive — the reference validated
  this at arg-parse time, spark_loaders.py:35-43);
- Sqoop-style range partitioning with bounds discovery pushed to the
  source DB (one `SELECT min,max` via the JDBC `query` option,
  spark_loaders.py:89-102);
- per-dialect option maps (the reference special-cased Oracle inline,
  spark_loaders.py:104-107);
- aggregate pushdown for reconciliation counts
  (jdbc_loader_spark2.py:33-34).

Every path below executes for real against embedded Derby
(`jdbc:derby:memory:`, tests/test_jdbc_live.py): table scan, query
scan, bounds discovery, range-partitioned parallel read, filter/count
pushdown, the write-back path, and both incremental ingest strategies
over a live source. `discover_bounds` also has a file-backed twin
(core.bounds) used by the ingest tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrameReader, SparkSession

# Per-dialect extra options (applied when the url starts with the key).
DIALECT_OPTIONS: dict[str, dict[str, str]] = {
    "jdbc:oracle": {
        # Oracle DATE must not map to timestamp; pin the session format
        # (reference spark_loaders.py:104-107).
        "oracle.jdbc.mapDateToTimestamp": "false",
        "sessionInitStatement": (
            "ALTER SESSION SET NLS_TIMESTAMP_FORMAT = 'YYYY-MM-DD HH24:MI:SS.FF'"
        ),
    },
}


@dataclass(frozen=True)
class JdbcSourceConfig:
    url: str
    driver: str | None = None
    user: str | None = None
    password: str | None = None
    table: str | None = None
    query: str | None = None
    fetch_size: int | None = None
    query_timeout: int | None = None
    session_init_statement: str | None = None
    partition_column: str | None = None
    num_partitions: int | None = None
    lower_bound: object | None = None
    upper_bound: object | None = None
    push_down_aggregate: bool = False
    extra_options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if (self.table is None) == (self.query is None):
            raise ValueError("exactly one of table/query is required")
        if self.partition_column and self.query:
            raise ValueError("range partitioning requires table mode")

    def options(self) -> dict[str, str]:
        opts: dict[str, str] = {"url": self.url}
        for prefix, extra in DIALECT_OPTIONS.items():
            if self.url.startswith(prefix):
                opts.update(extra)
        if self.driver:
            opts["driver"] = self.driver
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.table:
            opts["dbtable"] = self.table
        if self.query:
            opts["query"] = self.query
        if self.fetch_size is not None:
            opts["fetchSize"] = str(self.fetch_size)
        if self.query_timeout is not None:
            opts["queryTimeout"] = str(self.query_timeout)
        if self.session_init_statement:
            opts["sessionInitStatement"] = self.session_init_statement
        if self.partition_column:
            opts["partitionColumn"] = self.partition_column
            opts["numPartitions"] = str(self.num_partitions or 2)
            if self.lower_bound is not None:
                opts["lowerBound"] = str(self.lower_bound)
            if self.upper_bound is not None:
                opts["upperBound"] = str(self.upper_bound)
        if self.push_down_aggregate:
            opts["pushDownAggregate"] = "true"
        opts.update(self.extra_options)
        return opts

    def bounds_query(self) -> str:
        """S7: bounds discovery SQL, executed ON THE SOURCE DB via the
        JDBC `query` option (reference spark_loaders.py:90)."""
        if not self.partition_column or not self.table:
            raise ValueError("bounds discovery needs table + partition_column")
        return (
            f"SELECT MIN({self.partition_column}) AS lower_bound, "
            f"MAX({self.partition_column}) AS upper_bound FROM {self.table}"
        )


def reader(spark: SparkSession, cfg: JdbcSourceConfig) -> DataFrameReader:
    """Build the configured JDBC reader (lazy; `.load()` fetches the
    remote schema)."""
    return spark.read.format("jdbc").options(**cfg.options())


def writer(df, cfg: JdbcSourceConfig, mode: str = "append",
           batch_size: int | None = None):
    """Build a JDBC writer for `cfg.table` (the return-path twin of
    :func:`reader` — the reference only read over JDBC, but a complete
    engine round-trips: exporting curated/consolidated tables back to
    an RDBMS is the natural last hop of an ingest pipeline).

    Scale: each input partition opens one connection and writes
    `batchSize`-row batches; `df.repartition(n)` upstream controls
    write parallelism against the DB's connection budget. Dialect
    options (Oracle session init etc.) apply exactly as on the read
    side."""
    if not cfg.table:
        raise ValueError("JDBC writes require table mode")
    opts = {k: v for k, v in cfg.options().items()
            if k not in ("partitionColumn", "numPartitions",
                         "lowerBound", "upperBound", "pushDownAggregate")}
    if batch_size is not None:
        opts["batchsize"] = str(batch_size)
    return df.write.format("jdbc").options(**opts).mode(mode)


def discover_bounds(spark: SparkSession, cfg: JdbcSourceConfig) -> "JdbcSourceConfig":
    """Run the bounds query on the source DB and return a config with
    lower/upper bounds filled in (reference spark_loaders.py:92-102:
    the first action of the job runs before the main plan exists)."""
    from dataclasses import replace

    probe = replace(cfg, table=None, query=cfg.bounds_query(),
                    partition_column=None, num_partitions=None)
    row = reader(spark, probe).load().first()
    # Positional access: identifier-case folding is dialect-specific
    # (Derby/Oracle uppercase unquoted aliases, Postgres lowercases),
    # but the bounds query's column order is ours.
    return replace(cfg, lower_bound=row[0], upper_bound=row[1])
