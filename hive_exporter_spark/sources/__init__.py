"""Sources: file datasets, catalog tables, JDBC relations."""

from hive_exporter_spark.sources.files import TESTDATA_TABLES, load_tables, read_table

__all__ = ["TESTDATA_TABLES", "load_tables", "read_table"]
