"""hive_exporter_spark — a PySpark-native analytics/ETL engine.

A from-scratch, idiomatic PySpark rebuild of the capabilities of the
reference `kagesenshi/hive_exporter` (see SURVEY.md for the structural
analysis with file:line citations), extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout:
    session     SparkSession factory (deterministic, UTC, AQE on)
    catalog     table-name parsing, catalog probes, metadata snapshots
    sources     file / table / JDBC readers (bounds discovery, dialects)
    sinks       file / table writers (safe_overwrite two-phase protocol)
    operators   relational core + ingest strategies + LLM-pipeline ops
    functions   column-level helpers (vector math, text, hashing)
    plans       plan-inspection helpers (pushdown/broadcast assertions)
    streaming   micro-batch CDC runner + Structured Streaming wrappers
"""

from hive_exporter_spark.session import build_session

__all__ = ["build_session"]
__version__ = "0.1.0"
