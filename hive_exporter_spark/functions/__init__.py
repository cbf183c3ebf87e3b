"""Column-level helper functions (all JVM-side built-ins — no UDFs)."""

from hive_exporter_spark.functions.aggs import dsum, davg
from hive_exporter_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["dsum", "davg", "cosine_similarity", "dot", "l2_norm"]
