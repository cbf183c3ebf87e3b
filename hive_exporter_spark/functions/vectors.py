"""Vector math over ``array<float>`` columns — pure built-in Column
algebra (`F.zip_with` + `F.aggregate`), fully JVM-side: no Python UDF
in the hot path, so brute-force similarity scans stay inside
whole-stage codegen and scale linearly with executors.

All arithmetic is done in DOUBLE after an explicit element cast, so
results are reproducible against the DuckDB oracle (which computes the
same expression over the same float32 inputs widened to double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """Dot product of two array<numeric> columns, computed in double."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: str | Column) -> Column:
    """Euclidean norm of an array<numeric> column."""
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
