"""Engine-portable deterministic randomness.

One canonical source for the md5-derived uniform coin used by every
sampling operator (`stratified_sample_hash`, `weighted_sample`,
`temperature_mix`): u = (first 10 md5 hex chars as int + 0.5) / 2^40 —
a 40-bit uniform in (0, 1), bit-identical in Spark and DuckDB, a pure
function of the id (reruns and backfills keep identical rows), and
free of the ~1M-id cycle a multiplicative Weyl hash would have.

Both the Column and the SQL fragment live here so the Spark side and
its DuckDB oracle can never silently diverge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

MD5_UNIFORM_MOD = float(1 << 40)


def md5_int40(col: str) -> F.Column:
    """Deterministic 40-bit integer hash of `col` (stringified).
    Uniform in [0, 2^40); bit-identical in Spark and DuckDB. The ONE
    canonical hash expression — `md5_uniform` and every sketch
    (operators/sketches.py) derive from it, so the sampling operators
    and the sketches can never silently diverge. NULL input hashes to
    NULL (md5(NULL) is NULL in both engines): callers that feed
    nullable keys must filter, or Spark's nulls-first vs DuckDB's
    nulls-last ORDER BY defaults will split the engines."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 10), 16, 10)
        .cast("long")
    )


def md5_int40_sql(expr: str) -> str:
    """DuckDB twin of `md5_int40` for oracle SQL strings."""
    return (
        f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 10) AS BIGINT)"
    )


def md5_uniform(id_col: str) -> F.Column:
    """Deterministic uniform in (0, 1) derived from `id_col`."""
    return (md5_int40(id_col) + F.lit(0.5)) / F.lit(MD5_UNIFORM_MOD)


def md5_uniform_sql(id_expr: str) -> str:
    """DuckDB twin of `md5_uniform` for oracle SQL strings."""
    return f"(({md5_int40_sql(id_expr)} + 0.5) / {MD5_UNIFORM_MOD})"
