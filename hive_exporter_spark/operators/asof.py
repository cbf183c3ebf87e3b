"""As-of join — an operator Spark lacks natively, composed from
union + window (no Python, no per-group pandas):

For each left row, attach the payload of the latest right row with
the same key and right_ts <= left_ts. Implementation: union both
sides (right rows carry a payload struct, left rows a NULL one),
window per key ordered by (ts, right-before-left-at-ties), and take
`last(payload, ignorenulls=True)` up to the current row.

Scale shape: ONE shuffle on the key for both inputs combined, then a
per-key sort — identical cost to the sort-merge join Spark would do
for an equi-join, with no range-explosion. This beats the
`applyInPandas` + pd.merge_asof alternative (which serializes every
group through Arrow) everywhere except tiny inputs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    payload_prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. Right rows tied with a left row's timestamp ARE
    visible to it (`<=` semantics, matching DuckDB/kdb asof). Right
    side must be unique per (keys, right_ts) — dedup upstream,
    otherwise the winner among equal timestamps is undefined.

    `direction="backward"` (default) attaches the LATEST right row at
    or before the left timestamp; `"forward"` the EARLIEST right row
    at or after it (`>=`) — the lookahead form ("next maintenance
    after each failure"). Forward is the same single-shuffle plan with
    the per-key sort reversed, not a second algorithm.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("__payload")
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts before left at ts ties
        payload,
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # Forward scans time descending, so "last non-null up to current"
    # is the nearest right row at-or-after; __side keeps ties visible.
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(ts_order, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__filled", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"__filled.{c}").alias(f"{payload_prefix}{c}") for c in payload_cols
    ]
    return filled.where(F.col("__side") == 1).select(*out_cols)
