"""Plan-inspection helpers: programmatic access to the physical plan
for pushdown / pruning / broadcast / shuffle assertions.

These power the plan-quality test suite (tests/test_plans.py): every
headline operator asserts not just its result but the *plan shape* it
must keep at 100 TB — filters reaching the scan, dimension joins
broadcast, partial aggregation before exchanges. A correctness-green
operator with a regressed plan fails CI here.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain('formatted')` text, captured as a string."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def executed_plan(df: DataFrame) -> str:
    """String form of the executed (post-AQE-input) physical plan."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def scan_read_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each parquet scan (ReadSchema) — the
    column-pruning witness."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def num_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges
    excluded) — the scale-cost headline number."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or (
        "BroadcastNestedLoopJoin" in formatted_plan(df)
    )


def broadcast_join_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(re.findall(r"BroadcastHashJoin", plan))


def sort_merge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", formatted_plan(df)))


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present (partial_* functions in a
    HashAggregate below the exchange)."""
    return bool(re.search(r"partial_(sum|count|min|max|avg)", formatted_plan(df)))
