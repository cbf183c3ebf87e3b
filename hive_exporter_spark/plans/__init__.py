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


def scan_locations(df: DataFrame) -> list[str]:
    """File-index locations of every file scan in the plan, one entry
    per scan node (duplicates = the same data read more than once)."""
    return re.findall(r"Location: \w+FileIndex \[([^\]]*)\]", formatted_plan(df))


def _single_partition_funnels(tree: str) -> int:
    """Count Exchange SinglePartition nodes whose CONSUMER (the
    nearest ancestor in the executed-plan tree, i.e. the first
    less-indented node above) is a Sort or Window — the shapes where
    the full input serializes through one task. A SinglePartition
    exchange consumed by a final aggregate carries one partial row
    per input partition and is not a funnel."""
    lines = tree.splitlines()

    def indent(s: str) -> int:
        # tree prefix is spaces, ':', '|', '+-', ':-'; the '*(n)'
        # codegen marker is part of the node content, not the prefix
        body = re.sub(r"^[\s:+|-]*", "", s)
        return len(s) - len(body)

    n = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        my = indent(line)
        for j in range(i - 1, -1, -1):
            if not lines[j].strip():
                continue
            if indent(lines[j]) < my:
                consumer = lines[j]
                if re.search(r"\bSort\b|\bWindow", consumer):
                    n += 1
                break
    return n


def audit_plan(df: DataFrame,
               dismiss: dict[str, str] | None = None) -> list[dict]:
    """Lint a DataFrame's physical plan for the anti-patterns that are
    survivable on a laptop and fatal at 100 TB. Returns findings as
    ``{"rule", "severity", "detail"}`` dicts (empty list = clean).

    ``dismiss`` maps rule name -> human reason for shapes the caller
    has adjudicated as legitimate (self-joins, two-phase reads,
    crosscheck reports). Matching findings are STILL returned —
    downgraded to severity ``"dismissed"`` with the reason appended —
    so a dismissal is visible in every audit log, never silent.

    Rules:
      - ``cartesian_product`` (error): CartesianProduct — both sides
        partitioned, O(n·m) pair blowup with no small side.
      - ``cross_broadcast_join`` (warn): Cross
        BroadcastNestedLoopJoin — fine when the build side is a
        scalar/bounded aggregate (the deliberate pattern this repo
        uses for sketch scalars), fatal when it is data-sized; the
        plan alone can't tell, so this is a review flag.
      - ``single_partition_exchange`` (error): an Exchange
        SinglePartition feeding a Sort or Window — the whole input
        funnels through ONE task (global window/sort without
        partitioning). Use a partitioned window or the two-phase
        top-k pattern. A SinglePartition exchange under a FINAL
        aggregate is NOT flagged: only one partial row per input
        partition crosses it — the normal scalar-aggregate shape.
        Review flags on windows over already-dimension-sized frames
        (daily rollups etc.) are expected and dismissible with
        context — the plan alone cannot see frame sizes.
      - ``repeated_scan`` (error): the same file location scanned
        more than once. Legitimate multi-scan shapes exist — self
        joins, agg-then-join-back over a fact too big to checkpoint,
        two-phase threshold reads, crosscheck reports, bloom
        build+probe — but each must be DISMISSED with a reason (the
        ``dismiss`` param / registry whitelist), because the silent
        default is Catalyst re-expanding a shared subtree: a full
        extra corpus pass per reference at 100 TB. The pre-fix
        ``embedding_drift`` shape (two filtered centroid subtrees
        over one parquet source) is the canonical offender this rule
        exists to catch (SCALE.md multi-scan audit).
      - ``python_row_udf`` (error): BatchEvalPython — row-at-a-time
        Python in the hot path; use built-ins or Arrow.
      - ``python_arrow_udf`` (info): ArrowEvalPython / pandas
        map nodes — vectorized Python; acceptable where built-ins
        can't express the kernel, but JVM-side is still faster.
    """
    plan = formatted_plan(df)
    findings: list[dict] = []
    dismiss = dismiss or {}

    def _hit(rule: str, severity: str, detail: str) -> None:
        if rule in dismiss:
            severity = "dismissed"
            detail += f" [dismissed: {dismiss[rule]}]"
        findings.append({"rule": rule, "severity": severity,
                         "detail": detail})

    if "CartesianProduct" in plan:
        _hit("cartesian_product", "error", "CartesianProduct node")
    n_cross = len(re.findall(r"BroadcastNestedLoopJoin Cross", plan))
    if n_cross:
        _hit("cross_broadcast_join", "warn",
             f"{n_cross} Cross BroadcastNestedLoopJoin(s): fine iff "
             "the build side is a scalar/bounded aggregate")
    n_single = _single_partition_funnels(executed_plan(df))
    if n_single:
        _hit("single_partition_exchange", "error",
             f"{n_single} single-partition exchange(s) feeding a "
             "Sort/Window: that stage runs as ONE task")
    locs = scan_locations(df)
    for loc in sorted({l for l in locs if locs.count(l) > 1}):
        _hit("repeated_scan", "error",
             f"{loc} scanned {locs.count(loc)}x — dismiss with a "
             "reason if the semantics are N-pass (self-join, "
             "agg-then-join-back, crosscheck); otherwise "
             "localCheckpoint the shared intermediate")
    if "BatchEvalPython" in plan:
        _hit("python_row_udf", "error",
             "row-at-a-time Python UDF in the plan")
    for node in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        if node in plan:
            _hit("python_arrow_udf", "info", f"{node} (vectorized Python)")
    return findings
