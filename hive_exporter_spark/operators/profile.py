"""Data-profiling utility: per-column stats in ONE pass over the data.

The wide-aggregate-then-unpivot shape matters at scale: profiling N
columns is one scan + one partial-aggregate collapse (a single row
crosses the shuffle), never N scans. min/max surface as strings so
heterogeneous column types fit one result schema.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_SCHEMA_COLS = ("column_name", "n_rows", "n_nonnull", "n_distinct",
                       "min_value", "max_value")


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per profiled column: row count, non-null count, exact
    distinct count, min/max (stringified)."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nonnull"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    # Explode one array of per-column structs from the single agg row —
    # a union of per-column projections would re-run the aggregate (and
    # the scan) once per branch; this stays one scan, one agg, N rows.
    entries = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__rows").alias("n_rows"),
            F.col(f"{c}__nonnull").alias("n_nonnull"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Shuffle-skew diagnostic: the `top_n` hottest values of a
    prospective join/group key with their row share — the number you
    need before choosing broadcast vs salting vs AQE for a 100 TB
    shuffle (a key holding >1/partitions of the rows will straggle).

    One grouped count (map-side combined) + a single-row total
    crossJoined broadcast; top-n via TakeOrdered — no global sort. NULL
    keys count too (they hash to one partition like any hot key)."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key_value", "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("row_share"),
        )
        .orderBy(F.col("n_rows").desc(), "key_value")
        .limit(top_n)
    )


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a plan (bytes) — file sizes for
    scans, propagated through projections/filters. The same number AQE
    and the broadcast-threshold planner consult; surfacing it lets
    pipeline code make the decisions Catalyst can't (partition counts
    for a WRITE, salting factors) from the same statistics."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def suggest_shuffle_partitions(
    df: DataFrame,
    target_partition_bytes: int = 128 * 1024 * 1024,
    min_partitions: int = 1,
    max_partitions: int = 100_000,
) -> int:
    """Partition count putting ~`target_partition_bytes` in each task
    — the number to feed repartition()/repartitionByRange before a
    wide op or write so tasks neither spill (too big) nor drown the
    scheduler in empty tasks (too many). Pure planning call: reads
    Catalyst statistics, runs NO job. At 100 TB the difference between
    this and a static spark.sql.shuffle.partitions is the difference
    between 800k sensible tasks and 200 multi-GB spilling ones."""
    size = plan_size_bytes(df)
    n = (size + target_partition_bytes - 1) // target_partition_bytes
    return int(min(max(n, min_partitions), max_partitions))


# ---------------------------------------------------------------------------
# Data-contract validation
# ---------------------------------------------------------------------------

CONTRACT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
CONTRACT_TS_MIN = "2020-01-01"


def validate_events_contract(events: DataFrame) -> DataFrame:
    """Contract report for the events table: one row per rule with
    checked/violation counts — the machine-readable gate an ingestion
    job asserts on before publishing a batch (a nonzero row blocks
    the publish; the report names exactly which promise broke).

    Rules: ids present and UNIQUE, timestamps present and not before
    the epoch floor, types from the enum, values non-negative, props
    object-shaped. Everything except uniqueness folds into ONE
    conditional-sum pass over the scan (map-side combined);
    uniqueness adds the one distinct aggregate it fundamentally
    needs. The report itself is rules-sized.
    """
    base = events.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(F.col("event_id").isNull(), 1).otherwise(0))
        .alias("id_null"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0))
        .alias("ts_null"),
        F.sum(F.when(F.col("ts") < F.lit(CONTRACT_TS_MIN).cast("timestamp"),
                     1).otherwise(0)).alias("ts_early"),
        # NULL-hostile: a three-valued ~isin(...) evaluates to NULL for a
        # NULL input and would fall through otherwise(0) — an all-NULL
        # event_type batch must NOT pass the enum rule, so each
        # violation predicate coalesces NULL to "violated".
        F.sum(F.when(F.coalesce(
            ~F.col("event_type").isin(*CONTRACT_EVENT_TYPES), F.lit(True)),
            1).otherwise(0)).alias("type_bad"),
        F.sum(F.when(F.coalesce(F.col("value") < 0, F.lit(True)), 1)
              .otherwise(0)).alias("val_neg"),
        F.sum(F.when(F.coalesce(
            ~(F.col("props").startswith("{") & F.col("props").endswith("}")),
            F.lit(True)), 1).otherwise(0)).alias("props_bad"),
    )
    uniq = events.where(F.col("event_id").isNotNull()).agg(
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("id_dup"),
        F.count(F.lit(1)).alias("__n_ids"))
    r = base.crossJoin(F.broadcast(uniq))
    rules = [
        ("event_id_not_null", "__n", "id_null"),
        ("event_id_unique", "__n_ids", "id_dup"),
        ("ts_not_null", "__n", "ts_null"),
        ("ts_after_floor", "__n", "ts_early"),
        ("event_type_in_enum", "__n", "type_bad"),
        ("value_non_negative", "__n", "val_neg"),
        ("props_object_shaped", "__n", "props_bad"),
    ]
    stack = ", ".join(f"'{name}', {n}, {v}" for name, n, v in rules)
    return (
        r.selectExpr(
            f"stack({len(rules)}, {stack}) AS (rule, n_checked, n_violations)")
        .withColumn("passed", F.col("n_violations") == 0)
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# k-anonymity / re-identification risk (r8)
# ---------------------------------------------------------------------------

K_ANON_K = 5             # a group smaller than this is re-identifiable
K_ANON_RISK_BUDGET = 0.05  # tolerated share of rows in risky groups


def k_anonymity_report(df: DataFrame, quasi_cols: Sequence[str],
                       k: int = K_ANON_K,
                       risk_budget: float = K_ANON_RISK_BUDGET) -> DataFrame:
    """Privacy audit before releasing or training on event-level data:
    group by the QUASI-IDENTIFIER columns (the attributes an attacker
    could link to an external dataset — type, day, coarse location…)
    and measure how much of the corpus sits in groups smaller than k,
    i.e. rows whose quasi-id combination is rare enough to point at an
    individual (Sweeney 2002's k-anonymity, as a report rather than a
    transform — the remediation, generalize/suppress, is a policy
    choice this engine should inform, not make).

    One-row report: n_rows, n_groups, min_group_size, n_risky_groups
    and n_risky_rows (groups of size < k), risky_row_share, and the
    computed verdict `k_anonymous_ok` (share within `risk_budget`).

    Scale shape: ONE groupBy on the quasi-id key (partial-agg
    combined — the only corpus-sized exchange) and a group-count-sized
    fold; nothing row-level ever reaches the driver. Skewed quasi-id
    combos are harmless here: a hot group is by definition the SAFE
    kind, and it arrives at the reducer as one partial row per map
    partition, not as raw rows.
    """
    sizes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("__g"))
    risky = F.col("__g") < F.lit(int(k))
    agg = sizes.agg(
        F.sum("__g").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("__g").alias("min_group_size"),
        F.sum(F.when(risky, 1).otherwise(0)).alias("n_risky_groups"),
        F.coalesce(F.sum(F.when(risky, F.col("__g"))), F.lit(0))
        .alias("n_risky_rows"),
    )
    share = F.col("n_risky_rows") / F.col("n_rows")
    return agg.select(
        "n_rows", "n_groups", "min_group_size",
        "n_risky_groups", "n_risky_rows",
        F.round(share, 6).alias("risky_row_share"),
        F.coalesce(share <= F.lit(float(risk_budget)), F.lit(False))
        .alias("k_anonymous_ok"),
    )
