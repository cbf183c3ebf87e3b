"""The relational core of the reference, as pure DataFrame→DataFrame
functions (reference: spark_loaders.py; see SURVEY.md §2.3/2.5/2.6).

Every function here is lazy Column algebra — Catalyst pushes the
watermark predicates into the scan (parquet row-group skipping / JDBC
``WHERE``), which is the reference's main scalability lever: only the
delta crosses the wire (reference spark_loaders.py:157-158,201-208).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Default ingestion-tag column name (reference spark_loaders.py:119-121).
INGEST_TAG_COLUMN = "dl_ingest_date"


def tag_batch(df: DataFrame, batch_tag: str, tag_column: str = INGEST_TAG_COLUMN) -> DataFrame:
    """P2: append a constant batch-tag column.

    The reference stamps ``datetime.now().strftime('%Y%m%dT%H%M%S')``
    (spark_loaders.py:121) — a driver-computed constant, NOT a per-row
    ``current_timestamp()``: one batch must carry exactly one tag or the
    partitioned sink splinters into per-row partitions. The engine makes
    the clock injectable: callers pass the tag.
    """
    return df.withColumn(tag_column, F.lit(batch_tag))


def high_water_mark(df: DataFrame, column: str):
    """A3: current high-water mark = max(column), as a driver scalar.

    Single-row aggregate — safe at any scale (never collects data rows).
    Reference: ``select max(col) from db.tbl`` + ``take(1)``
    (spark_loaders.py:153-155,193-199). Returns None on an empty table.
    """
    return df.agg(F.max(F.col(column)).alias("hwm")).first()["hwm"]


def newer_than(df: DataFrame, column: str, last_value, *,
               rewind=None) -> DataFrame:
    """P5: strict high-water-mark filter for append-only sources.

    Strict ``>`` — rows tied with the stored max are skipped, matching
    the reference's documented semantics (spark_loaders.py:157-158).
    Catalyst pushes this into the source scan.

    ``rewind`` is the allowed-lateness option the reference lacks
    (SURVEY.md §2.9: late rows below the watermark are silently lost):
    the watermark is pulled back by that amount — a number for numeric
    columns, an ``"INTERVAL ..."`` expression string for timestamps —
    and the filter becomes inclusive, re-ingesting the late window.
    Downstream merge/dedup (latest_per_key) collapses the re-read
    overlap, so rewind trades a bounded re-scan for no data loss.
    """
    if last_value is None:
        return df
    if rewind is None:
        return df.where(F.col(column) > F.lit(last_value))
    delta = F.expr(rewind) if isinstance(rewind, str) else F.lit(rewind)
    return df.where(F.col(column) >= F.lit(last_value) - delta)


def newer_or_modified(
    df: DataFrame,
    incremental_column: str,
    last_value,
    last_modified_column: str | None = None,
    last_modified: object | None = None,
) -> DataFrame:
    """P6: disjunctive high-water-mark filter for merge sources —
    new rows OR modified rows (reference spark_loaders.py:201-208,
    including the degenerate single-predicate branches)."""
    preds: list[Column] = []
    if last_value is not None:
        preds.append(F.col(incremental_column) > F.lit(last_value))
    if last_modified_column is not None and last_modified is not None:
        preds.append(F.col(last_modified_column) > F.lit(last_modified))
    if not preds:
        return df
    cond = preds[0]
    for p in preds[1:]:
        cond = cond | p
    return df.where(cond)


def latest_per_key(
    df: DataFrame,
    key_columns: Sequence[str],
    order_column: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """W1: latest-record-per-key dedup — the upsert consolidation.

    ``row_number() OVER (PARTITION BY keys ORDER BY order_col DESC
    [, tiebreakers DESC])``, keep rank 1 (reference
    spark_loaders.py:228-237). Two deliberate semantics:

    - Spark's ``desc()`` places NULLs last, so a row with NULL
      ``order_column`` loses to any non-NULL version — required by the
      reference's merge test (tests/test_incremental_merge.py:108-118).
    - The reference orders by ``order_column`` alone, so timestamp ties
      pick an arbitrary winner; the engine adds deterministic
      ``tiebreakers`` (SURVEY.md §7.4.4).

    Scale: one shuffle on ``key_columns``; AQE splits skewed keys. This
    is shuffle-equivalent to the sort-merge join a MERGE INTO would do.
    """
    order = [F.col(order_column).desc()] + [F.col(t).desc() for t in tiebreakers]
    w = Window.partitionBy(*[F.col(k) for k in key_columns]).orderBy(*order)
    rn = "__rn"
    return df.withColumn(rn, F.row_number().over(w)).where(F.col(rn) == 1).drop(rn)


def not_soft_deleted(df: DataFrame, deleted_column: str) -> DataFrame:
    """P8: tombstone filter — keep rows whose soft-delete marker is NULL
    (reference spark_loaders.py:238-239)."""
    return df.where(F.col(deleted_column).isNull())


def merge_upsert(
    base: DataFrame,
    increment: DataFrame,
    key_columns: Sequence[str],
    order_column: str,
    tiebreakers: Sequence[str] = (),
    deleted_column: str | None = None,
) -> DataFrame:
    """§2.4: the reference's one conceptual join, kept join-free.

    MERGE expressed as UNION ALL + latest-per-key window (reference
    spark_loaders.py:222-239) — idiomatic Spark and shuffle-equivalent
    to a sort-merge join on the keys, but with a single shuffle and no
    join-side buffering. Column order is aligned by name first
    (``insertInto`` positional trap, SURVEY.md §7.4.2).
    """
    inc = increment.select(*base.columns)
    merged = latest_per_key(base.unionByName(inc), key_columns, order_column, tiebreakers)
    if deleted_column is not None:
        merged = not_soft_deleted(merged, deleted_column)
    return merged


def bounds(df: DataFrame, column: str) -> tuple:
    """S7: split-bounds discovery — ``min``/``max`` of the partition
    column as one single-row aggregate (reference spark_loaders.py:89-98
    runs it as a pushed-down JDBC query; over files Catalyst reads it
    from parquet statistics where possible)."""
    row = df.agg(
        F.min(F.col(column)).alias("lower_bound"),
        F.max(F.col(column)).alias("upper_bound"),
    ).first()
    return row["lower_bound"], row["upper_bound"]


def reconcile_counts(source: DataFrame, ingested: DataFrame, destination: DataFrame) -> dict:
    """A2: the reconciliation triple the reference logs side by side
    (jdbc_loader_spark2.py:33-47). Returned structured, not printed."""
    return {
        "source_count": source.count(),
        "ingested_count": ingested.count(),
        "destination_count": destination.count(),
    }


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sampling (sampleBy): downsample
    overrepresented classes without a shuffle — each task filters its
    own rows against the stratum's fraction. The standard rebalancing
    step before training-data export; deterministic under a fixed
    seed (rerun-stable splits)."""
    return df.sampleBy(strata_col, fractions, seed)


def stratified_sample_hash(df: DataFrame, strata_col: str,
                           fractions: dict, id_col: str) -> DataFrame:
    """Per-stratum Bernoulli sampling with a DETERMINISTIC coin: keep
    a row iff its md5-derived 40-bit uniform (the same engine-portable
    trick as `weighted_sample`) falls below the stratum's fraction.

    Same map-only, shuffle-free shape as `stratified_sample`, but the
    kept set is a pure function of (id, stratum, fractions): reruns,
    backfills, and other engines reproduce the row set exactly — which
    also makes it value-hash-checkable against a SQL oracle, where
    `sampleBy`'s engine RNG is rows-only by nature. Strata absent from
    `fractions` get rate 0, matching `sampleBy`.
    """
    from hive_exporter_spark.functions.rand import md5_uniform

    u = md5_uniform(id_col)
    frac = F.lit(0.0)
    for s, fr in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == s, F.lit(float(fr))).otherwise(frac)
    return df.where(u < frac)


# 6 binomial standard deviations + 1/n slack: Bernoulli sampling at
# fraction p over n rows keeps n·p ± ~sqrt(n·p(1-p)); a 6-sigma band
# false-alarms ~never while still catching a broken coin outright.
SAMPLE_TOL_SD = 6.0


def stratified_sample_report(df: DataFrame, strata_col: str,
                             fractions: dict, id_col: str,
                             seed: int = 42) -> DataFrame:
    """Sampled-vs-exact fraction audit for BOTH stratified samplers —
    the hash-checked auditor that keeps the engine-RNG `sampleBy` path
    honest (VERDICT r5 item 2). Per stratum:

    - `n_total`, `expected_frac`, and `n_hash_kept` (the md5-coin
      sampler's kept count) are deterministic — the DuckDB oracle
      replays them bit-exactly;
    - each sampler's observed fraction is tested against a
      `SAMPLE_TOL_SD`-sigma binomial band and surfaces as a VERDICT
      boolean the oracle pins to TRUE. The engine-RNG path thereby
      gets a real correctness contract (red driver row if its kept
      fraction ever leaves the band) without pretending its row set
      has a SQL twin.

    Three scans of df (the two audited samplers run unmodified beside
    one exact group count); all joins are strata-count-sized.
    """
    totals = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_total"))
    hash_kept = (
        stratified_sample_hash(df, strata_col, fractions, id_col)
        .groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_hash_kept")))
    rng_kept = (
        stratified_sample(df, strata_col, fractions, seed)
        .groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n_rng")))
    frac = F.lit(0.0)
    for s, fr in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == s, F.lit(float(fr))).otherwise(frac)
    n = F.col("n_total").cast("double")
    p = F.col("expected_frac")
    tol = SAMPLE_TOL_SD * F.sqrt(p * (1 - p) / n) + 1.0 / n
    hash_ok = F.abs(F.col("n_hash_kept") / n - p) <= tol
    rng_ok = F.abs(F.col("__n_rng") / n - p) <= tol
    return (
        totals
        .join(hash_kept, strata_col, "left")
        .join(rng_kept, strata_col, "left")
        .fillna(0, ["n_hash_kept", "__n_rng"])
        .withColumn("expected_frac", frac)
        .select(strata_col, "n_total", "expected_frac", "n_hash_kept",
                hash_ok.alias("hash_frac_ok"),
                rng_ok.alias("rng_frac_ok"))
        .orderBy(strata_col)
    )


def sample_fixed_n(df: DataFrame, strata_col: str, id_col: str,
                   n: int, salt_buckets: int = 16) -> DataFrame:
    """EXACTLY n rows per stratum (or all of a smaller stratum),
    chosen uniformly-without-replacement by the deterministic md5
    coin: rank rows within each stratum by their 40-bit hash and keep
    the n smallest — a uniform order statistic, so the kept set is an
    unbiased fixed-size sample AND a pure function of the ids
    (reruns/backfills/other engines reproduce it; a fraction-based
    sample can't hit an exact quota, a reservoir sample isn't
    rerun-stable).

    Selection runs through the two-phase grouped top-k
    (`relational.topk_per_group`), so a hot stratum never sorts in one
    task. Adds `sample_rank` (1..n within the stratum, by hash order).
    """
    from hive_exporter_spark.functions.rand import md5_int40
    from hive_exporter_spark.operators.relational import topk_per_group

    return topk_per_group(
        df, [strata_col], [md5_int40(id_col), F.col(id_col)], n,
        salt_col=F.pmod(md5_int40(id_col), F.lit(salt_buckets)),
        rank_name="sample_rank",
    )


def snapshot_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
                  compare_cols: Sequence[str] | None = None) -> DataFrame:
    """CDC-style diff of two table snapshots keyed on `keys`: one row
    per changed key with change_type in (added, removed, changed).

    Full outer join on the keys — one co-partitioned shuffle per side,
    the classic reconciliation shape. Column comparison is
    null-safe (`<=>`), so NULL→value and value→NULL transitions count
    as changes. `compare_cols` defaults to every non-key column the
    snapshots share."""
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c in set(new.columns) and c not in keys]
    # Literal presence markers, NOT keys[0] IS NOT NULL: a row whose first
    # key column is legitimately NULL (the join is eqNullSafe, so NULL keys
    # do match) would otherwise be misclassified as added/removed.
    o = old.select(*keys, *compare_cols).withColumn("__op", F.lit(1)).alias("o")
    n = new.select(*keys, *compare_cols).withColumn("__np", F.lit(1)).alias("n")
    cond = [o[k].eqNullSafe(n[k]) for k in keys]
    joined = o.join(n, cond, "full_outer")
    old_present = F.col("o.__op").isNotNull()
    new_present = F.col("n.__np").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(~old_present, F.lit("added"))
        .when(~new_present, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    key_cols = [F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys]
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def scd2_intervals(changes: DataFrame, keys: Sequence[str], ts_col: str,
                   attr_cols: Sequence[str]) -> DataFrame:
    """Type-2 slowly-changing-dimension builder: from a change log,
    one validity interval [valid_from, valid_to) per attribute version
    per key; open versions get NULL valid_to and is_current = true.

    One window over (key, ts): valid_to = lead(ts). Consecutive
    duplicate attribute values are collapsed first (lag comparison,
    same window partitioning) so intervals describe *changes*, not
    every observation — all in a single exchange on the key."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    prev_same = F.lit(True)
    for c in attr_cols:
        prev_same = prev_same & F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
    # The first row per key must always survive — its lag() is NULL,
    # and eqNullSafe would call an all-NULL first version "same".
    is_first = F.row_number().over(w) == 1
    dedup = (
        changes.withColumn(
            "__same", F.when(is_first, F.lit(False)).otherwise(prev_same)
        )
        .where(~F.col("__same"))
        .drop("__same")
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    return (
        dedup.select(
            *keys, *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
