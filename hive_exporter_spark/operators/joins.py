"""Scale-hardened join strategies beyond what Catalyst picks on its
own: salting for shuffle-key skew, and bucketed range joins for
interval containment (which would otherwise fall back to a broadcast
nested-loop / cartesian plan).

These complement — not replace — AQE's skew-join splitting: AQE fixes
skew it can observe in shuffle files at runtime; salting fixes it by
construction when the skewed key set is known or the operator must
stay deterministic across reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def _salt_col(df: DataFrame, salt: int):
    """Per-row salt in [0, salt): xxhash64 over the row's columns MIXED
    with monotonically_increasing_id, so fully-duplicate rows (which a
    pure row-hash would co-locate — the pathological duplicate-heavy
    hot key) still spread across all salt partitions. The mono id is
    partition-id << 33 | row-offset — deterministic for a stable scan,
    so retries and speculative tasks still agree."""
    return F.pmod(
        F.xxhash64(F.monotonically_increasing_id(), *df.columns), F.lit(salt)
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: the big (skewed) side gets a
    deterministic per-row salt in [0, salt), the small side is
    replicated `salt` times, and the join key becomes (key, salt) —
    splitting each hot key's rows across `salt` shuffle partitions.

    Use when one side has hot keys too large for a single task and the
    other side is small enough to replicate `salt`× (but too big or
    too dynamic to broadcast outright). The salt is derived from a
    hash of the whole big-side row (xxhash64), not rand(), so retries
    and speculative tasks see identical assignments.

    At 100 TB: `salt` bounds the per-task share of the hottest key at
    1/salt of its rows; replication multiplies the small-side shuffle
    by `salt`, so pick salt ≈ (hottest-key rows / target task rows).
    """
    salted_big = big.withColumn("__salt", _salt_col(big, salt))
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    # Dataframe-qualified key refs: with identical key names on both sides
    # an unqualified F.col(key) == F.col(key) is ambiguous (or silently
    # self-compares); qualifying matches the __salt comparison's style.
    out = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return out.drop("__salt")


def range_bucket_join(
    facts: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (start <= point < end) via time
    bucketing: both sides are exploded/keyed to coarse buckets of
    `bucket_width` seconds, equi-joined on the bucket, then filtered
    by the exact range predicate.

    A raw `facts.join(intervals, point.between(start, end))` has no
    equi-key, so Spark plans a broadcast-nested-loop or cartesian —
    O(|facts|·|intervals|) compares. Bucketing restores a shuffle
    equi-join: each fact row joins only intervals overlapping its
    bucket. Cost is interval replication = ceil(span/bucket_width)
    copies — pick bucket_width near the median interval span so
    replication stays O(1) per interval.

    Timestamps are compared at epoch-second resolution on the bucket
    key and full resolution on the exact predicate.
    """
    point_s = F.unix_timestamp(F.col(point_col))
    start_s = F.unix_timestamp(F.col(start_col))
    end_s = F.unix_timestamp(F.col(end_col))

    # floor(), not cast("long"): casting truncates toward zero, so for
    # pre-1970 (negative-epoch) timestamps a fact and its containing
    # interval could land in different buckets and silently miss.
    f = facts.withColumn("__bucket", F.floor(point_s / bucket_width).cast("long"))
    iv = (
        intervals.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(start_s / bucket_width).cast("long"),
                    F.floor(end_s / bucket_width).cast("long"),
                )
            ),
        )
    )
    out = f.join(iv, "__bucket", how).where(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return out.drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str, l_end: str,
    r_start: str, r_end: str,
    bucket_width: int = 3600,
) -> DataFrame:
    """Interval×interval overlap join (half-open: l_start < r_end AND
    r_start < l_end) via the same time-bucketing trick as
    `range_bucket_join` — restoring an equi-key where Spark would
    otherwise plan a cartesian nested-loop.

    Both sides explode to the coarse buckets their span covers and
    equi-join on the bucket. A pair overlapping several buckets would
    match once per shared bucket; instead of a costly DISTINCT over
    the joined width, each pair is kept only in its canonical bucket —
    the bucket containing greatest(l_start, r_start), the overlap's
    first instant, which both sides provably cover. Replication per
    interval = ceil(span/bucket_width), so pick `bucket_width` near
    the median span; the join itself is an ordinary shuffle hash join
    on the bucket key.
    """
    def b(col):
        return F.floor(F.unix_timestamp(F.col(col)) / bucket_width).cast("long")

    lf = left.withColumn(
        "__bucket",
        F.explode(F.sequence(b(l_start), b(l_end))),
    )
    rf = right.withColumn(
        "__bucket",
        F.explode(F.sequence(b(r_start), b(r_end))),
    )
    canonical = F.floor(
        F.greatest(F.unix_timestamp(F.col(l_start)), F.unix_timestamp(F.col(r_start)))
        / bucket_width
    ).cast("long")
    return (
        lf.join(rf, "__bucket")
        .where(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("__bucket") == canonical)
        )
        .drop("__bucket")
    )


def blocked_fuzzy_pairs(df: DataFrame, id_col: str, name_col: str,
                        max_dist: int = 1, block_suffix: int = 2) -> DataFrame:
    """Entity-resolution fuzzy self-match: candidate pairs from a
    blocking key (the name minus its last `block_suffix` chars), scored
    with exact Levenshtein distance, kept at <= `max_dist`.

    Blocking is what makes fuzzy matching feasible at scale: the
    all-pairs O(n²) comparison collapses to an equi-join on the block
    key — shuffle-partitioned like any join, per-block work bounded by
    block size (here <= alphabet^suffix), independent of table size.
    Levenshtein runs only on within-block candidates. The same shape
    with phonetic/soundex or q-gram blocking keys covers the standard
    record-linkage recipes; Catalyst treats the substring expressions
    as ordinary equi-join keys.
    """
    # greatest(..., 1): names shorter than block_suffix+1 would collapse
    # to an empty-string block, lumping every short name into one
    # quadratic bucket and cross-matching unrelated strings. Keeping at
    # least the first char routes short names to per-prefix blocks.
    block = F.expr(
        f"substring({name_col}, 1, greatest(length({name_col}) - {block_suffix}, 1))"
    )
    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(name_col).alias("name_a"),
                  block.alias("__block_a"))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(name_col).alias("name_b"),
                  block.alias("__block_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, (F.col("__block_a") == F.col("__block_b"))
               & (F.col("id_a") < F.col("id_b")))
        .where(dist <= max_dist)
        .select("id_a", "id_b", "name_a", "name_b",
                dist.cast("long").alias("dist"))
        .orderBy("id_a", "id_b")
    )


def blocked_fuzzy_pairs_capped(df: DataFrame, id_col: str, name_col: str,
                               max_dist: int = 1, block_suffix: int = 2,
                               block_cap: int = 64) -> DataFrame:
    """Skew-armored `blocked_fuzzy_pairs` — the shape that survives an
    adversarial block at 100 TB. Blocking bounds per-block work ONLY
    while blocks stay small: a corpus where millions of records share
    a name prefix (placeholder names, templated accounts — the
    entity-resolution analog of the viral LSH bucket) collapses into
    one block and the equi-join emits B(B-1)/2 candidates.

    Reuses the shared hot-bucket armor `llm.capped_bucket_pairs`
    (operators/llm.py): blocks at or under `block_cap` keep the exact
    all-pairs candidates; larger blocks emit only their id-sorted
    consecutive chain (B-1 pairs). Names shed before the pair shuffle
    and rejoin after (the payload-shedding move of the capped
    embedding screen); every candidate — chain or all-pairs — still
    passes the exact Levenshtein verification, so capped output is
    always a subset of the uncapped verified pairs, identical to it
    when no block exceeds the cap.
    """
    from hive_exporter_spark.operators.llm import capped_bucket_pairs

    block = F.expr(
        f"substring({name_col}, 1, greatest(length({name_col}) - {block_suffix}, 1))"
    )
    keyed = df.select(F.col(id_col).alias("__id"), block.alias("__block"))
    cand = capped_bucket_pairs(keyed, ["__block"], "__id", block_cap)
    names = df.select(F.col(id_col).alias("__id"),
                      F.col(name_col).alias("__name"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        cand.join(names.withColumnRenamed("__id", "doc_a")
                  .withColumnRenamed("__name", "name_a"), "doc_a")
        .join(names.withColumnRenamed("__id", "doc_b")
              .withColumnRenamed("__name", "name_b"), "doc_b")
        .where(dist <= max_dist)
        .select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"),
                "name_a", "name_b", dist.cast("long").alias("dist"))
        .orderBy("id_a", "id_b")
    )
