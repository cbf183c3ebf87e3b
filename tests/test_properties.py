"""Property-based tests (hypothesis) for the merge/watermark core —
the invariants that must hold for ANY input, not just the replayed
reference narratives."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hive_exporter_spark.operators import core

BASE_TS = datetime(2024, 1, 1)

# (id, version, value): version becomes last_modified = BASE_TS + version
# days; (id, version) pairs are deduplicated so latest-wins is well-defined.
rows_strategy = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8), st.integers(0, 100)),
    min_size=1, max_size=12, unique_by=lambda r: (r[0], r[1]),
)

SETTINGS = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, rows):
    data = [(i, BASE_TS + timedelta(days=v), x) for i, v, x in rows]
    return spark.createDataFrame(data, "id int, last_modified timestamp, value int")


@given(base=rows_strategy, inc=rows_strategy)
@SETTINGS
def test_merge_key_unique_and_latest_wins(spark, base, inc):
    merged = core.merge_upsert(_df(spark, base), _df(spark, inc), ["id"],
                               "last_modified", tiebreakers=["value"])
    out = merged.collect()
    ids = [r["id"] for r in out]
    assert len(ids) == len(set(ids)), "merge must leave one row per key"
    # the surviving version per key carries the max last_modified seen
    want = {}
    for i, v, x in base + inc:
        if i not in want or v > want[i]:
            want[i] = v
    got = {r["id"]: (r["last_modified"] - BASE_TS).days for r in out}
    assert {k: v for k, v in got.items()} == want


@given(rows=rows_strategy)
@SETTINGS
def test_merge_idempotent(spark, rows):
    df = _df(spark, rows)
    once = core.latest_per_key(df, ["id"], "last_modified", ["value"])
    twice = core.latest_per_key(once, ["id"], "last_modified", ["value"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=rows_strategy, wm=st.integers(-1, 9))
@SETTINGS
def test_newer_than_partitions_input(spark, rows, wm):
    """strict-> filter: kept ∪ dropped == input; kept are all > wm."""
    df = _df(spark, rows).withColumn("seq", F.col("value"))
    kept = core.newer_than(df, "seq", wm).collect()
    assert all(r["seq"] > wm for r in kept)
    n_dropped = len([r for r in rows if r[2] <= wm])
    assert len(kept) + n_dropped == len(rows)


# --- r3 additions: distributed rank / sharding / tail trim ---------------

from hive_exporter_spark.operators import pipeline  # noqa: E402

rank_rows = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 10**6)),
    min_size=1, max_size=40, unique_by=lambda r: r[1],
)


@given(rows=rank_rows)
@SETTINGS
def test_global_rank_matches_python_sort(spark, rows):
    df = spark.createDataFrame(rows, "v long, id long").repartition(5)
    got = {
        r["id"]: r["rank"]
        for r in pipeline.global_rank(df, [F.col("v"), F.col("id")]).collect()
    }
    want = {
        id_: i + 1
        for i, (v, id_) in enumerate(sorted(rows, key=lambda r: (r[0], r[1])))
    }
    assert got == want


@given(rows=rank_rows, n_shards=st.integers(2, 8))
@SETTINGS
def test_shard_by_tokens_is_partition(spark, rows, n_shards):
    docs = spark.createDataFrame(
        [(id_, "w " * max(v, 1)) for v, id_ in rows], "doc_id long, text string"
    )
    out = pipeline.shard_by_tokens(docs, n_shards=n_shards).collect()
    # Every doc exactly once; shard ids in range.
    assert sorted(r["doc_id"] for r in out) == sorted(id_ for _, id_ in rows)
    assert all(0 <= r["shard"] < n_shards for r in out)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 1000)),
        min_size=4, max_size=40,
    )
)
@SETTINGS
def test_trim_outliers_subset_and_tail_drop(spark, rows):
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "event_type string, value double"
    )
    kept = pipeline.trim_outliers(df, lo=0.25, hi=0.75).collect()
    # Subset of the input multiset.
    from collections import Counter
    assert not Counter((r["event_type"], r["value"]) for r in kept) - Counter(
        (g, float(v)) for g, v in rows
    )
    # A UNIQUE per-group max has percent_rank exactly 1.0 > 0.75 when
    # the group has >1 distinct value → must be dropped. (A TIED max
    # ranks at (first_rank-1)/(n-1) < 1.0 and may legitimately
    # survive: [0,0,1,1] puts the 1s at 2/3 ≤ 0.75 — hypothesis found
    # exactly this case.)
    for g in {g for g, _ in rows}:
        vals = [v for gg, v in rows if gg == g]
        if len(set(vals)) > 1 and vals.count(max(vals)) == 1:
            assert (g, float(max(vals))) not in {
                (r["event_type"], r["value"]) for r in kept
            }
