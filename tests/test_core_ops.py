"""Unit tests for the relational core (SURVEY.md §2.3/2.5/2.6),
including a replay of the reference's incremental-merge narrative
(tests/test_incremental_merge.py in the reference) on synthesized
DataFrames — counts AND winning values (the reference only checked
counts; SURVEY.md §5)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from hive_exporter_spark.operators import core

SCHEMA = "id int, value string, last_modified timestamp, created timestamp, date string, deleted int"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_tag_batch_constant(spark):
    df = spark.range(3)
    tagged = core.tag_batch(df, "20260101T000000")
    tags = [r["dl_ingest_date"] for r in tagged.collect()]
    assert tags == ["20260101T000000"] * 3


def test_high_water_mark_and_newer_than(spark):
    df = spark.range(10).withColumnRenamed("id", "x")
    assert core.high_water_mark(df, "x") == 9
    assert core.newer_than(df, "x", 7).count() == 2
    # None watermark (empty destination) passes everything through
    assert core.newer_than(df, "x", None).count() == 10
    empty = df.where(F.col("x") < 0)
    assert core.high_water_mark(empty, "x") is None


def test_newer_or_modified_disjunction(spark):
    t = datetime(2024, 1, 5)
    df = _rows(spark, [
        (1, "a", datetime(2024, 1, 1), t, "d", None),   # old, unmodified
        (2, "b", datetime(2024, 1, 9), t, "d", None),   # old id, modified
        (6, "c", None, t, "d", None),                    # new id, NULL last_modified
    ])
    out = core.newer_or_modified(df, "id", 5, "last_modified", datetime(2024, 1, 5))
    got = sorted(r["id"] for r in out.collect())
    assert got == [2, 6]


def test_merge_narrative_counts_and_values(spark):
    """Reference narrative: 10 rows -> +1 NULL-last_modified row ->
    update id=3 -> count stays 11 and value 'K' wins."""
    t0 = datetime(2024, 1, 1)
    base = _rows(spark, [
        (i, chr(65 + i), t0, t0, "2024-01-01", None) for i in range(10)
    ])
    # new row with NULL last_modified must still be ingested
    inc1 = _rows(spark, [(11, "X", None, t0, "2024-01-02", None)])
    m1 = core.merge_upsert(base, inc1, ["id"], "last_modified",
                           tiebreakers=["created"], deleted_column="deleted")
    assert m1.count() == 11
    # update id=3: latest wins
    t1 = datetime(2024, 2, 1)
    inc2 = _rows(spark, [(3, "K", t1, t1, "2024-02-01", None)])
    m2 = core.merge_upsert(m1, inc2, ["id"], "last_modified",
                           tiebreakers=["created"], deleted_column="deleted")
    assert m2.count() == 11
    assert m2.where(F.col("id") == 3).first()["value"] == "K"
    # NULL last_modified loses to any non-NULL version (desc => nulls last)
    inc3 = _rows(spark, [(3, "OLD", None, t1, "2024-02-02", None)])
    m3 = core.merge_upsert(m2, inc3, ["id"], "last_modified",
                           tiebreakers=["created"], deleted_column="deleted")
    assert m3.where(F.col("id") == 3).first()["value"] == "K"


def test_merge_soft_delete(spark):
    t0 = datetime(2024, 1, 1)
    t1 = datetime(2024, 2, 1)
    base = _rows(spark, [(1, "a", t0, t0, "d", None), (2, "b", t0, t0, "d", None)])
    tomb = _rows(spark, [(2, "b", t1, t1, "d", 1)])
    out = core.merge_upsert(base, tomb, ["id"], "last_modified",
                            deleted_column="deleted")
    assert [r["id"] for r in out.collect()] == [1]


def test_latest_per_key_composite_keys(spark):
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    df = spark.createDataFrame(
        [(1, "x", t0, "old"), (1, "x", t1, "new"), (1, "y", t0, "other")],
        "k1 int, k2 string, ts timestamp, v string",
    )
    out = core.latest_per_key(df, ["k1", "k2"], "ts")
    got = {(r["k1"], r["k2"]): r["v"] for r in out.collect()}
    assert got == {(1, "x"): "new", (1, "y"): "other"}


def test_bounds(spark):
    df = spark.range(5, 42).withColumnRenamed("id", "c")
    assert core.bounds(df, "c") == (5, 41)


def test_reconcile_counts(spark):
    src = spark.range(10)
    ing = spark.range(4)
    dst = spark.range(10)
    rep = core.reconcile_counts(src, ing, dst)
    assert rep == {"source_count": 10, "ingested_count": 4, "destination_count": 10}


def test_stratified_sample_fractions_and_determinism(spark, sf_dir):
    from hive_exporter_spark.operators.core import stratified_sample
    from hive_exporter_spark.sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    fr = {"click": 0.1, "view": 0.2, "purchase": 1.0}
    s1 = stratified_sample(ev, "event_type", fr, seed=42)
    s2 = stratified_sample(ev, "event_type", fr, seed=42)
    ids1 = {r["event_id"] for r in s1.select("event_id").collect()}
    ids2 = {r["event_id"] for r in s2.select("event_id").collect()}
    assert ids1 == ids2, "same seed must give identical samples"
    base = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["event_type"]: r["n"] for r in
           s1.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("purchase") == base["purchase"]
    for t, frac in (("click", 0.1), ("view", 0.2)):
        if t in base and base[t] > 100:
            ratio = got.get(t, 0) / base[t]
            assert abs(ratio - frac) < 0.1, (t, ratio)
    others = set(base) - set(fr)
    assert all(t not in got for t in others)


def test_stratified_sample_hash_rates_and_rerun_stability(spark, sf_dir):
    from hive_exporter_spark.operators.core import stratified_sample_hash
    from hive_exporter_spark.sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    fr = {"click": 0.1, "view": 0.2, "purchase": 1.0}
    s1 = stratified_sample_hash(ev, "event_type", fr, "event_id")
    ids1 = {r["event_id"] for r in s1.select("event_id").collect()}
    ids2 = {r["event_id"] for r in
            stratified_sample_hash(ev, "event_type", fr, "event_id")
            .select("event_id").collect()}
    assert ids1 == ids2 and len(ids1) > 0
    base = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["event_type"]: r["n"] for r in
           s1.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("purchase") == base["purchase"]
    for t, frac in (("click", 0.1), ("view", 0.2)):
        if t in base and base[t] > 100:
            assert abs(got.get(t, 0) / base[t] - frac) < 0.1
    assert all(t not in got for t in set(base) - set(fr))


def test_snapshot_diff_change_classes(spark):
    from hive_exporter_spark.operators.core import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 unchanged (absent); 2 changed (s); 3 changed (NULL->30, null-safe);
    # 4 removed; 5 added
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_scd2_intervals_collapse_and_current(spark):
    from hive_exporter_spark.operators.core import scd2_intervals

    rows = [
        (1, 1, "x"), (1, 2, "x"), (1, 3, "y"), (1, 4, "x"),
        (2, 1, None), (2, 2, None), (2, 3, "z"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = scd2_intervals(df, ["user_id"], "ts", ["event_type"]).collect()
    by_user = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["valid_from"])):
        by_user.setdefault(r["user_id"], []).append(
            (r["event_type"], r["valid_from"], r["valid_to"], r["is_current"])
        )
    assert by_user[1] == [("x", 1, 3, False), ("y", 3, 4, False), ("x", 4, None, True)]
    # first version survives even with NULL attribute; NULL run collapses
    assert by_user[2] == [(None, 1, 3, False), ("z", 3, None, True)]


def test_snapshot_diff_null_first_key(spark):
    """A NULL in the first key column must not be misread as row
    absence (ADVICE r1): presence comes from literal markers, so a
    NULL-keyed row present in both snapshots but changed is 'changed',
    not 'added'."""
    from hive_exporter_spark.operators.core import snapshot_diff

    old = spark.createDataFrame([(None, 1, "x"), (2, 2, "y")],
                                "k1 int, k2 int, v string")
    new = spark.createDataFrame([(None, 1, "CHANGED"), (2, 2, "y")],
                                "k1 int, k2 int, v string")
    got = {(r["k1"], r["k2"]): r["change_type"]
           for r in snapshot_diff(old, new, ["k1", "k2"]).collect()}
    assert got == {(None, 1): "changed"}


def test_asof_join_directions(spark):
    """Backward takes the latest right row <= left ts; forward the
    earliest >= — ties visible in both; no match -> NULL payload."""
    from hive_exporter_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 20), (3, "k", 35)],
        "lid int, k string, lts int")
    right = spark.createDataFrame(
        [("k", 10, "r10"), ("k", 30, "r30")], "k string, rts int, tag string")
    back = {r["lid"]: r["asof_tag"] for r in asof_join(
        left, right, ["k"], "lts", "rts", ["tag"]).collect()}
    fwd = {r["lid"]: r["asof_tag"] for r in asof_join(
        left, right, ["k"], "lts", "rts", ["tag"],
        direction="forward").collect()}
    assert back == {1: "r10", 2: "r10", 3: "r30"}
    assert fwd == {1: "r10", 2: "r30", 3: None}


def test_plan_size_and_partition_advisor(spark, sf_dir):
    from hive_exporter_spark.operators.profile import (
        plan_size_bytes, suggest_shuffle_partitions)
    from hive_exporter_spark.sources.files import read_table

    li = read_table(spark, sf_dir, "lineitem")
    size = plan_size_bytes(li)
    assert size > 0
    # tiny target -> many partitions, scaled to the estimate
    n = suggest_shuffle_partitions(li, target_partition_bytes=1024)
    assert n == (size + 1023) // 1024
    # huge target -> clamps to the floor
    assert suggest_shuffle_partitions(li, target_partition_bytes=1 << 40) == 1
    # column pruning shrinks the estimate the advisor sees
    assert plan_size_bytes(li.select("l_orderkey")) < size


def test_event_anomaly_zscore_flags_injected_spike(spark, sf_dir):
    """Inject a 50x single-day spike for one event type; it must be
    flagged, and z must be NULL for the first day (empty trail)."""
    from hive_exporter_spark.operators.sessions import event_anomaly_zscore
    from hive_exporter_spark.sources.files import read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events").select("ts", "event_type")
    spike_day = ev.agg(F.date_trunc("day", F.max("ts"))).first()[0]
    spike = spark.range(5000).select(
        F.lit(spike_day).alias("ts"), F.lit("click").alias("event_type"))
    out = event_anomaly_zscore(ev.unionByName(spike))
    rows = {(r["day"], r["event_type"]): r for r in out.collect()}
    flagged = [r for r in rows.values() if r["is_anomaly"]]
    assert any(r["day"] == spike_day and r["event_type"] == "click"
               for r in flagged)
    first_day = min(d for d, _ in rows)
    assert all(rows[(first_day, t)]["z"] is None
               for t in {k[1] for k in rows if k[0] == first_day})


def test_topk_per_group_two_phase_equals_window(spark, sf_dir):
    """The two-phase grouped top-k must return exactly the plain
    ranking window's rows for any salt split."""
    from hive_exporter_spark.operators.relational import (
        top_orders_per_priority, top_orders_per_priority_2p)
    from hive_exporter_spark.sources.files import read_table

    orders = read_table(spark, sf_dir, "orders")
    a = top_orders_per_priority(orders, k=3)
    b = top_orders_per_priority_2p(orders, k=3)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_topk_per_group_rejects_bad_k(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F
    from hive_exporter_spark.operators.relational import topk_per_group
    from hive_exporter_spark.sources.files import read_table

    orders = read_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        topk_per_group(orders, ["o_orderpriority"],
                       [F.col("o_totalprice").desc(), "o_orderkey"], 0)


def test_event_anomaly_mad_resists_masking(spark, sf_dir):
    """The robust detector's reason to exist: inject TWO spike days —
    a monster (300x) and a moderate (4x). The monster must not mask
    the moderate one (the classic mean/std failure: one huge outlier
    inflates sigma until real anomalies vanish), and the flat baseline
    days must not be flagged."""
    from hive_exporter_spark.operators.sessions import event_anomaly_mad
    from hive_exporter_spark.sources.files import read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events").select("ts", "event_type")
    days = sorted(d[0] for d in ev.select(
        F.date_trunc("day", "ts").alias("d")).distinct().collect())
    base = ev.where(F.col("event_type") == "click").count() // len(days)
    monster = spark.range(base * 300).select(
        F.lit(days[-1]).alias("ts"), F.lit("click").alias("event_type"))
    moderate = spark.range(base * 3).select(
        F.lit(days[-2]).alias("ts"), F.lit("click").alias("event_type"))
    out = event_anomaly_mad(ev.unionByName(monster).unionByName(moderate))
    rows = {(r["day"], r["event_type"]): r for r in out.collect()}
    assert rows[(days[-1], "click")]["is_anomaly"]
    assert rows[(days[-2], "click")]["is_anomaly"]  # not masked
    n_click_flags = sum(1 for (d, t), r in rows.items()
                        if t == "click" and r["is_anomaly"])
    assert n_click_flags <= 4  # baseline days stay quiet


def test_event_anomaly_mad_flat_series_yields_null(spark):
    """MAD = 0 (constant daily counts) must yield NULL robust_z and
    False flags, not a division blowup."""
    import datetime

    from hive_exporter_spark.operators.sessions import event_anomaly_mad

    rows = [(datetime.datetime(2026, 1, 1 + d, 0, 0, i), "flat")
            for d in range(5) for i in range(3)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = event_anomaly_mad(df).collect()
    assert len(out) == 5
    assert all(r["robust_z"] is None and not r["is_anomaly"] for r in out)


def test_sample_fixed_n_exact_quota_and_determinism(spark, sf_dir):
    """Exactly n rows per stratum (all rows when the stratum is
    smaller), identical across reruns, and equal to the n smallest
    md5 hashes per stratum (uniform order statistic)."""
    from hive_exporter_spark.functions.rand import md5_int40
    from hive_exporter_spark.operators.core import sample_fixed_n
    from hive_exporter_spark.sources.files import read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id")
    got = sample_fixed_n(ev, "event_type", "event_id", 15).collect()
    per = {}
    for r in got:
        per.setdefault(r["event_type"], set()).add(r["event_id"])
    sizes = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    for t, ids in per.items():
        assert len(ids) == min(15, sizes[t])
    # rerun identical
    again = sample_fixed_n(ev, "event_type", "event_id", 15).collect()
    assert {(r["event_type"], r["event_id"]) for r in again} == \
           {(r["event_type"], r["event_id"]) for r in got}
    # matches the brute-force n smallest hashes for one stratum
    t0 = sorted(per)[0]
    want = [r["event_id"] for r in
            ev.where(F.col("event_type") == t0)
            .select("event_id", md5_int40("event_id").alias("h"))
            .orderBy("h", "event_id").limit(15).collect()]
    assert per[t0] == set(want)


def test_conversion_funnel_within_horizon_cuts_late_conversions(spark):
    """User A converts fully inside the horizon; user B's purchase
    lands after the 7-day horizon (counted by the unbounded funnel,
    not by the windowed one); user C acts out of order."""
    import datetime as dt

    from hive_exporter_spark.operators.sessions import (
        conversion_funnel, conversion_funnel_within)

    t = lambda d, h=0: dt.datetime(2026, 1, 1 + d, h)  # noqa: E731
    rows = [
        # A: signup d0 -> view d1 -> click d2 -> purchase d3 (all in)
        (1, t(0), "signup"), (1, t(1), "view"),
        (1, t(2), "click"), (1, t(3), "purchase"),
        # B: signup d0 -> view d1 -> click d2 -> purchase d20 (late)
        (2, t(0), "signup"), (2, t(1), "view"),
        (2, t(2), "click"), (2, t(20), "purchase"),
        # C: view BEFORE signup only -> depth 1 (anchor exists, view
        # never re-occurs after it)
        (3, t(0), "view"), (3, t(1), "signup"),
    ]
    ev = spark.createDataFrame(
        [(u, ts, et, 0.0) for u, ts, et in rows],
        "user_id long, ts timestamp, event_type string, value double")
    bounded = {r["step_no"]: r["n_users"]
               for r in conversion_funnel_within(ev).collect()}
    unbounded = {r["step_no"]: r["n_users"]
                 for r in conversion_funnel(ev).collect()}
    assert bounded[1] == 3          # all three signed up
    assert bounded[2] == 2          # A, B viewed in order within window
    assert bounded[3] == 2
    assert bounded.get(4, 0) == 1   # only A purchased inside horizon
    assert unbounded.get(4, 0) == 2  # the unbounded funnel credits B


def test_event_transition_matrix_rows_are_distributions(spark, sf_dir):
    """Per-source probabilities sum to 1; counts are consistent with
    a hand computation on a tiny crafted sequence."""
    import datetime as dt

    from hive_exporter_spark.operators.sessions import (
        event_transition_matrix)
    from hive_exporter_spark.sources.files import read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events")
    rows = event_transition_matrix(ev).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["from_type"], 0.0)
        per_src[r["from_type"]] += r["p_transition"]
    assert all(abs(s - 1.0) < 1e-4 for s in per_src.values()), per_src
    # crafted: a->b->b->a for one user
    t = lambda i: dt.datetime(2026, 1, 1, i)  # noqa: E731
    tiny = spark.createDataFrame(
        [(1, t(0), 10, "a", 0.0), (1, t(1), 11, "b", 0.0),
         (1, t(2), 12, "b", 0.0), (1, t(3), 13, "a", 0.0)],
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value double")
    got = {(r["from_type"], r["to_type"]): r["n_transitions"]
           for r in event_transition_matrix(tiny).collect()}
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 1}


def test_rfm_scores_rank_heavy_buyers_highest(spark, sf_dir):
    """Monotonicity: the user with max monetary must hold m_score 5;
    a user with zero purchases holds f_score 1 and m_score 1; scores
    stay in [1, 5] and rfm composes digits."""
    from hive_exporter_spark.operators.sessions import rfm_scores
    from hive_exporter_spark.sources.files import read_table

    rows = rfm_scores(read_table(spark, sf_dir, "events")).collect()
    assert rows
    top_money = max(rows, key=lambda r: r["monetary"])
    assert top_money["m_score"] == 5
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["rfm"] == r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]
        if r["frequency"] == 0:
            assert r["f_score"] == 1 and r["monetary"] == 0.0


def test_sessionized_transitions_drop_cross_session_pairs(spark):
    """A pair separated by more than the session gap must not count;
    within-gap pairs must match the unsessionized matrix."""
    import datetime as dt

    from hive_exporter_spark.operators.sessions import (
        event_transition_matrix, event_transition_matrix_sessionized)

    rows = [
        (1, dt.datetime(2026, 1, 1, 10, 0), 1, "a", 0.0),
        (1, dt.datetime(2026, 1, 1, 10, 10), 2, "b", 0.0),  # in gap
        (1, dt.datetime(2026, 1, 2, 10, 0), 3, "c", 0.0),   # next day
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string, value double")
    sess = {(r["from_type"], r["to_type"])
            for r in event_transition_matrix_sessionized(ev).collect()}
    full = {(r["from_type"], r["to_type"])
            for r in event_transition_matrix(ev).collect()}
    assert sess == {("a", "b")}
    assert full == {("a", "b"), ("b", "c")}


def test_time_to_convert_stats_on_crafted_timeline(spark):
    """Two converted users (1 day and 2 days anchor-to-purchase) and
    one non-converter: count 2, min 86400s, max 172800s."""
    import datetime as dt

    from hive_exporter_spark.operators.sessions import (
        time_to_convert_stats)

    t = lambda d, h=0: dt.datetime(2026, 1, 1 + d, h)  # noqa: E731
    rows = []
    for u, final_day in ((1, 1), (2, 2)):
        rows += [(u, t(0), "signup"), (u, t(0, 6), "view"),
                 (u, t(0, 12), "click"), (u, t(final_day), "purchase")]
    rows += [(3, t(0), "signup")]
    ev = spark.createDataFrame(
        [(u, ts, et, 0.0) for u, ts, et in rows],
        "user_id long, ts timestamp, event_type string, value double")
    (r,) = time_to_convert_stats(ev).collect()
    assert r["n_converted"] == 2
    assert r["min_secs"] == 86400.0
    assert r["max_secs"] == 172800.0
    assert 86400.0 <= r["median_secs"] <= 172800.0


def test_validate_events_contract_flags_injected_violations(spark, sf_dir):
    """Clean fixture passes every rule; injecting a duplicate id, a
    negative value, an unknown type, and malformed props flips exactly
    those rules with exact violation counts."""
    import datetime as dt

    from hive_exporter_spark.operators.profile import (
        validate_events_contract)
    from hive_exporter_spark.sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    clean = {r["rule"]: r for r in validate_events_contract(ev).collect()}
    assert all(r["passed"] for r in clean.values()), clean
    assert clean["event_id_not_null"]["n_checked"] == ev.count()

    bad = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5), 7, "click", -5.0, "not json"),
         (1, dt.datetime(2019, 1, 5), 8, "weird", 1.0, "{\"k\": 1}"),
         # all-NULL payload: type/value/props rules must flag it, not
         # let three-valued logic fall through to "clean"
         (2, dt.datetime(2024, 1, 6), 9, None, None, None)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    dirty = {r["rule"]: r for r in validate_events_contract(
        ev.unionByName(bad)).collect()}
    # ids 1 and 2 each appear once in the fixture + injected copies
    assert dirty["event_id_unique"]["n_violations"] == 3
    assert dirty["value_non_negative"]["n_violations"] == 2
    assert dirty["event_type_in_enum"]["n_violations"] == 2
    assert dirty["props_object_shaped"]["n_violations"] == 2
    assert dirty["ts_after_floor"]["n_violations"] == 1
    assert not dirty["event_id_unique"]["passed"]


def test_top_event_paths_session_cut_and_counts(spark):
    """Paths must respect session gaps and count exact trigrams."""
    import datetime as dt

    from hive_exporter_spark.operators.sessions import top_event_paths

    t = lambda m: dt.datetime(2026, 1, 1, 10, m)  # noqa: E731
    rows = [
        (1, t(0), 1, "view"), (1, t(1), 2, "click"), (1, t(2), 3, "purchase"),
        (2, t(0), 4, "view"), (2, t(1), 5, "click"), (2, t(2), 6, "purchase"),
        # user 3: same shape but a >30min gap before purchase
        (3, t(0), 7, "view"), (3, t(1), 8, "click"),
        (3, dt.datetime(2026, 1, 1, 12, 0), 9, "purchase"),
    ]
    ev = spark.createDataFrame(
        [(u, ts, e, et, 0.0) for u, ts, e, et in rows],
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value double")
    got = {r["path"]: r["n_paths"] for r in top_event_paths(ev).collect()}
    assert got == {"view > click > purchase": 2}


def test_decayed_activity_recency_beats_volume(spark):
    """A user active 10x yesterday must outrank one active 30x ten
    half-lives ago, and the self-similarity property must hold:
    advancing the clock one half-life halves every score."""
    import datetime as dt

    from hive_exporter_spark.operators.sessions import (
        decayed_user_activity)

    t0 = dt.datetime(2026, 3, 1)
    rows = [(1, t0, i, "click", 0.0) for i in range(10)]
    rows += [(2, t0 - dt.timedelta(days=70), 100 + i, "click", 0.0)
             for i in range(30)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string, value double")
    got = {r["user_id"]: r["decayed_score"]
           for r in decayed_user_activity(ev).collect()}
    assert got[1] > got[2]
    assert got[1] == 10.0                  # bucket 0: full weight
    assert got[2] == 30.0 / 1024           # 10 half-lives: /2^10
    # advance the reference day one half-life via a dummy newer event
    bumped = ev.unionByName(spark.createDataFrame(
        [(99, t0 + dt.timedelta(days=7), 999, "view", 0.0)],
        ev.schema))
    later = {r["user_id"]: r["decayed_score"]
             for r in decayed_user_activity(bumped).collect()}
    assert later[1] == got[1] / 2 and later[2] == got[2] / 2


def test_pagerank_matches_sequential_integer_replay(spark):
    """The distributed fixed-point PageRank must reproduce a pure-
    Python replay of the same integer recurrence on a crafted graph,
    and the scaled ranks must sum to ≤ 1.0 with bounded dangling
    loss."""
    import datetime as dt

    from hive_exporter_spark.operators.sessions import (
        PAGERANK_D_DEN, PAGERANK_D_NUM, PAGERANK_PSCALE, PAGERANK_SCALE,
        event_transition_pagerank)

    # u1: a->b->a->b ; u2: a->c ; c is dangling (no outgoing edge)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i, (u, ty) in enumerate([(1, "a"), (1, "b"), (1, "a"), (1, "b"),
                                 (2, "a"), (2, "c")]):
        rows.append((i, u, t0 + dt.timedelta(minutes=i), ty))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r["event_type"]: r["pagerank_scaled"]
           for r in event_transition_pagerank(ev).collect()}

    # sequential replay of the documented recurrence
    edges = {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1}
    n_out = {"a": 3, "b": 1}
    p = {e: (n * PAGERANK_PSCALE) // n_out[e[0]] for e, n in edges.items()}
    nodes = ["a", "b", "c"]
    tele = ((PAGERANK_D_DEN - PAGERANK_D_NUM) * PAGERANK_SCALE) // (
        PAGERANK_D_DEN * len(nodes))
    r = {v: PAGERANK_SCALE // len(nodes) for v in nodes}
    for _ in range(3):
        nxt = {v: tele for v in nodes}
        for (u, v), pv in p.items():
            nxt[v] += (PAGERANK_D_NUM * ((r[u] * pv) // PAGERANK_PSCALE)
                       ) // PAGERANK_D_DEN
        r = nxt
    assert got == r, (got, r)
    total = sum(got.values()) / PAGERANK_SCALE
    assert 0.5 < total <= 1.0  # dangling mass dropped, never created
    # 'a' ranks highest: b returns ALL its mass to a each round,
    # while a splits 2/3 to b and 1/3 to dangling c
    assert got["a"] == max(got.values())
    assert got["c"] == min(got.values())


def test_stratified_sample_report_verdicts_and_flip(spark, sf_dir, monkeypatch):
    """The fraction auditor's verdict booleans must be TRUE for the
    real samplers and must FLIP when the band is squeezed — a live
    contract, not a constant (VERDICT r5 item 2)."""
    from hive_exporter_spark.sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    fr = {"click": 0.1, "view": 0.2, "purchase": 1.0}
    rows = core.stratified_sample_report(ev, "event_type", fr, "event_id").collect()
    by = {r["event_type"]: r for r in rows}
    base = {r["event_type"] for r in ev.select("event_type").distinct().collect()}
    assert set(by) == base  # unsampled strata appear at frac 0, kept 0
    assert all(r["hash_frac_ok"] and r["rng_frac_ok"] for r in rows), rows
    for t, f in fr.items():
        assert by[t]["expected_frac"] == f
    assert by["purchase"]["n_hash_kept"] == by["purchase"]["n_total"]
    for t in base - set(fr):
        assert by[t]["expected_frac"] == 0.0 and by[t]["n_hash_kept"] == 0
    monkeypatch.setattr(core, "SAMPLE_TOL_SD", 0.0)
    flipped = core.stratified_sample_report(ev, "event_type", fr, "event_id").collect()
    assert any(not (r["hash_frac_ok"] and r["rng_frac_ok"]) for r in flipped), flipped


def test_approx_stats_error_report_verdicts_and_flip(spark, sf_dir, monkeypatch):
    """Exact columns match the exact operators; sketch verdicts are
    TRUE at default tolerance and FLIP when the tolerance is made
    impossible — proving the booleans are computed, not pinned."""
    from hive_exporter_spark.operators import relational
    from hive_exporter_spark.sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    rows = relational.approx_stats_error_report(ev).collect()
    assert rows and all(r["users_within_tol"] and r["p50_within_tol"]
                        for r in rows), rows
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("n")).collect()}
    assert {r["event_type"]: r["exact_users"] for r in rows} == exact
    monkeypatch.setattr(relational, "APPROX_USERS_TOL", -1.0)
    monkeypatch.setattr(relational, "APPROX_P50_TOL", -1.0)
    flipped = relational.approx_stats_error_report(ev).collect()
    assert all(not r["users_within_tol"] for r in flipped), flipped


def test_approx_stats_error_report_all_null_group_visible(spark, sf_dir):
    """An event_type whose `value` is entirely NULL must stay VISIBLE
    in the audit — exact_p50 NULL, p50 verdict vacuously TRUE — not
    silently vanish from the report (ADVICE r7: a dropped group masks
    missing instrumentation)."""
    from hive_exporter_spark.operators import relational
    from hive_exporter_spark.sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    nullish = ev.withColumn(
        "value",
        F.when(F.col("event_type") == "click", F.lit(None).cast("double"))
        .otherwise(F.col("value")))
    rows = {r["event_type"]: r for r in
            relational.approx_stats_error_report(nullish).collect()}
    all_types = {r["event_type"] for r in
                 ev.select("event_type").distinct().collect()}
    assert set(rows) == all_types
    assert rows["click"]["exact_p50"] is None
    assert rows["click"]["p50_within_tol"] is True
    assert rows["click"]["exact_users"] > 0


def test_k_anonymity_report_counts_and_verdict(spark):
    """Risky mass counted exactly; verdict computed from the budget,
    not pinned; k is respected (size == k is SAFE, < k is risky)."""
    from hive_exporter_spark.operators.profile import k_anonymity_report

    # groups: (a,x) size 5, (a,y) size 2, (b,x) size 1 -> 3 risky rows of 8
    rows = ([("a", "x")] * 5) + ([("a", "y")] * 2) + [("b", "x")]
    df = spark.createDataFrame(rows, "q1 string, q2 string")
    r = k_anonymity_report(df, ["q1", "q2"], k=5).collect()[0]
    assert r["n_rows"] == 8 and r["n_groups"] == 3
    assert r["min_group_size"] == 1
    assert r["n_risky_groups"] == 2 and r["n_risky_rows"] == 3
    assert r["risky_row_share"] == round(3 / 8, 6)
    assert r["k_anonymous_ok"] is False          # 0.375 > 0.05 budget

    # generous budget flips the verdict; k=1 means nothing is risky
    r = k_anonymity_report(df, ["q1", "q2"], k=5,
                           risk_budget=0.5).collect()[0]
    assert r["k_anonymous_ok"] is True
    r = k_anonymity_report(df, ["q1", "q2"], k=1).collect()[0]
    assert r["n_risky_rows"] == 0 and r["k_anonymous_ok"] is True

    # empty input: verdict FALSE-safe, never a NULL boolean
    empty = spark.createDataFrame([], "q1 string, q2 string")
    r = k_anonymity_report(empty, ["q1", "q2"]).collect()[0]
    assert r["k_anonymous_ok"] is False and r["n_risky_rows"] == 0


def test_value_drift_psi_flips_on_shift(spark, sf_dir):
    """PSI near zero (verdict ok) when the two slices share a
    distribution; shifting the odd slice by 5x the range flips the
    verdict; psi_total reconciles with the per-bin terms."""
    from hive_exporter_spark.operators.relational import value_drift_psi
    from hive_exporter_spark.sources.files import read_table

    ev = read_table(spark, sf_dir, "events")
    rows = value_drift_psi(ev).collect()
    assert rows
    assert all(r["drift_ok"] for r in rows)
    total = round(sum(r["psi_term"] for r in rows), 6)
    assert round(rows[0]["psi_total"], 6) == total
    assert rows[0]["psi_total"] < 0.2

    hi = ev.agg(F.max("value")).collect()[0][0]
    shifted = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 2 == 1,
               F.col("value") + F.lit(5.0) * hi).otherwise(F.col("value")))
    bad = value_drift_psi(shifted).collect()
    assert all(not r["drift_ok"] for r in bad)
    assert bad[0]["psi_total"] > 0.2
