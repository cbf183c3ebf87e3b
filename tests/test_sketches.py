"""HLL sketch rollup tests: estimate accuracy vs exact distinct, and
losslessness of the daily-sketch merge (the pre-aggregation pattern's
correctness contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_exporter_spark.operators.sessions import (
    daily_distinct_users_hll, rolling_distinct_users,
)
from hive_exporter_spark.sources.files import read_table


def test_daily_hll_close_to_exact(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    est = {
        (r["day"], r["event_type"]): r["est_users"]
        for r in daily_distinct_users_hll(ev).collect()
    }
    exact = {
        (r["day"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        assert abs(e - exact[k]) <= max(2, 0.05 * exact[k]), (k, e, exact[k])


def test_rolling_merge_equals_direct_sketch(spark, sf_dir):
    """Merging daily sketches must estimate exactly what a single
    sketch over the whole stream estimates (merge is lossless)."""
    ev = read_table(spark, sf_dir, "events")
    merged = {
        r["event_type"]: r["est_users"]
        for r in rolling_distinct_users(ev).collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
             .cast("long").alias("est"))
        .collect()
    }
    assert merged == direct


def test_rolling_day_counts(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    n_days = ev.select(F.date_trunc("day", "ts")).distinct().count()
    for r in rolling_distinct_users(ev).collect():
        assert r["n_days"] <= n_days
        assert r["est_users"] > 0


# ---------------------------------------------------------------------------
# Portable sketches (operators/sketches.py): KMV + portable HLL
# ---------------------------------------------------------------------------

import pytest

from hive_exporter_spark.operators import sketches as sk


def _exact(ev, key="user_id"):
    return {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct(key).alias("n")).collect()
    }


def test_kmv_close_to_exact(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    exact = _exact(ev)
    got = {r["event_type"]: r["est_distinct"]
           for r in sk.kmv_distinct(ev, "user_id", ["event_type"]).collect()}
    assert set(got) == set(exact)
    for t, e in got.items():
        # k=64 -> relative std err ~ 1/sqrt(k-2) ~ 13%; allow 4 sigma.
        assert abs(e - exact[t]) <= max(3, 0.5 * exact[t]), (t, e, exact[t])


def test_kmv_exact_below_k(spark, sf_dir):
    """With fewer than k distinct keys the sketch degenerates to the
    exact distinct count."""
    ev = read_table(spark, sf_dir, "events")
    exact = _exact(ev)
    got = {r["event_type"]: (r["n_kept"], r["est_distinct"])
           for r in sk.kmv_distinct(
               ev, "user_id", ["event_type"], k=100_000).collect()}
    for t, (n_kept, est) in got.items():
        assert n_kept == exact[t]
        assert est == float(exact[t])


def test_kmv_merge_is_lossless(spark, sf_dir):
    """KMV of a union == re-pruned union of per-part KMV kept-sets.

    Exercised through the operator itself: running kmv over the
    concatenation of two disjoint halves must equal running it over
    the whole (the kept set is a pure function of the hash multiset)."""
    ev = read_table(spark, sf_dir, "events")
    half_a = ev.where(F.col("event_id") % 2 == 0)
    half_b = ev.where(F.col("event_id") % 2 == 1)
    direct = sk.kmv_distinct(ev, "user_id", ["event_type"])
    via_union = sk.kmv_distinct(half_a.unionByName(half_b),
                                "user_id", ["event_type"])
    assert direct.exceptAll(via_union).count() == 0
    assert via_union.exceptAll(direct).count() == 0


def test_kmv_rejects_bad_k(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        sk.kmv_distinct(ev, "user_id", ["event_type"], k=1)


def test_hll_close_to_exact_both_branches(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    # Small-cardinality groups (users ~ 150 at sf0.001): the linear
    # counting branch.
    exact_u = _exact(ev)
    got_u = {r["event_type"]: r["est_distinct"]
             for r in sk.hll_distinct(
                 ev, "user_id", ["event_type"]).collect()}
    for t, e in got_u.items():
        assert abs(e - exact_u[t]) <= max(3, 0.2 * exact_u[t]), (t, e)
    # High-cardinality key (event_id: unique per row): the raw
    # harmonic-mean branch (E > 2.5m).
    exact_i = _exact(ev, key="event_id")
    got_i = {r["event_type"]: r["est_distinct"]
             for r in sk.hll_distinct(
                 ev, "event_id", ["event_type"]).collect()}
    for t, e in got_i.items():
        assert abs(e - exact_i[t]) <= 0.3 * exact_i[t], (t, e, exact_i[t])


def test_hll_merge_equals_direct(spark, sf_dir):
    """Max-merging per-day register tables == sketching the raw stream
    (exact equality — mergeability is structural, not approximate)."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts"))
    daily = sk.hll_registers(ev, "user_id", ["day", "event_type"])
    merged = sk.hll_merge(
        [daily.where(F.col("day") <= "1995-01-15"),
         daily.where(F.col("day") > "1995-01-15")],
        ["day", "event_type"],
    ).groupBy("event_type", "bucket").agg(F.max("rho").alias("rho"))
    direct = sk.hll_registers(ev, "user_id", ["event_type"])
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_rejects_bad_p(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        sk.hll_registers(ev, "user_id", ["event_type"], p=2)


def test_cms_never_underestimates(spark, sf_dir):
    """Count-min's structural guarantee: est >= exact, overshoot
    bounded by the collision mass (N/width per row, min over rows)."""
    docs = read_table(spark, sf_dir, "documents")
    rows = sk.cms_token_freq(docs).collect()
    assert rows
    total = sum(r["cnt_exact"] for r in rows)
    for r in rows:
        assert r["cnt_cms"] >= r["cnt_exact"], r
        assert r["cnt_cms"] - r["cnt_exact"] <= max(
            10, total), r  # generous sanity cap; tight bound below
    # With vocab << width the expected overestimate is ~0: at least
    # half the top terms must be EXACT through the sketch.
    n_exact = sum(1 for r in rows if r["cnt_cms"] == r["cnt_exact"])
    assert n_exact >= len(rows) // 2, (n_exact, len(rows))


def test_cms_merge_is_additive(spark, sf_dir):
    """Summing per-half counter tables == the whole-corpus counters
    (sketch merge is cell-wise addition, exactly)."""
    from hive_exporter_spark.operators.llm import tokens_col
    docs = read_table(spark, sf_dir, "documents")
    counts = (docs.select(F.explode(tokens_col()).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("cnt")))
    whole = sk.cms_counters(counts, "token", "cnt")
    half_a = sk.cms_counters(counts.where(F.col("cnt") % 2 == 0),
                             "token", "cnt")
    half_b = sk.cms_counters(counts.where(F.col("cnt") % 2 == 1),
                             "token", "cnt")
    merged = (half_a.unionByName(half_b)
              .groupBy("row", "col").agg(F.sum("c").alias("c")))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_absent_key_estimate_is_collision_noise(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    from hive_exporter_spark.operators.llm import tokens_col
    counts = (docs.select(F.explode(tokens_col()).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("cnt")))
    counters = sk.cms_counters(counts, "token", "cnt")
    probe = spark.createDataFrame(
        [("zzqx_not_a_token",)], "token string")
    (est,) = sk.cms_lookup(counters, probe, "token").collect()
    total = counts.agg(F.sum("cnt")).collect()[0][0]
    # min over 4 rows of the collision mass: far under N/width * 4.
    assert 0 <= est["est_count"] <= max(10, 8 * total // sk.CMS_WIDTH)


def test_theta_overlap_exact_regime(spark):
    """Below k distinct keys the sketches are exact: overlap algebra
    must return the true intersection/union/Jaccard."""
    rows = ([(u, "a") for u in range(50)]
            + [(u, "b") for u in range(30, 80)])
    df = spark.createDataFrame(rows, "user_id long, grp string")
    (r,) = sk.theta_overlap(df, "user_id", "grp", k=256).collect()
    assert r["grp_a"] == "a" and r["grp_b"] == "b"
    assert r["est_intersection"] == 20.0
    assert r["est_union"] == 80.0
    assert r["est_jaccard"] == 0.25


def test_theta_overlap_estimates_at_small_k(spark, sf_dir):
    """Sampled regime: every event_type shares the same user base at
    sf0.001, so jaccard must be ~1 and intersection ~ the user count."""
    ev = read_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    rows = sk.theta_overlap(ev, "user_id", "event_type", k=32).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert r["est_jaccard"] >= 0.8, r
        assert abs(r["est_intersection"] - n_users) <= 0.6 * n_users, r
        assert r["est_union"] >= r["est_intersection"]


def test_theta_overlap_disjoint_groups(spark):
    rows = ([(u, "a") for u in range(200)]
            + [(u + 10_000, "b") for u in range(200)])
    df = spark.createDataFrame(rows, "user_id long, grp string")
    (r,) = sk.theta_overlap(df, "user_id", "grp", k=64).collect()
    assert r["n_common"] == 0
    assert r["est_intersection"] == 0.0 and r["est_jaccard"] == 0.0
    assert r["est_union"] > 200  # ~400 expected


def test_hist_quantiles_within_bin_width(spark, sf_dir):
    """Midpoint estimates must sit within half a bin width of the TRUE
    discrete quantile (the ceil(q*N)-th smallest value — the sketch's
    own rank definition; interpolated percentile() can legitimately
    sit bins away in sparse tails)."""
    import math

    ev = read_table(spark, sf_dir, "events")
    got = {(r["event_type"], r["q"]): r["est_value"]
           for r in sk.value_quantiles_hist(
               ev, "value", ["event_type"]).collect()}
    pdf = ev.select("event_type", "value").toPandas()
    for t, grp in pdf.groupby("event_type"):
        vals = sorted(grp["value"].tolist())
        lo, hi = vals[0], vals[-1]
        half_bin = (hi - lo) / sk.HIST_BINS / 2
        for q in sk.HIST_QS:
            exact = vals[math.ceil(q * len(vals)) - 1]
            est = got[(t, q)]
            assert abs(est - exact) <= half_bin + 1e-9, (
                t, q, est, exact, half_bin)


def test_hist_bins_merge_additively(spark, sf_dir):
    """Bin tables over disjoint halves (with SHARED edges) must sum to
    the whole-data bin table — the mergeability contract."""
    ev = read_table(spark, sf_dir, "events")
    whole = sk.histogram_bins(ev, "value", ["event_type"])
    # Merging requires shared [lo, hi]: freeze the global edges by
    # binning each half against the full data's min/max via union of
    # half + an empty-weight echo of the other... simpler and honest:
    # halves of the SAME distribution produce the same edges only by
    # luck, so merge bins built against identical edges — rebin each
    # half joined to the global edge table.
    edges = ev.groupBy("event_type").agg(
        F.min(F.col("value").cast("double")).alias("lo"),
        F.max(F.col("value").cast("double")).alias("hi"))
    halves = [ev.where(F.col("event_id") % 2 == i) for i in (0, 1)]

    def bins_with_edges(df):
        v = F.col("value").cast("double")
        raw = F.floor((v - F.col("lo")) / (F.col("hi") - F.col("lo"))
                      * F.lit(float(sk.HIST_BINS)))
        b = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(raw, F.lit(sk.HIST_BINS - 1))).cast("int")
        return (df.join(F.broadcast(edges), ["event_type"])
                .select("event_type", "lo", "hi", b.alias("bin"))
                .groupBy("event_type", "lo", "hi", "bin")
                .agg(F.count(F.lit(1)).alias("n")))

    merged = (bins_with_edges(halves[0]).unionByName(
        bins_with_edges(halves[1]))
        .groupBy("event_type", "lo", "hi", "bin")
        .agg(F.sum("n").alias("n")))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hist_quantiles_constant_group(spark):
    df = spark.createDataFrame([(1, "a", 5.0)] * 10,
                               "id long, grp string, v double")
    rows = sk.value_quantiles_hist(df, "v", ["grp"]).collect()
    assert rows and all(r["est_value"] == 5.0 for r in rows)


def test_sketch_state_answers_many_questions(spark, sf_dir, tmp_path):
    """The pre-aggregation narrative end-to-end: persist per-day HLL
    registers ONCE, then answer (a) all-time per-type distinct and
    (b) an arbitrary day-range distinct purely from the stored state —
    each exactly equal to sketching the raw stream for that scope."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts"))
    state_dir = str(tmp_path / "hll_state")
    sk.hll_registers(ev, "user_id", ["day", "event_type"]) \
        .write.parquet(state_dir)
    state = spark.read.parquet(state_dir)

    alltime = (state.groupBy("event_type", "bucket")
               .agg(F.max("rho").alias("rho")))
    direct = sk.hll_registers(ev, "user_id", ["event_type"])
    assert alltime.exceptAll(direct).count() == 0
    assert direct.exceptAll(alltime).count() == 0

    lohi = ("1995-01-05", "1995-01-20")
    ranged = (state.where(F.col("day").between(*lohi))
              .groupBy("event_type", "bucket")
              .agg(F.max("rho").alias("rho")))
    direct_ranged = sk.hll_registers(
        ev.where(F.col("day").between(*lohi)),
        "user_id", ["event_type"])
    assert ranged.exceptAll(direct_ranged).count() == 0
    assert direct_ranged.exceptAll(ranged).count() == 0


def test_sketches_ignore_null_keys_and_values(spark):
    """NULL keys/values must be excluded, not silently mis-binned:
    Spark sorts NULL first and DuckDB last, so a surviving NULL hash
    would split the engines; least(NULL, n-1) would dump NULL values
    into a histogram's top bin in BOTH engines (oracle-blind)."""
    rows = [(u, "a", float(u)) for u in range(20)] + [
        (None, "a", None), (None, "a", None)]
    df = spark.createDataFrame(rows, "user_id long, grp string, v double")
    (kmv,) = sk.kmv_distinct(df, "user_id", ["grp"]).collect()
    assert kmv["n_kept"] == 20 and kmv["est_distinct"] == 20.0
    (hll,) = sk.hll_distinct(df, "user_id", ["grp"]).collect()
    assert hll["n_buckets"] <= 20
    binned = sk.histogram_bins(df, "v", ["grp"])
    assert binned.agg(F.sum("n")).collect()[0][0] == 20
    top = binned.orderBy(F.col("bin").desc()).first()
    assert top["n"] == 1  # only v=19.0, not the two NULLs


def test_superspreaders_find_heaviest_entities(spark):
    """An entity with 8x the distinct keys of the crowd must rank
    first, and its p=4 estimate must be within HLL-coarse tolerance."""
    rows = [(u, f"k{d}") for u in range(10) for d in range(5)]
    rows += [(99, f"k{d}") for d in range(40)]
    df = spark.createDataFrame(rows, "user_id long, key string")
    got = sk.superspreaders(df, "user_id", "key", top_n=3).collect()
    assert got[0]["user_id"] == 99
    assert abs(got[0]["est_distinct_keys"] - 40) <= 16  # m=16: +-26%


def test_ams_f2_estimate_tracks_exact(spark, sf_dir):
    """Median-of-means over 64 tug-of-war rows: relative error on
    every event_type's self-join size must be well inside the
    sqrt(2/8)~50% per-mean deviation the median is built to trim."""
    ev = read_table(spark, sf_dir, "events")
    rows = sk.ams_f2(ev, "user_id", ["event_type"]).collect()
    assert len(rows) == 5
    for r in rows:
        exact = r["f2_selfjoin_rows"]
        assert exact > 0
        assert abs(r["est_f2"] - exact) <= 0.5 * exact, r


def test_ams_sums_merge_linearly(spark, sf_dir):
    """The defining property of a linear sketch: sketch(A union B) ==
    sketch(A) + sketch(B), element-wise and EXACTLY — per-slice
    sketches can pre-aggregate like CMS cells."""
    ev = read_table(spark, sf_dir, "events")
    whole = sk.ams_sums(ev, "user_id", ["event_type"])
    half_a = sk.ams_sums(ev.where(F.col("event_id") % 2 == 0),
                         "user_id", ["event_type"])
    half_b = sk.ams_sums(ev.where(F.col("event_id") % 2 == 1),
                         "user_id", ["event_type"])
    merged = (half_a.unionByName(half_b)
              .groupBy("event_type", "i").agg(F.sum("xi").alias("xi")))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_ams_f2_detects_skew(spark):
    """F2/N separates a skewed key distribution from a flat one of the
    same size: one hot key with 100 occurrences has F2 ~ 100x the
    all-distinct stream's."""
    flat = spark.createDataFrame(
        [(k, "flat") for k in range(100)], "k long, grp string")
    hot = spark.createDataFrame(
        [(0, "hot")] * 100, "k long, grp string")
    rows = {r["grp"]: r for r in sk.ams_f2(
        flat.unionByName(hot), "k", ["grp"]).collect()}
    assert rows["flat"]["f2_selfjoin_rows"] == 100
    assert rows["hot"]["f2_selfjoin_rows"] == 10_000
    assert rows["hot"]["est_f2"] == 10_000.0  # single key: exact
    assert rows["hot"]["est_f2"] > 10 * rows["flat"]["est_f2"]


def test_ams_ignores_null_keys_and_rejects_bad_r(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (None, "a")], "k long, grp string")
    (r,) = sk.ams_f2(df, "k", ["grp"]).collect()
    assert r["f2_selfjoin_rows"] == 4
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sk.ams_sums(df, "k", ["grp"], r=sk.AMS_R + 1)
    with _pytest.raises(ValueError):
        sk.ams_estimate(sk.ams_sums(df, "k", ["grp"]), ["grp"],
                        n_groups=3)


def test_ams_join_size_tracks_exact(spark, sf_dir):
    """Cross-join-size estimate within the tug-of-war error envelope
    of the true join output size, on a genuinely fanned-out join."""
    ev = read_table(spark, sf_dir, "events")
    (r,) = sk.ams_join_size(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "view"),
        "user_id", "user_id").collect()
    true = r["join_rows"]
    assert true > 0
    assert abs(r["est_join_rows"] - true) <= 0.6 * true, r


def test_ams_join_size_disjoint_keys_near_zero(spark):
    """Disjoint key sets: exact join size 0, estimate clipped >= 0 and
    small relative to the would-be-overlap scale."""
    a = spark.createDataFrame([(k,) for k in range(500)], "k long")
    b = spark.createDataFrame([(k + 10_000,) for k in range(500)], "k long")
    (r,) = sk.ams_join_size(a, b, "k", "k").collect()
    assert r["join_rows"] == 0
    assert 0 <= r["est_join_rows"] <= 500  # noise << the 500*500 cross scale


def test_hll_kmv_crosscheck_verdicts_and_flip(spark, sf_dir, monkeypatch):
    """The cross-engine distinct audit: KMV estimate is deterministic
    and within its documented error, the Datasketches verdicts are
    TRUE at default tolerance, and the tolerance verdict FLIPS when
    squeezed — a computed contract (VERDICT r5 item 2)."""
    import hive_exporter_spark.operators.sketches as sk2

    ev = read_table(spark, sf_dir, "events")
    rows = sk2.hll_kmv_crosscheck(ev).collect()
    assert rows
    for r in rows:
        assert r["ds_hll_within_tol"] and r["ds_hll_merge_lossless"], r
        assert r["kmv_rel_err"] <= 0.25, r  # k=1024 KMV ~3% rsd, wide margin
    monkeypatch.setattr(sk2, "DS_HLL_TOL", -1.0)
    flipped = sk2.hll_kmv_crosscheck(ev).collect()
    assert all(not r["ds_hll_within_tol"] for r in flipped), flipped
    assert all(r["ds_hll_merge_lossless"] for r in flipped)
