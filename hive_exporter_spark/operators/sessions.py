"""Event-stream analytics over the `events` fixture: sessionization,
time-bucketed rollups, pivots, JSON lifting — the batch twins of the
streaming operators in hive_exporter_spark/streaming/ (the reference's
'streaming' is micro-batch CDC, SURVEY.md §2.9; these are the
analytics a real event table needs on top).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_exporter_spark.functions.aggs import davg_sql, dsum, dsum_sql
from hive_exporter_spark.sources.files import read_table

SESSION_GAP_MINUTES = 30
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``.

    Classic lag + cumulative-sum-over-window formulation: exactly one
    shuffle on ``user_id`` shared by both windows (same partitioning),
    so at 100 TB this is a single exchange + per-key sort. The
    streaming twin is ``F.session_window`` (streaming/ module).
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    prev_ts = F.lag("ts").over(by_user)
    is_new = F.when(prev_ts.isNull() | (F.col("ts") > prev_ts + gap), 1).otherwise(0)
    session_id = F.sum(is_new).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("session_id", session_id)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


def daily_stats(events: DataFrame) -> DataFrame:
    """Time-bucketed rollup: day × event_type counts and value sums."""
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day", "event_type")
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """Pivot: per-user event-type counts as columns. The value list is
    pinned so the plan is a single pass (no distinct-values pre-query)."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


def user_value_deltas(events: DataFrame) -> DataFrame:
    """Analytic lag: per-user consecutive value deltas (the lag/lead
    family the reference's window surface lacked, SURVEY.md §2.6)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return events.select(
        "event_id", "user_id", "ts", "value",
        prev.alias("prev_value"),
        (F.col("value") - prev).alias("value_delta"),
    )


def event_type_unpivot(events: DataFrame) -> DataFrame:
    """Unpivot (stack): the wide per-user pivot back to long form —
    (user_id, event_type, n) including explicit zero rows."""
    wide = event_type_pivot(events)
    stack_expr = ", ".join(f"'{t}', {t}" for t in EVENT_TYPES)
    return wide.selectExpr(
        "user_id",
        f"stack({len(EVENT_TYPES)}, {stack_expr}) AS (event_type, n)",
    )


def lift_props(events: DataFrame) -> DataFrame:
    """Lift the JSON `props` payload to typed columns (schema-on-read:
    the reference's world is schema-inferred, SURVEY.md §1.2)."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )



FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def conversion_funnel(events: DataFrame,
                      steps: tuple = FUNNEL_STEPS) -> DataFrame:
    """Ordered-funnel analysis: how many users reached each step IN
    ORDER (step k counts only if its first occurrence is at or after
    step k-1's first occurrence).

    One grouped aggregate computes every step's first timestamp per
    user (conditional mins share the single exchange); the ordered
    prefix depth is a pure projection; the final per-step tally is a
    tiny second aggregate. No joins, no window over raw events."""
    firsts = events.groupBy("user_id").agg(*[
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"__t{i}")
        for i, s in enumerate(steps)
    ])
    # funnel_depth = longest prefix of steps whose first occurrences
    # exist and are non-decreasing in time.
    depth = F.lit(0)
    prefix_ok = F.lit(True)
    for i in range(len(steps)):
        ok = F.col(f"__t{i}").isNotNull()
        if i > 0:
            ok = ok & (F.col(f"__t{i}") >= F.col(f"__t{i - 1}"))
        prefix_ok = prefix_ok & ok
        depth = F.when(prefix_ok, i + 1).otherwise(depth)
    per_user = firsts.withColumn("funnel_depth", depth)
    step_names = F.array(*[F.lit(s) for s in steps])
    return (
        # depth-0 users filtered BEFORE sequence(): sequence(1, 0)
        # would infer a negative step and emit [1, 0], not empty.
        per_user.where(F.col("funnel_depth") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("funnel_depth"))).alias("step_no"))
        .groupBy("step_no")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .withColumn("step_name", F.element_at(step_names, F.col("step_no")))
        .select("step_no", "step_name", "n_users")
        .orderBy("step_no")
    )


def retention_cohorts(events: DataFrame, max_offset: int = 14) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted by
    day-offset of later activity. Two aggregates: per-user cohort day
    (min), then distinct users per (cohort, offset) — the cohort side
    is one row per user, broadcast back onto the activity stream."""
    cohorts = (
        events.groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    )
    activity = events.select(
        "user_id", F.date_trunc("day", "ts").alias("active_day")
    ).distinct()
    return (
        activity.join(F.broadcast(cohorts), "user_id")
        .withColumn("day_offset", F.datediff("active_day", "cohort_day"))
        .where(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def daily_distinct_users_hll(events: DataFrame) -> DataFrame:
    """Per (day, event_type) distinct users via HLL++ sketches
    (Datasketches HllSketch, F.hll_sketch_agg). Same single-exchange
    shape as an exact count-distinct, but the partial state is a
    fixed-size sketch instead of a hash set — at 100 TB/day the
    per-group state stays KBs regardless of cardinality."""
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select(
            "day", "event_type",
            F.hll_sketch_estimate("sk").cast("long").alias("est_users"),
        )
        .orderBy("day", "event_type")
    )


def rolling_distinct_users(events: DataFrame) -> DataFrame:
    """Sketch re-aggregation: merge the per-day HLL sketches into an
    all-time distinct per event_type (hll_union_agg).

    THE pre-aggregation pattern for 100 TB: materialize the tiny
    (day, type, sketch) table once, then answer any coarser distinct
    (week/month/all-time, any day subset) by merging sketches —
    never rescanning raw events. Merging is lossless: the union of
    daily sketches estimates exactly what one sketch over the raw
    stream would (asserted in tests/test_sketches.py)."""
    daily = events.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(F.hll_union_agg("sk").alias("sk"),
             F.count(F.lit(1)).alias("n_days"))
        .select(
            "event_type", "n_days",
            F.hll_sketch_estimate("sk").cast("long").alias("est_users"),
        )
        .orderBy("event_type")
    )


def cumulative_distinct_users(events: DataFrame) -> DataFrame:
    """EXACT running distinct-user count by day — the exact twin of the
    HLL rolling sketch, via the first-seen trick: a user contributes to
    the cumulative count exactly on their first-ever day, so
    cumulative_distinct(day) = running_sum(new_users(day)).

    Two key-partitioned aggregates (user -> first day, day -> new-user
    count) plus a window over the tiny per-day table — no
    count(distinct) over an expanding window (which would rescan
    O(days²) rows). This exact form costs one shuffle on user_id at any
    scale; the HLL twin answers arbitrary day-subset unions instead."""
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day"))
    daily_new = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    return (
        daily_new.withColumn("cum_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


# -- driver-contract wiring -------------------------------------------------

def _q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    return sessionize(read_table(spark, sf, "events"))


def _q_daily(spark: SparkSession, sf: str) -> DataFrame:
    return daily_stats(read_table(spark, sf, "events"))


def _q_pivot(spark: SparkSession, sf: str) -> DataFrame:
    return event_type_pivot(read_table(spark, sf, "events"))


def _q_props(spark: SparkSession, sf: str) -> DataFrame:
    return lift_props(read_table(spark, sf, "events"))


def _q_deltas(spark: SparkSession, sf: str) -> DataFrame:
    return user_value_deltas(read_table(spark, sf, "events"))


def _q_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    return event_type_unpivot(read_table(spark, sf, "events"))


def _q_funnel(spark, sf):
    return conversion_funnel(read_table(spark, sf, "events"))


def _q_retention(spark, sf):
    return retention_cohorts(read_table(spark, sf, "events"))


def _q_daily_hll(spark, sf):
    return daily_distinct_users_hll(read_table(spark, sf, "events"))


def _q_rolling_hll(spark, sf):
    return rolling_distinct_users(read_table(spark, sf, "events"))


def _q_cum_distinct(spark, sf):
    return cumulative_distinct_users(read_table(spark, sf, "events"))


QUERIES = {
    "sessionize": _q_sessionize,
    "conversion_funnel": _q_funnel,
    "retention_cohorts": _q_retention,
    "daily_event_stats": _q_daily,
    "event_type_pivot": _q_pivot,
    "json_props_lift": _q_props,
    "user_value_deltas": _q_deltas,
    "event_type_unpivot": _q_unpivot,
    "cumulative_distinct_users": _q_cum_distinct,
    # rows-only (sketch-based, no DuckDB twin; exactness asserted in
    # tests against exact count-distinct and the unmerged sketch):
    "daily_distinct_users_hll": _q_daily_hll,
    "rolling_distinct_users_hll": _q_rolling_hll,
}

_FUNNEL_FIRSTS_SQL = ", ".join(
    f"MIN(CASE WHEN event_type = '{s}' THEN ts END) AS t{i}"
    for i, s in enumerate(FUNNEL_STEPS)
)
_FUNNEL_DEPTH_SQL = """
    CASE WHEN t0 IS NOT NULL AND t1 >= t0 AND t2 >= t1 AND t3 >= t2 THEN 4
         WHEN t0 IS NOT NULL AND t1 >= t0 AND t2 >= t1 THEN 3
         WHEN t0 IS NOT NULL AND t1 >= t0 THEN 2
         WHEN t0 IS NOT NULL THEN 1
         ELSE 0 END
"""

ORACLES = {
    "conversion_funnel": f"""
        WITH firsts AS (
            SELECT user_id, {_FUNNEL_FIRSTS_SQL}
            FROM events GROUP BY user_id
        ), depths AS (
            SELECT {_FUNNEL_DEPTH_SQL} AS funnel_depth FROM firsts
        ), steps(step_no, step_name) AS (
            VALUES {", ".join(f"({i + 1}, '{s}')" for i, s in enumerate(FUNNEL_STEPS))}
        )
        SELECT step_no, step_name,
               (SELECT COUNT(*) FROM depths WHERE funnel_depth >= step_no) AS n_users
        FROM steps
        WHERE (SELECT COUNT(*) FROM depths WHERE funnel_depth >= step_no) > 0
        ORDER BY step_no
    """,
    "retention_cohorts": """
        WITH cohorts AS (
            SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
            FROM events GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day
            FROM events
        )
        SELECT cohort_day,
               date_diff('day', CAST(cohort_day AS DATE),
                         CAST(active_day AS DATE)) AS day_offset,
               COUNT(DISTINCT a.user_id) AS n_users
        FROM activity a JOIN cohorts c ON a.user_id = c.user_id
        WHERE date_diff('day', CAST(cohort_day AS DATE),
                        CAST(active_day AS DATE)) <= 14
        GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset
    """,
    "sessionize": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts > lag(ts) OVER w + INTERVAL {SESSION_GAP_MINUTES} MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
            -- CAST: DuckDB SUM(int) yields HUGEINT, which pandas renders as
            -- float64 and the driver's value-hash then mismatches Spark's
            -- bigint; BIGINT restores int64 parity.
            SELECT *, CAST(SUM(is_new) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
        FROM numbered GROUP BY user_id, session_id
    """,
    "daily_event_stats": f"""
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n_events, {dsum_sql('value')} AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "event_type_pivot": """
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS click,
               COUNT(*) FILTER (WHERE event_type = 'error') AS error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
               COUNT(*) FILTER (WHERE event_type = 'view') AS view
        FROM events GROUP BY user_id
    """,
    "json_props_lift": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
    """,
    "user_value_deltas": """
        SELECT event_id, user_id, ts, value,
               lag(value) OVER w AS prev_value,
               value - lag(value) OVER w AS value_delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "event_type_unpivot": """
        WITH types(event_type) AS (
            VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')
        ), users AS (SELECT DISTINCT user_id FROM events)
        SELECT u.user_id, t.event_type,
               COALESCE((SELECT COUNT(*) FROM events e
                         WHERE e.user_id = u.user_id
                           AND e.event_type = t.event_type), 0) AS n
        FROM users u CROSS JOIN types t
    """,
}

ORACLES["cumulative_distinct_users"] = """
    WITH first_seen AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS first_day
        FROM events GROUP BY user_id
    ), daily_new AS (
        SELECT first_day AS day, COUNT(*) AS new_users
        FROM first_seen GROUP BY 1
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
    FROM daily_new
    ORDER BY day
"""


# ---------------------------------------------------------------------------
# Trailing-window anomaly detection
# ---------------------------------------------------------------------------

ANOMALY_TRAIL_DAYS = 7
ANOMALY_Z = 2.0


def event_anomaly_zscore(events: DataFrame,
                         trail: int = ANOMALY_TRAIL_DAYS,
                         z_cut: float = ANOMALY_Z) -> DataFrame:
    """Daily per-event-type volume anomalies: z-score of each day's
    count against the trailing `trail` days' mean/stddev (the standard
    pipeline-health monitor — ingestion drops, bot spikes, replayed
    batches all surface as |z| spikes).

    Two exchanges total: the daily rollup, then ONE window partitioned
    by event_type (a bounded key set — each type's day series sorts
    within one task). Mean and variance come from exact integer sums
    over the frame (sum, sum of squares), so the doubles are computed
    from identical integers in any engine/partitioning — deterministic
    without decimal rounding. Days with fewer than 2 trailing points
    or zero variance yield NULL z (flagged false).
    """
    daily = (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-trail, -1)
    )
    n = F.col("n_events").cast("double")
    cnt = F.count("n_events").over(w)
    s1 = F.sum("n_events").over(w).cast("double")
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(w).cast("double")
    mean = s1 / cnt
    var = (s2 - s1 * s1 / cnt) / (cnt - 1)
    z = F.when((cnt >= 2) & (var > 0),
               F.round((n - mean) / F.sqrt(var), 6))
    return (
        daily.select(
            "day", "event_type", "n_events",
            z.alias("z"),
            F.coalesce(F.abs(z) >= z_cut, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("day", "event_type")
    )


def _q_anomaly(spark, sf):
    return event_anomaly_zscore(read_table(spark, sf, "events"))


QUERIES["event_anomaly_zscore"] = _q_anomaly

ORACLES["event_anomaly_zscore"] = f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT day, event_type, n_events,
               COUNT(n_events) OVER w AS cnt,
               CAST(SUM(n_events) OVER w AS DOUBLE) AS s1,
               CAST(SUM(n_events * n_events) OVER w AS DOUBLE) AS s2
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN {ANOMALY_TRAIL_DAYS} PRECEDING
                     AND 1 PRECEDING)
    )
    SELECT day, event_type, n_events,
           CASE WHEN cnt >= 2 AND (s2 - s1 * s1 / cnt) / (cnt - 1) > 0
                THEN round((CAST(n_events AS DOUBLE) - s1 / cnt)
                           / sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)), 6)
           END AS z,
           COALESCE(abs(CASE WHEN cnt >= 2
                              AND (s2 - s1 * s1 / cnt) / (cnt - 1) > 0
                             THEN round((CAST(n_events AS DOUBLE) - s1 / cnt)
                                  / sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)), 6)
                        END) >= {ANOMALY_Z}, FALSE) AS is_anomaly
    FROM stats
    ORDER BY day, event_type
"""


# ---------------------------------------------------------------------------
# Robust (median/MAD) anomaly detection
# ---------------------------------------------------------------------------

MAD_Z = 3.5            # Iglewicz & Hoaglin's classic modified-z cutoff
MAD_CONSISTENCY = 0.6745  # Phi^-1(0.75): scales MAD to sigma-equivalents


def event_anomaly_mad(events: DataFrame,
                      z_cut: float = MAD_Z) -> DataFrame:
    """Daily per-event-type volume anomalies by MODIFIED z-score
    (Iglewicz & Hoaglin 1993): 0.6745·(x − median)/MAD against the
    type's whole history. The robust twin of `event_anomaly_zscore`:
    mean/stddev are hijacked by the very outliers being hunted (one
    100× bot spike inflates sigma enough to mask every other spike,
    and the trailing window goes blind for `trail` days after it);
    median and MAD have a 50% breakdown point, so the baseline stays
    put no matter how wild the anomalies are.

    Scale shape: the only data-sized work is the daily rollup (partial
    agg). The medians run per event_type over its DAY series — state
    bounded by days×types, not data — and rejoin by broadcast. Exact
    cross-engine determinism: day counts are integers, so their
    interpolated median is an exact half-integer, |x − med| an exact
    half-integer, and MAD an exact quarter-integer — the modified z is
    one identical float expression over identical exact inputs in both
    engines, rounded to 6 dp. Days where MAD = 0 (over half the days
    identical — a degenerate flat series) yield NULL z, flagged false.
    """
    # days x types-sized checkpoint: the median, the deviation frame,
    # and (through it) the MAD all reference this rollup — unchecked,
    # each reference re-scans events (four corpus passes for one).
    daily = (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=False)
    )
    med = daily.groupBy("event_type").agg(
        F.percentile("n_events", 0.5).alias("med"))
    dev = (
        daily.join(F.broadcast(med), "event_type")
        .withColumn("absdev",
                    F.abs(F.col("n_events").cast("double") - F.col("med")))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("absdev", 0.5).alias("mad"))
    z = F.when(
        F.col("mad") > 0,
        F.round(F.lit(MAD_CONSISTENCY)
                * (F.col("n_events").cast("double") - F.col("med"))
                / F.col("mad"), 6))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "day", "event_type", "n_events", "med", "mad",
            z.alias("robust_z"),
            F.coalesce(F.abs(z) >= z_cut, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("day", "event_type")
    )


def _q_anomaly_mad(spark, sf):
    return event_anomaly_mad(read_table(spark, sf, "events"))


QUERIES["event_anomaly_mad"] = _q_anomaly_mad

ORACLES["event_anomaly_mad"] = f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type, quantile_cont(n_events, 0.5) AS med
        FROM daily GROUP BY event_type
    ), dev AS (
        SELECT d.day, d.event_type, d.n_events, m.med,
               abs(CAST(d.n_events AS DOUBLE) - m.med) AS absdev
        FROM daily d JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, quantile_cont(absdev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT day, dev.event_type, n_events, med, mad,
           CASE WHEN mad > 0
                THEN round({MAD_CONSISTENCY} * (CAST(n_events AS DOUBLE) - med)
                           / mad, 6)
           END AS robust_z,
           COALESCE(abs(CASE WHEN mad > 0
                             THEN round({MAD_CONSISTENCY}
                                  * (CAST(n_events AS DOUBLE) - med)
                                  / mad, 6)
                        END) >= {MAD_Z}, FALSE) AS is_anomaly
    FROM dev JOIN mad USING (event_type)
    ORDER BY day, dev.event_type
"""


# ---------------------------------------------------------------------------
# Time-bounded funnel (conversion within a horizon)
# ---------------------------------------------------------------------------

FUNNEL_WITHIN_SECONDS = 7 * 86400


def conversion_funnel_within(events: DataFrame,
                             steps: tuple = FUNNEL_STEPS,
                             within_seconds: int = FUNNEL_WITHIN_SECONDS
                             ) -> DataFrame:
    """Funnel with a conversion horizon: step k counts only if it
    happens AFTER step k-1's matched event and within
    `within_seconds` of the user's anchor (first step-0 event) — the
    product-analytics "converted within 7 days" question, which the
    unbounded `conversion_funnel` cannot answer (it happily credits a
    purchase a year after signup).

    Semantics are greedy first-touch anchoring (the default in
    product-analytics tools): the anchor is the user's first step-0
    event, and each step matches its earliest occurrence after the
    previous match inside the horizon. The step-k time is a window
    min whose predicate references step k-1's window min — a chain of
    Window projections over the SAME user_id partitioning, which
    Spark executes with ONE exchange and k in-partition passes (no
    join per step, no re-shuffle; NULL propagates down the chain
    structurally because a NULL t_{k-1} nulls the predicate). The
    final tally aggregates one collapsed row per user.
    """
    w = Window.partitionBy("user_id")
    horizon = F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
    df = events.select("user_id", "event_type", "ts")
    df = df.withColumn("__t0", F.min(
        F.when(F.col("event_type") == steps[0], F.col("ts"))).over(w))
    for i in range(1, len(steps)):
        cond = (
            (F.col("event_type") == steps[i])
            & (F.col("ts") >= F.col(f"__t{i - 1}"))
            & (F.col("ts") <= F.col("__t0") + horizon)
        )
        df = df.withColumn(f"__t{i}",
                           F.min(F.when(cond, F.col("ts"))).over(w))
    per_user = df.groupBy("user_id").agg(*[
        F.first(f"__t{i}").alias(f"__t{i}") for i in range(len(steps))
    ])
    depth = F.lit(0)
    for i in range(len(steps)):
        depth = F.when(F.col(f"__t{i}").isNotNull(), i + 1).otherwise(depth)
    step_names = F.array(*[F.lit(s) for s in steps])
    return (
        per_user.withColumn("funnel_depth", depth)
        .where(F.col("funnel_depth") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("funnel_depth")))
                .alias("step_no"))
        .groupBy("step_no")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .withColumn("step_name", F.element_at(step_names, F.col("step_no")))
        .select("step_no", "step_name", "n_users")
        .orderBy("step_no")
    )


def _q_funnel_within(spark, sf):
    return conversion_funnel_within(read_table(spark, sf, "events"))


QUERIES["conversion_funnel_within"] = _q_funnel_within


def _funnel_within_sql(steps=FUNNEL_STEPS,
                       within=FUNNEL_WITHIN_SECONDS) -> str:
    ctes = [f"""u0 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = '{steps[0]}' THEN ts END) AS t0
        FROM events GROUP BY user_id
    )"""]
    for i in range(1, len(steps)):
        prev = f"u{i - 1}"
        ts_cols = ", ".join(
            f"ANY_VALUE({prev}.t{j}) AS t{j}" for j in range(i))
        ctes.append(f"""u{i} AS (
        SELECT e.user_id, {ts_cols},
               MIN(CASE WHEN e.event_type = '{steps[i]}'
                         AND e.ts >= {prev}.t{i - 1}
                         AND e.ts <= {prev}.t0
                             + INTERVAL {within} SECOND
                    THEN e.ts END) AS t{i}
        FROM events e JOIN {prev} USING (user_id)
        GROUP BY e.user_id
    )""")
    last = f"u{len(steps) - 1}"
    depth = "CASE " + " ".join(
        f"WHEN t{i} IS NOT NULL THEN {i + 1}"
        for i in range(len(steps) - 1, -1, -1)) + " ELSE 0 END"
    names = ", ".join(f"({i + 1}, '{s}')" for i, s in enumerate(steps))
    return f"""
    WITH {", ".join(ctes)},
    depths AS (SELECT {depth} AS funnel_depth FROM {last}),
    steps(step_no, step_name) AS (VALUES {names})
    SELECT step_no, step_name,
           (SELECT COUNT(*) FROM depths
            WHERE funnel_depth >= step_no) AS n_users
    FROM steps
    WHERE (SELECT COUNT(*) FROM depths WHERE funnel_depth >= step_no) > 0
    ORDER BY step_no
    """


ORACLES["conversion_funnel_within"] = _funnel_within_sql()


# ---------------------------------------------------------------------------
# First-order event transition matrix
# ---------------------------------------------------------------------------

def event_transition_matrix(events: DataFrame) -> DataFrame:
    """Per-user first-order transition counts and probabilities:
    P(next event type | current type) — the Markov view of user
    behavior (what follows a signup? where do error loops sit?).

    One lead() window over (user_id, ts, event_id) — a single
    exchange — then a pair-count aggregate with map-side combine and
    a broadcast of the per-source totals (|types|² table). Ties in
    ts break on event_id, so the sequence (and thus every count) is
    deterministic. Session boundaries are deliberately NOT applied:
    compose over `sessionize`'s output to cut transitions at gaps.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__next", F.lead("event_type").over(w))
        .where(F.col("__next").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"),
                 F.col("__next").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").alias("__total"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select("from_type", "to_type", "n_transitions",
                F.round(F.col("n_transitions").cast("double")
                        / F.col("__total"), 6).alias("p_transition"))
        .orderBy("from_type", "to_type")
    )


def _q_transitions(spark, sf):
    return event_transition_matrix(read_table(spark, sf, "events"))


QUERIES["event_transition_matrix"] = _q_transitions

ORACLES["event_transition_matrix"] = """
    WITH seq AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    ), pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n_transitions
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n_transitions AS BIGINT) AS n_transitions,
           round(CAST(n_transitions AS DOUBLE)
                 / SUM(n_transitions) OVER (PARTITION BY from_type), 6)
               AS p_transition
    FROM pairs
    ORDER BY from_type, to_type
"""


PAGERANK_ITERS = 3
PAGERANK_SCALE = 10 ** 12   # rank unit: 1.0 == 10^12
PAGERANK_PSCALE = 10 ** 6   # transition-probability fixed-point scale
PAGERANK_D_NUM, PAGERANK_D_DEN = 85, 100  # damping d = 0.85


def event_transition_pagerank(events: DataFrame,
                              iters: int = PAGERANK_ITERS) -> DataFrame:
    """PageRank over the event-type transition graph — which states a
    user's behavior gravitates to under the Markov dynamics
    `event_transition_matrix` estimates (error loops and terminal
    screens rank high; pass-through states rank low).

    The whole iteration runs in FIXED-POINT INTEGER arithmetic so the
    result is bit-exact and engine-portable (hash-checked vs DuckDB —
    rare for an iterative algorithm): ranks are integers scaled by
    10^12, transition probabilities by 10^6, and each step is the
    integer recurrence

        p_uv   = (n_uv * 10^6) DIV n_u
        c_uv   = (85 * ((r_u * p_uv) DIV 10^6)) DIV 100
        r'_v   = (15 * 10^12) DIV (100 * N)  +  Σ_u c_uv

    (successive floor divisions, so every engine that truncates
    positive integer division identically — all of them — reproduces
    the same bits; the ≤1-unit floor loss per step is 10^-12-scale).
    Dangling-node mass is dropped, not redistributed: ranks sum to
    slightly under 1, identically in both engines.

    Scale shape: ONE corpus pass builds the |types|² edge frame
    (lead window — the same single exchange as the transition
    matrix), checkpointed; every iteration is a join over that
    dimension-sized frame, checkpointed per round like the
    connected-components loop. N (node count) is a driver-side count
    of the types dimension — bounded by contract.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__next", F.lead("event_type").over(w))
        .where(F.col("__next").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"),
                 F.col("__next").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_out"))
    edges = (
        pairs.join(F.broadcast(totals), "from_type")
        .select("from_type", "to_type",
                F.expr(f"(n * {PAGERANK_PSCALE}) DIV n_out").alias("p"))
        .localCheckpoint(eager=False)
    )
    nodes = (events.select("event_type").distinct()
             .localCheckpoint(eager=False))
    n_nodes = nodes.count()
    teleport = (((PAGERANK_D_DEN - PAGERANK_D_NUM) * PAGERANK_SCALE)
                // (PAGERANK_D_DEN * n_nodes))
    ranks = nodes.select(
        "event_type",
        F.lit(PAGERANK_SCALE // n_nodes).cast("long").alias("r"))
    for _ in range(iters):
        inc = (
            edges.join(
                ranks.select(F.col("event_type").alias("from_type"),
                             F.col("r").alias("__r")),
                "from_type")
            .select(
                F.col("to_type").alias("event_type"),
                F.expr(f"({PAGERANK_D_NUM} * ((__r * p) DIV "
                       f"{PAGERANK_PSCALE})) DIV {PAGERANK_D_DEN}")
                 .alias("c"))
            .groupBy("event_type").agg(F.sum("c").alias("__inc"))
        )
        ranks = (
            nodes.join(inc, "event_type", "left")
            .select(
                "event_type",
                (F.lit(teleport).cast("long")
                 + F.coalesce(F.col("__inc"), F.lit(0))).alias("r"))
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "event_type",
        F.col("r").alias("pagerank_scaled"),
        F.round(F.col("r").cast("double") / PAGERANK_SCALE, 6)
         .alias("pagerank"),
    ).orderBy("event_type")


def _q_pagerank(spark, sf):
    return event_transition_pagerank(read_table(spark, sf, "events"))


QUERIES["event_transition_pagerank"] = _q_pagerank

# 3 unrolled integer iterations: every division is `//` on positive
# BIGINTs, matching Spark's DIV bit-for-bit.
_PR_ITER_SQL = """
    SELECT n.event_type,
           (15 * 1000000000000) // (100 * (SELECT n FROM nn))
           + COALESCE(SUM((85 * ((r.r * e.p) // 1000000)) // 100), 0) AS r
    FROM nodes n
    LEFT JOIN edges e ON e.to_type = n.event_type
    LEFT JOIN {prev} r ON r.event_type = e.from_type
    GROUP BY n.event_type
"""

ORACLES["event_transition_pagerank"] = f"""
    WITH seq AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    ), pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ), totals AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_out
        FROM pairs GROUP BY from_type
    ), edges AS (
        SELECT from_type, to_type, (n * 1000000) // n_out AS p
        FROM pairs JOIN totals USING (from_type)
    ), nodes AS (
        SELECT DISTINCT event_type FROM events
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
    ), r0 AS (
        SELECT event_type,
               1000000000000 // (SELECT n FROM nn) AS r
        FROM nodes
    ), r1 AS ({_PR_ITER_SQL.format(prev="r0")}
    ), r2 AS ({_PR_ITER_SQL.format(prev="r1")}
    ), r3 AS ({_PR_ITER_SQL.format(prev="r2")})
    SELECT event_type,
           CAST(r AS BIGINT) AS pagerank_scaled,
           round(CAST(r AS DOUBLE) / 1000000000000, 6) AS pagerank
    FROM r3
    ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# RFM scoring
# ---------------------------------------------------------------------------

RFM_QS = (0.2, 0.4, 0.6, 0.8)


def rfm_scores(events: DataFrame) -> DataFrame:
    """Classic RFM segmentation: per-user Recency (days since last
    activity, against the corpus max day so the query is
    deterministic), Frequency (purchase count) and Monetary (exact
    decimal purchase value), each scored 1–5 against the user
    population's quintile thresholds. rfm = 100·R + 10·F + M.

    Deliberately NOT NTILE: equal-size tiles need a total order over
    all users in one task. Thresholds come from exact interpolated
    percentiles of the (already user-aggregated, users ≪ events)
    metric distributions — one tiny agg broadcast back — and scoring
    is a map-only fold over the 4 thresholds, ties resolving to the
    lower bucket identically in both engines (strict >). Recency
    scores through its negation so 5 always means "best".
    """
    per_user = (
        events.groupBy("user_id")
        .agg(F.max("ts").alias("__last"),
             F.sum(F.when(F.col("event_type") == "purchase", 1)
                   .otherwise(0)).alias("frequency"),
             dsum(F.when(F.col("event_type") == "purchase",
                         F.col("value")).otherwise(F.lit(0.0)))
             .alias("monetary"))
    )
    now = events.agg(F.max("ts").alias("__now"))
    # User-sized checkpoint: the threshold agg AND the scoring pass
    # both reference this frame — unchecked, each re-runs the events
    # rollup (two extra corpus scans for nothing).
    m = (per_user.crossJoin(F.broadcast(now))
         .select(
             "user_id",
             F.datediff(F.col("__now").cast("date"),
                        F.col("__last").cast("date")).alias("recency_days"),
             "frequency",
             F.coalesce(F.col("monetary").cast("double"), F.lit(0.0))
             .alias("monetary"))
         .localCheckpoint(eager=False))
    qs = ", ".join(str(q) for q in RFM_QS)
    thr = m.agg(
        F.expr(f"percentile(-recency_days, array({qs}))").alias("__tr"),
        F.expr(f"percentile(frequency, array({qs}))").alias("__tf"),
        F.expr(f"percentile(monetary, array({qs}))").alias("__tm"))

    def score(value: F.Column, thr_col: str) -> F.Column:
        return F.lit(1) + F.aggregate(
            F.col(thr_col), F.lit(0),
            lambda acc, t: acc + F.when(value > t, 1).otherwise(0))

    scored = m.crossJoin(F.broadcast(thr)).select(
        "user_id", "recency_days", "frequency", "monetary",
        score(-F.col("recency_days"), "__tr").alias("r_score"),
        score(F.col("frequency").cast("double"), "__tf").alias("f_score"),
        score(F.col("monetary"), "__tm").alias("m_score"),
    )
    return scored.withColumn(
        "rfm", F.col("r_score") * 100 + F.col("f_score") * 10
        + F.col("m_score")).orderBy("user_id")


def _q_rfm(spark, sf):
    return rfm_scores(read_table(spark, sf, "events"))


QUERIES["rfm_scores"] = _q_rfm

_RFM_QS_SQL = ", ".join(str(q) for q in RFM_QS)
ORACLES["rfm_scores"] = f"""
    WITH per_user AS (
        SELECT user_id, MAX(ts) AS last_ts,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS frequency,
               {dsum_sql("CASE WHEN event_type = 'purchase' "
                         "THEN value ELSE 0.0 END")} AS monetary_d
        FROM events GROUP BY user_id
    ), m AS (
        SELECT user_id,
               date_diff('day', CAST(last_ts AS DATE),
                         CAST((SELECT MAX(ts) FROM events) AS DATE))
                   AS recency_days,
               frequency,
               COALESCE(CAST(monetary_d AS DOUBLE), 0.0) AS monetary
        FROM per_user
    ), thr AS (
        SELECT quantile_cont(-recency_days, [{_RFM_QS_SQL}]) AS tr,
               quantile_cont(CAST(frequency AS DOUBLE),
                             [{_RFM_QS_SQL}]) AS tf,
               quantile_cont(monetary, [{_RFM_QS_SQL}]) AS tm
        FROM m
    ), scored AS (
        SELECT m.user_id, m.recency_days,
               CAST(m.frequency AS BIGINT) AS frequency, m.monetary,
               1 + len(list_filter(thr.tr, t -> -m.recency_days > t))
                   AS r_score,
               1 + len(list_filter(thr.tf,
                                   t -> CAST(m.frequency AS DOUBLE) > t))
                   AS f_score,
               1 + len(list_filter(thr.tm, t -> m.monetary > t)) AS m_score
        FROM m CROSS JOIN thr
    )
    SELECT user_id, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS rfm
    FROM scored
    ORDER BY user_id
"""


def event_transition_matrix_sessionized(
        events: DataFrame,
        gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """`event_transition_matrix` with transitions cut at session
    boundaries: a pair only counts when the next event follows within
    `gap_minutes` — cross-session "transitions" (tonight's last click
    → next week's first view) are noise, not behavior. Same single
    lead() exchange; the gap test rides the same window."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__next", F.lead("event_type").over(w))
        .withColumn("__next_ts", F.lead("ts").over(w))
        .where(F.col("__next").isNotNull()
               & (F.col("__next_ts") <= F.col("ts") + gap))
        .groupBy(F.col("event_type").alias("from_type"),
                 F.col("__next").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").alias("__total"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select("from_type", "to_type", "n_transitions",
                F.round(F.col("n_transitions").cast("double")
                        / F.col("__total"), 6).alias("p_transition"))
        .orderBy("from_type", "to_type")
    )


def _q_transitions_sess(spark, sf):
    return event_transition_matrix_sessionized(
        read_table(spark, sf, "events"))


QUERIES["event_transition_matrix_sessionized"] = _q_transitions_sess

ORACLES["event_transition_matrix_sessionized"] = f"""
    WITH seq AS (
        SELECT event_type, ts,
               LEAD(event_type) OVER w AS next_type,
               LEAD(ts) OVER w AS next_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n_transitions
        FROM seq
        WHERE next_type IS NOT NULL
          AND next_ts <= ts + INTERVAL {SESSION_GAP_MINUTES} MINUTE
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n_transitions AS BIGINT) AS n_transitions,
           round(CAST(n_transitions AS DOUBLE)
                 / SUM(n_transitions) OVER (PARTITION BY from_type), 6)
               AS p_transition
    FROM pairs
    ORDER BY from_type, to_type
"""


def time_to_convert_stats(events: DataFrame,
                          steps: tuple = FUNNEL_STEPS,
                          within_seconds: int = FUNNEL_WITHIN_SECONDS
                          ) -> DataFrame:
    """How long full conversions take: for users who completed the
    bounded funnel, the distribution of anchor→final-step seconds —
    converted-user count plus exact min / median / p90 / max. Runs on
    the one-row-per-user funnel table (users ≪ events), so the exact
    interpolated percentiles aggregate summary-sized state; the only
    data-sized work is the funnel chain's single user exchange."""
    w = Window.partitionBy("user_id")
    horizon = F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
    df = events.select("user_id", "event_type", "ts")
    df = df.withColumn("__t0", F.min(
        F.when(F.col("event_type") == steps[0], F.col("ts"))).over(w))
    for i in range(1, len(steps)):
        cond = ((F.col("event_type") == steps[i])
                & (F.col("ts") >= F.col(f"__t{i - 1}"))
                & (F.col("ts") <= F.col("__t0") + horizon))
        df = df.withColumn(f"__t{i}",
                           F.min(F.when(cond, F.col("ts"))).over(w))
    last = f"__t{len(steps) - 1}"
    per_user = (df.groupBy("user_id")
                .agg(F.first("__t0").alias("t0"),
                     F.first(last).alias("tN"))
                .where(F.col("tN").isNotNull())
                # exact integer microseconds — unix_timestamp() would
                # truncate each endpoint to seconds BEFORE subtracting
                # while an epoch()-based oracle truncates AFTER, an
                # off-by-one caught by the value hash.
                # NTZ fixtures reject unix_micros; the session tz is
                # UTC, so the cast is the identity on the difference.
                .select((F.unix_micros(F.col("tN").cast("timestamp"))
                         - F.unix_micros(F.col("t0").cast("timestamp")))
                        .alias("us")))
    secs = F.col("us") / F.lit(1_000_000.0)
    return per_user.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.min(secs), 6).alias("min_secs"),
        F.round(F.percentile("us", 0.5) / 1_000_000.0, 4)
        .alias("median_secs"),
        F.round(F.percentile("us", 0.9) / 1_000_000.0, 4)
        .alias("p90_secs"),
        F.round(F.max(secs), 6).alias("max_secs"),
    )


def _q_time_to_convert(spark, sf):
    return time_to_convert_stats(read_table(spark, sf, "events"))


QUERIES["time_to_convert_stats"] = _q_time_to_convert


def _ttc_sql(steps=FUNNEL_STEPS, within=FUNNEL_WITHIN_SECONDS) -> str:
    ctes = [f"""u0 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = '{steps[0]}' THEN ts END) AS t0
        FROM events GROUP BY user_id
    )"""]
    for i in range(1, len(steps)):
        prev = f"u{i - 1}"
        ts_cols = ", ".join(
            f"ANY_VALUE({prev}.t{j}) AS t{j}" for j in range(i))
        ctes.append(f"""u{i} AS (
        SELECT e.user_id, {ts_cols},
               MIN(CASE WHEN e.event_type = '{steps[i]}'
                         AND e.ts >= {prev}.t{i - 1}
                         AND e.ts <= {prev}.t0 + INTERVAL {within} SECOND
                    THEN e.ts END) AS t{i}
        FROM events e JOIN {prev} USING (user_id)
        GROUP BY e.user_id
    )""")
    last_t = f"t{len(steps) - 1}"
    return f"""
    WITH {", ".join(ctes)},
    conv AS (
        SELECT epoch_us({last_t}) - epoch_us(t0) AS us
        FROM u{len(steps) - 1} WHERE {last_t} IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           round(MIN(us) / 1000000.0, 6) AS min_secs,
           round(quantile_cont(us, 0.5) / 1000000.0, 4) AS median_secs,
           round(quantile_cont(us, 0.9) / 1000000.0, 4) AS p90_secs,
           round(MAX(us) / 1000000.0, 6) AS max_secs
    FROM conv
    """


ORACLES["time_to_convert_stats"] = _ttc_sql()


# ---------------------------------------------------------------------------
# Top user paths
# ---------------------------------------------------------------------------

PATH_LEN = 3
PATH_TOPK = 20


def top_event_paths(events: DataFrame, path_len: int = PATH_LEN,
                    k: int = PATH_TOPK,
                    gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """The k most common length-`path_len` event sequences (user
    journeys), counted within session gaps — "view → click →
    purchase" vs "view → error → view" is the product question the
    transition matrix's one-step memory can't answer.

    One lead() window per lookahead step over the SAME (user, ts)
    partitioning — a single exchange regardless of path_len — then a
    path-string aggregate with map-side combine and a distributed
    TakeOrdered(k). Paths crossing a session boundary are cut by the
    same gap rule as `event_transition_matrix_sessionized`.
    """
    if path_len < 2:
        raise ValueError(f"path_len must be >= 2 (got {path_len})")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    df = events.select("user_id", "ts", "event_id", "event_type")
    cols, ok = [F.col("event_type")], F.lit(True)
    for j in range(1, path_len):
        df = (df.withColumn(f"__e{j}", F.lead("event_type", j).over(w))
              .withColumn(f"__ts{j}", F.lead("ts", j).over(w)))
        prev_ts = F.col("ts") if j == 1 else F.col(f"__ts{j - 1}")
        ok = ok & F.col(f"__e{j}").isNotNull() & (
            F.col(f"__ts{j}") <= prev_ts + gap)
        cols.append(F.col(f"__e{j}"))
    return (
        df.where(ok)
        .groupBy(F.concat_ws(" > ", *cols).alias("path"))
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "path")
        .limit(k)
    )


def _q_top_paths(spark, sf):
    return top_event_paths(read_table(spark, sf, "events"))


QUERIES["top_event_paths"] = _q_top_paths

ORACLES["top_event_paths"] = f"""
    WITH seq AS (
        SELECT event_type, ts,
               LEAD(event_type, 1) OVER w AS e1,
               LEAD(ts, 1) OVER w AS ts1,
               LEAD(event_type, 2) OVER w AS e2,
               LEAD(ts, 2) OVER w AS ts2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT concat_ws(' > ', event_type, e1, e2) AS path,
           CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM seq
    WHERE e1 IS NOT NULL AND e2 IS NOT NULL
      AND ts1 <= ts + INTERVAL {SESSION_GAP_MINUTES} MINUTE
      AND ts2 <= ts1 + INTERVAL {SESSION_GAP_MINUTES} MINUTE
    GROUP BY 1
    ORDER BY n_paths DESC, path
    LIMIT {PATH_TOPK}
"""


# ---------------------------------------------------------------------------
# Recency-decayed activity scoring
# ---------------------------------------------------------------------------

DECAY_HALFLIFE_DAYS = 7
DECAY_TOPK = 50


def decayed_user_activity(events: DataFrame,
                          halflife_days: int = DECAY_HALFLIFE_DAYS,
                          k: int = DECAY_TOPK) -> DataFrame:
    """Top-k users by exponentially-decayed activity: each event
    weighs 2^(-age/halflife), so "active yesterday" outranks "active
    all of last quarter" — the standard recency-weighted engagement
    score, and (by exponential self-similarity) one that can be
    maintained incrementally: advancing the reference day d days
    multiplies every score by the same 2^(-d/h), so stored scores
    decay in place without re-scanning history.

    Portability is the design constraint: a float pow(2, -age/h)
    differs between JVM StrictMath and C libm in the last ulp, which
    the driver's value hash would catch. Ages quantize to WHOLE
    half-life buckets instead — weights become exact binary fractions
    (1, 1/2, 1/4, ...) whose decimal-cast sums are order-independent
    and bit-identical in both engines. The rollup partial-aggregates
    per user; the top-k is a TakeOrdered with id tiebreak.
    """
    if halflife_days < 1:
        raise ValueError(f"halflife_days must be >= 1 (got {halflife_days})")
    now = events.agg(F.max(F.date_trunc("day", "ts")).alias("__now"))
    aged = events.crossJoin(F.broadcast(now)).select(
        "user_id",
        # explicit floor: DuckDB's double->INT cast ROUNDS while
        # Spark's truncates — an off-by-one bucket for every age in
        # the upper half of a half-life (caught by the value hash).
        # Clamp at 18 buckets: 2^-b needs exactly b decimal digits, so
        # DECIMAL(28,18) holds every weight EXACTLY only through b=18;
        # beyond that the double->decimal cast must round and Spark's
        # HALF_UP is not guaranteed to match DuckDB's. Weights below
        # 2^-18 (~4e-6) are noise for a top-k score; the floor keeps
        # both engines bit-exact at any history length.
        F.least(
            F.floor(F.datediff(F.col("__now"), F.date_trunc("day", "ts"))
                    / F.lit(halflife_days)).cast("int"),
            F.lit(18),
        ).alias("__buckets"),
    )
    weight = F.lit(1.0) / F.pow(F.lit(2.0), F.col("__buckets"))
    return (
        aged.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(weight.cast("decimal(28,18)")).cast("double")
             .alias("decayed_score"))
        .orderBy(F.col("decayed_score").desc(), "user_id")
        .limit(k)
    )


def _q_decayed(spark, sf):
    return decayed_user_activity(read_table(spark, sf, "events"))


QUERIES["decayed_user_activity"] = _q_decayed

ORACLES["decayed_user_activity"] = f"""
    WITH nowd AS (
        SELECT MAX(date_trunc('day', ts)) AS now_day FROM events
    ), aged AS (
        SELECT user_id,
               least(CAST(floor(date_diff('day', date_trunc('day', ts),
                                          now_day)
                    / {DECAY_HALFLIFE_DAYS}.0) AS INT), 18) AS buckets
        FROM events CROSS JOIN nowd
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(1.0 / power(2.0, buckets)
                         AS DECIMAL(28,18))) AS DOUBLE) AS decayed_score
    FROM aged
    GROUP BY user_id
    ORDER BY decayed_score DESC, user_id
    LIMIT {DECAY_TOPK}
"""
