"""Engine-portable distinct-count sketches: KMV and HyperLogLog.

Spark ships Datasketches HLL (`F.hll_sketch_agg`, used by
`sessions.daily_distinct_users_hll`) — but its binary sketches have no
DuckDB twin, so those queries are only rows-checked. This module
re-derives both classic distinct sketches on the repo's portable
md5-derived hashing (`functions/rand.py:md5_int40`) with estimators
arranged so every intermediate is EXACT int64 arithmetic and the final
estimate is a single correctly-rounded float op — which makes the
driver's value-hash gate able to verify a *sketch* bit-for-bit against
DuckDB. Same move that flipped minhash/simhash from rows-only to
hash-checked in round 3 (operators/llm.py:319).

Reference parity: the reference engine exposes no sketches — this is
part of the large-scale-pipeline extension surface (SURVEY.md §6), the
machinery that turns "count distinct users over 100 TB" from a
shuffle-everything aggregation into a mergeable fixed-size state.

KMV (k minimum values; Bar-Yossef et al. 2002): keep the k smallest
distinct hash values per group; with U = kth smallest / 2^40,
D ≈ (k-1)/U. Mergeable: union the kept sets, re-prune to k.

HyperLogLog (Flajolet et al. 2007): m = 2^p registers per group, each
the max of a geometric observable over the keys routed to it. The
observable here is TRAILING zeros of the hash remainder (the
Flajolet–Martin / PCSA position-of-lowest-set-bit, identically
Geometric(1/2) for uniform bits) rather than leading zeros, because
the lowest set bit `w & -w` is computable EXACTLY in both engines with
two's-complement bitwise ops + log2 of an exact power of two — no
floor(log(w)/log(2)) boundary bugs. Registers merge by max — the
`hll_distinct_users_merged` query proves mergeability end-to-end by
having Spark merge per-day register tables while the oracle sketches
the raw stream in one pass: equality is exact, not approximate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_exporter_spark.functions.rand import md5_int40, md5_int40_sql
from hive_exporter_spark.sources.files import read_table

HASH_BITS = 40  # md5_int40 emits x ∈ [0, 2^40)

# --------------------------------------------------------------------------
# KMV
# --------------------------------------------------------------------------

KMV_K = 64
KMV_SALT_BUCKETS = 16


def kmv_distinct(df: DataFrame, key_col: str,
                 group_cols: Sequence[str],
                 k: int = KMV_K,
                 salt_buckets: int = KMV_SALT_BUCKETS) -> DataFrame:
    """Per-group distinct-count estimate via the k minimum hash values.

    Two-phase min-k so no single task ever sorts a whole group's
    distinct set (the KMV skew trap — one hot group with 10^9 distinct
    keys would otherwise become one window partition):

    1. LOCAL prune: rank within (group, salt) where salt = h mod S —
       the hash itself spreads a group's values uniformly over S
       sub-partitions, each ranked concurrently; `dense_rank ≤ k`
       keeps ≤ k distinct values per sub-partition WITHOUT a prior
       corpus-wide `distinct()` exchange (duplicate hashes share a
       dense rank and are collapsed by the post-prune `distinct()`,
       which now runs on ≤ |groups|·S·k rows).
    2. GLOBAL prune: re-rank the ≤ S·k survivors per group and keep
       the true k minima. This window is histogram-sized, not
       data-sized — the deliberate narrow step.

    The whole-data cost is ONE exchange (phase-1 window) carrying
    (group, 8-byte hash). Estimator: n<k ⇒ exact n (the sketch
    degenerates to an exact distinct count); else (k-1)·2^40/kth —
    exact-int64-over-exact-int64 in one IEEE division, so DuckDB
    reproduces the estimate bit-for-bit.
    """
    kept = kmv_kept(df, key_col, group_cols, k, salt_buckets)
    gcols = list(group_cols)
    num = float((k - 1) * (1 << HASH_BITS))  # < 2^53: exact in double
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.round(F.lit(num) / F.col("kth_hash"), 4))
    return (
        kept.groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.max("__h").alias("kth_hash"))
        .select(*gcols, "n_kept", "kth_hash", est.alias("est_distinct"))
    )


def kmv_kept(df: DataFrame, key_col: str, group_cols: Sequence[str],
             k: int = KMV_K,
             salt_buckets: int = KMV_SALT_BUCKETS) -> DataFrame:
    """The kept-set itself — (group, __h) rows holding each group's k
    smallest distinct hash values. This IS the mergeable sketch state
    (union kept-sets, re-prune to k) and the substrate for the
    theta-sketch set algebra in `theta_overlap`."""
    if not 1 < k <= 1 << 20:
        raise ValueError(f"k must be in (1, 2^20] (got {k})")
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1 (got {salt_buckets})")
    gcols = list(group_cols)
    # NULL keys hash to NULL (md5(NULL) is NULL); drop them BEFORE the
    # window — Spark sorts NULL first, DuckDB last, so a surviving
    # NULL would put the engines' kept-sets out of step.
    base = (df.select(*gcols, md5_int40(key_col).alias("__h"))
            .where(F.col("__h").isNotNull()))
    w1 = (Window.partitionBy(*gcols, F.pmod(F.col("__h"), F.lit(salt_buckets)))
          .orderBy("__h"))
    local = (
        base.withColumn("__dr", F.dense_rank().over(w1))
        .where(F.col("__dr") <= k)
        .select(*gcols, "__h")
        .distinct()
    )
    w2 = Window.partitionBy(*gcols).orderBy("__h")
    return (local.withColumn("__rn", F.row_number().over(w2))
            .where(F.col("__rn") <= k).drop("__rn"))


def kmv_distinct_sql(table: str, key_expr: str,
                     group_cols: Sequence[str],
                     k: int = KMV_K) -> str:
    """DuckDB twin of `kmv_distinct` (same hash, same estimator)."""
    g = ", ".join(group_cols)
    num = repr(float((k - 1) * (1 << HASH_BITS)))
    return f"""
        WITH h AS (
            SELECT DISTINCT {g}, {md5_int40_sql(key_expr)} AS h
            FROM {table} WHERE {key_expr} IS NOT NULL
        ), r AS (
            SELECT {g}, h,
                   row_number() OVER (PARTITION BY {g} ORDER BY h) AS rn
            FROM h
        )
        SELECT {g},
               COUNT(*) AS n_kept,
               MAX(h) AS kth_hash,
               CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE round({num} / MAX(h), 4) END AS est_distinct
        FROM r WHERE rn <= {k} GROUP BY {g}
    """


# --------------------------------------------------------------------------
# HyperLogLog (portable)
# --------------------------------------------------------------------------

HLL_P = 8  # m = 256 registers/group: ±~6.5% typical, 256 rows of state


def _hll_alpha(m: int) -> float:
    # Flajolet et al. 2007 §4 bias constant (m >= 128 branch).
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, key_col: str,
                  group_cols: Sequence[str],
                  p: int = HLL_P) -> DataFrame:
    """(group, bucket, rho) register table — the mergeable sketch state.

    bucket = top p bits of the 40-bit hash; w = low (40-p) bits;
    rho = 1 + trailing zeros of w (w=0 ⇒ the max, 41-p). All integer:
    the lowest set bit is `w & -w`, an exact power of two whose log2
    is exact in IEEE (rounded to kill any ulp worry). groupBy MAX is
    a partial agg — map-side combine bounds every exchange at
    m rows per group per task regardless of input size, which is the
    entire point of HLL at 100 TB.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16] (got {p})")
    gcols = list(group_cols)
    width = HASH_BITS - p
    x = md5_int40(key_col)
    # NULL keys hash to NULL: bucket/rho would both be NULL and the
    # engines disagree on NULL grouping order downstream — drop them.
    df = df.where(F.col(key_col).isNotNull())
    w = x.bitwiseAND(F.lit((1 << width) - 1))
    t = w.bitwiseAND(-w)  # lowest set bit: exact power of two
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.round(F.log2(t)).cast("int") + F.lit(1))
    return (
        df.select(*gcols,
                  F.shiftright(x, width).alias("bucket"),
                  rho.alias("__rho"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("__rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: Sequence[str],
                 p: int = HLL_P) -> DataFrame:
    """Estimate per group from a register table.

    The harmonic indicator Z = Σ 2^-rho is held EXACT by scaling every
    term to the integer 2^(width+1-rho) (≤ 2^(41-p), summed over ≤ 2^p
    buckets ⇒ < 2^42: exact int64). Absent buckets contribute the
    rho=0 term. The only float ops are one division (raw estimate) and
    — in the small-range regime — m·ln(m/V) linear counting, both
    rounded to 4 dp so Spark and DuckDB agree bit-for-bit.
    """
    gcols = list(group_cols)
    m, width = 1 << p, HASH_BITS - p
    scale = 1 << (width + 1)
    c = repr(_hll_alpha(m) * m * m * scale)
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({width + 1} - rho AS INT))")
    per = registers.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(term).alias("__s"))
    v = F.lit(m) - F.col("n_buckets")
    s_total = F.col("__s") + v.cast("long") * F.lit(scale)
    raw = F.lit(float(c)) / s_total
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / v), 4),
    ).otherwise(F.round(raw, 4))
    return per.select(*gcols, "n_buckets", est.alias("est_distinct"))


def hll_distinct(df: DataFrame, key_col: str,
                 group_cols: Sequence[str],
                 p: int = HLL_P) -> DataFrame:
    """One-shot per-group HLL distinct estimate (registers + estimate)."""
    return hll_estimate(hll_registers(df, key_col, group_cols, p),
                        group_cols, p)


def hll_merge(register_tables: Sequence[DataFrame],
              group_cols: Sequence[str]) -> DataFrame:
    """Merge register tables (e.g. per-day sketches) by register max.

    Lossless by construction: max is associative/commutative, so
    merging per-partition sketches equals sketching the union — the
    pre-aggregation pattern that answers any-day-range distincts from
    a (day, group, 256-row) rollup instead of the raw stream.
    """
    gcols = list(group_cols)
    unioned = register_tables[0]
    for r in register_tables[1:]:
        unioned = unioned.unionByName(r)
    return (unioned.groupBy(*gcols, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_distinct_sql(table: str, key_expr: str, group_cols: Sequence[str],
                     p: int = HLL_P) -> str:
    """DuckDB twin of `hll_distinct` (same registers, same estimator)."""
    g = ", ".join(group_cols)
    m, width = 1 << p, HASH_BITS - p
    scale = 1 << (width + 1)
    c = repr(_hll_alpha(m) * m * m * scale)
    x = md5_int40_sql(key_expr)
    w = f"(x & {(1 << width) - 1})"
    return f"""
        WITH base AS (
            SELECT {g}, {x} AS x FROM {table}
            WHERE {key_expr} IS NOT NULL
        ), obs AS (
            SELECT {g}, x >> {width} AS bucket,
                   CASE WHEN {w} = 0 THEN {width + 1}
                        ELSE CAST(round(log2({w} & -{w})) AS INT) + 1
                   END AS rho
            FROM base
        ), regs AS (
            SELECT {g}, bucket, MAX(rho) AS rho
            FROM obs GROUP BY {g}, bucket
        ), per AS (
            SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n_buckets,
                   CAST(SUM(CAST(1 AS BIGINT) << ({width + 1} - rho))
                        AS BIGINT) AS s
            FROM regs GROUP BY {g}
        )
        SELECT {g}, n_buckets,
               CASE WHEN {c} / (s + ({m} - n_buckets) * {scale})
                         <= {2.5 * m}
                         AND n_buckets < {m}
                    THEN round({float(m)!r} * ln({float(m)!r}
                               / ({m} - n_buckets)), 4)
                    ELSE round({c} / (s + ({m} - n_buckets) * {scale}), 4)
               END AS est_distinct
        FROM per
    """


# Datasketches HLL default lgConfigK=12 -> rsd ~1.6%; a 15% band is
# a ~9x margin, so only a broken sketch flips the verdict.
DS_HLL_TOL = 0.15


def hll_kmv_crosscheck(events: DataFrame) -> DataFrame:
    """Cross-engine distinct-estimate audit for the Datasketches HLL
    entries (`daily_distinct_users_hll` / `rolling_distinct_users_hll`
    — rows-only: their sketch internals have no DuckDB twin), closing
    VERDICT r5 item 2's last gap. Per event_type:

    - `exact_users`, the portable KMV estimate, and its relative
      error are fully deterministic — the oracle replays them
      bit-exactly (same hash family, same estimator arithmetic);
    - the Datasketches estimate gets a BOUNDED VERDICT boolean
      (within `DS_HLL_TOL` of exact) and a merge-losslessness boolean
      (union of per-day sketches == one direct sketch), both pinned
      TRUE by the oracle — if the engine sketch ever drifts or
      merging stops being lossless, the driver row goes red.

    Four scans of events (exact, KMV, direct sketch, daily+merge
    sketch — the latter two ARE the audited operators' shapes); all
    joins are group-count-sized.
    """
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"))
    kmv = kmv_distinct(events, "user_id", ["event_type"]).select(
        "event_type", F.col("est_distinct").alias("kmv_est"))
    direct = (
        events.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select("event_type",
                F.hll_sketch_estimate("sk").cast("long").alias("__ds")))
    merged = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type").agg(F.hll_union_agg("sk").alias("sk"))
        .select("event_type",
                F.hll_sketch_estimate("sk").cast("long").alias("__ds_merged")))
    ds_ok = (F.abs(F.col("__ds") - F.col("exact_users"))
             <= DS_HLL_TOL * F.col("exact_users"))
    return (
        exact.join(kmv, "event_type")
        .join(direct, "event_type")
        .join(merged, "event_type")
        .select(
            "event_type", "exact_users", "kmv_est",
            F.round(F.abs(F.col("kmv_est") - F.col("exact_users"))
                    / F.col("exact_users"), 6).alias("kmv_rel_err"),
            ds_ok.alias("ds_hll_within_tol"),
            (F.col("__ds") == F.col("__ds_merged"))
            .alias("ds_hll_merge_lossless"),
        )
        .orderBy("event_type")
    )


def _q_hll_kmv_crosscheck(spark: SparkSession, sf: str) -> DataFrame:
    return hll_kmv_crosscheck(read_table(spark, sf, "events"))


HLL_KMV_CROSSCHECK_SQL = f"""
    WITH kmv AS ({kmv_distinct_sql("events", "user_id", ["event_type"])}),
    ex AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
        FROM events GROUP BY event_type
    )
    SELECT ex.event_type, exact_users,
           kmv.est_distinct AS kmv_est,
           round(abs(kmv.est_distinct - exact_users) / exact_users, 6)
               AS kmv_rel_err,
           TRUE AS ds_hll_within_tol,
           TRUE AS ds_hll_merge_lossless
    FROM ex JOIN kmv ON ex.event_type = kmv.event_type
    ORDER BY ex.event_type
"""


# --------------------------------------------------------------------------
# Registry queries
# --------------------------------------------------------------------------

def _q_kmv(spark: SparkSession, sf: str) -> DataFrame:
    return kmv_distinct(read_table(spark, sf, "events"), "user_id",
                        ["event_type"])


def _q_hll(spark: SparkSession, sf: str) -> DataFrame:
    return hll_distinct(read_table(spark, sf, "events"), "user_id",
                        ["event_type"])


def _q_hll_merged(spark: SparkSession, sf: str) -> DataFrame:
    # Spark side: sketch per (day, type), then MERGE the daily register
    # tables down to per-type. The oracle sketches the raw stream
    # directly per type — exact equality of the two IS the mergeability
    # proof, enforced by the driver's value hash.
    ev = read_table(spark, sf, "events").withColumn(
        "day", F.date_trunc("day", "ts"))
    daily = hll_registers(ev, "user_id", ["day", "event_type"])
    return hll_estimate(hll_merge([daily], ["event_type"]),
                        ["event_type"])


QUERIES = {
    "kmv_distinct_users": _q_kmv,
    "hll_distinct_users": _q_hll,
    "hll_distinct_users_merged": _q_hll_merged,
    "hll_kmv_crosscheck": _q_hll_kmv_crosscheck,
}

ORACLES = {
    "kmv_distinct_users": kmv_distinct_sql(
        "events", "user_id", ["event_type"]),
    "hll_distinct_users": hll_distinct_sql("events", "user_id", ["event_type"]),
    # Merged == direct by max-associativity; the oracle is the direct
    # single-pass sketch.
    "hll_distinct_users_merged": hll_distinct_sql(
        "events", "user_id", ["event_type"]),
    "hll_kmv_crosscheck": HLL_KMV_CROSSCHECK_SQL,
}


# --------------------------------------------------------------------------
# Count-min sketch (portable)
# --------------------------------------------------------------------------

# Cormode & Muthukrishnan 2005. d Carter-Wegman rows over the md5
# 28-bit base (same overflow-free family as the minhash slots,
# operators/llm.py:319: a·x+b < 2^59, exact in checked int64, so the
# DuckDB oracle replicates every cell). Counters merge by ADDITION —
# per-partition sketches sum into the corpus sketch, the frequency
# twin of HLL's max-merge. est(x) = min_i cell[i, h_i(x)] ≥ true
# count, with overestimate ≤ 2N/w at probability 1 - 2^-d.
CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_P = 2147483647  # 2^31 - 1 (Mersenne), same modulus as minhash
import random as _random  # noqa: E402  (module-constant generation only)
_rng = _random.Random(0xC0FFEE)
CMS_COEF = tuple(
    (_rng.randrange(1, CMS_P), _rng.randrange(0, CMS_P))
    for _ in range(CMS_DEPTH)
)
del _rng

_MD5_BASE28 = "CAST('0x' || substr(md5({expr}), 1, 7) AS BIGINT)"


def _cms_base28(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def _cms_cells(x: F.Column, width: int) -> F.Column:
    """The d exploded (row, col) cells for a key's base value — ONE
    definition shared by insert and probe, because the sketch only
    works if both sides hash identically."""
    return F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            (((F.lit(a) * x + F.lit(b)) % CMS_P) % width).alias("col"),
        )
        for i, (a, b) in enumerate(CMS_COEF)
    ]))


def cms_counters(counts: DataFrame, key_col: str, count_col: str,
                 width: int = CMS_WIDTH) -> DataFrame:
    """(row, col, c) counter cells from an exact (key, count) table.

    Input is the ALREADY-AGGREGATED per-key count (the canonical
    wordcount shape — vocabulary-bounded, map-side combined), so the
    explode emits d rows per DISTINCT key, not per occurrence; the
    final groupBy carries ≤ d·width rows per partition. The sketch is
    a fixed d×w table regardless of corpus size — the whole point.
    """
    cells = _cms_cells(_cms_base28(F.col(key_col)), width).alias("cell")
    return (
        counts.select(cells, F.col(count_col).alias("__c"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.sum("__c").alias("c"))
    )


def cms_lookup(counters: DataFrame, keys: DataFrame, key_col: str,
               width: int = CMS_WIDTH) -> DataFrame:
    """Point-estimate each key in `keys`: min over the d counter cells.

    The d×w counter table is tiny (≤ 4096 rows here) — broadcast, so
    the probe side never shuffles. Keys absent from every cell
    estimate 0 (left join + coalesce): the sketch never underestimates.
    """
    probes = keys.select(
        key_col,
        _cms_cells(_cms_base28(F.col(key_col)), width).alias("cell"),
    ).select(key_col, F.col("cell.row").alias("row"),
             F.col("cell.col").alias("col"))
    return (
        probes.join(F.broadcast(counters), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )


CMS_TOP_TERMS = 50


def cms_token_freq(documents: DataFrame,
                   top_n: int = CMS_TOP_TERMS,
                   width: int = CMS_WIDTH) -> DataFrame:
    """Corpus token frequencies through a count-min sketch, reported
    against the exact counts for the top_n most frequent tokens.

    Pipeline: exact wordcount (vocab-bounded) → CMS cells → point
    lookups for the deterministic top-n (count desc, token asc). The
    output carries both the exact and the sketch count so the
    ≥-property and the error bound are directly visible — and
    driver-verifiable, since every cell is portable integer math.
    """
    from hive_exporter_spark.operators.llm import tokens_col

    counts = (
        documents.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    counters = cms_counters(counts, "token", "cnt", width)
    top = counts.orderBy(F.col("cnt").desc(), "token").limit(top_n)
    return (
        cms_lookup(counters, top.select("token"), "token", width)
        .join(F.broadcast(top), "token")
        .select("token", F.col("cnt").alias("cnt_exact"),
                F.col("est_count").alias("cnt_cms"))
    )


def _q_cms(spark: SparkSession, sf: str) -> DataFrame:
    return cms_token_freq(read_table(spark, sf, "documents"))


QUERIES["cms_token_freq"] = _q_cms

from hive_exporter_spark.operators.llm import TOKS_SQL as _TOKS_SQL  # noqa: E402

_CMS_COEF_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(CMS_COEF))

ORACLES["cms_token_freq"] = f"""
    WITH toks AS (
        SELECT unnest({_TOKS_SQL}) AS token FROM documents
    ), counts AS (
        SELECT token, COUNT(*) AS cnt,
               {_MD5_BASE28.format(expr='token')} AS x
        FROM toks GROUP BY token
    ), coef(i, a, b) AS (
        VALUES {_CMS_COEF_VALUES}
    ), cells AS (
        SELECT i, ((a * x + b) % {CMS_P}) % {CMS_WIDTH} AS col,
               CAST(SUM(cnt) AS BIGINT) AS c
        FROM counts CROSS JOIN coef
        GROUP BY 1, 2
    ), top AS (
        SELECT token, cnt, x FROM counts
        ORDER BY cnt DESC, token LIMIT {CMS_TOP_TERMS}
    )
    SELECT top.token, CAST(top.cnt AS BIGINT) AS cnt_exact,
           CAST(MIN(cells.c) AS BIGINT) AS cnt_cms
    FROM top CROSS JOIN coef
    JOIN cells ON cells.i = coef.i
              AND cells.col = ((coef.a * top.x + coef.b) % {CMS_P})
                              % {CMS_WIDTH}
    GROUP BY top.token, top.cnt
"""


# --------------------------------------------------------------------------
# Theta-sketch set algebra over KMV kept-sets
# --------------------------------------------------------------------------

THETA_FULL = 1 << HASH_BITS  # "exact" theta: every hash retained


def theta_overlap(df: DataFrame, key_col: str, group_col: str,
                  k: int = KMV_K) -> DataFrame:
    """Distinct-set union / intersection / Jaccard estimates between
    every pair of groups, from each group's KMV kept-set — the theta
    sketch framework (Dasgupta, Lang, Rhodes 2016): set algebra that
    exact distinct-counting simply cannot do post-aggregation.

    Per group: theta = kth smallest hash (or 2^40 when the group has
    fewer than k distinct keys — the sketch is then exact). Per pair:
    theta_u = min(theta_a, theta_b); every kept hash below theta_u is
    a uniform sample of that group's key-set at rate theta_u/2^40, so
    |∩| ≈ n_i·2^40/theta_u and |∪| ≈ (n_a + n_b − n_i)·2^40/theta_u.

    Scale shape: the ONLY data-sized work is building the kept-sets
    (kmv_kept's single salted exchange). Everything pairwise runs on
    k-row sketches — broadcast joins by construction — so comparing
    1000 cohorts costs 1000·k rows of state, not another corpus scan
    per pair. Deterministic integer/hash math end-to-end: the DuckDB
    oracle reproduces every estimate bit-for-bit.
    """
    kept = kmv_kept(df, key_col, [group_col], k).localCheckpoint(eager=False)
    stats = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n"), F.max("__h").alias("__kth"))
    th = stats.select(
        group_col,
        F.when(F.col("__n") < k, F.lit(THETA_FULL))
        .otherwise(F.col("__kth")).alias("theta"))
    pa = th.select(F.col(group_col).alias("__ga"),
                   F.col("theta").alias("__ta"))
    pb = th.select(F.col(group_col).alias("__gb"),
                   F.col("theta").alias("__tb"))
    pairs = (pa.join(pb, F.col("__ga") < F.col("__gb"))
             .select("__ga", "__gb",
                     F.least("__ta", "__tb").alias("__theta_u")))
    ka = kept.select(F.col(group_col).alias("__ga"), "__h")
    kb = kept.select(F.col(group_col).alias("__gb"),
                     F.col("__h").alias("__hb"))
    below = F.col("__h") < F.col("__theta_u")
    n_a = (ka.join(F.broadcast(pairs), "__ga").where(below)
           .groupBy("__ga", "__gb").agg(F.count(F.lit(1)).alias("__n_a")))
    n_b = (kb.join(F.broadcast(pairs), "__gb")
           .where(F.col("__hb") < F.col("__theta_u"))
           .groupBy("__ga", "__gb").agg(F.count(F.lit(1)).alias("__n_b")))
    n_i = (ka.join(kb, (F.col("__h") == F.col("__hb"))
                   & (F.col("__ga") < F.col("__gb")))
           .join(F.broadcast(pairs), ["__ga", "__gb"]).where(below)
           .groupBy("__ga", "__gb").agg(F.count(F.lit(1)).alias("__n_i")))
    full = F.lit(float(THETA_FULL))
    res = (pairs.join(n_a, ["__ga", "__gb"], "left")
           .join(n_b, ["__ga", "__gb"], "left")
           .join(n_i, ["__ga", "__gb"], "left"))
    ni = F.coalesce(F.col("__n_i"), F.lit(0))
    nu = (F.coalesce(F.col("__n_a"), F.lit(0))
          + F.coalesce(F.col("__n_b"), F.lit(0)) - ni)
    return res.select(
        F.col("__ga").alias(f"{group_col}_a"),
        F.col("__gb").alias(f"{group_col}_b"),
        ni.cast("long").alias("n_common"),
        F.round(ni * full / F.col("__theta_u"), 4).alias("est_intersection"),
        F.round(nu * full / F.col("__theta_u"), 4).alias("est_union"),
        F.when(nu > 0, F.round(ni.cast("double") / nu, 6))
        .otherwise(F.lit(0.0)).alias("est_jaccard"),
    )


def theta_overlap_sql(table: str, key_expr: str, group_col: str,
                      k: int = KMV_K) -> str:
    """DuckDB twin of `theta_overlap` (same sketches, same algebra)."""
    full = float(THETA_FULL)
    return f"""
        WITH h AS (
            SELECT DISTINCT {group_col} AS g,
                   {md5_int40_sql(key_expr)} AS h
            FROM {table} WHERE {key_expr} IS NOT NULL
        ), r AS (
            SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
            FROM h
        ), kept AS (
            SELECT g, h FROM r WHERE rn <= {k}
        ), th AS (
            SELECT g,
                   CASE WHEN COUNT(*) < {k} THEN {THETA_FULL}
                        ELSE MAX(h) END AS theta
            FROM kept GROUP BY g
        ), pairs AS (
            SELECT a.g AS ga, b.g AS gb,
                   least(a.theta, b.theta) AS theta_u
            FROM th a JOIN th b ON a.g < b.g
        ), na AS (
            SELECT ga, gb, COUNT(*) AS n_a
            FROM pairs JOIN kept ON kept.g = ga AND kept.h < theta_u
            GROUP BY ga, gb
        ), nb AS (
            SELECT ga, gb, COUNT(*) AS n_b
            FROM pairs JOIN kept ON kept.g = gb AND kept.h < theta_u
            GROUP BY ga, gb
        ), ni AS (
            SELECT ga, gb, COUNT(*) AS n_i
            FROM pairs
            JOIN kept ka ON ka.g = ga AND ka.h < theta_u
            JOIN kept kb ON kb.g = gb AND kb.h = ka.h
            GROUP BY ga, gb
        )
        SELECT ga AS {group_col}_a, gb AS {group_col}_b,
               CAST(COALESCE(n_i, 0) AS BIGINT) AS n_common,
               round(COALESCE(n_i, 0) * {full!r} / theta_u, 4)
                   AS est_intersection,
               round((COALESCE(n_a, 0) + COALESCE(n_b, 0)
                      - COALESCE(n_i, 0)) * {full!r} / theta_u, 4)
                   AS est_union,
               CASE WHEN (COALESCE(n_a, 0) + COALESCE(n_b, 0)
                          - COALESCE(n_i, 0)) > 0
                    THEN round(CAST(COALESCE(n_i, 0) AS DOUBLE)
                               / (COALESCE(n_a, 0) + COALESCE(n_b, 0)
                                  - COALESCE(n_i, 0)), 6)
                    ELSE 0.0 END AS est_jaccard
        FROM pairs
        LEFT JOIN na USING (ga, gb)
        LEFT JOIN nb USING (ga, gb)
        LEFT JOIN ni USING (ga, gb)
    """


def _q_theta(spark: SparkSession, sf: str) -> DataFrame:
    return theta_overlap(read_table(spark, sf, "events"), "user_id",
                         "event_type")


QUERIES["theta_audience_overlap"] = _q_theta
ORACLES["theta_audience_overlap"] = theta_overlap_sql(
    "events", "user_id", "event_type")


# --------------------------------------------------------------------------
# Mergeable histogram quantiles
# --------------------------------------------------------------------------

HIST_BINS = 128
HIST_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def histogram_bins(df: DataFrame, value_col: str,
                   group_cols: Sequence[str],
                   n_bins: int = HIST_BINS) -> DataFrame:
    """(group, bin, n, lo, hi) equi-width bin counts — the mergeable
    quantile-sketch state (bins over the same [lo, hi] merge by count
    ADDITION, like count-min cells).

    Two passes by design: a min/max agg (map-side combined, one tiny
    broadcast back) fixes the bin edges, then one partial-agg count
    pass. Spark's approx_percentile avoids the second pass but its
    binary KLL state has no engine twin; this sketch's state is ≤
    n_bins rows per group of plain integers+doubles, so the DuckDB
    oracle replays it bit-for-bit. The bin formula
    floor((v-lo)/(hi-lo)·n) is the same IEEE expression in both
    engines; v = hi clamps into the last bin.
    """
    if not 1 < n_bins <= 1 << 16:
        raise ValueError(f"n_bins must be in (1, 65536] (got {n_bins})")
    gcols = list(group_cols)
    # NULL values carry no position: floor((NULL-lo)/...) is NULL and
    # least(NULL, n-1) is the non-null arg in BOTH engines, which
    # would silently dump every NULL row into the top bin.
    df = df.where(F.col(value_col).isNotNull())
    edges = df.groupBy(*gcols).agg(
        F.min(value_col).cast("double").alias("lo"),
        F.max(value_col).cast("double").alias("hi"))
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.col("lo")) / (F.col("hi") - F.col("lo"))
                  * F.lit(float(n_bins)))
    bin_ = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(raw, F.lit(n_bins - 1))).cast("int")
    return (
        df.join(F.broadcast(edges), gcols)
        .select(*gcols, "lo", "hi", bin_.alias("bin"))
        .groupBy(*gcols, "lo", "hi", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantiles_from_histogram(bins: DataFrame, group_cols: Sequence[str],
                             qs: Sequence[float] = HIST_QS,
                             n_bins: int = HIST_BINS) -> DataFrame:
    """Per-group quantile estimates from a bin-count table: the first
    bin whose cumulative count reaches ceil(q·N), reported at the bin
    MIDPOINT — error ≤ half a bin width, deterministic (no within-bin
    interpolation float chains to drift between engines).

    The cumulative window runs over ≤ n_bins rows per group — sketch
    state, not data. Output one row per (group, q). All qs are
    answered in ONE pass: each cum row is exploded against the q list
    (a per-q union of branches would re-run the bin build — and the
    data scan under it — once per quantile).
    """
    gcols = list(group_cols)
    w = (Window.partitionBy(*gcols).orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (bins.withColumn("cum", F.sum("n").over(w))
           .withColumn("total",
                       F.sum("n").over(Window.partitionBy(*gcols)))
           .withColumn("q", F.explode(F.array(*[F.lit(q) for q in qs]))))
    hit = (cum.where(F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
           .groupBy(*gcols, "lo", "hi", "q")
           .agg(F.min("bin").alias("bin")))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    est = F.when(
        F.col("hi") == F.col("lo"), F.col("lo")
    ).otherwise(F.col("lo") + (F.col("bin") + F.lit(0.5)) * width)
    return hit.select(*gcols, "q", F.round(est, 6).alias("est_value"))


def value_quantiles_hist(df: DataFrame, value_col: str,
                         group_cols: Sequence[str],
                         qs: Sequence[float] = HIST_QS,
                         n_bins: int = HIST_BINS) -> DataFrame:
    """One-shot mergeable-histogram quantiles (bins + estimate)."""
    return quantiles_from_histogram(
        histogram_bins(df, value_col, group_cols, n_bins),
        group_cols, qs, n_bins)


def value_quantiles_hist_sql(table: str, value_expr: str, group_col: str,
                             qs: Sequence[float] = HIST_QS,
                             n_bins: int = HIST_BINS) -> str:
    """DuckDB twin of `value_quantiles_hist` (same bins, same picks)."""
    q_values = ", ".join(f"({q!r})" for q in qs)
    return f"""
        WITH src AS (
            SELECT * FROM {table} WHERE {value_expr} IS NOT NULL
        ), edges AS (
            SELECT {group_col},
                   CAST(MIN({value_expr}) AS DOUBLE) AS lo,
                   CAST(MAX({value_expr}) AS DOUBLE) AS hi
            FROM src GROUP BY {group_col}
        ), binned AS (
            SELECT t.{group_col}, e.lo, e.hi,
                   CASE WHEN e.hi = e.lo THEN 0
                        ELSE CAST(least(
                            floor((CAST(t.{value_expr} AS DOUBLE) - e.lo)
                                  / (e.hi - e.lo) * {float(n_bins)!r}),
                            {n_bins - 1}) AS INT)
                   END AS bin
            FROM src t JOIN edges e USING ({group_col})
        ), bins AS (
            SELECT {group_col}, lo, hi, bin, COUNT(*) AS n
            FROM binned GROUP BY {group_col}, lo, hi, bin
        ), cum AS (
            SELECT {group_col}, lo, hi, bin, n,
                   SUM(n) OVER (PARTITION BY {group_col} ORDER BY bin
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(n) OVER (PARTITION BY {group_col}) AS total
            FROM bins
        ), qs(q) AS (
            VALUES {q_values}
        ), hit AS (
            SELECT {group_col}, lo, hi, q, MIN(bin) AS bin
            FROM cum CROSS JOIN qs
            WHERE cum >= ceil(q * total)
            GROUP BY {group_col}, lo, hi, q
        )
        SELECT {group_col}, q,
               round(CASE WHEN hi = lo THEN lo
                          ELSE lo + (bin + 0.5)
                               * ((hi - lo) / {float(n_bins)!r})
                     END, 6) AS est_value
        FROM hit
    """


def _q_hist_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    return value_quantiles_hist(read_table(spark, sf, "events"),
                                "value", ["event_type"])


QUERIES["value_quantiles_hist"] = _q_hist_quantiles
ORACLES["value_quantiles_hist"] = value_quantiles_hist_sql(
    "events", "value", "event_type")


# --------------------------------------------------------------------------
# Heavy-distinct detection (super-spreaders)
# --------------------------------------------------------------------------

SPREADER_P = 4   # m=16 registers per entity: coarse but 16 rows/user
SPREADER_TOP = 20


def superspreaders(df: DataFrame, entity_col: str, key_col: str,
                   p: int = SPREADER_P,
                   top_n: int = SPREADER_TOP) -> DataFrame:
    """Entities with the highest estimated DISTINCT-key counts — the
    security/abuse "super-spreader" query (IPs contacting the most
    distinct hosts, users active the most distinct days) at per-entity
    sketch cost: m=2^p registers per entity instead of a distinct-set
    per entity, so the exchange is bounded at m rows per entity
    regardless of how heavy the entity is. Global top-n is a
    TakeOrdered (no global sort); ties break on the entity id.
    """
    est = hll_distinct(df, key_col, [entity_col], p)
    return (est.select(entity_col,
                       F.col("est_distinct").alias("est_distinct_keys"))
            .orderBy(F.col("est_distinct_keys").desc(), entity_col)
            .limit(top_n))


def superspreaders_sql(table: str, entity_col: str, key_expr: str,
                       p: int = SPREADER_P,
                       top_n: int = SPREADER_TOP) -> str:
    """DuckDB twin of `superspreaders`."""
    inner = hll_distinct_sql(table, key_expr, [entity_col], p)
    return f"""
        SELECT {entity_col}, est_distinct AS est_distinct_keys
        FROM ({inner})
        ORDER BY est_distinct_keys DESC, {entity_col}
        LIMIT {top_n}
    """


def _q_spreaders(spark: SparkSession, sf: str) -> DataFrame:
    # day as an explicit yyyy-MM-dd STRING: the md5 coin hashes the
    # stringified key, and timestamp->string rendering is the one spot
    # where engines drift; a formatted date is unambiguous in both.
    ev = read_table(spark, sf, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd"))
    return superspreaders(ev, "user_id", "day")


QUERIES["superspreader_users"] = _q_spreaders
ORACLES["superspreader_users"] = superspreaders_sql(
    "(SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events)",
    "user_id", "day")


# --------------------------------------------------------------------------
# AMS / tug-of-war second-moment (F2) sketch
# --------------------------------------------------------------------------

# Alon, Matias & Szegedy 1996 (the STOC paper that founded streaming
# sketches). F2 = Σ_k c_k² over the per-key counts — identically the
# row count of the self-equijoin on the key, which is what a planner
# needs to size a join (and what a skew monitor needs to spot hot
# keys: F2/N² spikes when one key dominates). The sketch is r
# independent ±1-weighted sums X_i = Σ_k sign_i(k)·c_k; E[X_i²] = F2.
# Estimator layout is median-of-means — AMS_GROUPS means of
# AMS_R/AMS_GROUPS squares each — with every intermediate EXACT:
# X_i is an int64 sum, X_i² an int64 product, each mean divides an
# int64 by a power of two (exact in IEEE double), and the median of
# an even group count averages the two middle values (again a halving)
# — so the DuckDB oracle reproduces the estimate bit-for-bit, the
# same portability discipline as KMV/HLL/CMS above.
# Signs come from the CMS Carter-Wegman family over the md5 28-bit
# base: parity of ((a·x + b) mod P) is an unbiased ±1 for uniform x,
# and a·x + b < 2^59 stays exact in int64 in both engines.
AMS_R = 64
AMS_GROUPS = 8  # 8 means of 8 squares; median = avg of ranks 4 and 5
_rng = _random.Random(0xA35A35)
AMS_COEF = tuple(
    (_rng.randrange(1, CMS_P), _rng.randrange(0, CMS_P))
    for _ in range(AMS_R)
)
del _rng


def ams_sums(df: DataFrame, key_col: str,
             group_cols: Sequence[str],
             r: int = AMS_R) -> DataFrame:
    """The linear sketch state: (group, i, xi) with
    xi = Σ_keys sign_i(key)·count(key) for i < r.

    LINEARITY is the operational superpower: the sketch of a union of
    datasets is the element-wise SUM of their sketches (pinned in
    tests), so per-partition / per-day sketches merge by addition like
    CMS cells — r int64s per group answer join-size questions over any
    later combination of slices without rescanning.

    Scale shape: ONE data-sized exchange (the (group, key) wordcount,
    map-side combined). The r-way explode runs on the vocabulary-
    bounded count table, and its own aggregation keys on (group, i) —
    partial agg collapses it to ≤ r rows per group per task before the
    final tiny exchange.
    """
    if r > len(AMS_COEF):
        raise ValueError(f"r must be <= {len(AMS_COEF)} (got {r})")
    gcols = list(group_cols)
    wc = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(*gcols, key_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return ams_sums_from_counts(wc, key_col, gcols, r)


def ams_sums_from_counts(wc: DataFrame, key_col: str,
                         group_cols: Sequence[str],
                         r: int = AMS_R) -> DataFrame:
    """Sketch from an ALREADY-AGGREGATED (group, key, __cnt) table —
    the shared-scan entry point: callers that also need the exact
    counts (`ams_f2`, `ams_join_size`) build the wordcount once,
    checkpoint it, and feed both consumers."""
    gcols = list(group_cols)
    wc = wc.withColumn("__x", _cms_base28(F.col(key_col).cast("string")))
    # r12: ONE wide aggregate (r sum columns), not explode-r-rows-then-
    # groupBy. The explode shape pushed r x |wc| rows through the
    # aggregate hash map (r hash probes per wordcount row) to produce
    # the same r sums the wide form accumulates with ONE probe per row;
    # the post-agg posexplode back to (i, xi) runs on group-count-sized
    # data. Each xi is the identical exact-int64 sum of the identical
    # sgn*cnt terms (integer addition — order-free), so downstream
    # means/medians and every hash-checked consumer are bit-unchanged.
    # The 64 sum aggregates arrive as parsed SQL strings (r12, the
    # `minhash_signatures` treatment): the Column-object form cost
    # several py4j round-trips per coefficient per call site; each
    # parsed sum is the identical integer arithmetic on the identical
    # longs (integer literals round-trip exactly), so every xi is
    # bit-unchanged.
    sums = wc.groupBy(*gcols).agg(*[
        F.expr(f"sum((1 - 2 * ((({a} * __x + {b}) % {CMS_P}) % 2))"
               f" * __cnt) AS __xi{i}")
        for i, (a, b) in enumerate(AMS_COEF[:r])
    ])
    # NULL guard: a global (no-group-cols) aggregate over an EMPTY
    # wordcount emits one all-NULL row where the old explode shape
    # emitted none; xi is never NULL for any real group (sum of >= 1
    # non-null ints), so the filter only restores the empty-input
    # contract.
    arr = ", ".join(f"__xi{i}" for i in range(r))
    return sums.select(
        *gcols,
        F.posexplode(F.expr(f"array({arr})")).alias("i", "xi"),
    ).where(F.col("xi").isNotNull())


def ams_estimate(sums: DataFrame, group_cols: Sequence[str],
                 r: int = AMS_R,
                 n_groups: int = AMS_GROUPS) -> DataFrame:
    """Median-of-means F2 estimate from the (group, i, xi) state.

    All arithmetic on sketch-sized data (r rows per group): squares
    and per-bucket sums are exact int64; each mean divides by the
    power-of-two bucket size; the median of the n_groups means (even
    count) averages the two middle values. No rounding is applied
    because no step can drift between engines.
    """
    if r % n_groups != 0 or n_groups % 2 != 0:
        raise ValueError(
            f"r must split into an even number of equal buckets "
            f"(got r={r}, n_groups={n_groups})")
    per = r // n_groups
    gcols = list(group_cols)
    means = (
        sums.groupBy(*gcols, F.floor(F.col("i") / per).alias("j"))
        .agg((F.sum(F.col("xi") * F.col("xi")) / F.lit(float(per)))
             .alias("mj"))
    )
    w = Window.partitionBy(*gcols).orderBy("mj", "j")
    return (
        means.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn").isin(n_groups // 2, n_groups // 2 + 1))
        .groupBy(*gcols)
        .agg((F.sum("mj") / F.lit(2.0)).alias("est_f2"))
    )


def ams_f2(df: DataFrame, key_col: str, group_cols: Sequence[str],
           r: int = AMS_R) -> DataFrame:
    """Per-group exact F2 (self-join row count) next to the AMS
    estimate, so the sketch's error is directly visible — the same
    exact-anchor-beside-sketch reporting as `cms_token_freq`. Both
    sides derive from one shared wordcount scan."""
    gcols = list(group_cols)
    wc = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(*gcols, key_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .localCheckpoint(eager=False)
    )
    sums = ams_sums_from_counts(wc, key_col, gcols, r)
    exact = wc.groupBy(*gcols).agg(
        F.sum(F.col("__cnt") * F.col("__cnt")).alias("f2_selfjoin_rows"))
    return exact.join(ams_estimate(sums, gcols, r), gcols).select(
        *gcols, "f2_selfjoin_rows", "est_f2")


def ams_f2_sql(table: str, key_expr: str, group_col: str,
               r: int = AMS_R, n_groups: int = AMS_GROUPS) -> str:
    """DuckDB twin of `ams_f2` (same coefficients, same exact math)."""
    per = r // n_groups
    coef_values = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(AMS_COEF[:r]))
    base = _MD5_BASE28.format(expr=f"CAST({key_expr} AS VARCHAR)")
    return f"""
        WITH wc AS (
            SELECT {group_col} AS g, {key_expr} AS k, COUNT(*) AS cnt,
                   {base} AS x
            FROM {table} WHERE {key_expr} IS NOT NULL
            GROUP BY 1, 2
        ), coef(i, a, b) AS (
            VALUES {coef_values}
        ), sums AS (
            SELECT g, i,
                   CAST(SUM((1 - 2 * (((a * x + b) % {CMS_P}) % 2)) * cnt)
                        AS BIGINT) AS xi
            FROM wc CROSS JOIN coef GROUP BY 1, 2
        ), means AS (
            SELECT g, CAST(floor(i / {per}) AS INT) AS j,
                   CAST(SUM(xi * xi) AS BIGINT) / {float(per)!r} AS mj
            FROM sums GROUP BY 1, 2
        ), ranked AS (
            SELECT g, mj,
                   row_number() OVER (PARTITION BY g ORDER BY mj, j) AS rn
            FROM means
        ), med AS (
            SELECT g, SUM(mj) / 2.0 AS est_f2
            FROM ranked WHERE rn IN ({n_groups // 2}, {n_groups // 2 + 1})
            GROUP BY g
        ), exact AS (
            SELECT g, CAST(SUM(cnt * cnt) AS BIGINT) AS f2_selfjoin_rows
            FROM wc GROUP BY g
        )
        SELECT g AS {group_col}, f2_selfjoin_rows, est_f2
        FROM exact JOIN med USING (g)
    """


def _q_ams(spark: SparkSession, sf: str) -> DataFrame:
    return ams_f2(read_table(spark, sf, "events"), "user_id",
                  ["event_type"])


QUERIES["ams_f2_user_activity"] = _q_ams
ORACLES["ams_f2_user_activity"] = ams_f2_sql(
    "events", "user_id", "event_type")


def ams_join_size(left: DataFrame, right: DataFrame,
                  left_key: str, right_key: str,
                  r: int = AMS_R,
                  n_groups: int = AMS_GROUPS) -> DataFrame:
    """Estimated equi-join OUTPUT size |L ⋈ R| from the two sides'
    tug-of-war sketches: E[X_i(L)·X_i(R)] = Σ_k c_k(L)·c_k(R) — the
    inner-product generalization of F2 (AMS 1996 §3; F2 is the
    self-join special case). THE planner primitive: decide
    broadcast-vs-shuffle or pre-aggregate-vs-join-first from 2·r
    int64s, without scanning either table again — and because the
    sketches are linear, per-slice sketches built earlier can answer
    join-size questions about any union of slices.

    Each side pays one keyed-wordcount exchange; everything after is
    sketch-sized. Exact anchor (`join_rows`) computed from the same
    wordcounts beside the estimate. Estimator layout mirrors
    `ams_estimate`: products and bucket sums exact int64, bucket mean
    a power-of-two division, median the average of the two middle
    means — bit-for-bit reproducible by the oracle. (Signed products
    can be negative; the median-of-means tolerates it, and the floor
    at 0 is the standard clip for a size estimate.)
    """
    def _wc(df: DataFrame, key: str) -> DataFrame:
        return (df.where(F.col(key).isNotNull())
                .groupBy(F.col(key).alias("__k"))
                .agg(F.count(F.lit(1)).alias("__cnt"))
                .localCheckpoint(eager=False))

    return ams_join_size_from_counts(
        _wc(left, left_key), _wc(right, right_key), r, n_groups)


def ams_join_size_from_counts(lc: DataFrame, rc: DataFrame,
                              r: int = AMS_R,
                              n_groups: int = AMS_GROUPS) -> DataFrame:
    """`ams_join_size` from PRE-BUILT (__k, __cnt) wordcounts. The
    split matters when both join sides slice the SAME table (the
    usual planner question — "click ⋈ purchase on user_id"): one
    grouped count over the union of slices feeds both sides, so the
    table is scanned ONCE instead of once per side — at 100 TB that
    halves the cost of the estimate."""
    if r % n_groups != 0 or n_groups % 2 != 0:
        raise ValueError(
            f"r must split into an even number of equal buckets "
            f"(got r={r}, n_groups={n_groups})")
    per = r // n_groups

    la = ams_sums_from_counts(lc, "__k", [], r)
    rb = ams_sums_from_counts(rc, "__k", [], r)
    prod = (
        la.withColumnRenamed("xi", "xa")
        .join(rb.withColumnRenamed("xi", "xb"), "i")
        .select("i", (F.col("xa") * F.col("xb")).alias("p"))
    )
    means = (prod.groupBy(F.floor(F.col("i") / per).alias("j"))
             .agg((F.sum("p") / F.lit(float(per))).alias("mj")))
    w = Window.orderBy("mj", "j")
    est = (means.withColumn("__rn", F.row_number().over(w))
           .where(F.col("__rn").isin(n_groups // 2, n_groups // 2 + 1))
           .agg(F.greatest(F.sum("mj") / F.lit(2.0), F.lit(0.0))
                .alias("est_join_rows")))
    exact = (
        lc.join(rc.withColumnRenamed("__cnt", "__cnt_r"), "__k")
        .agg(F.coalesce(F.sum(F.col("__cnt") * F.col("__cnt_r")),
                        F.lit(0)).alias("join_rows")))
    return exact.crossJoin(F.broadcast(est))


def ams_join_size_sql(left_table: str, left_key: str,
                      right_table: str, right_key: str,
                      r: int = AMS_R, n_groups: int = AMS_GROUPS) -> str:
    """DuckDB twin of `ams_join_size`."""
    per = r // n_groups
    coef_values = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(AMS_COEF[:r]))

    def side(table: str, key: str, alias: str) -> str:
        base = _MD5_BASE28.format(expr=f"CAST({key} AS VARCHAR)")
        return f"""
        {alias}_wc AS (
            SELECT {key} AS k, COUNT(*) AS cnt, {base} AS x
            FROM {table} WHERE {key} IS NOT NULL GROUP BY 1
        ), {alias}_sums AS (
            SELECT i,
                   CAST(SUM((1 - 2 * (((a * x + b) % {CMS_P}) % 2)) * cnt)
                        AS BIGINT) AS xi
            FROM {alias}_wc CROSS JOIN coef GROUP BY 1
        )"""

    return f"""
        WITH coef(i, a, b) AS (
            VALUES {coef_values}
        ), {side(left_table, left_key, 'l')}, {side(right_table, right_key, 'r')},
        means AS (
            SELECT CAST(floor(l_sums.i / {per}) AS INT) AS j,
                   CAST(SUM(l_sums.xi * r_sums.xi) AS BIGINT)
                       / {float(per)!r} AS mj
            FROM l_sums JOIN r_sums ON l_sums.i = r_sums.i
            GROUP BY 1
        ), ranked AS (
            SELECT mj, row_number() OVER (ORDER BY mj, j) AS rn FROM means
        ), est AS (
            SELECT greatest(SUM(mj) / 2.0, 0.0) AS est_join_rows
            FROM ranked WHERE rn IN ({n_groups // 2}, {n_groups // 2 + 1})
        ), exact AS (
            SELECT CAST(COALESCE(SUM(l_wc.cnt * r_wc.cnt), 0) AS BIGINT)
                       AS join_rows
            FROM l_wc JOIN r_wc USING (k)
        )
        SELECT join_rows, est_join_rows FROM exact CROSS JOIN est
    """


def _q_ams_join(spark: SparkSession, sf: str) -> DataFrame:
    # How many rows would events ⋈ events-of-another-type produce on
    # user_id? The skew question behind every fan-out join. Both
    # sides slice the same table, so ONE grouped count over the
    # two-type union feeds both sketches (single events scan).
    ev = read_table(spark, sf, "events")
    wc = (ev.where(F.col("event_type").isin("click", "purchase")
                   & F.col("user_id").isNotNull())
          .groupBy("event_type", F.col("user_id").alias("__k"))
          .agg(F.count(F.lit(1)).alias("__cnt"))
          .localCheckpoint(eager=False))
    return ams_join_size_from_counts(
        wc.where(F.col("event_type") == "click").select("__k", "__cnt"),
        wc.where(F.col("event_type") == "purchase").select("__k", "__cnt"))


QUERIES["ams_join_size_click_purchase"] = _q_ams_join
ORACLES["ams_join_size_click_purchase"] = ams_join_size_sql(
    "(SELECT * FROM events WHERE event_type = 'click')", "user_id",
    "(SELECT * FROM events WHERE event_type = 'purchase')", "user_id")
