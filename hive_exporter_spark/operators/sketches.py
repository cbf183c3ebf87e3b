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
    if not 1 < k <= 1 << 20:
        raise ValueError(f"k must be in (1, 2^20] (got {k})")
    gcols = list(group_cols)
    base = df.select(*gcols, md5_int40(key_col).alias("__h"))
    w1 = (Window.partitionBy(*gcols, F.pmod(F.col("__h"), F.lit(salt_buckets)))
          .orderBy("__h"))
    local = (
        base.withColumn("__dr", F.dense_rank().over(w1))
        .where(F.col("__dr") <= k)
        .select(*gcols, "__h")
        .distinct()
    )
    w2 = Window.partitionBy(*gcols).orderBy("__h")
    kept = local.withColumn("__rn", F.row_number().over(w2)).where(
        F.col("__rn") <= k)
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


def kmv_distinct_sql(table: str, key_expr: str,
                     group_cols: Sequence[str],
                     k: int = KMV_K) -> str:
    """DuckDB twin of `kmv_distinct` (same hash, same estimator)."""
    g = ", ".join(group_cols)
    num = repr(float((k - 1) * (1 << HASH_BITS)))
    return f"""
        WITH h AS (
            SELECT DISTINCT {g}, {md5_int40_sql(key_expr)} AS h
            FROM {table}
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
    merged = (daily.groupBy("event_type", "bucket")
              .agg(F.max("rho").alias("rho")))
    return hll_estimate(merged, ["event_type"])


QUERIES = {
    "kmv_distinct_users": _q_kmv,
    "hll_distinct_users": _q_hll,
    "hll_distinct_users_merged": _q_hll_merged,
}

ORACLES = {
    "kmv_distinct_users": kmv_distinct_sql(
        "events", "user_id", ["event_type"]),
    "hll_distinct_users": hll_distinct_sql("events", "user_id", ["event_type"]),
    # Merged == direct by max-associativity; the oracle is the direct
    # single-pass sketch.
    "hll_distinct_users_merged": hll_distinct_sql(
        "events", "user_id", ["event_type"]),
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


def cms_counters(counts: DataFrame, key_col: str, count_col: str,
                 width: int = CMS_WIDTH) -> DataFrame:
    """(row, col, c) counter cells from an exact (key, count) table.

    Input is the ALREADY-AGGREGATED per-key count (the canonical
    wordcount shape — vocabulary-bounded, map-side combined), so the
    explode emits d rows per DISTINCT key, not per occurrence; the
    final groupBy carries ≤ d·width rows per partition. The sketch is
    a fixed d×w table regardless of corpus size — the whole point.
    """
    x = _cms_base28(F.col(key_col))
    cells = F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            (((F.lit(a) * x + F.lit(b)) % CMS_P) % width).alias("col"),
        )
        for i, (a, b) in enumerate(CMS_COEF)
    ])).alias("cell")
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
    x = _cms_base28(F.col(key_col))
    probes = keys.select(
        key_col,
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                (((F.lit(a) * x + F.lit(b)) % CMS_P) % width).alias("col"),
            )
            for i, (a, b) in enumerate(CMS_COEF)
        ])).alias("cell"),
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

_TOKS_SQL = ("list_filter(regexp_split_to_array(lower(text), "
             "'[^a-z0-9]+'), t -> t <> '')")
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
