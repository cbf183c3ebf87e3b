"""Portable DataFrame-native Bloom filter primitives.

Spark's own `bloom_filter_agg` / `might_contain` expressions are
internal (not in the public function registry), and
`df.stat.bloomFilter` hands back a JVM object usable only from the
driver — neither composes into a declarative plan. These primitives
rebuild the same capability from plain Column algebra so Catalyst can
see (and codegen) every step:

- **Build** is one groupBy over bit-word indices with a `bit_or`
  partial aggregate — the filter materializes as a tiny
  (word, bits) DataFrame of at most m/64 rows, built in a single
  pass with map-side combine. Nothing but word ids (< m/64 distinct)
  ever shuffles.
- **Probe** has two shapes for two scales:
  (a) `bloom_contains` embeds the collected bitmap (m/8 bytes —
      128 KiB at the m=2^20 default, same order as a broadcast
      variable) as a single binary literal, so membership is
      pure whole-stage-codegen arithmetic: zero joins, zero
      shuffles, zero Python. This is the path while the filter fits
      driver / plan size (m up to LITERAL_PROBE_MAX_BITS = 2^24).
  (b) `bloom_probe_join` keeps the bitmap distributed and probes by
      exploding each value's j word positions into a join against
      the (word, bits) table — the path when m is sized for 10^10+
      items (tens of GiB of bits) and can neither be collected nor
      broadcast. Only (value, word) pairs shuffle, never payloads.

Hashing: position_i = pmod(xxhash64(value, i), m) — j independent
seeded xxhash64 evaluations (Spark's seed parameter), avoiding the
h1 + i*h2 combining arithmetic that ANSI mode would overflow-check.
Bloom guarantees hold as usual: NO false negatives, false-positive
rate ~ (1 - e^(-j*n/m))^j; size m at ~10 bits and j≈5-7 hashes per
expected distinct item for ~1% fpp.

Because a Bloom filter admits false positives, every consumer in this
package uses it strictly as a PREFILTER in front of an exact
confirmation join — results are bit-identical to the exact operator
(and oracle-checkable as such); the filter only shrinks the row
stream that reaches the join.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 1 << 20   # m: 1M bits = 16K words = 128 KiB dense
BLOOM_HASHES = 5       # j
# Above this, embedding the bitmap as a plan literal is a measured
# perf cliff (the filter expression tree carries the literal once per
# check and per consuming Filter; optimizer canonicalization rehashes
# multi-MB byte arrays): m=2^24 probes in ~2 s, m=2^26 in ~35 s on the
# same stream. Larger filters must use bloom_probe_join.
LITERAL_PROBE_MAX_BITS = 1 << 24


def bloom_sizing(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing for a target false-positive rate: returns
    (m_bits, n_hashes) with m = -n·ln(p)/ln(2)² and j = (m/n)·ln(2).
    Undersizing saturates the filter fast — at fill ratio f the fpp is
    f^j, e.g. a filter at 90% fill with j=5 passes 59% of non-members
    to the confirmation join and stops paying for itself. m rounds up
    to a multiple of 64 (whole bitmap words)."""
    import math

    if n_items <= 0:
        return 64, 1
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    j = max(1, round(m / n_items * math.log(2)))
    return m, j


def _shl1(bit: F.Column) -> F.Column:
    """1L << bit as a Column — `F.shiftleft`'s wrapper only takes a
    Python int shift, so go through call_function."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bit)


def _positions(col: F.Column, m_bits: int, n_hashes: int) -> list[F.Column]:
    """The j bit positions of `col`, each an int Column in [0, m)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)).cast("int")
        for i in range(n_hashes)
    ]


def bloom_bitmap(df: DataFrame, col: str, m_bits: int = BLOOM_BITS,
                 n_hashes: int = BLOOM_HASHES) -> DataFrame:
    """Distributed Bloom-filter build: (word int, bits long) sparse
    bitmap over `df[col]`'s values.

    One map-only projection (j positions per row, exploded) followed
    by one groupBy(word).bit_or — the partial aggregate collapses each
    partition to <= m/64 rows BEFORE the exchange, so the shuffle is
    bounded by the bitmap size regardless of input row count.
    """
    pos = F.explode(F.array(*_positions(F.col(col), m_bits, n_hashes)))
    words = df.select(pos.alias("__pos")).select(
        (F.col("__pos") / 64).cast("int").alias("word"),
        _shl1(F.pmod(F.col("__pos"), F.lit(64)).cast("int")).alias("__bit"),
    )
    return words.groupBy("word").agg(F.bit_or("__bit").alias("bits"))


def collect_bloom(bitmap: DataFrame, m_bits: int = BLOOM_BITS) -> bytes:
    """Densify a (word, bits) bitmap to m/8 bytes (little-endian per
    word, so global bit p lives at byte p//8, bit p%8).

    The ONLY driver-side materialization in this module, and it is
    bounded by m (the filter's design size), never by data volume —
    the same contract as broadcasting the filter would have.
    """
    import numpy as np

    n_words = (m_bits + 63) // 64
    arr = np.zeros(n_words, dtype=np.int64)
    # Arrow transfer + one vectorized scatter: the row-at-a-time py4j
    # collect was 1-2 s per 100k-word delta (measured in the r11
    # stream-admission profile); toPandas moves the same rows in one
    # Arrow batch.
    pdf = bitmap.toPandas()
    if len(pdf):
        arr[pdf["word"].to_numpy(dtype=np.int64)] = \
            pdf["bits"].to_numpy(dtype=np.int64)
    # int64 little-endian words == the little-endian-per-word layout
    # bloom_contains indexes (global bit p at byte p//8, bit p%8).
    dense = arr.astype("<i8", copy=False).tobytes()
    return dense[:(m_bits + 7) // 8]


def bloom_delta_dense(df: DataFrame, col: str,
                      m_bits: int = BLOOM_BITS,
                      n_hashes: int = BLOOM_HASHES) -> bytes:
    """Dense bloom bytes for a BATCH-BOUNDED value set, built by
    collecting the raw bit positions over Arrow and scattering with
    numpy — no (word, bits) aggregate at all. For a micro-batch delta
    at a large m (2^30 bits = 16M words), `bloom_bitmap`'s groupBy
    holds multi-million-entry partial maps per task and its
    collection moves up to m/64 rows; the positions themselves are
    only |values| x j rows, so collecting them directly is strictly
    smaller whenever |values| x j < m/64 x ~2 — true for every
    micro-batch update. Use `bloom_bitmap`+`collect_bloom` for
    corpus-sized builds (positions would exceed the bitmap there)."""
    import numpy as np

    pos = F.explode(F.array(*_positions(F.col(col), m_bits, n_hashes)))
    pdf = df.select(pos.alias("__pos")).toPandas()
    dense = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    if len(pdf):
        p = pdf["__pos"].to_numpy(dtype=np.int64)
        np.bitwise_or.at(dense, p >> 3,
                         (1 << (p & 7)).astype(np.uint8))
    return dense.tobytes()


def bloom_or(dense: bytes | bytearray, delta: bytes) -> bytearray:
    """OR two equal-length dense bitmaps via numpy (a Python-int OR
    materializes three m/8-byte big-ints per call — measured churn at
    m=2^30)."""
    import numpy as np

    a = np.frombuffer(bytes(dense), dtype=np.uint8)
    b = np.frombuffer(bytes(delta), dtype=np.uint8)
    return bytearray((a | b).tobytes())


def bloom_contains(col: F.Column, dense: bytes,
                   m_bits: int = BLOOM_BITS,
                   n_hashes: int = BLOOM_HASHES) -> F.Column:
    """Membership test as a pure codegen expression: AND over j
    byte-extract-and-mask checks against the bitmap embedded as ONE
    binary literal. No join, no shuffle, no UDF.

    The bitmap literal is deliberately a single BINARY scalar leaf,
    and for two measured reasons:
    - `lit(list-of-longs)` builds a CreateArray with m/64 child
      expressions; every optimizer rule walks the 16K-node tree once
      per reference (2×j references per consuming plan) and the
      per-row CreateArray eval is O(m/64) — planning + eval cost ~15 s
      per query at the default m.
    - a hex STRING literal fixes the tree size, but `substring` on a
      string is O(position) per call (UTF8String must scan variable-
      width chars to find the offset), so probing the tail of a 256 KiB
      hex literal cost ~0.7 ms PER CHECK (~20 s per 28K-row stream).
    `substring` on BinaryType is a constant-time byte slice; one
    hex() of the single extracted byte feeds conv(). j small nodes,
    O(1) per check, planning instant.
    """
    if m_bits > LITERAL_PROBE_MAX_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds the literal-probe ceiling "
            f"{LITERAL_PROBE_MAX_BITS}; use bloom_probe_join for "
            "filters this large")
    bm = F.lit(dense)
    checks = []
    for pos in _positions(col, m_bits, n_hashes):
        byte_idx = (pos / 8).cast("int")
        byte_val = F.conv(
            F.hex(F.substring(bm, byte_idx + 1, F.lit(1))), 16, 10
        ).cast("int")
        bit = F.pmod(pos, F.lit(8)).cast("int")
        checks.append(
            F.call_function("shiftright", byte_val, bit)
            .bitwiseAND(F.lit(1)) != 0
        )
    return reduce(lambda a, b: a & b, checks)


def bloom_probe_join(values: DataFrame, bitmap: DataFrame, col: str,
                     m_bits: int = BLOOM_BITS,
                     n_hashes: int = BLOOM_HASHES,
                     flag_col: str = "might_contain") -> DataFrame:
    """Distributed probe for bitmaps too large to collect/broadcast:
    returns `values` (distinct on `col`) plus a boolean `flag_col`.

    Each value explodes to its j (word, mask) probes, joins the
    (word, bits) table on word — Catalyst picks broadcast-hash while
    the bitmap is small and shuffle-hash when it isn't — and a value
    is flagged iff ALL j probes hit (missing word => miss). Shuffle
    traffic is j rows of (value, word) per distinct value; the
    original relation is never re-shuffled.
    """
    pos = F.posexplode(F.array(*_positions(F.col(col), m_bits, n_hashes)))
    probes = values.select(col).distinct().select(
        col, pos.alias("__i", "__pos")
    ).select(
        col,
        (F.col("__pos") / 64).cast("int").alias("word"),
        _shl1(F.pmod(F.col("__pos"), F.lit(64)).cast("int")).alias("__mask"),
    )
    hits = probes.join(bitmap, "word", "left").select(
        col,
        F.when(F.col("bits").isNotNull()
               & (F.col("bits").bitwiseAND(F.col("__mask")) != 0), 1)
        .otherwise(0).alias("__hit"),
    )
    return (
        hits.groupBy(col)
        .agg((F.sum("__hit") == F.lit(n_hashes)).alias(flag_col))
    )


def bloom_probe_broadcast(values: DataFrame, dense: bytes, col: str,
                          m_bits: int = BLOOM_BITS,
                          n_hashes: int = BLOOM_HASHES,
                          flag_col: str = "might_contain",
                          bc_registry: list | None = None) -> DataFrame:
    """Probe a DRIVER-HELD dense bitmap that is too large to embed as
    a plan literal (`bloom_contains`'s measured cliff starts at
    m=2^24) but small enough to broadcast (<= ~128 MiB): the j bit
    positions are computed JVM-side (same xxhash64 positions the
    builder used), and a vectorized Arrow UDF tests them against the
    TorrentBroadcast'd bytes with numpy — no literal in the plan, no
    (word, bits) join/merge shuffle, one Arrow pass over the distinct
    values. Returns `values` distinct on `col` plus boolean
    `flag_col` (exact same contract as `bloom_probe_join`).

    This is the probe the partitioned near-dup state step uses for
    its band-key filter: the per-batch alternative — maintaining the
    bitmap as a persisted (word, bits) DataFrame — paid a ~1M-word
    groupBy+persist per batch for the update and a j-row-per-key join
    per probe (both measured as the top per-batch costs in the r11
    stream-admission profile)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    spark = values.sparkSession
    bc = spark.sparkContext.broadcast(bytes(dense))
    if bc_registry is not None:
        # The caller owns the broadcast's lifetime: a per-micro-batch
        # probe re-broadcasts fresh bytes every batch, and waiting for
        # the ContextCleaner to GC 8-128 MiB handles lags behind a
        # fast trigger (measured driver OOM over a 20-chunk seeding
        # run) — register so the caller can destroy last batch's.
        bc_registry.append(bc)

    @pandas_udf("boolean")
    def _probe(positions: pd.Series) -> pd.Series:
        buf = np.frombuffer(bc.value, dtype=np.uint8)
        if not len(positions):
            return pd.Series([], dtype=bool)
        mat = np.vstack(positions.to_numpy()).astype(np.int64)
        hit = (buf[mat >> 3]
               & (1 << (mat & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    pos_arr = F.array(*_positions(F.col(col), m_bits, n_hashes))
    return (values.select(col).distinct()
            .select(col, _probe(pos_arr).alias(flag_col)))


def bloom_prefiltered_join(fact: DataFrame, dim: DataFrame, key: str,
                           fpp: float = 0.01) -> DataFrame:
    """Inner-join a huge fact side to a SELECTIVE dim side with a
    Bloom prefilter: build the filter from dim's distinct keys (one
    dim-sized pass), drop fact rows that cannot match BEFORE the join
    — the classic shuffle-pruning move when the dim is too big or the
    join too complex for a plain broadcast to win, and the manual,
    engine-portable twin of Spark's AQE runtime bloom
    (spark.sql.optimizer.runtime.bloomFilter.*, which Catalyst only
    injects under its own selectivity heuristics).

    Because every true match survives the filter (no false negatives)
    and the confirming join removes the false positives, the result
    is EXACTLY the plain join — the bloom changes the plan, never the
    answer, which is why the composed query stays oracle-checkable
    with plain-join SQL even though the filter hashes with xxhash64.

    The filter is sized from dim's distinct-key count for the target
    fpp and embedded as one binary literal in a codegen expression
    (`bloom_contains`): the fact side pays j hash+mask ops per row,
    no extra join, no shuffle. Requires the sized filter to fit the
    literal-probe ceiling — selective dims by definition do; for
    jumbo filters compose `bloom_probe_join` instead.
    """
    keys = dim.select(key).distinct()
    n = keys.count()
    m_bits, n_hashes = bloom_sizing(n, fpp)
    if m_bits > LITERAL_PROBE_MAX_BITS:
        raise ValueError(
            f"dim has {n} distinct keys -> m={m_bits} bits exceeds the "
            f"literal ceiling {LITERAL_PROBE_MAX_BITS}; use "
            "bloom_probe_join for filters this large")
    dense = collect_bloom(bloom_bitmap(keys, key, m_bits, n_hashes), m_bits)
    pre = fact.where(bloom_contains(F.col(key), dense, m_bits, n_hashes))
    return pre.join(dim, key)
