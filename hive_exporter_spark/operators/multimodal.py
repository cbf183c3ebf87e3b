"""Multimodal columns: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched Pandas UDFs via
mapInPandas.

The container has no image/audio libraries, so the decode kernels are
stubbed (deterministic fake behind an import-try, NotImplementedError
for the real path) — the Spark-side plumbing (schema, batch shape,
partitioning) is real and tested. At 100 TB the pattern is: binary
payloads stay columnar in parquet, mapInPandas streams Arrow batches
through the Python kernel, `spark.sql.files.maxPartitionBytes` bounds
per-task memory, and metadata-only queries never touch the payload
column (column pruning).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_exporter_spark.operators.llm import (
    LSH_BUCKET_CAP as _LSH_BUCKET_CAP,
    capped_bucket_pairs,
)

BINARY_META_SCHEMA = "doc_id long, byte_len long, sha256 string"
DECODED_IMAGE_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, decode_status string"
)


def with_binary_content(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize an opaque binary column (UTF-8
    bytes of the text). A frame that ALREADY carries a binary
    `content` column — the real-pipeline shape, read straight from
    parquet — passes through untouched."""
    if "content" in documents.columns:
        return documents.select("doc_id", "content")
    return documents.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("content")
    )


def binary_metadata(documents: DataFrame) -> DataFrame:
    """Extract per-payload metadata (size, digest) with an Arrow-batched
    Pandas kernel over mapInPandas. The kernel sees pandas batches —
    the exact shape a decode/feature-extract kernel would use."""
    binary = with_binary_content(documents)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": content.map(len).astype("int64"),
                "sha256": content.map(lambda b: hashlib.sha256(b).hexdigest()),
            })

    return binary.mapInPandas(kernel, BINARY_META_SCHEMA)


def binary_dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact multimodal dedup: one canonical (lowest-id) row per
    distinct binary payload. The digest is computed JVM-side —
    `sha2` accepts BinaryType directly — so unlike the metadata
    kernel this op needs no Python at all, and the shuffle carries a
    32-byte digest regardless of payload size (the image/audio bytes
    never cross an exchange). The same lowest-id-wins window as
    `llm.dedup_exact`, applied to the opaque-content modality.
    """
    from pyspark.sql import Window

    binary = with_binary_content(documents)
    digest = F.sha2(F.col("content"), 256)
    w = Window.partitionBy(digest).orderBy(F.col("doc_id"))
    return (
        binary.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "doc_id",
            F.length(F.col("content")).alias("byte_len"),
            digest.alias("sha256"),
        )
        .orderBy("doc_id")
    )


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except ImportError:
        return None


def decode_images(documents: DataFrame, fake: bool = True) -> DataFrame:
    """Decode an image binary column to (width, height, channels).

    With no imaging library in the container, `fake=True` derives a
    deterministic fake geometry from the payload digest — making the
    distributed plumbing (Arrow batching, schema, partition flow)
    fully testable. `fake=False` requires PIL and raises
    NotImplementedError if absent (clearly-marked stub).
    """
    binary = with_binary_content(documents)
    pil = _try_import_pil()
    if not fake and pil is None:
        raise NotImplementedError(
            "real image decode needs PIL/Pillow, not present in this container"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["content"].map(lambda b: hashlib.sha256(b).digest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": digests.map(lambda d: 64 + d[0] % 192).astype("int32"),
                "height": digests.map(lambda d: 64 + d[1] % 192).astype("int32"),
                "n_channels": digests.map(lambda d: 1 + (d[2] % 2) * 2).astype("int32"),
                "decode_status": "fake",
            })

    def kernel_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Same schema and batch shape as the fake path; activates only
        # when PIL is importable (test_decode_images_real_path_with_pil
        # is skip-marked on PIL's absence so this cannot rot silently).
        import io

        from PIL import Image

        for pdf in batches:
            ws, hs, cs, st = [], [], [], []
            for b in pdf["content"]:
                try:
                    img = Image.open(io.BytesIO(bytes(b)))
                    ws.append(img.width)
                    hs.append(img.height)
                    cs.append(len(img.getbands()))
                    st.append("ok")
                except Exception:
                    ws.append(0), hs.append(0), cs.append(0)
                    st.append("error")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "n_channels": pd.Series(cs, dtype="int32"),
                "decode_status": st,
            })

    return binary.mapInPandas(kernel if fake else kernel_real,
                              DECODED_IMAGE_SCHEMA)


def frame_sample_plan(documents: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame-sampling plumbing: emits one row per sampled frame
    index from per-payload metadata — the fan-out shape
    (mapInPandas returning MORE rows than input) that frame extraction
    needs. Frame count is a deterministic fake of the payload size."""
    binary = with_binary_content(documents)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx = [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n_frames = len(content) % 100 + 1
                for i in range(0, n_frames, every_n):
                    out_doc.append(doc_id)
                    out_idx.append(i)
            yield pd.DataFrame({"doc_id": out_doc, "frame_index": out_idx})

    return binary.mapInPandas(kernel, "doc_id long, frame_index int")


def resize_images(documents: DataFrame, target_w: int = 8, target_h: int = 8) -> DataFrame:
    """Image-resize plumbing: binary in → (smaller) binary out plus
    output geometry. The fake kernel synthesizes target_w×target_h
    deterministic pixel bytes from the payload digest; a real kernel
    swaps in PIL's resize with identical schema/batching. The binary→
    binary shape matters: it proves payloads can round-trip through
    Arrow batches without driver involvement."""
    binary = with_binary_content(documents)
    n_px = target_w * target_h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["content"].map(lambda b: hashlib.sha256(b).digest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "out_width": target_w,
                "out_height": target_h,
                "resized": digests.map(
                    lambda d: (d * (n_px // len(d) + 1))[:n_px]
                ),
            })

    return binary.mapInPandas(
        kernel, "doc_id long, out_width int, out_height int, resized binary"
    )


N_MFCC = 13


def audio_features(documents: DataFrame, n_coeff: int = N_MFCC) -> DataFrame:
    """Audio feature-extraction plumbing: binary in → fixed-length
    float vector out (MFCC-shaped). The fake kernel derives each
    coefficient from one digest byte (deterministic, oracle-checkable);
    a real kernel would swap in librosa with the same schema. The
    output array<double> column feeds directly into the similarity
    operators (topk_cosine etc.) — binary → embedding is the
    multimodal bridge into the vector pipeline."""
    binary = with_binary_content(documents)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["content"].map(lambda b: hashlib.sha256(b).digest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "mfcc": digests.map(
                    lambda d: [d[i] / 255.0 for i in range(n_coeff)]
                ),
            })

    return binary.mapInPandas(kernel, "doc_id long, mfcc array<double>")


PHASH_BANDS = 8

# Quantized DCT-II matrix: round(cos(pi/8 * (i+0.5) * u) * 1024).
# Integer quantization makes the whole pHash pipeline EXACT int64
# arithmetic — numpy's matmul on int64 is order-independent (unlike
# float BLAS summation), so the Arrow kernel and a SQL replay agree
# bit-for-bit, which is what lets the banded pair screens hash-check
# against a DuckDB oracle. Magnitude bound: |coef| <= 8*8*1024²*255
# ≈ 2^34, far inside int64 on both engines.
PHASH_DCT_SCALE = 1024
_PHASH_DCTQ = [
    [round(math.cos(math.pi / 8 * (i + 0.5) * u) * PHASH_DCT_SCALE)
     for i in range(8)]
    for u in range(8)
]


def phash64(documents: DataFrame, fake: bool = True) -> DataFrame:
    """64-bit perceptual image hash (pHash): resample to 8×8
    luminance, 2-D DCT-II, threshold the low-frequency block at its
    median — visually-similar images land within a few Hamming bits.

    The fake path derives the 8×8 matrix from the payload digest
    (identical payloads → identical hashes), so the distributed shape
    — Arrow-batched kernel doing one small matmul per image, emitting
    one long per row — is real; a PIL kernel swaps in behind the same
    schema. The DCT uses the integer-quantized matrix `_PHASH_DCTQ`
    and the median test is the exact integer form
    `2*coef >= sorted[31] + sorted[32]`, so every step is portable
    (`phash64_sql` is the bit-identical DuckDB twin). Bit 63 enters
    the packed long as the negative two's-complement constant, the
    same convention as `llm.simhash64`. Output: (doc_id, phash long).
    """
    import numpy as np

    binary = with_binary_content(documents)
    if not fake:
        # The real kernel (PIL decode → grayscale resize → same DCT
        # path) is not implemented in this container; refusing — even
        # when PIL happens to be importable — beats silently returning
        # sha-derived fabrications a caller can't tell from real
        # pHashes.
        raise NotImplementedError(
            "real pHash kernel not implemented (container has no "
            "imaging stack); only the deterministic fake path exists"
        )
    dctq = np.array(_PHASH_DCTQ, dtype=np.int64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(content: bytes) -> int:
            # 64 deterministic bytes: digest + sha256 of its hex form
            # (DuckDB's sha256 is VARCHAR-only, so the extension hashes
            # the hex string both engines can see).
            d1 = hashlib.sha256(content)
            raw = d1.digest() + hashlib.sha256(d1.hexdigest().encode()).digest()
            px = np.frombuffer(raw, dtype=np.uint8).astype(np.int64).reshape(8, 8)
            flat = (dctq @ px @ dctq.T).ravel()
            s = np.sort(flat)
            t2 = int(s[31] + s[32])          # 2 * median, exact
            low = sum(1 << k for k in range(63) if 2 * int(flat[k]) >= t2)
            if 2 * int(flat[63]) >= t2:
                low -= 1 << 63
            return low

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "phash": pdf["content"].map(one).astype("int64"),
            })

    return binary.mapInPandas(kernel, "doc_id long, phash long")


def phash64_sql(src_sql: str) -> str:
    """DuckDB twin of the fake `phash64` kernel over a (doc_id, text)
    source query — bit-identical by construction: the same quantized
    DCT constants, exact int64 row/column transforms, the same
    `2*coef >= sorted[31]+sorted[32]` median test, and the same
    two's-complement bit-63 packing. Generated, not hand-written, so
    the kernel and the oracle can only drift together."""
    px_cols = ", ".join(
        f"CAST(concat('0x', substr(hx, {b * 2 + 1}, 2)) AS BIGINT) AS p{b}"
        for b in range(64))
    r_cols = ", ".join(
        "(" + " + ".join(f"({_PHASH_DCTQ[u][i]}) * p{i * 8 + j}"
                         for i in range(8)) + f") AS r{u}_{j}"
        for u in range(8) for j in range(8))
    c_cols = ", ".join(
        "(" + " + ".join(f"({_PHASH_DCTQ[v][j]}) * r{u}_{j}"
                         for j in range(8)) + f") AS c{u * 8 + v}"
        for u in range(8) for v in range(8))
    clist = ", ".join(f"c{k}" for k in range(64))
    bits = " + ".join(
        f"CASE WHEN 2 * c{k} >= t2 THEN CAST({1 << k} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END"
        for k in range(63))
    bits += (" + CASE WHEN 2 * c63 >= t2 THEN "
             "CAST(-9223372036854775808 AS BIGINT) "
             "ELSE CAST(0 AS BIGINT) END")
    return f"""
        WITH __src AS ({src_sql}),
        __hx AS (
            SELECT doc_id, sha256(text) || sha256(sha256(text)) AS hx
            FROM __src
        ),
        __px AS (SELECT doc_id, {px_cols} FROM __hx),
        __r AS (SELECT doc_id, {r_cols} FROM __px),
        __c AS (SELECT doc_id, {c_cols} FROM __r),
        __m AS (
            SELECT *, list_sort([{clist}])[32] + list_sort([{clist}])[33]
                      AS t2
            FROM __c
        )
        SELECT doc_id, {bits} AS phash FROM __m
    """


def image_near_dup_pairs(hashes: DataFrame, max_hamming: int = PHASH_BANDS - 1,
                         bands: int = PHASH_BANDS) -> DataFrame:
    """Image near-dup pairs by pHash Hamming distance, banded so the
    join is an equi-join, never all-pairs: the 64-bit hash splits into
    `bands` sub-keys; by pigeonhole, any pair within `max_hamming` <
    `bands` differing bits agrees exactly on SOME band, so bucketing
    on (band index, band value) has PERFECT recall while only
    comparing per-bucket candidates. Hamming is computed JVM-side
    (xor + bit_count); duplicate discoveries across bands collapse via
    distinct over three scalar columns."""
    if max_hamming >= bands:
        raise ValueError("recall guarantee needs max_hamming < bands")
    # 16-bytes/row checkpoint: the banded self-join references the
    # hash frame twice, and unchecked lineage re-runs the upstream
    # decode/DCT kernel once PER SIDE — the dominant cost at image
    # scale, paid double for nothing.
    hashes = hashes.select("doc_id", "phash").localCheckpoint(eager=False)
    width = 64 // bands
    band = F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("phash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
        ) for i in range(bands)
    ])).alias("b")
    banded = hashes.select("doc_id", "phash", band).select(
        "doc_id", "phash", "b.band", "b.key")
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .where(ham <= max_hamming)
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                ham.cast("int").alias("hamming"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def image_near_dup_pairs_capped(hashes: DataFrame,
                                max_hamming: int = PHASH_BANDS - 1,
                                bands: int = PHASH_BANDS,
                                bucket_cap: int | None = None) -> DataFrame:
    """Skew-armored `image_near_dup_pairs` via the shared
    `llm.capped_bucket_pairs` degradation — the last banded pair
    generator to get the armor (VERDICT r6 item 1). The failure mode
    is identical to the MinHash/SimHash/embedding screens: a corpus
    of templated or solid-color images collapses onto one
    (band, key) bucket and the banded equi-join emits B(B-1)/2
    candidates. Buckets above `bucket_cap` emit only their
    doc_id-sorted consecutive chain (B-1 pairs) — within-bucket
    connectivity survives for component clustering, and no bucket's
    output is super-linear in its size. With no hot buckets the
    result is IDENTICAL to the uncapped screen (pinned in tests).
    Hashes rejoin AFTER pair dedup, so the banded shuffle carries
    (doc_id, band, key) only — the same payload-shedding shape as the
    embedding-LSH capped variant."""
    if bucket_cap is None:
        bucket_cap = _LSH_BUCKET_CAP
    if max_hamming >= bands:
        raise ValueError("recall guarantee needs max_hamming < bands")
    hashes = hashes.select("doc_id", "phash").localCheckpoint(eager=False)
    width = 64 // bands
    band = F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("phash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
        ) for i in range(bands)
    ])).alias("b")
    banded = hashes.select("doc_id", band).select("doc_id", "b.band", "b.key")
    cand = capped_bucket_pairs(banded, ["band", "key"], "doc_id", bucket_cap)
    ha = hashes.select(F.col("doc_id").alias("doc_a"),
                       F.col("phash").alias("__h_a"))
    hb = hashes.select(F.col("doc_id").alias("doc_b"),
                       F.col("phash").alias("__h_b"))
    ham = F.bit_count(F.col("__h_a").bitwiseXOR(F.col("__h_b")))
    return (
        cand.join(ha, "doc_a").join(hb, "doc_b")
        .where(ham <= max_hamming)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


# -- driver-contract wiring -------------------------------------------------

def _q_binary_meta(spark, sf):
    from hive_exporter_spark.sources.files import read_table
    return binary_metadata(read_table(spark, sf, "documents"))


def _q_binary_dedup(spark, sf):
    from hive_exporter_spark.sources.files import read_table
    return binary_dedup_exact(read_table(spark, sf, "documents"))


def _q_decode(spark, sf):
    from hive_exporter_spark.sources.files import read_table
    return decode_images(read_table(spark, sf, "documents"))


def _q_frames(spark, sf):
    from hive_exporter_spark.sources.files import read_table
    return frame_sample_plan(read_table(spark, sf, "documents"))


def _q_audio(spark, sf):
    """Window entry: the MFCC vector posexplodes to (doc_id,
    coeff_idx, mfcc_value) rows — the driver canonicalizer cannot sort
    top-level array columns, and byte/255.0 is the same IEEE double in
    both engines so the exploded numeric column hash-matches where a
    stringified array of doubles would not."""
    from hive_exporter_spark.sources.files import read_table
    df = audio_features(read_table(spark, sf, "documents"))
    return df.select(
        "doc_id",
        F.posexplode("mfcc").alias("coeff_idx", "mfcc_value"),
    )


def _phash_fixture(spark, sf):
    """Shared pair-screen fixture: the sf0.01 slice has no duplicate
    payloads (digest-derived fake hashes only collide for identical
    bytes), so both screens union in replicas of the first 5 documents
    under shifted ids — each must pair with its original, making the
    expected output non-empty and deterministic at every scale."""
    from hive_exporter_spark.sources.files import read_table
    docs = read_table(spark, sf, "documents")
    replicas = (docs.where(F.col("doc_id") < 5)
                .withColumn("doc_id", F.col("doc_id") + 1_000_000))
    return docs.unionByName(replicas)


def _q_phash_pairs(spark, sf):
    """Hash-checked since the integer-DCT rewrite: `phash64_sql`
    replays the fake kernel bit-for-bit, so the full banded screen
    has a DuckDB twin (previously rows-only)."""
    return image_near_dup_pairs(phash64(_phash_fixture(spark, sf)))


def _q_phash_pairs_capped(spark, sf):
    """Skew-capped twin — identical output on this fixture (no bucket
    exceeds the cap), hash-checked through the same portable pHash."""
    return image_near_dup_pairs_capped(phash64(_phash_fixture(spark, sf)))


QUERIES = {
    "binary_metadata": _q_binary_meta,
    "binary_dedup_exact": _q_binary_dedup,
    "decode_images": _q_decode,
    "frame_sample_plan": _q_frames,
    "audio_features": _q_audio,
    "image_phash_near_dups": _q_phash_pairs,
    "image_phash_near_dups_capped": _q_phash_pairs_capped,
}

# sha256(text) in DuckDB hashes the same UTF-8 bytes the kernels see;
# digest byte i is hex pair i, lifted to int via the 0x-prefix cast.
def _digest_byte_sql(i: int) -> str:
    return f"CAST(concat('0x', substr(sha256(text), {i * 2 + 1}, 2)) AS INTEGER)"


ORACLES = {
    "binary_metadata": """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               sha256(text) AS sha256
        FROM documents
    """,
    "binary_dedup_exact": """
        SELECT doc_id, byte_len, sha256 FROM (
            SELECT doc_id,
                   octet_length(encode(text)) AS byte_len,
                   sha256(text) AS sha256,
                   ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                      ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1 ORDER BY doc_id
    """,
    "decode_images": f"""
        SELECT doc_id,
               64 + ({_digest_byte_sql(0)} % 192) AS width,
               64 + ({_digest_byte_sql(1)} % 192) AS height,
               1 + ({_digest_byte_sql(2)} % 2) * 2 AS n_channels,
               'fake' AS decode_status
        FROM documents
    """,
    "frame_sample_plan": """
        SELECT doc_id,
               CAST(unnest(range(0, octet_length(encode(text)) % 100 + 1, 10))
                    AS INTEGER) AS frame_index
        FROM documents
    """,
    "audio_features": f"""
        SELECT doc_id,
               CAST(t.i AS INTEGER) AS coeff_idx,
               CAST(CAST(concat('0x', substr(sha256(text), t.i * 2 + 1, 2))
                         AS INTEGER) AS DOUBLE) / 255.0 AS mfcc_value
        FROM documents, range(0, {N_MFCC}) t(i)
    """,
}

# The pair-screen fixture source: documents plus id-shifted replicas of
# the first five (see `_phash_fixture`).
_PHASH_SRC_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 5
"""
_PHASH_BAND_IDX = ", ".join(f"({i})" for i in range(PHASH_BANDS))
_PHASH_WIDTH = 64 // PHASH_BANDS
_PHASH_MASK = (1 << _PHASH_WIDTH) - 1

# Banded Hamming screen, replayed end-to-end: portable integer pHash
# (phash64_sql), 8×8-bit banding via the arithmetic-shift-then-mask
# idiom (masked band values agree with the JVM's logical shift for
# every band), bit_count(xor) Hamming — the same portability kit the
# SimHash screens use (llm.py:5749).
ORACLES["image_phash_near_dups"] = f"""
    WITH sig AS ({phash64_sql(_PHASH_SRC_SQL)}),
    banded AS (
        SELECT doc_id, phash, i AS band,
               (phash >> (i * {_PHASH_WIDTH})) & {_PHASH_MASK} AS key
        FROM sig CROSS JOIN (VALUES {_PHASH_BAND_IDX}) bi(i)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.key = b.key
                 AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_BANDS - 1}
    ORDER BY doc_a, doc_b
"""

# Skew-capped twin: bucket sizes gate all-pairs vs the consecutive
# chain, Hamming verification after pair dedup — the same replay shape
# as simhash_near_dup_pairs_capped's oracle.
ORACLES["image_phash_near_dups_capped"] = f"""
    WITH sig AS ({phash64_sql(_PHASH_SRC_SQL)}),
    banded AS (
        SELECT doc_id, i AS band,
               (phash >> (i * {_PHASH_WIDTH})) & {_PHASH_MASK} AS key
        FROM sig CROSS JOIN (VALUES {_PHASH_BAND_IDX}) bi(i)
    ), bsize AS (
        SELECT band, key, COUNT(*) AS n FROM banded GROUP BY band, key
    ), cand_small AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.key = b.key
                     AND a.doc_id < b.doc_id
        JOIN bsize s ON s.band = a.band AND s.key = a.key
        WHERE s.n <= {_LSH_BUCKET_CAP}
    ), cand_big AS (
        SELECT doc_id AS doc_a, nxt AS doc_b FROM (
            SELECT bk.doc_id, LEAD(bk.doc_id) OVER (
                       PARTITION BY bk.band, bk.key
                       ORDER BY bk.doc_id) AS nxt
            FROM banded bk
            JOIN bsize s ON s.band = bk.band AND s.key = bk.key
            WHERE s.n > {_LSH_BUCKET_CAP}
        ) WHERE nxt IS NOT NULL
    ), cand AS (
        SELECT doc_a, doc_b FROM cand_small
        UNION
        SELECT doc_a, doc_b FROM cand_big
    )
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(sa.phash, sb.phash)) AS INT) AS hamming
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    WHERE bit_count(xor(sa.phash, sb.phash)) <= {PHASH_BANDS - 1}
    ORDER BY c.doc_a, c.doc_b
"""
