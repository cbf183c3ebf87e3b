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
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def phash64(documents: DataFrame, fake: bool = True) -> DataFrame:
    """64-bit perceptual image hash (pHash): resample to 8×8
    luminance, 2-D DCT-II, threshold the low-frequency block at its
    median — visually-similar images land within a few Hamming bits.

    The fake path derives the 8×8 matrix from the payload digest
    (identical payloads → identical hashes), so the distributed shape
    — Arrow-batched kernel doing one small matmul per image, emitting
    one long per row — is real; a PIL kernel swaps in behind the same
    schema. Output: (doc_id, phash long)."""
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
    # DCT-II matrix, fixed and tiny — computed once per task.
    n = 8
    dct = np.cos(np.pi / n * (np.arange(n)[:, None] + 0.5) * np.arange(n)[None, :]).T

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(content: bytes) -> int:
            d = hashlib.sha256(content).digest()
            d = d + hashlib.sha256(d).digest()          # 64 deterministic bytes
            px = np.frombuffer(d, dtype=np.uint8).astype(np.float64).reshape(n, n)
            coef = dct @ px @ dct.T
            bits = (coef >= np.median(coef)).flatten()
            return int(sum(1 << i for i, b in enumerate(bits) if b) - (1 << 63))

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "phash": pdf["content"].map(one).astype("int64"),
            })

    return binary.mapInPandas(kernel, "doc_id long, phash long")


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


def _q_phash_pairs(spark, sf):
    """Rows-only: the DCT/median pipeline has no tractable SQL twin;
    recall vs brute-force Hamming is asserted in tests. The fixture's
    sf0.01 slice has no duplicate payloads (sha-derived fake hashes
    only collide for identical bytes), so the query unions in replicas
    of the first 5 documents under shifted ids — each must pair with
    its original, making the expected output non-empty and
    deterministic at every scale."""
    from hive_exporter_spark.sources.files import read_table
    docs = read_table(spark, sf, "documents")
    replicas = (docs.where(F.col("doc_id") < 5)
                .withColumn("doc_id", F.col("doc_id") + 1_000_000))
    return image_near_dup_pairs(phash64(docs.unionByName(replicas)))


QUERIES = {
    "binary_metadata": _q_binary_meta,
    "binary_dedup_exact": _q_binary_dedup,
    "decode_images": _q_decode,
    "frame_sample_plan": _q_frames,
    "audio_features": _q_audio,
    "image_phash_near_dups": _q_phash_pairs,
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
