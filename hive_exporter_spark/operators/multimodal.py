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
    bytes of the text). Real pipelines read binary columns straight
    from parquet."""
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

    return binary.mapInPandas(kernel, DECODED_IMAGE_SCHEMA)


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


# -- driver-contract wiring -------------------------------------------------

def _q_binary_meta(spark, sf):
    from hive_exporter_spark.sources.files import read_table
    return binary_metadata(read_table(spark, sf, "documents"))


QUERIES = {"binary_metadata": _q_binary_meta}

ORACLES = {
    "binary_metadata": """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               sha256(text) AS sha256
        FROM documents
    """,
}
