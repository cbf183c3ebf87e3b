"""Multimodal plumbing tests: Arrow-batched kernels over binary
columns — schema, determinism, fan-out shape, stub gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hive_exporter_spark.operators import multimodal
from hive_exporter_spark.sources.files import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").limit(50).cache()


def test_binary_metadata_matches_driver_side(spark, docs):
    sample = docs.limit(5).collect()
    got = {r["doc_id"]: r for r in multimodal.binary_metadata(docs).collect()}
    for row in sample:
        b = row["text"].encode("utf-8")
        assert got[row["doc_id"]]["byte_len"] == len(b)
        assert got[row["doc_id"]]["sha256"] == hashlib.sha256(b).hexdigest()


def test_decode_images_fake_deterministic(spark, docs):
    a = {r["doc_id"]: (r["width"], r["height"], r["n_channels"])
         for r in multimodal.decode_images(docs).collect()}
    b = {r["doc_id"]: (r["width"], r["height"], r["n_channels"])
         for r in multimodal.decode_images(docs).collect()}
    assert a == b
    assert all(64 <= w < 256 and 64 <= h < 256 and c in (1, 3)
               for (w, h, c) in a.values())


def test_decode_images_real_path_gated(spark, docs):
    if multimodal._try_import_pil() is None:
        with pytest.raises(NotImplementedError):
            multimodal.decode_images(docs, fake=False)


@pytest.mark.skipif(multimodal._try_import_pil() is None,
                    reason="PIL not installed in this container")
def test_decode_images_real_path_with_pil(spark):
    """When the container gains PIL, the real kernel must actually
    decode: a generated 12x7 RGB PNG comes back with its true
    geometry, and junk bytes report decode_status='error' instead of
    fabricated dimensions."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    rows = [(1, buf.getvalue()), (2, b"not an image")]
    docs = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in
           multimodal.decode_images(docs, fake=False).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"],
            got[1]["decode_status"]) == (12, 7, 3, "ok")
    assert got[2]["decode_status"] == "error"


def test_frame_sample_fan_out(spark, docs):
    out = multimodal.frame_sample_plan(docs, every_n=10)
    n_docs = docs.count()
    counts = out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert counts.count() == n_docs
    assert out.count() >= n_docs  # at least frame 0 per doc
    assert out.where(F.col("frame_index") % 10 != 0).count() == 0


def test_resize_images_binary_roundtrip(spark, docs):
    from hive_exporter_spark.operators.multimodal import resize_images

    out = resize_images(docs, target_w=8, target_h=8)
    rows = out.limit(5).collect()
    assert rows
    for r in rows:
        assert r["out_width"] == 8 and r["out_height"] == 8
        assert isinstance(r["resized"], (bytes, bytearray))
        assert len(r["resized"]) == 64


def test_audio_features_feed_similarity(spark, docs):
    """The binary→embedding bridge: audio_features output must be
    directly consumable by the vector similarity operators."""
    from hive_exporter_spark.operators import llm
    from hive_exporter_spark.operators.multimodal import audio_features

    feats = audio_features(docs).withColumnRenamed("doc_id", "vec_id") \
        .withColumnRenamed("mfcc", "embedding")
    topk = llm.topk_cosine(feats, feats.where(F.col("vec_id") < 3), k=2)
    got = topk.collect()
    assert len(got) == 6
    assert all(0.0 <= r["score"] <= 1.0 for r in got)


def test_phash_deterministic_and_identical_payloads_collide(spark):
    from hive_exporter_spark.operators.multimodal import phash64

    df = spark.createDataFrame(
        [(1, "same body"), (2, "same body"), (3, "different body")],
        "doc_id long, text string")
    h = {r["doc_id"]: r["phash"] for r in phash64(df).collect()}
    assert h[1] == h[2]
    assert h[1] != h[3]
    h2 = {r["doc_id"]: r["phash"] for r in phash64(df).collect()}
    assert h == h2


def test_image_near_dup_pairs_perfect_recall_vs_brute_force(spark, sf_dir):
    """Banded bucketing must find EVERY pair within max_hamming — the
    pigeonhole guarantee, checked against the all-pairs baseline."""
    from hive_exporter_spark.operators.multimodal import (
        image_near_dup_pairs, phash64)
    from hive_exporter_spark.sources.files import read_table

    hashes = phash64(read_table(spark, sf_dir, "documents")).cache()
    a, b = hashes.alias("a"), hashes.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    brute = {
        (r["da"], r["db"]) for r in
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .where(ham <= 7)
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .collect()
    }
    banded = {(r["doc_a"], r["doc_b"])
              for r in image_near_dup_pairs(hashes, max_hamming=7).collect()}
    assert banded == brute


def test_image_near_dup_pairs_rejects_bad_bands(spark):
    from hive_exporter_spark.operators.multimodal import (
        image_near_dup_pairs, phash64)

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        image_near_dup_pairs(phash64(df), max_hamming=8, bands=8)


def test_binary_dedup_exact_keeps_lowest_id(spark):
    from hive_exporter_spark.operators.multimodal import binary_dedup_exact

    df = spark.createDataFrame(
        [(5, "same payload"), (2, "same payload"), (9, "other")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in binary_dedup_exact(df).collect()}
    assert set(rows) == {2, 9}
    assert rows[2]["byte_len"] == len(b"same payload")
    assert len(rows[2]["sha256"]) == 64


def test_phash64_matches_duckdb_replay(spark):
    """The integer-DCT pHash is engine-portable by construction:
    phash64_sql replays the Arrow kernel bit-for-bit in DuckDB —
    quantized constants, exact int64 transforms, the 2*coef >=
    m31+m32 median test, and two's-complement bit-63 packing."""
    import duckdb

    from hive_exporter_spark.operators.multimodal import phash64, phash64_sql

    texts = ["hello world", "the quick brown fox", "a", "", "Zzz 123",
             "same body", "same body"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r["phash"] for r in phash64(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    for i, s in enumerate(texts):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, s])
    exp = dict(con.execute(
        phash64_sql("SELECT doc_id, text FROM t")).fetchall())
    assert got == exp
    assert got[5] == got[6]  # identical payloads still collide


def test_image_capped_equals_uncapped_and_arms_hot_buckets(spark, docs):
    """The pHash capped twin (VERDICT r6 item 1): identical to the
    uncapped screen with no hot buckets; a corpus of identical
    payloads (one viral bucket) degrades to linear candidates while
    the cluster stays connected."""
    from hive_exporter_spark.operators.multimodal import (
        image_near_dup_pairs, image_near_dup_pairs_capped, phash64)

    replicas = (docs.where(F.col("doc_id") < 5)
                .withColumn("doc_id", F.col("doc_id") + 1_000_000))
    hashes = phash64(docs.unionByName(replicas)).cache()
    base = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in image_near_dup_pairs(hashes).collect()}
    capped = {(r["doc_a"], r["doc_b"]): r["hamming"]
              for r in image_near_dup_pairs_capped(hashes).collect()}
    assert base and capped == base

    n = 60
    hot = spark.createDataFrame(
        [(i, "identical viral page body shared by mirrors " * 3)
         for i in range(n)],
        "doc_id long, text string")
    hot_hashes = phash64(hot).cache()
    full = image_near_dup_pairs(hot_hashes).collect()
    small = image_near_dup_pairs_capped(hot_hashes, bucket_cap=4).collect()
    assert len(full) == n * (n - 1) / 2  # identical payloads: all pairs
    assert 0 < len(small) < len(full)
    assert {(r["doc_a"], r["doc_b"]) for r in small} <= \
           {(r["doc_a"], r["doc_b"]) for r in full}
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in small:
        parent[find(int(r["doc_a"]))] = find(int(r["doc_b"]))
    assert len({find(i) for i in range(n)}) == 1

    with pytest.raises(ValueError):
        image_near_dup_pairs_capped(hot_hashes, max_hamming=8, bands=8)
