"""Bloom-filter primitive and prefilter-operator tests: the no-false-
negative guarantee (the correctness-critical property — a false
negative would silently drop a duplicate check), false-positive-rate
sanity, agreement between the codegen-literal and distributed-join
probe paths, and bit-identity of the Bloom-prefiltered operators with
their exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_exporter_spark.operators.bloom import (
    bloom_bitmap, bloom_contains, bloom_probe_join, collect_bloom,
)
from hive_exporter_spark.operators.llm import (
    incremental_dedup, incremental_dedup_bloom,
)
from hive_exporter_spark.operators.pipeline import (
    ngram_contamination, ngram_contamination_bloom,
)
from hive_exporter_spark.sources.files import read_table

M, J = 1 << 16, 5


def _members(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v"))


def test_no_false_negatives(spark):
    mem = _members(spark)
    dense = collect_bloom(bloom_bitmap(mem, "v", M, J), M)
    flagged = mem.where(bloom_contains(F.col("v"), dense, M, J)).count()
    assert flagged == 500


def test_false_positive_rate_sane(spark):
    """500 items in 2^16 bits, j=5 => theoretical fpp ~ 2e-7; allow a
    generous margin but require that non-members overwhelmingly miss."""
    mem = _members(spark)
    dense = collect_bloom(bloom_bitmap(mem, "v", M, J), M)
    non = spark.range(2000).select(
        F.concat(F.lit("stranger-"), F.col("id")).alias("v"))
    fp = non.where(bloom_contains(F.col("v"), dense, M, J)).count()
    assert fp <= 20, fp


def test_probe_join_agrees_with_literal_path(spark):
    mem = _members(spark)
    bm = bloom_bitmap(mem, "v", M, J)
    dense = collect_bloom(bm, M)
    mixed = mem.unionByName(
        spark.range(300).select(
            F.concat(F.lit("stranger-"), F.col("id")).alias("v")))
    lit_flags = {
        r["v"]: r["f"]
        for r in mixed.select(
            "v", bloom_contains(F.col("v"), dense, M, J).alias("f")
        ).collect()
    }
    join_flags = {
        r["v"]: r["might_contain"]
        for r in bloom_probe_join(mixed, bm, "v", M, J).collect()
    }
    assert lit_flags == join_flags


def test_empty_build_side_flags_nothing(spark):
    empty = _members(spark).where(F.lit(False))
    dense = collect_bloom(bloom_bitmap(empty, "v", M, J), M)
    assert all(b == 0 for b in dense)
    n = _members(spark).where(
        bloom_contains(F.col("v"), dense, M, J)).count()
    assert n == 0


def _docs_split(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    pred = F.expr("CAST(substring(source, 4, 10) AS INT) < 10")
    return docs.where(~pred), docs.where(pred)


def test_incremental_dedup_bloom_matches_exact(spark, sf_dir):
    new_docs, corpus = _docs_split(spark, sf_dir)
    exact = {r["doc_id"] for r in
             incremental_dedup(new_docs, corpus).collect()}
    bloom = {r["doc_id"] for r in
             incremental_dedup_bloom(new_docs, corpus).collect()}
    assert bloom == exact and len(exact) > 0


def test_incremental_dedup_bloom_tiny_filter_still_exact(spark, sf_dir):
    """An undersized, saturated filter (high fpp) must still give the
    exact answer — everything funnels into the confirmation join."""
    new_docs, corpus = _docs_split(spark, sf_dir)
    exact = {r["doc_id"] for r in
             incremental_dedup(new_docs, corpus).collect()}
    bloom = {r["doc_id"] for r in
             incremental_dedup_bloom(new_docs, corpus,
                                     m_bits=256, n_hashes=3).collect()}
    assert bloom == exact


def test_contamination_bloom_matches_exact(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    exact = {(r["doc_id"], r["n_shingles"], r["n_contaminated"],
              r["contamination_rate"])
             for r in ngram_contamination(docs).collect()}
    bloom = {(r["doc_id"], r["n_shingles"], r["n_contaminated"],
              r["contamination_rate"])
             for r in ngram_contamination_bloom(docs).collect()}
    assert bloom == exact and len(exact) > 0


def test_bitmap_bounded_rows(spark):
    """The build-side aggregate can never exceed m/64 rows no matter
    the input size — the shuffle-bound contract."""
    big = spark.range(50_000).select(F.col("id").cast("string").alias("v"))
    assert bloom_bitmap(big, "v", 1 << 12, J).count() <= (1 << 12) // 64


def test_prefilter_plan_is_join_free(spark):
    """The bloom_contains prefilter stage must stay pure codegen: no
    join, no exchange introduced on the probe side."""
    mem = _members(spark)
    dense = collect_bloom(bloom_bitmap(mem, "v", M, J), M)
    plan = (
        mem.where(bloom_contains(F.col("v"), dense, M, J))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_incremental_dedup_bloom_distributed_probe_matches(spark, sf_dir):
    """The giant-m path (bitmap stays a DataFrame, probe via join)
    must give the identical exact answer."""
    new_docs, corpus = _docs_split(spark, sf_dir)
    exact = {r["doc_id"] for r in
             incremental_dedup(new_docs, corpus).collect()}
    dist = {r["doc_id"] for r in
            incremental_dedup_bloom(new_docs, corpus,
                                    distributed_probe=True).collect()}
    assert dist == exact and len(exact) > 0


def test_bloom_sizing_textbook_values():
    from hive_exporter_spark.operators.bloom import bloom_sizing

    m, j = bloom_sizing(1_000_000, 0.01)
    assert 9_500_000 <= m <= 9_700_000   # ~9.59 bits/item
    assert j == 7
    m, j = bloom_sizing(0)
    assert (m, j) == (64, 1)
    m, j = bloom_sizing(1000, 0.5)
    assert j >= 1 and m % 64 == 0


def test_bloom_prefiltered_join_exact_and_selective(spark, sf_dir):
    """The bloom-prefiltered join must return EXACTLY the plain join
    (no false negatives, join kills false positives), and the
    prefilter must actually drop most non-matching fact rows."""
    from hive_exporter_spark.operators.bloom import (
        bloom_contains, bloom_bitmap, bloom_prefiltered_join,
        bloom_sizing, collect_bloom)
    from hive_exporter_spark.sources.files import read_table
    from pyspark.sql import functions as F

    orders = read_table(spark, sf_dir, "orders")
    dim = (read_table(spark, sf_dir, "customer")
           .where(F.col("c_acctbal") > 9000)
           .select(F.col("c_custkey").alias("o_custkey"), "c_name"))
    got = bloom_prefiltered_join(orders, dim, "o_custkey")
    want = orders.join(dim, "o_custkey")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # selectivity: the prefilter keeps ~|matches| + fpp*|rest|
    keys = dim.select("o_custkey").distinct()
    m, j = bloom_sizing(keys.count(), 0.01)
    dense = collect_bloom(bloom_bitmap(keys, "o_custkey", m, j), m)
    kept = orders.where(
        bloom_contains(F.col("o_custkey"), dense, m, j)).count()
    matched = orders.join(keys, "o_custkey").count()
    total = orders.count()
    assert kept < total * 0.25 + matched  # dropped the bulk pre-shuffle
    assert kept >= matched
