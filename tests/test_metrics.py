"""Shuffle-byte accounting (hive_exporter_spark/metrics.py) and the
plan-cost keep-list: every capped banded pair screen must exchange
strictly fewer shuffle bytes than its uncapped twin on the canonical
hot-cluster fixture (VERDICT r6 item 6) — bytes are box-independent,
so unlike wall-clock this contract cannot be blurred by machine drift.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_exporter_spark import metrics
from hive_exporter_spark.operators import llm, multimodal

N_HOT = 60
# The image screen's hot fixture is bigger: its per-pair payload is a
# single 8-byte hash, so the capped variant's fixed bookkeeping
# exchanges (bucket-size agg + hash rejoin) only fall below the
# uncapped screen's quadratic candidate volume once the viral bucket
# is large — which is precisely the regime the cap exists for. The
# text screens carry token signatures and cross over far earlier.
N_HOT_IMAGE = 500
CAP = 4


def _hot_docs(spark, n=N_HOT):
    return spark.createDataFrame(
        [(i, "identical viral page body shared by mirrors " * 3,
          "en", "web", 120) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long")


def _hot_vecs(spark):
    vec = [float((j % 7) - 3) for j in range(64)]
    return spark.createDataFrame(
        [(i, vec) for i in range(N_HOT)],
        "vec_id long, embedding array<double>")


def test_shuffle_snapshot_sees_a_shuffle(spark):
    df = (spark.range(0, 100_000)
          .select((F.col("id") % 31).alias("k"), "id")
          .groupBy("k").agg(F.sum("id").alias("s")))
    _, delta = metrics.measure_shuffle(spark, lambda: df.count())
    assert delta["shuffle_read_bytes"] > 0
    assert delta["shuffle_write_bytes"] > 0
    assert delta["spilled_bytes"] >= 0


def test_shuffle_delta_floors_at_zero():
    before = {"shuffle_read_bytes": 10, "shuffle_write_bytes": 5,
              "spilled_bytes": 0}
    after = {"shuffle_read_bytes": 4, "shuffle_write_bytes": 9,
             "spilled_bytes": 0}
    d = metrics.shuffle_delta(before, after)
    assert d == {"shuffle_read_bytes": 0, "shuffle_write_bytes": 4,
                 "spilled_bytes": 0}


@pytest.mark.parametrize("name,uncapped,capped", [
    ("minhash",
     lambda s: llm.minhash_lsh_pairs(_hot_docs(s)),
     lambda s: llm.minhash_lsh_pairs_capped(_hot_docs(s), bucket_cap=CAP)),
    ("simhash",
     lambda s: llm.simhash_near_dup_pairs(_hot_docs(s)),
     lambda s: llm.simhash_near_dup_pairs_capped(_hot_docs(s),
                                                 bucket_cap=CAP)),
    ("embedding",
     lambda s: llm.embedding_near_dup_lsh_pairs(_hot_vecs(s)),
     lambda s: llm.embedding_near_dup_lsh_pairs_capped(_hot_vecs(s),
                                                       bucket_cap=CAP)),
    ("image_phash",
     lambda s: multimodal.image_near_dup_pairs(
         multimodal.phash64(_hot_docs(s, N_HOT_IMAGE))),
     lambda s: multimodal.image_near_dup_pairs_capped(
         multimodal.phash64(_hot_docs(s, N_HOT_IMAGE)), bucket_cap=CAP)),
])
# NOT parametrized here: joins.blocked_fuzzy_pairs_capped. Its hot-block
# armor is real (candidate volume quadratic -> linear, pinned in
# tests/test_joins.py), but at fixture scale the blocking self-join
# BROADCASTS — the B(B-1)/2 blowup happens inside the join operator
# without crossing an exchange, so shuffle bytes are not its
# observable.
def test_capped_screen_exchanges_fewer_bytes(spark, name, uncapped, capped):
    """One viral bucket: the uncapped screen's equi-join emits
    B(B-1)/2 candidate pairs through the shuffle; the capped twin's
    consecutive chain emits B-1. The byte ledger must show it."""
    _, d_full = metrics.measure_shuffle(
        spark, lambda: uncapped(spark).count())
    _, d_cap = metrics.measure_shuffle(
        spark, lambda: capped(spark).count())
    full_bytes = d_full["shuffle_read_bytes"] + d_full["shuffle_write_bytes"]
    cap_bytes = d_cap["shuffle_read_bytes"] + d_cap["shuffle_write_bytes"]
    assert full_bytes > 0, name
    assert cap_bytes < full_bytes, (
        f"{name}: capped screen exchanged {cap_bytes} bytes, "
        f"uncapped {full_bytes} — the cap is not shedding shuffle volume")


def test_measure_shuffle_survives_stage_eviction(spark):
    """The regression the full-suite run exposed: once the status
    store evicts old stages (spark.ui.retainedStages overflow, default
    1000), a cumulative-sum diff goes backwards and undercounts. The
    stage-ID accounting must report the SAME bytes for the same plan
    regardless of how many stages the session has accumulated — here
    pinned by comparing a fresh measurement against one taken after
    hundreds of additional stages."""
    def job():
        return (spark.range(0, 50_000)
                .select((F.col("id") % 13).alias("k"), "id")
                .groupBy("k").agg(F.sum("id").alias("s")).count())

    _, first = metrics.measure_shuffle(spark, job)
    assert first["shuffle_write_bytes"] > 0
    # churn the store: many distinct tiny stages
    for i in range(40):
        spark.range(0, 1000 + i).select(
            (F.col("id") % 7).alias("k")).groupBy("k").count().count()
    _, again = metrics.measure_shuffle(spark, job)
    assert again["shuffle_write_bytes"] == first["shuffle_write_bytes"]
    assert again["shuffle_read_bytes"] == first["shuffle_read_bytes"]
