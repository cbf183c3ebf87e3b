"""Bucketed co-located join: writing both fact tables bucketed on the
join key removes the join-time shuffle entirely — the SCALE.md
next-step #1 demonstration, asserted on the physical plan."""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from hive_exporter_spark import plans
from hive_exporter_spark.functions.aggs import dsum
from hive_exporter_spark.sources.files import read_table


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir):
    from hive_exporter_spark.catalog import TableName
    from hive_exporter_spark.sinks import write_bucketed

    db = f"bucketdb_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    write_bucketed(read_table(spark, sf_dir, "orders"),
                   TableName(db, "orders_b"), ["o_orderkey"],
                   n_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(read_table(spark, sf_dir, "lineitem"),
                   TableName(db, "lineitem_b"), ["l_orderkey"],
                   n_buckets=8, sort_cols=["l_orderkey"])
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_db):
    orders = spark.table(f"{bucketed_db}.orders_b")
    lineitem = spark.table(f"{bucketed_db}.lineitem_b")
    # At fixture scale Catalyst prefers broadcast (also shuffle-free);
    # force sort-merge to prove the bucketed path needs no exchange —
    # this is the plan shape two 50 TB fact tables would take.
    joined = orders.hint("merge").join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    )
    plan = plans.formatted_plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert plans.num_exchanges(joined) == 0, plan


def test_bucketed_join_same_result_as_plain(spark, sf_dir, bucketed_db):
    plain = (
        read_table(spark, sf_dir, "orders")
        .join(read_table(spark, sf_dir, "lineitem"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("q"))
        .first()
    )
    bucketed = (
        spark.table(f"{bucketed_db}.orders_b")
        .join(spark.table(f"{bucketed_db}.lineitem_b"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("q"))
        .first()
    )
    assert plain == bucketed


def test_bucketed_agg_avoids_exchange(spark, bucketed_db):
    """Aggregation on the bucket key also reuses the bucketing."""
    lineitem = spark.table(f"{bucketed_db}.lineitem_b")
    agg = lineitem.groupBy("l_orderkey").agg(dsum("l_quantity").alias("q"))
    assert plans.num_exchanges(agg) == 0, plans.formatted_plan(agg)


def test_partitioned_table_prunes_partitions(spark, sf_dir):
    """A filter on the partition column must become a PartitionFilter
    (pruned directories), not a post-scan predicate."""
    import uuid as _uuid

    from hive_exporter_spark.catalog import TableName
    from hive_exporter_spark.sinks import write_partitioned

    db = f"prunedb_{_uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    try:
        ev = read_table(spark, sf_dir, "events")
        write_partitioned(ev, TableName(db, "ev_p"), ["event_type"],
                          overwrite=True)
        df = spark.table(f"{db}.ev_p").where(F.col("event_type") == "click")
        plan = plans.formatted_plan(df)
        import re
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "event_type" in m.group(1), plan
        n_click = ev.where(F.col("event_type") == "click").count()
        assert df.count() == n_click
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_write_clustered_files_range_disjoint(spark, sf_dir, tmp_path):
    """Clustered files must cover disjoint key ranges with tight
    footer stats — the property file-level data skipping relies on."""
    import pyarrow.parquet as pq

    from hive_exporter_spark.sinks import write_clustered
    from hive_exporter_spark.sources.files import read_table

    out = str(tmp_path / "events_clustered")
    # ts is TIMESTAMP_NTZ (not directly castable to long); unix_micros over
    # an LTZ cast gives a monotone long key — a uniform tz shift preserves
    # the range-disjointness property under test.
    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts_long", F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    )
    write_clustered(ev.select("event_id", "ts_long", "user_id", "value"),
                    out, ["ts_long"], n_files=8)
    ranges = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out, f))
        los, his = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(1)  # ts_long
            los.append(col.statistics.min)
            his.append(col.statistics.max)
        ranges.append((min(los), max(his)))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"


def test_bucketed_digest_table_standing_dedup(spark, sf_dir):
    """The standing-dedup shape incremental_dedup's docstring promises:
    corpus digests materialized ONCE as a table bucketed on the digest,
    each new crawl batch anti-joined against it. The bucketed (huge)
    side must need NO exchange — only the small batch sorts/shuffles —
    and the surviving set must equal the plain anti-join's."""
    import uuid as _uuid

    from hive_exporter_spark.catalog import TableName
    from hive_exporter_spark.sinks import write_bucketed

    docs = read_table(spark, sf_dir, "documents")
    pred = F.expr("CAST(substring(source, 4, 10) AS INT) < 10")
    corpus, batch_docs = docs.where(pred), docs.where(~pred)
    digests = corpus.select(F.sha2(F.col("text"), 256).alias("digest")).distinct()
    db = f"dedupdb_{_uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    try:
        write_bucketed(digests, TableName(db, "corpus_digests"),
                       ["digest"], n_buckets=8, sort_cols=["digest"])
        dig_table = spark.table(f"{db}.corpus_digests")
        batch = batch_docs.withColumn("digest", F.sha2(F.col("text"), 256))
        fresh = batch.hint("merge").join(dig_table, "digest", "left_anti")
        plan = plans.formatted_plan(fresh)
        assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan
        assert plans.num_exchanges(fresh) == 1, plan  # batch side only
        got = {r["doc_id"] for r in fresh.collect()}
        expected = {r["doc_id"] for r in
                    batch.join(digests, "digest", "left_anti").collect()}
        assert got == expected and len(got) > 0
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
