"""Plan-quality gates: the physical-plan properties each operator must
keep for 100 TB viability. A result-correct operator whose plan loses
pushdown / broadcast / partial aggregation fails HERE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_exporter_spark import plans
from hive_exporter_spark.operators import core, llm, relational
from hive_exporter_spark.sources.files import read_table


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    # Cache substitution is plan-based and session-global: a table cached
    # by an earlier test module would turn these parquet scans into
    # InMemoryTableScan and erase the ReadSchema/PushedFilters evidence
    # the assertions below inspect. Plan tests need the raw scans.
    spark.catalog.clearCache()
    return lambda name: read_table(spark, sf_dir, name)


def test_q1_pushdown_pruning_partial_agg(t):
    df = relational.pricing_summary(t("lineitem"))
    pushed = plans.pushed_filters(df)
    assert any("l_shipdate" in p and "LessThanOrEqual" in p for p in pushed), pushed
    (cols,) = plans.scan_read_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols, (
        f"column pruning lost: scan reads {cols}"
    )
    assert plans.has_partial_aggregate(df)


def test_watermark_filter_pushes_to_scan(t):
    df = core.newer_than(t("orders"), "o_orderkey", 1000)
    pushed = plans.pushed_filters(df)
    assert any("GreaterThan" in p and "o_orderkey" in p for p in pushed), pushed


def test_part_volume_joins_broadcast_no_fact_shuffle(t):
    """The explicit broadcast join must not shuffle the lineitem fact
    side for the join — only the aggregation exchange remains."""
    df = relational.part_type_volume(t("part"), t("lineitem"))
    assert plans.has_broadcast_join(df)
    assert plans.sort_merge_join_count(df) == 0
    # one exchange for the groupBy, one for the final orderBy sort
    assert plans.num_exchanges(df) <= 2, plans.formatted_plan(df)


def test_q5_dimension_joins_broadcast(t):
    df = relational.local_supplier_volume(
        t("region"), t("nation"), t("customer"), t("orders"),
        t("lineitem"), t("supplier"),
    )
    assert plans.broadcast_join_count(df) >= 2


def test_latest_per_key_single_shuffle(t):
    df = core.latest_per_key(t("events"), ["user_id"], "ts", ["event_id"])
    assert plans.num_exchanges(df) == 1, plans.formatted_plan(df)


def test_merge_upsert_single_shuffle(t):
    ev = t("events")
    df = core.merge_upsert(
        ev.where(F.col("event_id") <= 800), ev.where(F.col("event_id") > 600),
        ["event_id"], "ts",
    )
    assert plans.num_exchanges(df) == 1, plans.formatted_plan(df)


def test_scan_projection_prunes_columns(t):
    df = t("lineitem").select("l_orderkey", "l_quantity")
    (cols,) = plans.scan_read_columns(df)
    assert cols == ["l_orderkey", "l_quantity"]


def test_topk_cosine_corpus_not_shuffled(t):
    """Brute-force similarity: queries broadcast, corpus scanned in
    place; the only exchange is the per-query top-k window."""
    emb = t("embeddings")
    df = llm.topk_cosine(emb, emb.where(F.col("vec_id") < 10))
    assert plans.has_broadcast_join(df)
    assert plans.num_exchanges(df) <= 1, plans.formatted_plan(df)


def test_minhash_partial_aggregation(t):
    df = llm.minhash_signatures(t("documents"))
    assert plans.has_partial_aggregate(df)


def test_q6_all_predicates_push_to_scan(t):
    df = relational.forecast_revenue(t("lineitem"))
    pushed = " ".join(plans.pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    (cols,) = plans.scan_read_columns(df)
    assert set(cols) <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q14_broadcast_and_month_pushdown(t):
    df = relational.promo_revenue(t("lineitem"), t("part"))
    assert plans.has_broadcast_join(df)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_shipdate" in pushed, pushed


def test_q18_having_collapses_before_join(t):
    """The per-order quantity aggregate must sit below the joins, so
    the join probes one row per order key, not per lineitem row."""
    df = relational.large_orders(t("customer"), t("orders"), t("lineitem"))
    assert plans.has_partial_aggregate(df)
    plan = plans.formatted_plan(df)
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1


def test_q19_disjunctive_arms_stay_single_scan(t):
    """The OR'd arms must evaluate in one pass over lineitem — exactly
    one lineitem scan node, no union-of-scans rewrite."""
    df = relational.disjunctive_part_revenue(t("lineitem"), t("part"))
    plan = plans.formatted_plan(df)
    assert plan.count("lineitem.parquet") <= plan.count("Scan parquet"), plan
    assert plans.has_broadcast_join(df)
    scans = plans.scan_read_columns(df)
    assert sum("l_quantity" in cols for cols in scans) == 1, scans


def test_q22_scalar_subquery_broadcast_anti_join(t):
    df = relational.idle_rich_customers(t("customer"), t("orders"))
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_events_ts_range_pushes_to_scan(spark, sf_dir):
    """The ts_range option must land as a pushed filter in the parquet
    scan (row-group min/max skipping), whichever physical representation
    the fixture's ts column has (epoch-nanos long or native micros).

    On the nanos-era fixture a predicate over the CONVERTED timestamp
    column cannot push (it sits above timestamp_micros()); ts_range's
    raw-long comparison is what restores pushdown. On the micros fixture
    both formulations push — assert pushdown holds either way."""
    df = read_table(spark, sf_dir, "events", ts_range=("2024-01-10", None))
    pushed = " ".join(plans.pushed_filters(df))
    assert "ts" in pushed and "GreaterThanOrEqual" in pushed, pushed
    ts_is_long = dict(
        spark.read.parquet(f"{sf_dir}/events.parquet").dtypes
    )["ts"] == "bigint"
    if ts_is_long:
        unpushed = read_table(spark, sf_dir, "events").where(
            F.col("ts") >= F.lit("2024-01-10").cast("timestamp")
        )
        assert not any(
            "GreaterThanOrEqual" in p for p in plans.pushed_filters(unpushed))


def test_window_analytics_single_exchange(t):
    """Six analytic functions over one partition spec must share a
    single exchange (one Window group, not six)."""
    df = relational.order_window_analytics(t("orders"))
    assert plans.num_exchanges(df) == 1, plans.formatted_plan(df)


def test_moving_avg_window_runs_post_aggregate(t):
    """The range-frame window must sit above the per-day aggregate —
    |days| input rows, not |lineitem| rows."""
    df = relational.daily_revenue_moving_avg(t("lineitem"))
    plan = plans.formatted_plan(df)
    assert plan.index("Window") < plan.index("HashAggregate"), plan


def test_split_and_epoch_mix_are_map_only(t):
    """The curation projections must stay shuffle-free: deterministic
    hash assignment is a map-side expression, not a repartition."""
    from hive_exporter_spark.operators import pipeline

    docs = t("documents")
    assert plans.num_exchanges(pipeline.train_val_test_split(docs)) == 0
    assert plans.num_exchanges(pipeline.epoch_mix(docs)) == 0


def test_gopher_signals_single_scan_no_exchange(t):
    from hive_exporter_spark.operators import pipeline

    df = pipeline.gopher_quality_signals(t("documents"))
    assert plans.num_exchanges(df) == 0, plans.formatted_plan(df)


def test_q21_dims_broadcast(t):
    """supplier/nation joins must broadcast; the fact side shuffles
    only on the shared o_orderkey prefix."""
    df = relational.waiting_suppliers(
        t("orders"), t("lineitem"), t("supplier"), t("nation")
    )
    assert plans.broadcast_join_count(df) >= 2, plans.formatted_plan(df)


def test_fill_missing_days_spine_broadcast(t):
    """The date spine (O(days) rows) must be on the broadcast side —
    the daily aggregate must not shuffle for the join."""
    from hive_exporter_spark.operators import pipeline

    df = pipeline.fill_missing_days(t("events"))
    assert plans.has_broadcast_join(df), plans.formatted_plan(df)


def test_q2_catalog_broadcasts_dims(t):
    """Adapted Q2: part/supplier/nation/region dims broadcast into the
    fact scan; the per-part min joins back broadcast (no second
    fact-sized shuffle)."""
    df = relational.min_cost_supplier(
        t("part"), t("supplier"), t("nation"), t("region"), t("lineitem"))
    assert plans.broadcast_join_count(df) >= 3, plans.formatted_plan(df)


def test_q9_single_fact_shuffle(t):
    """Adapted Q9: all dims broadcast; the only sort-merge join allowed
    is lineitem⋈orders (two fact tables)."""
    df = relational.nation_product_profit(
        t("part"), t("supplier"), t("nation"), t("orders"), t("lineitem"))
    assert plans.broadcast_join_count(df) >= 2
    assert plans.sort_merge_join_count(df) <= 1, plans.formatted_plan(df)


def test_q11_threshold_is_broadcast_scalar(t):
    """Adapted Q11: the global threshold must be a broadcast single-row
    join, never a shuffled cartesian."""
    df = relational.important_parts(t("supplier"), t("nation"), t("lineitem"))
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or plans.has_broadcast_join(df), plan
    assert "CartesianProduct" not in plan, plan


def test_q20_no_repeat_fact_shuffle(t):
    """Adapted Q20: per-(part,supplier) and per-part aggregates must
    reuse one fact shuffle; the rollup side joins back broadcast."""
    df = relational.dominant_share_suppliers(
        t("part"), t("supplier"), t("nation"), t("lineitem"))
    assert plans.broadcast_join_count(df) >= 2, plans.formatted_plan(df)


def test_semantic_dedup_no_cartesian(t):
    """The intra-cluster self-join must be an equi-join on the cluster
    id, never a cartesian/BNLJ over the corpus."""
    df = llm.semantic_dedup(t("documents"), t("embeddings"))
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_incremental_dedup_shuffles_digests_not_text(t):
    """The corpus side of the anti-join must be the aggregated digest
    projection: its scan reads ONLY the text column (for hashing), and
    the join itself is hash-based, not nested-loop."""
    pred = F.expr("CAST(substring(source, 4, 10) AS INT) < 10")
    docs = t("documents")
    df = llm.incremental_dedup(docs.where(~pred), docs.where(pred))
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftAnti" in plan, plan
    # one of the scans (the corpus side) must be pruned to the hash
    # input (text) + the split predicate column only
    assert any(set(cols) <= {"source", "text"}
               for cols in plans.scan_read_columns(df)), (
        plans.scan_read_columns(df))


def test_tfidf_partial_aggregation_and_pruning(t):
    """Two scans by design: the tf scan (doc_id + text only) and the
    broadcast-N count scan, which must read NO data columns."""
    df = llm.tfidf_topk_terms(t("documents"))
    assert plans.has_partial_aggregate(df)
    scans = plans.scan_read_columns(df)
    assert len(scans) == 2, scans
    assert any(set(cols) == {"doc_id", "text"} for cols in scans), scans
    assert any(cols == [] for cols in scans), scans


def test_heavy_hitters_single_merge_exchange(t):
    """Space-saving summaries are built map-side in the Arrow kernel;
    the only wide ops after it are the merge agg + final top-k sort."""
    df = llm.heavy_hitters(t("documents"))
    assert plans.num_exchanges(df) <= 2, plans.formatted_plan(df)
    assert plans.has_partial_aggregate(df)


def test_image_phash_pairs_equi_join(t):
    from hive_exporter_spark.operators import multimodal

    df = multimodal.image_near_dup_pairs(multimodal.phash64(t("documents")))
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_zorder_index_map_only_after_bounds(t):
    """Beyond the single-row bounds agg (broadcast back), the z-value
    projection adds NO wide exchange of the fact table."""
    from hive_exporter_spark.operators import layout

    df = layout.zorder_index(t("events"), ["user_id", "value"])
    # exchanges: only the bounds aggregate's (partial->final) pair on
    # a single-row side; the events side itself is never repartitioned.
    assert plans.num_exchanges(df) <= 2, plans.formatted_plan(df)
    assert plans.has_broadcast_join(df)


def test_dsir_weights_plan_shape(spark, sf_dir):
    """Vocab totals broadcast (single row); no cartesian; bounded
    exchange count (token agg + token join + doc agg + sort)."""
    from hive_exporter_spark.operators import pipeline

    df = pipeline.dsir_weights(read_table(spark, sf_dir, "documents"))
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert plans.has_broadcast_join(df)
    assert plans.num_exchanges(df) <= 5, plan


def test_token_entropy_plan_shape(spark, sf_dir):
    """(doc, token) partial agg collapses duplicates map-side before
    the shuffle; the per-doc agg is the only other data exchange."""
    from hive_exporter_spark.operators import pipeline

    df = pipeline.token_entropy(read_table(spark, sf_dir, "documents"))
    plan = plans.formatted_plan(df)
    assert plans.num_exchanges(df) <= 3, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_contributor_cap_single_exchange(spark, sf_dir):
    from hive_exporter_spark.operators import pipeline

    df = pipeline.contributor_cap(read_table(spark, sf_dir, "events"))
    assert plans.num_exchanges(df) == 1, plans.formatted_plan(df)


def test_event_anomaly_plan_shape(spark, sf_dir):
    """Daily rollup + one window + output sort — no joins at all."""
    from hive_exporter_spark.operators import sessions

    df = sessions.event_anomaly_zscore(read_table(spark, sf_dir, "events"))
    plan = plans.formatted_plan(df)
    assert plans.num_exchanges(df) <= 3, plan
    assert "Join" not in plan, plan


def test_temperature_mix_no_data_row_shuffle(spark, sf_dir):
    """The corpus must reach the rate join via broadcast only: every
    exchange in the plan belongs to the dimension-sized rate chain,
    and the join on the data path is a BroadcastHashJoin (a sort-merge
    join would mean the corpus itself shuffles)."""
    from hive_exporter_spark.operators import pipeline

    df = pipeline.temperature_mix(read_table(spark, sf_dir, "documents"))
    plan = plans.formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plans.has_broadcast_join(df), plan


def test_bpe_pair_counts_partial_agg_and_topk(spark, sf_dir):
    """Pair counting must combine map-side (hot-pair skew collapses
    before the exchange) and the top-k must compile to
    TakeOrderedAndProject, not a global sort."""
    df = llm.bpe_pair_counts(t := read_table(spark, sf_dir, "documents"))
    plan = plans.formatted_plan(df)
    assert plans.has_partial_aggregate(df), plan
    assert "TakeOrderedAndProject" in plan, plan
    assert plans.num_exchanges(df) <= 1, plan


def test_remove_dup_spans_bounded_exchanges(spark, sf_dir):
    """Verdict aggregate + verdict join + rebuild + output sort — the
    chunk stream must not shuffle more than that."""
    df = llm.remove_dup_spans(read_table(spark, sf_dir, "documents"))
    assert plans.num_exchanges(df) <= 4, plans.formatted_plan(df)


def test_sketches_prune_and_partial_agg(t):
    """Portable sketches must read only (key, group) columns; HLL's
    data-path cost must be ONE exchange fed by a map-side partial agg
    (the mergeable-register property in plan form)."""
    from hive_exporter_spark.operators import sketches as sk

    h = sk.hll_distinct(t("events"), "user_id", ["event_type"])
    (hcols,) = plans.scan_read_columns(h)
    assert sorted(hcols) == ["event_type", "user_id"], hcols
    assert plans.has_partial_aggregate(h)
    # registers exchange + histogram-sized estimate exchange only
    assert plans.num_exchanges(h) <= 2, plans.formatted_plan(h)

    k = sk.kmv_distinct(t("events"), "user_id", ["event_type"])
    (kcols,) = plans.scan_read_columns(k)
    assert sorted(kcols) == ["event_type", "user_id"], kcols
    # one full-data exchange (salted local prune); everything after
    # runs on <= groups*S*k rows
    assert plans.num_exchanges(k) <= 4, plans.formatted_plan(k)
    assert "CartesianProduct" not in plans.executed_plan(k)


def test_theta_overlap_no_cartesian_sketch_sized_algebra(t):
    from hive_exporter_spark.operators import sketches as sk

    df = sk.theta_overlap(t("events"), "user_id", "event_type")
    plan = plans.executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the pairwise counts join broadcast (k-row sketches, never shuffled)
    assert plans.broadcast_join_count(df) >= 3, plan


def test_hist_quantiles_two_passes_total(t):
    """Mergeable histogram quantiles: exactly the edge pass + the bin
    pass over the data — the per-q work must NOT re-scan (a union-of-
    branches formulation read the fact table 2x per quantile)."""
    from hive_exporter_spark.operators import sketches as sk

    df = sk.value_quantiles_hist(t("events"), "value", ["event_type"])
    assert len(plans.scan_read_columns(df)) <= 2, plans.formatted_plan(df)
    assert plans.num_exchanges(df) <= 4, plans.formatted_plan(df)


def test_ams_f2_partial_agg_no_cartesian(t):
    """F2's only data-sized exchange is the keyed wordcount; the
    64-way sign explode must partial-aggregate map-side and nothing
    may turn into a cartesian or sort-merge join."""
    from hive_exporter_spark.operators import sketches as sk

    df = sk.ams_f2(t("events"), "user_id", ["event_type"])
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert plans.has_partial_aggregate(df)
    assert plans.sort_merge_join_count(df) <= 1  # exact<->est join only


def test_source_overlap_matrix_broadcasts_pair_side(t):
    """Both label joins must broadcast (the pair graph), never
    shuffle the corpus-sized label projection."""
    from hive_exporter_spark.operators import llm as _llm

    df = _llm.source_overlap_matrix(t("documents"))
    assert plans.broadcast_join_count(df) >= 2
    assert plans.sort_merge_join_count(df) == 0, plans.formatted_plan(df)


def test_quality_prune_topp_broadcast_quota_no_global_sort(t):
    """The quota join must broadcast; ranking must stay partitioned
    by (lang[, salt]) — no empty-partitionBy global window."""
    from hive_exporter_spark.operators import pipeline as pl

    df = pl.quality_prune_topp(t("documents"))
    assert plans.has_broadcast_join(df)
    plan = plans.formatted_plan(df)
    import re
    for spec in re.findall(r"partitionBy=\[([^\]]*)\]", plan):
        assert spec.strip(), "global (un-partitioned) window in plan"


def test_bpe_apply_corpus_side_is_broadcast_join(t):
    """The corpus encode pass must be a broadcast dictionary join —
    merges never execute on the data-sized side."""
    from hive_exporter_spark.operators import llm as _llm

    docs = t("documents")
    df = _llm.bpe_apply(docs, _llm.bpe_train(docs, 2))
    assert plans.has_broadcast_join(df)
    assert plans.sort_merge_join_count(df) == 0, plans.formatted_plan(df)


def test_bpe_apply_vocab_broadcast_gated_on_size(t):
    """Above the vocab threshold the FORCED broadcast hint must not
    fire — on a web-scale corpus the distinct-token dictionary is
    10^8+ rows and the hint would OOM regardless of planner stats.
    (The tiny test fixture still broadcasts by PLANNER CHOICE, which
    is correct — at scale the size estimate flips it to shuffle; the
    gate removes only the unconditional override.)"""
    from hive_exporter_spark.operators import llm as _llm

    docs = t("documents")
    merges = _llm.bpe_train(docs, 2)
    gated = _llm.bpe_apply(docs, merges, broadcast_vocab_max=0)
    hinted = _llm.bpe_apply(docs, merges)
    analyzed = lambda d: d._jdf.queryExecution().analyzed().toString()  # noqa: E731
    assert "ResolvedHint" in analyzed(hinted)
    assert "ResolvedHint" not in analyzed(gated), analyzed(gated)
    # and the result is identical either way — strategy, not semantics
    a = sorted(map(tuple, hinted.collect()))
    b = sorted(map(tuple, gated.collect()))
    assert a == b


def test_funnel_within_single_user_exchange(t):
    """The chained step mins must share ONE user_id exchange (k window
    passes, no join per step): exchanges = user window + final tally
    shuffle + sort, and zero sort-merge joins."""
    from hive_exporter_spark.operators import sessions as sess

    df = sess.conversion_funnel_within(t("events"))
    assert plans.sort_merge_join_count(df) == 0, plans.formatted_plan(df)
    assert plans.num_exchanges(df) <= 4, plans.formatted_plan(df)


def test_rfm_no_global_window_thresholds_broadcast(t):
    """RFM must not rank users through a global window; the quintile
    thresholds and the 'now' scalar arrive by broadcast."""
    from hive_exporter_spark.operators import sessions as sess

    df = sess.rfm_scores(t("events"))
    plan = plans.formatted_plan(df)
    import re
    assert not re.search(r"Window.*partitionBy=\[\]", plan)
    # single-row scalar sides arrive as BroadcastNestedLoopJoin (the
    # crossJoin of the 'now' scalar and the threshold row), never a
    # data-sized shuffle join
    assert plan.count("BroadcastNestedLoopJoin") >= 2, plan
    assert plans.sort_merge_join_count(df) == 0, plan


def test_bloom_prefiltered_join_filters_before_join(t):
    """The bloom membership test must sit on the fact side BELOW the
    join (a Filter containing the bitmap probe), so pruned rows never
    reach the exchange."""
    from pyspark.sql import functions as F

    from hive_exporter_spark.operators.bloom import bloom_prefiltered_join

    orders = t("orders")
    dim = (t("customer").where(F.col("c_acctbal") > 9000)
           .select(F.col("c_custkey").alias("o_custkey"), "c_name"))
    df = bloom_prefiltered_join(orders, dim, "o_custkey")
    plan = plans.formatted_plan(df)
    assert "xxhash64" in plan  # the probe expression is in the plan
    assert plans.has_broadcast_join(df) or \
        plans.sort_merge_join_count(df) <= 1


def test_r5_new_ops_exchange_budgets(t):
    """Shuffle budgets for the round-5 additions: the fingerprint and
    keep-list dedup are one-exchange aggregates, the group split is
    map-only, the pack report pays the packer's window plus its
    rollups and nothing more."""
    from hive_exporter_spark.operators import llm as _llm
    from hive_exporter_spark.operators import pipeline as _pl

    docs = t("documents")
    fp = _pl.dataset_fingerprint(docs, ["doc_id", "text"])
    # one agg exchange + the orderBy sort over the groups-sized result
    assert plans.num_exchanges(fp) <= 2, plans.formatted_plan(fp)
    assert plans.has_partial_aggregate(fp)
    gfp = _pl.dataset_fingerprint(docs, ["doc_id", "text"], group_col=None)
    assert plans.num_exchanges(gfp) <= 1, plans.formatted_plan(gfp)
    ids = _llm.dedup_exact_ids(docs)
    assert plans.num_exchanges(ids) == 1, plans.formatted_plan(ids)
    gs = _pl.group_split(docs)
    assert plans.num_exchanges(gs) == 0, plans.formatted_plan(gs)
    rep = _pl.pack_efficiency_report(docs)
    assert plans.num_exchanges(rep) <= 3, plans.formatted_plan(rep)


def test_ams_join_size_fused_wrapper_single_scan(t, spark, sf_dir):
    """When both join sides slice the same table, the registry wrapper
    must feed both sketches from ONE grouped count — exactly one
    events scan in the plan (the generic two-DataFrame form pays
    two)."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["ams_join_size_click_purchase"](spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert plan.count("events.parquet") <= 1, plan


def test_new_reports_single_corpus_scan(t):
    """The r5 evaluation reports must each read the documents corpus
    exactly once: labels/totals are carried through one projection or
    one grouped count (lazily checkpointed), never re-joined against a
    second scan."""
    from hive_exporter_spark.operators import pipeline as _pl2

    docs = t("documents")
    for df in (
        llm.language_id_eval(docs),
        llm.tokenizer_fertility(docs),
        llm.vocab_coverage(docs, vocab_size=5),
        _pl2.sample_accuracy_report(docs),
    ):
        plan = plans.formatted_plan(df)
        assert plan.count("documents.parquet") <= 1, plan


def test_audit_plan_flags_antipatterns(t, spark, tmp_path):
    """audit_plan must flag the classic 100 TB killers on deliberately
    bad plans and stay quiet on a production-shaped one."""
    from pyspark.sql import Window

    docs = t("documents")

    # global window → single-partition exchange (error)
    bad_win = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id")))
    rules = {f["rule"] for f in plans.audit_plan(bad_win)}
    assert "single_partition_exchange" in rules

    # self-referencing aggregate subtree → repeated scan (error)
    path = str(tmp_path / "docs_audit")
    docs.limit(50).write.parquet(path)
    p = spark.read.parquet(path)
    rescan = p.crossJoin(p.groupBy().agg(F.count("*").alias("n")))
    by_rule = {f["rule"]: f for f in plans.audit_plan(rescan)}
    assert by_rule["repeated_scan"]["severity"] == "error"
    assert "cross_broadcast_join" in by_rule

    # a dismissal downgrades but stays VISIBLE in the findings
    dismissed = plans.audit_plan(
        rescan, dismiss={"repeated_scan": "scalar broadcast twin"})
    sev = {f["rule"]: f["severity"] for f in dismissed}
    assert sev["repeated_scan"] == "dismissed"
    assert any("scalar broadcast twin" in f["detail"] for f in dismissed)

    # row-at-a-time Python UDF (error)
    from pyspark.sql.functions import udf
    bad_udf = docs.select(udf(lambda s: s and s.upper())("text"))
    rules = {f["rule"] for f in plans.audit_plan(bad_udf)}
    assert "python_row_udf" in rules

    # a production-shaped query must produce NO error-severity findings
    from hive_exporter_spark.operators import relational
    clean = relational.pricing_summary(t("lineitem"))
    errors = [f for f in plans.audit_plan(clean) if f["severity"] == "error"]
    assert errors == [], errors


def test_audit_plan_catches_prefix_embedding_drift_shape(t, spark):
    """Regression for VERDICT r7 item 2: the pre-fix `embedding_drift`
    plan — two filtered centroid subtrees over ONE parquet source,
    joined on (label, dim) — must be flagged as an error-severity
    repeated_scan, and the shipped single-scan rewrite must scan the
    embeddings table exactly once."""
    from hive_exporter_spark.functions.aggs import davg
    from hive_exporter_spark.operators import llm

    emb = t("embeddings")

    def centroid(df, name):
        return (df.select("label",
                          F.posexplode("embedding").alias("dim", "val"))
                .groupBy("label", "dim")
                .agg(davg(F.col("val").cast("double")).alias(name)))

    a = centroid(emb.where(F.col("vec_id") % 2 == 0), "mean_a")
    b = centroid(emb.where(F.col("vec_id") % 2 == 1), "mean_b")
    old_shape = a.join(b, ["label", "dim"]).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_dims"))
    errs = [f for f in plans.audit_plan(old_shape)
            if f["severity"] == "error"]
    assert any(f["rule"] == "repeated_scan" for f in errs), errs

    fixed = llm.embedding_drift(emb)
    assert len(plans.scan_locations(fixed)) == 1
    assert [f for f in plans.audit_plan(fixed)
            if f["severity"] == "error"] == []


def test_hybrid_rrf_topk_plan_shape(spark, sf_dir):
    """Both component rankings keep their scale shapes: the vector
    side rides a broadcast join (corpus never shuffles on it), no
    cartesian anywhere, and the fusion itself adds only
    dimension-sized joins over two (queries x k) frames."""
    from hive_exporter_spark.operators import llm

    df = llm.hybrid_rrf_topk(read_table(spark, sf_dir, "documents"),
                             read_table(spark, sf_dir, "embeddings"))
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert plans.has_broadcast_join(df), plan
    assert [f for f in plans.audit_plan(df)
            if f["severity"] == "error"
            and f["rule"] != "repeated_scan"] == []


def test_top_boilerplate_segments_plan_shape(spark, sf_dir):
    """One corpus scan (n_docs derives from the checkpointed chunk
    stream), a partial-aggregated digest groupBy, and a
    TakeOrderedAndProject top-k — never a global sort of the segment
    table."""
    from hive_exporter_spark.operators import llm

    df = llm.top_boilerplate_segments(
        read_table(spark, sf_dir, "documents"))
    plan = plans.formatted_plan(df)
    assert len(plans.scan_locations(df)) <= 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert plans.has_partial_aggregate(df), plan
    assert [f for f in plans.audit_plan(df)
            if f["severity"] == "error"] == []


def test_zipf_fit_report_plan_shape(spark, sf_dir):
    """Token counts partial-aggregate map-side; the top-V cut is a
    TakeOrderedAndProject; the rank window runs on the <=top_v-row
    frame only (no corpus-sized single-partition exchange)."""
    from hive_exporter_spark.operators import llm

    df = llm.zipf_fit_report(read_table(spark, sf_dir, "documents"))
    plan = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert plans.has_partial_aggregate(df), plan
    assert [f for f in plans.audit_plan(df)
            if f["severity"] == "error"] == []
