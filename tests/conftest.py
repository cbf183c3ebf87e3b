from __future__ import annotations

import pytest

from hive_exporter_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # 4g heap, not the 1g local-mode default: the session-scoped JVM
    # accumulates localCheckpoint blocks across hundreds of tests
    # (freed only when the Python-side refs are GC'd and the
    # ContextCleaner runs), and a long ordering-dependent test
    # sequence could OOM the driver — observed as a flaky
    # ConnectionRefusedError in the r10 layout property test when it
    # ran after the full streaming suite in one process.
    s = build_session("tests", shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "4g"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# ---------------------------------------------------------------------------
# Slow tier (VERDICT r12 item 4): the full suite is ~35-43 min, which
# the round driver's pytest budget cannot finish — its r12 run was
# killed at ~58% with ZERO failures. Tests measured >= 2.5 s in the r13
# full-suite duration run (`pytest --durations=0`, 509 passed) or in
# the default-tier reruns carry the `slow` marker, applied here from a frozen measured list so the
# policy lives in one place. pytest.ini deselects them by default
# (`addopts = -m "not slow"`): the default `python -m pytest tests/`
# finishes in well under 10 min; run the long-haul tier with
# `python -m pytest tests/ -m slow`, or everything with
# `python -m pytest tests/ -m "slow or not slow"`.
# Failure mode is safe-by-default: a renamed test silently falls OUT
# of this list and back INTO the default (always-run) tier.
_SLOW_TESTS = {
    "test_bloom.py::test_contamination_bloom_matches_exact",  # 7s
    "test_bloom.py::test_incremental_dedup_bloom_matches_exact",  # 6s
    "test_bloom.py::test_incremental_dedup_bloom_tiny_filter_still_exact",  # 5s
    "test_bloom.py::test_no_false_negatives",  # 8s
    "test_catalog_sinks.py::test_compact_table",  # 8s
    "test_catalog_sinks.py::test_export_import_format_matrix[csv]",  # 8s
    "test_catalog_sinks.py::test_export_import_format_matrix[json]",  # 8s
    "test_catalog_sinks.py::test_export_import_format_matrix[orc]",  # 7s
    "test_catalog_sinks.py::test_export_import_roundtrip",  # 6s
    "test_catalog_sinks.py::test_export_tables_parallel",  # 6s
    "test_cli.py::test_curate_cli_end_to_end",  # 6s
    "test_cli.py::test_doctor_cli_embeddings_mode",  # 13s
    "test_cli.py::test_doctor_cli_health_summary",  # 9s
    "test_cli.py::test_doctor_embeddings_unreadable_admissions_fails",  # 7s
    "test_cli.py::test_ivf_cli_lifecycle",  # 13s
    "test_cli.py::test_ivf_status_closes_maintenance_loop",  # 58s
    "test_cli.py::test_ivf_status_compact_path_end_to_end",  # 27s
    "test_cli.py::test_leakage_state_cli",  # 16s
    "test_cli.py::test_near_state_cli_pointered_root",  # 12s
    "test_cli.py::test_near_state_cli_to_layout_migration",  # 15s
    "test_cli.py::test_quality_cli_lifecycle",  # 62s
    "test_cli.py::test_shards_cli_end_to_end",  # 8s
    "test_core_ops.py::test_merge_narrative_counts_and_values",  # 5s
    "test_core_ops.py::test_pagerank_matches_sequential_integer_replay",  # 5s
    "test_entry_contract.py::test_all_queries_run",  # 217s
    "test_entry_contract.py::test_priority_window_is_fully_hash_checkable",  # 32s
    "test_hive_metastore.py::test_partitioned_merge_narrative_under_hive_metastore",  # 54s
    "test_ingest.py::test_full_and_merge_output_partition_columns",  # 16s
    "test_ingest.py::test_full_refresh_reconciles",  # 12s
    "test_ingest.py::test_incremental_append_narrative",  # 27s
    "test_ingest.py::test_incremental_merge_narrative",  # 25s
    "test_ingest.py::test_incremental_merge_soft_delete",  # 11s
    "test_jdbc_live.py::test_incremental_merge_over_jdbc",  # 6s
    "test_jdbc_live.py::test_reference_merge_narrative_end_to_end",  # 14s
    "test_joins.py::test_blocked_fuzzy_pairs_capped_contract",  # 7s
    "test_layout.py::test_compact_partitioned_deep_tree_500_leaves",  # 66s
    "test_llm_ops.py::test_ann_recall_report_matches_set_arithmetic",  # 7s
    "test_llm_ops.py::test_embedding_capped_equals_uncapped_and_arms_hot_buckets",  # 6s
    "test_llm_ops.py::test_embedding_near_dup_lsh_recall",  # 5s
    "test_llm_ops.py::test_incremental_dedup_near_hot_bucket_linear",  # 46s
    "test_llm_ops.py::test_incremental_dedup_near_screens",  # 10s
    "test_llm_ops.py::test_incremental_dedup_near_subset_of_exact",  # 7s
    "test_llm_ops.py::test_ivf_filtered_probe_shortfall_and_widen",  # 10s
    "test_llm_ops.py::test_ivf_index_incremental_update",  # 5s
    "test_llm_ops.py::test_ivf_update_then_compact_preserves_probes",  # 12s
    "test_llm_ops.py::test_lsh_bucket_skew_report",  # 16s
    "test_llm_ops.py::test_minhash_ml_agreement_verdicts_and_flip",  # 7s
    "test_llm_ops.py::test_remove_dup_spans_accounting_matches_cdc_scores",  # 6s
    "test_llm_ops.py::test_rrf_fuse_multi_system_never_demoted",  # 6s
    "test_llm_ops.py::test_simhash_capped_equals_uncapped_and_arms_hot_buckets",  # 5s
    "test_metrics.py::test_capped_screen_exchanges_fewer_bytes[image_phash-<lambda>-<lambda>]",  # 6s
    "test_metrics.py::test_capped_screen_exchanges_fewer_bytes[simhash-<lambda>-<lambda>]",  # 5s
    "test_metrics.py::test_measure_shuffle_survives_stage_eviction",  # 9s
    "test_pipeline_ops.py::test_quality_classifier_eval_verdicts_computed_not_pinned",  # 7s
    "test_pipeline_ops.py::test_quality_classifier_train_sample_cap",  # 21s
    "test_pipeline_ops.py::test_quality_margin_calibration_monotone_and_flip",  # 7s
    "test_properties.py::test_ams_linearity_any_split",  # 25s
    "test_properties.py::test_bpe_train_replay_any_corpus",  # 25s
    "test_properties.py::test_capped_bucket_pairs_invariants",  # 21s
    "test_properties.py::test_global_rank_matches_python_sort",  # 16s
    "test_properties.py::test_merge_idempotent",  # 12s
    "test_properties.py::test_merge_key_unique_and_latest_wins",  # 9s
    "test_properties.py::test_partitioned_state_layout_decision_identical",  # 91s
    "test_properties.py::test_shard_by_tokens_is_partition",  # 13s
    "test_properties.py::test_strip_boilerplate_matches_sequential_reference",  # 6s
    "test_properties.py::test_trim_outliers_subset_and_tail_drop",  # 6s
    "test_streaming.py::test_compact_bloom_sidecar_headroom",  # 74s
    "test_streaming.py::test_compact_near_dedup_state_preserves_admissions",  # 11s
    "test_streaming.py::test_compact_token_topk_preserves_bounds",  # 31s
    "test_streaming.py::test_compaction_preserves_reads_and_replay_idempotence",  # 22s
    "test_streaming.py::test_corpus_dedup_stream_across_batches_and_restarts",  # 19s
    "test_streaming.py::test_corpus_dedup_stream_bloom_distributed_bitmap_path",  # 21s
    "test_streaming.py::test_corpus_dedup_stream_bloom_matches_exact",  # 27s
    "test_streaming.py::test_distinct_users_stream_hll_agrees_with_batch",  # 19s
    "test_streaming.py::test_f2_sketch_stream_matches_batch_sketch",  # 19s
    "test_streaming.py::test_leakage_split_state_lsm_file_counts",  # 18s
    "test_streaming.py::test_leakage_split_stream_pins_standing_assignments",  # 19s
    "test_streaming.py::test_near_dedup_auto_promote_unrooted_fails_loudly",  # 5s
    "test_streaming.py::test_near_dedup_auto_promotes_layout_mid_stream",  # 29s
    "test_streaming.py::test_near_dedup_bloom_rebuilds_on_generation_switch",  # 19s
    "test_streaming.py::test_near_dedup_flat_to_partitioned_migration",  # 38s
    "test_streaming.py::test_near_dedup_generation_compact_mid_stream",  # 33s
    "test_streaming.py::test_near_dedup_generation_race_guard",  # 10s
    "test_streaming.py::test_near_dedup_layout_auto_sniffs_existing_state",  # 16s
    "test_streaming.py::test_near_dedup_layout_guards",  # 6s
    "test_streaming.py::test_near_dedup_partitioned_crash_window_self_heals",  # 29s
    "test_streaming.py::test_near_dedup_partitioned_layout_agrees_with_flat",  # 36s
    "test_streaming.py::test_near_dedup_partitioned_scan_is_pruned",  # 27s
    "test_streaming.py::test_near_dedup_sigless_crash_window_self_heals",  # 7s
    "test_streaming.py::test_near_dedup_stream_agrees_with_batch_replay",  # 19s
    "test_streaming.py::test_near_dedup_stream_monitor_bloom_health",  # 11s
    "test_streaming.py::test_near_dedup_stream_monitor_rows",  # 6s
    "test_streaming.py::test_near_dedup_v1_state_migrates_via_compact",  # 30s
    "test_streaming.py::test_quality_gate_stream_routes_every_row",  # 11s
    "test_streaming.py::test_stream_stream_join_agrees_with_batch",  # 10s
    "test_streaming.py::test_token_topk_stream_bounds_and_exact_regime",  # 86s
    "test_streaming.py::test_webclean_ops_stream_batch_parity",  # 6s
    "test_webclean.py::test_curation_pipeline_c4_stage_composes",  # 7s
    "test_webclean.py::test_language_id_eval_shares_sum_to_one",  # 6s
    "test_webclean.py::test_strip_boilerplate_idempotent",  # 7s
    "test_webclean.py::test_tokenizer_fertility_reconciles",  # 6s
    "test_webclean.py::test_webclean_plans_are_map_only",  # 10s
    "test_cli.py::test_near_state_cli",  # 16s (default-tier rerun)
    "test_properties.py::test_newer_than_partitions_input",  # 11s (default-tier rerun)
    "test_bloom.py::test_false_positive_rate_sane",  # 8s (default-tier rerun)
    "test_pipeline_ops.py::test_training_shards_roundtrip_and_verify",  # 8s (default-tier rerun)
    "test_cli.py::test_doctor_cli_events_mode",  # 8s (default-tier rerun)
    "test_bloom.py::test_bloom_prefiltered_join_exact_and_selective",  # 7s (default-tier rerun)
    "test_pipeline_ops.py::test_temperature_mix_alpha1_keeps_all_and_alpha_flattens",  # 7s (default-tier rerun)
    "test_pipeline_ops.py::test_leakage_safe_split_survivor_aware_chain",  # 7s (default-tier rerun)
    "test_llm_ops.py::test_bm25_scores_quoted_and_duplicate_terms",  # 6s (default-tier rerun)
    "test_plans.py::test_bpe_apply_vocab_broadcast_gated_on_size",  # 6s (default-tier rerun)
    "test_pipeline_ops.py::test_leakage_safe_split_keeps_within_split_pairs",  # 6s (default-tier rerun)
    "test_pipeline_ops.py::test_leakage_safe_split_cuts_cross_split_twins",  # 5s (default-tier rerun)
    "test_llm_ops.py::test_bigstar_long_chain_converges_fast",  # 5s (default-tier rerun)
    "test_pipeline_ops.py::test_token_entropy_bounds_and_repetition",  # 5s (default-tier rerun)
    "test_bloom.py::test_incremental_dedup_bloom_distributed_probe_matches",  # 5s (default-tier rerun)
    "test_pipeline_ops.py::test_global_rank_exact_vs_single_partition_window",  # 5s (default-tier rerun)
    "test_metrics.py::test_capped_screen_exchanges_fewer_bytes[embedding-<lambda>-<lambda>]",  # 5s (default-tier rerun)
    "test_llm_ops.py::test_hybrid_rrf_three_pqf_arm_matches_component",  # 5s (default-tier rerun)
    "test_catalog_sinks.py::test_snapshot_metadata",  # 4s (full run)
    "test_cli.py::test_doctor_documents_extended_headlines",  # 3s (full run)
    "test_cli.py::test_doctor_embeddings_null_vectors_not_ragged",  # 4s (full run)
    "test_cli.py::test_export_import_metadata_cli",  # 4s (full run)
    "test_core_ops.py::test_decayed_activity_recency_beats_volume",  # 4s (full run)
    "test_core_ops.py::test_event_transition_matrix_rows_are_distributions",  # 3s (full run)
    "test_core_ops.py::test_k_anonymity_report_counts_and_verdict",  # 3s (full run)
    "test_core_ops.py::test_value_drift_psi_flips_on_shift",  # 4s (full run)
    "test_layout.py::test_compact_partitioned_parallel_matches_serial",  # 5s (full run)
    "test_layout.py::test_compact_partitioned_preserves_layout_and_rows",  # 4s (full run)
    "test_llm_ops.py::test_bigstar_agrees_with_label_propagation",  # 4s (full run)
    "test_llm_ops.py::test_bpe_apply_matches_python_replay",  # 5s (full run)
    "test_llm_ops.py::test_bpe_apply_more_merges_never_increase_pieces",  # 5s (full run)
    "test_llm_ops.py::test_bpe_apply_unseen_words_fall_back_to_chars",  # 3s (full run)
    "test_llm_ops.py::test_bpe_train_matches_python_replay",  # 3s (full run)
    "test_llm_ops.py::test_cdc_dup_spans_shift_invariant",  # 4s (full run)
    "test_llm_ops.py::test_dedup_near_cc_strategy_knobs",  # 5s (full run)
    "test_llm_ops.py::test_embedding_truncation_report_recall_and_monotonicity",  # 4s (full run)
    "test_llm_ops.py::test_ivf_filtered_probe_pushes_predicate",  # 4s (full run)
    "test_llm_ops.py::test_ivf_rebuild_due_flips_on_drift",  # 5s (full run)
    "test_llm_ops.py::test_ivf_update_carries_meta_columns",  # 3s (full run)
    "test_llm_ops.py::test_keep_best_keeps_highest_quality_member",  # 4s (full run)
    "test_llm_ops.py::test_remove_dup_spans_first_occurrence_wins",  # 4s (default-tier rerun)
    "test_llm_ops.py::test_segment_dedup_idempotent_and_lossless_on_unique",  # 4s (default-tier rerun)
    "test_llm_ops.py::test_simhash_near_dups_close",  # 3s (full run)
    "test_llm_ops.py::test_source_overlap_matrix_finds_copying_feed",  # 4s (full run)
    "test_metrics.py::test_capped_screen_exchanges_fewer_bytes[minhash-<lambda>-<lambda>]",  # 5s (full run)
    "test_mlmodel.py::test_classifier_learns_heuristic_labels",  # 4s (default-tier rerun)
    "test_pipeline_ops.py::test_contributor_cap_exact_k_and_stable",  # 4s (default-tier rerun)
    "test_pipeline_ops.py::test_detector_agreement_matches_set_arithmetic",  # 4s (default-tier rerun)
    "test_pipeline_ops.py::test_dsir_weights_target_docs_score_higher",  # 4s (default-tier rerun)
    "test_pipeline_ops.py::test_quality_classifier_trained_weights_route_through_scorer",  # 3s (full run)
    "test_pipeline_ops.py::test_shard_by_tokens_balance_and_determinism",  # 4s (default-tier rerun)
    "test_streaming.py::test_dedup_stream_removes_replayed_rows",  # 5s (full run)
    "test_streaming.py::test_quality_gate_stream_agrees_with_batch_split",  # 3s (full run)
    "test_streaming.py::test_running_user_totals_stateful_agrees_with_batch",  # 4s (default-tier rerun)
    "test_streaming.py::test_session_window_stream_agrees_with_batch_sessionize",  # 4s (default-tier rerun)
    "test_streaming.py::test_value_drift_psi_stream_agrees_with_batch",  # 3s (full run)
    "test_streaming.py::test_windowed_counts_match_batch",  # 5s (default-tier rerun)
    "test_webclean.py::test_c4_report_counts_match_signals",  # 4s (full run)
    "test_bloom.py::test_probe_join_agrees_with_literal_path",  # 3.0s (full run)
    "test_cli.py::test_compact_cli_end_to_end",  # 3.0s (full run)
    "test_cli.py::test_doctor_embeddings_missing_index_dir_fails",  # 2.9s (full run)
    "test_core_ops.py::test_approx_stats_error_report_all_null_group_visible",  # 2.7s (full run)
    "test_core_ops.py::test_validate_events_contract_flags_injected_violations",  # 2.8s (full run)
    "test_jdbc_live.py::test_incremental_append_over_jdbc",  # 2.9s (full run)
    "test_llm_ops.py::test_bpe_fertility_report_verdict_booleans_flip",  # 2.8s (full run)
    "test_llm_ops.py::test_cdc_dup_spans_edge_docs",  # 2.8s (full run)
    "test_llm_ops.py::test_containment_capped_equals_exact_on_fixture",  # 2.8s (full run)
    "test_llm_ops.py::test_dedup_recall_report_matches_set_arithmetic",  # 3.0s (full run)
    "test_llm_ops.py::test_ivf_rebuild_due_cumulative_catches_slow_drift",  # 2.5s (full run)
    "test_llm_ops.py::test_minhash_capped_hot_bucket_linear_and_connected",  # 2.7s (full run)
    "test_llm_ops.py::test_pca_variance_report_accounting_and_flip",  # 2.5s (full run)
    "test_llm_ops.py::test_topk_ivf_pq_recall",  # 2.6s (full run)
    "test_llm_ops.py::test_topk_ivf_recall",  # 2.7s (full run)
    "test_multimodal.py::test_image_capped_equals_uncapped_and_arms_hot_buckets",  # 2.7s (full run)
    "test_sketches.py::test_ams_sums_merge_linearly",  # 2.5s (full run)
    "test_sketches.py::test_sketches_ignore_null_keys_and_values",  # 2.8s (full run)
    "test_streaming.py::test_leakage_split_single_batch_matches_batch_face",  # 2.9s (full run)
    "test_webclean.py::test_strip_boilerplate_removes_repeats_keeps_order",  # 3.0s (full run)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{item.fspath.basename}::{item.name}"
        if key in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
