"""Structured Streaming twins of the engine's batch operators.

The reference's 'streaming' is micro-batch CDC with sink-derived
watermarks (SURVEY.md §2.9) — rebuilt in operators/ingest.py. This
module provides the true Structured Streaming equivalents for
event-stream workloads: windowed aggregation with late-data
watermarks, gap sessionization via session_window, and a foreachBatch
CDC bridge that reuses the batch merge logic for exactly-once-style
incremental consolidation.
"""

from hive_exporter_spark.streaming.state import (
    init_state_root,
    resolve_state_dir,
    switch_generation,
)
from hive_exporter_spark.streaming.streams import (
    read_events_stream,
    windowed_event_counts,
    session_windows,
    run_to_memory_sink,
    incremental_append_stream,
    corpus_dedup_stream,
    near_dedup_stream,
    near_dedup_state_step,
    bloom_health,
    leakage_split_state_step,
    leakage_safe_split_stream,
    read_leakage_splits,
    compact_leakage_split_state,
    compact_leakage_split_generation,
    compact_near_dedup_state,
    compact_near_dedup_generation,
    run_generation_compact,
    jdbc_sink_stream,
    post_purchase_activity_stream,
    enrich_stream,
)

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "session_windows",
    "run_to_memory_sink",
    "incremental_append_stream",
    "corpus_dedup_stream",
    "near_dedup_stream",
    "near_dedup_state_step",
    "bloom_health",
    "leakage_split_state_step",
    "leakage_safe_split_stream",
    "read_leakage_splits",
    "compact_leakage_split_state",
    "compact_leakage_split_generation",
    "compact_near_dedup_state",
    "compact_near_dedup_generation",
    "run_generation_compact",
    "init_state_root",
    "resolve_state_dir",
    "switch_generation",
    "jdbc_sink_stream",
    "post_purchase_activity_stream",
    "enrich_stream",
]
