"""Shuffle/spill byte accounting from the Spark status store.

Wall-clock is box-dependent (the same plan times 1.6× slower on a busy
machine), but bytes exchanged through shuffles are a property of the
PLAN — the number that actually predicts 100 TB behavior. This module
snapshots the driver's AppStatusStore stage metrics so the bench and
tests can report per-query shuffle read/write and spilled bytes next
to seconds, and pin plan-shape contracts like "the capped dedup screen
exchanges strictly fewer bytes than its uncapped twin on a hot
cluster".

Two operational caveats, both handled here:

- The store retains only ``spark.ui.retainedStages`` stages (default
  1000); a long bench run evicts early stages and the cumulative sum
  DROPS, corrupting deltas. Sessions that measure bytes should pass
  ``SHUFFLE_METRIC_CONF`` (bumps retention) to ``build_session``.
- Stage events reach the store through the async listener bus;
  snapshots first drain the bus so a just-finished action's metrics
  are actually visible.
"""

from __future__ import annotations

SHUFFLE_METRIC_CONF = {
    # One bench sweep is ~98 queries x O(10) stages; 100k headroom
    # means cumulative totals never go backwards mid-run.
    "spark.ui.retainedStages": "100000",
}

_SNAPSHOT_KEYS = ("shuffle_read_bytes", "shuffle_write_bytes",
                  "spilled_bytes")


def _drain_listener_bus(spark, timeout_ms: int = 30_000) -> None:
    """Block until queued stage-completion events are applied to the
    status store (best-effort: some Spark builds hide the test-only
    waitUntilEmpty; a snapshot then just reads what has landed)."""
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(timeout_ms)
    except Exception:
        try:
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        except Exception:
            pass


def shuffle_snapshot(spark) -> dict[str, int]:
    """Cumulative shuffle read/write and spilled bytes across all
    retained stages. Callers snapshot before and after an action and
    diff with :func:`shuffle_delta`."""
    _drain_listener_bus(spark)
    store = spark.sparkContext._jsc.sc().statusStore()
    # Full Scala signature (the 1-arg Python-looking call does not
    # exist): stageList(statuses, details, withSummaries, quantiles,
    # taskStatus) — defaults fetched from their synthetic accessors.
    stages = store.stageList(
        None, False, False,
        getattr(store, "stageList$default$4")(),
        getattr(store, "stageList$default$5")(),
    )
    read = write = spilled = 0
    it = stages.iterator()
    while it.hasNext():
        sd = it.next()
        read += sd.shuffleReadBytes()
        write += sd.shuffleWriteBytes()
        spilled += sd.memoryBytesSpilled() + sd.diskBytesSpilled()
    return {"shuffle_read_bytes": read, "shuffle_write_bytes": write,
            "spilled_bytes": spilled}


def shuffle_delta(before: dict[str, int], after: dict[str, int]) -> dict[str, int]:
    """Per-key difference of two snapshots, floored at 0 (a stage
    eviction between snapshots would otherwise surface as a negative
    byte count)."""
    return {k: max(0, after[k] - before[k]) for k in _SNAPSHOT_KEYS}


def _stage_rows(spark) -> list[tuple[int, int, int, int]]:
    """(stageId, read, write, spilled) for every retained stage."""
    _drain_listener_bus(spark)
    store = spark.sparkContext._jsc.sc().statusStore()
    stages = store.stageList(
        None, False, False,
        getattr(store, "stageList$default$4")(),
        getattr(store, "stageList$default$5")(),
    )
    rows = []
    it = stages.iterator()
    while it.hasNext():
        sd = it.next()
        rows.append((sd.stageId(), sd.shuffleReadBytes(),
                     sd.shuffleWriteBytes(),
                     sd.memoryBytesSpilled() + sd.diskBytesSpilled()))
    return rows


def measure_shuffle(spark, action) -> tuple[object, dict[str, int]]:
    """Run ``action()`` and return (its result, the shuffle/spill bytes
    the action exchanged).

    Accounting is stage-ID based — only stages SUBMITTED after the
    action started count — so it stays correct even in long-lived
    sessions whose status store has begun evicting old stages (a
    cumulative-sum diff goes BACKWARDS when eviction removes an old
    stage between the two snapshots: the exact flake a full test-suite
    run hits once it accumulates 1000+ stages without
    SHUFFLE_METRIC_CONF's retention bump)."""
    hi = max((r[0] for r in _stage_rows(spark)), default=-1)
    result = action()
    after = [r for r in _stage_rows(spark) if r[0] > hi]
    return result, {
        "shuffle_read_bytes": sum(r[1] for r in after),
        "shuffle_write_bytes": sum(r[2] for r in after),
        "spilled_bytes": sum(r[3] for r in after),
    }
