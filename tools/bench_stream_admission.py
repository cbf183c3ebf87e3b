#!/usr/bin/env python3
"""Measure the streaming near-dup admission path against GROWING
standing state — the bench the r9 verdict asked for (item 6): the
per-round bench times the batch face once, so the flat layout's
corpus-sized per-batch state scan (What's wrong #1) never showed up.

Replays K micro-batches of M synthetic docs each through
`near_dedup_state_step` (the exact foreachBatch body the stream
runs) under BOTH state layouts, recording per-batch wall clock and
the state bytes eligible for that batch's scans. The flat layout
reads the whole state every batch (eligible == total, growing
linearly — per-stream-lifetime cost quadratic); the partitioned
layout reads only the partitions whose keys pass the standing
band-key/digest blooms — proportional to the batch's true near-dup
candidacy, not to corpus size.

The corpus is synthesized deterministically (md5-token docs, no RNG):
a `--dup-share` fraction of every batch are near-duplicates of a
small template pool (template tokens + one per-doc salt token, so
they collide in LSH bands and exercise the vs-corpus screen), the
rest are globally fresh. This controls the collision regime directly:
dup-share 0 is the pure-fresh crawl (partitioned's best case),
higher shares pay for genuine witness lookups in both layouts.

Usage:
  python tools/bench_stream_admission.py [--docs N] [--batches K]
      [--dup-share S] [--tokens T] [--out results.json]

Emits one JSON object with per-batch rows and a flat-vs-partitioned
summary; exits nonzero if the two layouts' admitted sets differ
(correctness guard: a fast wrong layout is not a result).
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TEMPLATES = 8


def synth_batch(spark, lo: int, hi: int, dup_share: float, tokens: int):
    """Deterministic synthetic docs [lo, hi): `dup_share` of them are
    near-duplicates of one of N_TEMPLATES template texts (template
    tokens + one per-doc salt token — high Jaccard, distinct digests),
    the rest globally-fresh md5-token prose."""
    from pyspark.sql import functions as F

    df = spark.range(lo, hi).select(F.col("id").alias("doc_id"))
    fresh = F.concat_ws(" ", F.array(*[
        F.substring(F.md5(F.concat_ws(":", F.col("doc_id"), F.lit(j))),
                    1, 8)
        for j in range(tokens)]))
    tpl = F.concat_ws(" ", F.array(*[
        F.substring(F.md5(F.concat_ws(
            ":", F.lit("tpl"), F.pmod("doc_id", F.lit(N_TEMPLATES)),
            F.lit(j))), 1, 8)
        for j in range(tokens)]))
    near_dup = F.concat_ws(
        " ", tpl, F.substring(F.md5(F.concat_ws(
            ":", F.lit("salt"), F.col("doc_id"))), 1, 8))
    is_dup = F.pmod("doc_id", F.lit(1000)) < int(dup_share * 1000)
    return df.select(
        "doc_id", F.when(is_dup, near_dup).otherwise(fresh).alias("text")
    ).localCheckpoint()


SEED_ID_BASE = 10 ** 9   # seed ids never collide with measured ids


def run_layout(spark, batches, layout: str, workdir: str,
               bloom_bits: int, compact_every: int = 0,
               seed_docs: int = 0, seed_chunk: int = 500_000,
               dup_share: float = 0.05, tokens: int = 30):
    from hive_exporter_spark.streaming.state import init_state_root
    from hive_exporter_spark.streaming.streams import (
        compact_near_dedup_generation, near_dedup_state_step)

    root = os.path.join(workdir, layout)
    init_state_root(root)
    bloom_state: dict = {"dense": None, "bands_dense": None}
    rows = []
    admitted_ids = set()
    if seed_docs:
        # Pre-build an N-doc standing corpus THROUGH the same step
        # (chunked to bound driver memory), then compact it — the
        # realistic steady state a long-lived stream reaches. This is
        # what lets the bench measure per-batch cost at corpus size N
        # without paying N/batch-size warm-up batches per layout.
        t0 = time.time()
        lo = SEED_ID_BASE
        while lo < SEED_ID_BASE + seed_docs:
            hi = min(lo + seed_chunk, SEED_ID_BASE + seed_docs)
            chunk = synth_batch(spark, lo, hi, dup_share, tokens)
            # promote_at_docs=None: this bench MEASURES the flat
            # layout at corpus sizes past the auto-promotion
            # threshold — the explicit override documented on the
            # state step keeps the comparison arm honest.
            near_dedup_state_step(chunk, root, None, layout=layout,
                                  bloom_state=bloom_state,
                                  bloom_bits=bloom_bits,
                                  promote_at_docs=None)
            chunk.unpersist()
            lo = hi
            # 20 rapid chunks outrun the ContextCleaner: drop Python
            # refs and nudge both GCs so checkpoint blocks/broadcasts
            # actually free (measured driver OOM without this).
            import gc
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        name, n_dig, n_band = compact_near_dedup_generation(spark, root)
        print(json.dumps({"layout": layout, "seeded": seed_docs,
                          "generation": name, "n_digests": n_dig,
                          "n_band_rows": n_band,
                          "wall_sec": round(time.time() - t0, 3)}),
              file=sys.stderr)
    for i, b in enumerate(batches):
        t0 = time.time()
        admitted, stats = near_dedup_state_step(
            b, root, None, layout=layout, bloom_state=bloom_state,
            bloom_bits=bloom_bits, collect_stats=True,
            promote_at_docs=None)
        ids = [r["doc_id"] for r in admitted.select("doc_id").collect()]
        wall = time.time() - t0
        admitted_ids.update(ids)
        rows.append({
            "layout": layout, "batch": i, "wall_sec": round(wall, 3),
            "n_in": b.count(), "n_admitted": len(ids),
            "state_bytes_eligible": stats["state_bytes_eligible"],
            "state_bytes_total": stats["state_bytes_total"],
            "n_parts_touched": stats["n_parts_touched"],
            "state_rows_materialized":
                stats["state_rows_materialized"],
            "sig_rows_materialized":
                stats.get("sig_rows_materialized"),
            "digest_bloom_fill": stats.get("digest_bloom_fill"),
            "band_bloom_fill": stats.get("band_bloom_fill"),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)
        if (compact_every and layout == "partitioned"
                and (i + 1) % compact_every == 0
                and i + 1 < len(batches)):
            tc = time.time()
            name, n_dig, n_band = compact_near_dedup_generation(
                spark, root)
            print(json.dumps({"layout": layout, "compact_after": i,
                              "generation": name, "n_digests": n_dig,
                              "n_band_rows": n_band,
                              "wall_sec": round(time.time() - tc, 3)}),
                  file=sys.stderr)
    return rows, admitted_ids


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--dup-share", type=float, default=0.05)
    ap.add_argument("--tokens", type=int, default=30)
    ap.add_argument("--compact-every", type=int, default=0,
                    help="partitioned only: run the generation "
                    "compact every N batches (0 = never)")
    ap.add_argument("--seed-docs", type=int, default=0,
                    help="pre-build (and compact) an N-doc standing "
                    "corpus through the step before the measured "
                    "batches — per-batch cost at corpus size N "
                    "without N/batch warm-up batches")
    ap.add_argument("--seed-chunk", type=int, default=250_000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from hive_exporter_spark.session import build_session

    # Local mode shares one JVM: the default 1g driver heap holds the
    # checkpointed batches AND every broadcast — size it for the
    # corpus this bench builds (must be set before the JVM starts).
    spark = build_session("bench-stream-admission", extra_conf={
        "spark.driver.memory": "32g",
        "spark.cleaner.periodicGC.interval": "1min"})
    # Size the blooms for the corpus this bench builds (~12 bits/doc;
    # the band-key filter is automatically bands x larger inside the
    # step). An undersized filter saturates and every partition reads
    # as touched — measured here before this line existed.
    bloom_bits = 1 << max(
        20, ((args.docs + args.seed_docs) * 12).bit_length())
    per = args.docs // args.batches
    batches = [synth_batch(spark, i * per, (i + 1) * per,
                           args.dup_share, args.tokens)
               for i in range(args.batches)]
    workdir = tempfile.mkdtemp(prefix="stream_admission_bench_")
    try:
        flat_rows, flat_ids = run_layout(
            spark, batches, "flat", workdir, bloom_bits,
            seed_docs=args.seed_docs, seed_chunk=args.seed_chunk,
            dup_share=args.dup_share, tokens=args.tokens)
        part_rows, part_ids = run_layout(
            spark, batches, "partitioned", workdir, bloom_bits,
            compact_every=args.compact_every,
            seed_docs=args.seed_docs, seed_chunk=args.seed_chunk,
            dup_share=args.dup_share, tokens=args.tokens)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    if flat_ids != part_ids:
        print("FAIL: layouts admitted different sets "
              f"(flat-only={sorted(flat_ids - part_ids)[:5]}, "
              f"part-only={sorted(part_ids - flat_ids)[:5]})",
              file=sys.stderr)
        return 1

    def growth(rows):
        # last-third vs first-third mean wall: the per-batch cost curve
        k = max(1, len(rows) // 3)
        head = sum(r["wall_sec"] for r in rows[:k]) / k
        tail = sum(r["wall_sec"] for r in rows[-k:]) / k
        return round(head, 3), round(tail, 3), round(tail / head, 2)

    fh, ft, fg = growth(flat_rows)
    ph, pt, pg = growth(part_rows)
    last_f, last_p = flat_rows[-1], part_rows[-1]
    result = {
        "metric": "stream_admission_per_batch",
        "docs": args.docs, "batches": args.batches,
        "seed_docs": args.seed_docs,
        "dup_share": args.dup_share, "bloom_bits": bloom_bits,
        "compact_every": args.compact_every,
        "rows": flat_rows + part_rows,
        "summary": {
            "flat": {"head_wall": fh, "tail_wall": ft, "growth": fg,
                     "final_bytes_eligible":
                         last_f["state_bytes_eligible"],
                     "final_rows_materialized":
                         last_f["state_rows_materialized"]},
            "partitioned": {"head_wall": ph, "tail_wall": pt,
                            "growth": pg,
                            "final_bytes_eligible":
                                last_p["state_bytes_eligible"],
                            "final_bytes_total":
                                last_p["state_bytes_total"],
                            "final_rows_materialized":
                                last_p["state_rows_materialized"]},
            # the scan PRODUCT each layout hands the admission joins on
            # the last batch: flat grows linearly with the corpus, the
            # partitioned pushdowns keep it at true collisions + fpp
            "rows_materialized_ratio_final": round(
                last_f["state_rows_materialized"]
                / max(1, last_p["state_rows_materialized"]), 1),
        },
        "admitted_sets_match": True,
    }
    payload = json.dumps(result)
    print(payload)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
