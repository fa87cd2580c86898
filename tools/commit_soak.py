#!/usr/bin/env python
"""Absorb-commit soak at depth (r11, VERDICT r10 #6).

`tools/snd_perbatch.py` gates per-batch probe/absorb cost at three index
SCALES but only one batch deep; this harness gates the other axis — what
happens to the COMMIT path as the action log deepens past the 16-commit
checkpoint cadence. It drives one snapshot table the way the incremental
dedup loop drives its members table: N txn-keyed microbatch appends of a
fixed-size delta (partitioned, with the loop's auto-compaction running
every batch), and measures

  * per-append WALL per decade of the soak — an O(delta) commit stays
    flat; an O(table) or O(log) commit drifts up with depth;
  * COLD head-reconstruction time at increasing depths, via a FRESH
    SnapshotTable instance (no in-memory memo): with the checkpoint
    cadence this replays at most 15 small manifests over the latest
    checkpoint, so it must stay bounded, not grow with commit count;
  * manifest-directory file count (vacuum + checkpointing keep it
    bounded under unbounded appends).

Gates (exit 1 on failure):
  * flatness: median append wall of the LAST decade <= FLAT_GATE x the
    median of the SECOND decade (first decade excluded as JVM warmup);
  * head load: cold reconstruction at the final depth <= HEAD_GATE x the
    reconstruction at depth ~25, and absolutely < HEAD_ABS_S.

Usage: python tools/commit_soak.py [--batches 100] [--rows 200]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAT_GATE = 2.0
HEAD_GATE = 3.0
HEAD_ABS_S = 1.0


def cold_head_load(spark, root: str) -> float:
    """Seconds to reconstruct the head file list from disk with no
    in-memory memo (a fresh reader process arriving at the table)."""
    from cassabon_spark.sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, root)
    t0 = time.time()
    v = t.version()
    t._files_at(v)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=100)
    ap.add_argument("--rows", type=int, default=200)
    ap.add_argument("--parts", type=int, default=8)
    args = ap.parse_args()

    from cassabon_spark.session import get_spark
    from cassabon_spark.sources.snapshot import SnapshotTable

    from pyspark.sql import functions as F

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="cassabon_commit_soak_")
    tbl = SnapshotTable(spark, root)

    walls: list[float] = []
    head_probes: dict[int, float] = {}
    probe_at = sorted({25, args.batches // 2, args.batches})
    for b in range(args.batches):
        # fixed-size delta, same shape as the incremental loop's member
        # absorb: partitioned append + txn key + threshold auto-compaction
        delta = (
            spark.range(args.rows)
            .select(
                (F.col("id") + b * args.rows).alias("doc_id"),
                F.pmod(F.col("id"), F.lit(args.parts)).cast("int").alias("pk"),
                F.lit(b).alias("bid"),
            )
            .repartition(args.parts, "pk")
        )
        t0 = time.time()
        tbl.append(delta, partition_cols=("pk",), txn=("soak", b))
        tbl.auto_compact(lambda d: d.coalesce(1), partition_cols=("pk",))
        walls.append(time.time() - t0)
        if (b + 1) in probe_at:
            head_probes[b + 1] = cold_head_load(spark, root)

    decades = [
        walls[i : i + 10] for i in range(0, len(walls) - len(walls) % 10, 10)
    ]
    meds = [statistics.median(d) for d in decades]
    mdir = os.path.join(root, "_manifests")
    n_manifests = (
        len([p for p in os.listdir(mdir) if p.endswith(".json")])
        if os.path.isdir(mdir)
        else -1
    )

    print(f"# commit soak — {args.batches} txn appends x {args.rows} rows, "
          f"{args.parts} partitions, auto-compact every batch\n")
    print("| decade | median append+compact wall (s) |")
    print("|---|---|")
    for i, m in enumerate(meds):
        print(f"| {i * 10 + 1}-{i * 10 + 10} | {m:.3f} |")
    print("\n| depth (commits) | cold head reconstruction (s) |")
    print("|---|---|")
    for d in probe_at:
        print(f"| {d} | {head_probes[d]:.3f} |")
    print(f"\nmanifest files retained: {n_manifests}")

    fails = []
    flat = meds[-1] / max(meds[1], 1e-9)
    if flat > FLAT_GATE:
        fails.append(
            f"append wall drift: last-decade median {meds[-1]:.3f}s = "
            f"{flat:.2f}x second-decade {meds[1]:.3f}s (gate {FLAT_GATE}x)"
        )
    h_late, h_early = head_probes[probe_at[-1]], head_probes[probe_at[0]]
    if h_late > HEAD_GATE * max(h_early, 1e-3):
        fails.append(
            f"head-load growth: {h_late:.3f}s at depth {probe_at[-1]} vs "
            f"{h_early:.3f}s at {probe_at[0]} (gate {HEAD_GATE}x)"
        )
    if h_late > HEAD_ABS_S:
        fails.append(f"head load {h_late:.3f}s exceeds absolute {HEAD_ABS_S}s")
    print(f"\n**Gate failures: {len(fails)}**")
    for f in fails:
        print(f"- {f}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
