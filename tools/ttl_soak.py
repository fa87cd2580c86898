#!/usr/bin/env python
"""TTL-loop absorb soak at depth (r12, VERDICT r11 #5).

`tools/commit_soak.py` gates the COMMIT path under plain appends; the ttl
dedup loop additionally (a) GROWS the rep-pair table via refresh
re-appends on every keep-alive touch, and (b) compacts all three state
tables with the expiry filter. This harness drives 100+ batches through
the REAL `_sndi_make_processor(ttl=N)` on one table set — each batch a
fixed-size mix of hot content (same text every batch: refresh-on-touch
fires each time), a rolling near-dup family (cross-batch windowed pairs)
and unique filler — and gates the bounded-window claims at depth, beyond
test_snd_ttl.py's toy scale:

  * per-batch WALL per decade — flat once the window saturates (an
    O(live-window) batch; growth means some read or append scales with
    stream length);
  * LIVE-WINDOW state size (members / band index / rep pairs, physical
    row counts including not-yet-compacted expired rows) probed every 10
    batches — bounded by live mass + one compaction period, not by
    stream length.

Gates (exit 1 on failure):
  * flatness: last-decade median wall <= FLAT_GATE x decade-3 median
    (decades 1-2 excluded: JVM warmup + window fill);
  * state: max probe over the last 3 probes <= STATE_GATE x the probe at
    batch 30 (post-saturation baseline), per table.

Usage: python tools/ttl_soak.py [--batches 100] [--rows 300] [--ttl 3]
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
STATE_GATE = 3.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=100)
    ap.add_argument("--rows", type=int, default=300)
    ap.add_argument("--ttl", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cassabon_spark.queries.extensions import _sndi_make_processor
    from cassabon_spark.session import get_spark, prep
    from cassabon_spark.sources.snapshot import SnapshotTable

    spark = get_spark()
    prep(spark)
    root = tempfile.mkdtemp(prefix="cassabon_ttl_soak_")
    tbls = {
        n: SnapshotTable(spark, os.path.join(root, n))
        for n in ("pairs", "idx", "mem", "rp")
    }
    width = spark.sparkContext.defaultParallelism
    proc = _sndi_make_processor(
        spark, tbls["pairs"], tbls["idx"], tbls["mem"], tbls["rp"],
        16, 16, width, app="ttl_soak", ttl=args.ttl,
    )

    hot = " ".join(f"hot{i}" for i in range(20))  # same content every batch
    fam = " ".join(f"fam{i}" for i in range(19))  # near-dup family base

    def batch_df(b: int):
        base = spark.range(args.rows).select(
            (F.col("id") + b * args.rows).alias("doc_id"), F.col("id").alias("i")
        )
        # 10% hot (refresh-on-touch every batch), one near-dup family doc
        # per batch (windowed cross-batch pairs), rest unique filler
        text = (
            F.when(F.col("i") < args.rows // 10, F.lit(hot))
            .when(F.col("i") == args.rows // 10, F.concat_ws(" ", F.lit(fam), F.lit(f"gen{b % 7}")))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit("a")),
                    F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit("b")),
                    F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit("c")),
                    F.lit("filler common tail"),
                )
            )
        )
        return base.select("doc_id", F.lit("en").alias("lang"), text.alias("text"))

    walls: list[float] = []
    probes: dict[int, dict] = {}
    for b in range(args.batches):
        df = batch_df(b)
        t0 = time.time()
        proc(df, b)
        walls.append(time.time() - t0)
        if (b + 1) % 10 == 0:
            probes[b + 1] = {
                n: (tbls[n].read().count() if tbls[n].version() is not None else 0)
                for n in ("mem", "idx", "rp")
            }

    decades = [walls[i : i + 10] for i in range(0, len(walls) - len(walls) % 10, 10)]
    meds = [statistics.median(d) for d in decades]
    print(f"# ttl soak — {args.batches} batches x {args.rows} docs, "
          f"ttl={args.ttl}, 10% hot + 1 near-dup family + unique filler\n")
    print("| decade | median per-batch wall (s) |")
    print("|---|---|")
    for i, m in enumerate(meds):
        print(f"| {i * 10 + 1}-{i * 10 + 10} | {m:.3f} |")
    print("\n| depth | members rows | band-index rows | rep-pair rows |")
    print("|---|---|---|---|")
    for d in sorted(probes):
        p = probes[d]
        print(f"| {d} | {p['mem']} | {p['idx']} | {p['rp']} |")

    fails = []
    flat = meds[-1] / max(meds[2], 1e-9)
    if flat > FLAT_GATE:
        fails.append(
            f"per-batch wall drift: last-decade median {meds[-1]:.3f}s = "
            f"{flat:.2f}x decade-3 {meds[2]:.3f}s (gate {FLAT_GATE}x)"
        )
    base_d = 30
    last3 = sorted(probes)[-3:]
    for n in ("mem", "idx", "rp"):
        base = max(probes[base_d][n], 1)
        worst = max(probes[d][n] for d in last3)
        if worst > STATE_GATE * base:
            fails.append(
                f"{n} state growth: {worst} rows late vs {base} at depth "
                f"{base_d} (gate {STATE_GATE}x)"
            )
    print(f"\n**Gate failures: {len(fails)}**")
    for f in fails:
        print(f"- {f}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
