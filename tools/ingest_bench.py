#!/usr/bin/env python
"""Ingest-path throughput: carbon wire lines/second through the full write
path (parse/validate -> route -> all rollup tiers -> partitioned parquet
store + incremental path index).

The reference's only published ingest figures are its stress-generator
shapes — 30 lines/s default, >=2000/s high-rate mode (devtools/
stresstest.go:21,31-55) — against which the batch engine's bulk rate is the
comparable capacity number.

Prints ONE JSON line: {"metric": "ingest_lines_per_sec", "value": N,
"lines": M, "wall_s": S}.

Usage: python tools/ingest_bench.py [--lines 2000000] [--paths 500]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cassabon_spark import get_spark  # noqa: E402
from cassabon_spark.config import RollupConfig  # noqa: E402
from cassabon_spark.engine import Engine  # noqa: E402
from cassabon_spark.session import prep  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=2_000_000)
    ap.add_argument("--paths", type=int, default=500)
    args = ap.parse_args()

    spark = get_spark(app_name="ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")
    prep(spark)

    cfg = RollupConfig.from_dict(
        {"default": {"method": "average", "windows": ["10s:1h", "60s:1d"]}}
    )

    # synthesize the stress-generator's shape at bulk scale: `paths` distinct
    # metric paths, triangle-wave values, 1 line/second per path
    lines = spark.range(args.lines).select(
        F.format_string(
            "svc.host%d.metric%d %d %d",
            (F.col("id") % args.paths) % 50,
            F.floor((F.col("id") % args.paths) / 50).cast("long"),
            (F.col("id") % 100) + 1,  # triangle-ish 1..100
            F.lit(1_700_000_000) + (F.col("id") / args.paths).cast("long"),
        ).alias("line")
    )
    lines.count()  # materialize the generator before timing the engine

    d = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        eng = Engine(spark, cfg, os.path.join(d, "store"), os.path.join(d, "idx"))
        t0 = time.time()
        counters = eng.ingest_lines(lines)
        wall = time.time() - t0

        # point read on the freshly-built store: one path, 10-minute range.
        # This is the GET /metrics shape — tier pruning + path/time pushdown
        # mean its cost tracks the pruned slice, not the store size. One
        # warm-up run (parquet footers + codegen), then min-of-2 timed.
        def _read():
            return eng.get_metrics(
                ["svc.host0.metric0"], 1_700_000_000, 1_700_000_600,
                now_s=1_700_000_000 + args.lines // args.paths,
            )

        _read()
        read_ms = None
        for _ in range(2):
            t0 = time.time()
            resp = _read()
            dt = (time.time() - t0) * 1000
            read_ms = dt if read_ms is None else min(read_ms, dt)
        n_slots = len(resp["series"]["svc.host0.metric0"])

        print(
            json.dumps(
                {
                    "metric": "ingest_lines_per_sec",
                    "value": round(counters["received"] / wall),
                    "lines": counters["received"],
                    "rejected": counters["rejected"],
                    "wall_s": round(wall, 2),
                    "point_read_ms": round(read_ms),
                    "point_read_slots": n_slots,
                }
            )
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
