#!/usr/bin/env python
"""Per-stage breakdown of one registered query (r14 optimization round).

Runs the query once (after a sf0.001 warm pass) with the UI enabled and
prints every completed stage of the run: task count, executor run time,
input / shuffle-read / shuffle-write bytes, and the first line of the
stage name so it can be mapped back to the plan.

Usage: python tools/stage_profile.py <query> [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassabon_spark.queries import load_registry  # noqa: E402


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    qd = registry[args.query]
    base = f"http://localhost:4050/api/v1/applications/{spark.sparkContext.applicationId}"

    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and os.path.abspath(warm_sf) != os.path.abspath(args.sf):
        try:
            qd.fn(spark, warm_sf).count()
        except Exception:
            pass

    for run in range(args.runs):
        spark.catalog.clearCache()
        jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
        t0 = time.time()
        qd.fn(spark, args.sf).count()
        wall = time.time() - t0
        jobs = [j for j in rest(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== run {run}: wall {wall:.2f}s, {len(jobs)} jobs, "
              f"{len(stage_ids)} stage ids ===")
        print(f"{'sid':>4} {'tasks':>5} {'run_s':>7} {'in_mb':>7} {'sr_mb':>6} "
              f"{'sw_mb':>6} {'out_rows':>9}  name")
        tot = 0.0
        for sid in stage_ids:
            try:
                atts = rest(base, f"/stages/{sid}")
            except Exception:
                continue
            for att in atts:
                if att["status"] == "SKIPPED":
                    print(f"{sid:>4} {'skip':>5}")
                    continue
                rs = att.get("executorRunTime", 0) / 1000.0
                tot += rs
                print(
                    f"{sid:>4} {att['numCompleteTasks']:>5} {rs:>7.1f} "
                    f"{att.get('inputBytes', 0)/1048576:>7.1f} "
                    f"{att.get('shuffleReadBytes', 0)/1048576:>6.1f} "
                    f"{att.get('shuffleWriteBytes', 0)/1048576:>6.1f} "
                    f"{att.get('outputRecords', 0) or att.get('shuffleWriteRecords', 0):>9} "
                    f" {att['name'].splitlines()[0][:70]}"
                )
        print(f"total executor run: {tot:.1f}s  (wall x cores = {wall*int(cpus):.0f}s)")


if __name__ == "__main__":
    main()
