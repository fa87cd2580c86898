#!/usr/bin/env python
"""Per-query profile of the headline bench set (r14 optimization round).

Runs each headline query exactly like bench.py (count() action, clearCache
between runs, warm pass at sf0.001 first) but with the Spark UI enabled so
the REST API can be queried for job/stage/task metrics. For every query it
reports:

  wall        — min-of-2 wall seconds (bench methodology)
  jobs        — Spark jobs launched by the LAST timed run
  stages      — completed stages in those jobs
  tasks       — total tasks
  task_s      — sum of task durations (executor-side work)
  sched_s     — wall - (task_s / cores): a crude driver/scheduling share
  shuf_mb     — shuffle read MB across those stages

The point (guide §1): at sf0.1 the inputs are tiny, so a query whose wall
is dominated by `wall >> task_s/32` is paying for stage count / job count /
driver work, not compute — the optimization lever is then removing jobs,
stages and exchanges, not making per-row work faster.

Usage: python tools/perf_profile.py [--sf DIR] [--only name,name]
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

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "win_topk_per_group", "agg_rollup", "asof_join_last_order", "sessionize_30m",
    "carbon_rollup_tumbling_1h", "carbon_multi_tier_fanout", "carbon_read_gapfill",
    "dedup_minhash_lsh", "dedup_simhash", "similarity_topk_cosine",
    "similarity_ann_lsh", "text_quality_score", "text_bpe_token_count",
    "q6_forecast_revenue",
    "similarity_ivfpq_adc", "dedup_semdedup", "dedup_cross_corpus",
    "text_bm25_search", "streaming_neardup_lsh",
]


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    # UI on for the REST metrics; everything else identical to bench.py's session
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from cassabon_spark import get_spark

    import cassabon_spark.session as sess_mod
    # patch: enable UI for this profiling session only
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("perf-profile")
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
    names = args.only.split(",") if args.only else HEADLINE

    base = f"http://localhost:4050/api/v1/applications/{spark.sparkContext.applicationId}"
    ncores = int(cpus)

    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        for name in names:
            try:
                registry[name].fn(spark, warm_sf).count()
            except Exception:
                pass

    print(f"{'query':28} {'wall':>6} {'jobs':>5} {'stages':>6} {'tasks':>6} "
          f"{'task_s':>7} {'sched_s':>7} {'shuf_mb':>8}")
    rows = []
    for name in names:
        qd = registry[name]
        walls = []
        for run in range(2):
            spark.catalog.clearCache()
            jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
            t0 = time.time()
            qd.fn(spark, args.sf).count()
            walls.append(time.time() - t0)
        wall = min(walls)
        # metrics for the LAST run only
        jobs = [j for j in rest(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        n_tasks = 0
        task_ms = 0.0
        shuf = 0.0
        n_stages = 0
        for sid in stage_ids:
            try:
                for att in rest(base, f"/stages/{sid}"):
                    if att["status"] not in ("COMPLETE", "FAILED"):
                        continue
                    n_stages += 1
                    n_tasks += att["numCompleteTasks"]
                    task_ms += att.get("executorRunTime", 0)
                    shuf += att.get("shuffleReadBytes", 0)
            except Exception:
                pass
        task_s = task_ms / 1000.0
        sched = wall - task_s / ncores
        print(f"{name:28} {wall:6.2f} {len(jobs):5d} {n_stages:6d} {n_tasks:6d} "
              f"{task_s:7.1f} {sched:7.2f} {shuf/1048576:8.1f}")
        rows.append(dict(name=name, wall=round(wall, 3), jobs=len(jobs),
                         stages=n_stages, tasks=n_tasks, task_s=round(task_s, 1),
                         shuf_mb=round(shuf / 1048576, 1)))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
