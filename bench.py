#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() forces the full plan; results
are not collected to keep the measurement about the engine, not the driver's
python loop).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — scan-agg, join+topk, many-way join,
# windows, as-of, carbon rollup/read path, dedup (LSH), similarity, text.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "win_topk_per_group",
    "agg_rollup",
    "asof_join_last_order",
    "sessionize_30m",
    "carbon_rollup_tumbling_1h",
    "carbon_multi_tier_fanout",
    "carbon_read_gapfill",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_topk_cosine",
    "similarity_ann_lsh",
    "text_quality_score",
    "text_bpe_token_count",
    "q6_forecast_revenue",
    # r4 additions (VERDICT r3 #3): the heavy flagship operators added in
    # rounds 2-3, so regressions in them are tracked round-over-round. The
    # original 17 names above are kept verbatim for cross-round continuity.
    "similarity_ivfpq_adc",
    "dedup_semdedup",
    "dedup_cross_corpus",
    "text_bm25_search",
    "streaming_neardup_lsh",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cassabon_spark import get_spark
    from cassabon_spark.queries import load_registry

    registry = load_registry()
    spark = get_spark(app_name="cassabon-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # engine, not first-touch costs
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # steady-state warmup: run every headline query once at the smallest sf.
    # Spark's whole-stage-codegen cache keys on generated source, which
    # depends on plan SHAPE not data — so this compiles each query's stages
    # once, and the timed sf runs below measure execution, not javac. (The
    # tiny-sf caches are plan-keyed too: different input path, no false hits.)
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and os.path.abspath(warm_sf) != os.path.abspath(sf_dir):
        for name in HEADLINE:
            try:
                registry[name].fn(spark, warm_sf).count()
            except Exception:
                pass

    # two timed runs per query, report the min: absorbs scheduler/GC noise.
    # clearCache between runs so run 2 recomputes from parquet (several
    # queries cache intermediates internally; without the clear, run 2 would
    # measure cached reads, not the engine). If the two runs disagree by
    # >40% the box is noisy right now — take up to two extra runs (min-of-k
    # converges to the true engine cost under one-sided noise).
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        qd = registry[name]
        runs: list[float] = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            qd.fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        extra = 0
        while extra < 2 and (max(runs) - min(runs)) / max(min(runs), 1e-9) > 0.4:
            spark.catalog.clearCache()
            t0 = time.time()
            qd.fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
            runs = sorted(runs)[:2]  # keep the two fastest; spread test on those
            extra += 1
        times[name] = round(min(runs), 3)
        total += times[name]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # box/JVM conditions (VERDICT r6 #5): driver-to-driver headline deltas
    # have swung +-15-50% on box variance while same-session comparisons
    # were flat — record the conditions so a cross-round reader can see
    # whether two BENCH files are even comparable; the stated contract is
    # that PERF_rN's SAME-SESSION min-of-k table is the primary comparator.
    conditions = {}
    try:
        conditions["load_avg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as fh:
            mem = dict(
                ln.split(":", 1) for ln in fh.read().splitlines() if ":" in ln
            )
        conditions["mem_available_gb"] = round(
            int(mem["MemAvailable"].strip().split()[0]) / 1048576, 1
        )
    except (OSError, KeyError, ValueError):
        pass
    conditions["cpus"] = os.environ.get("SPARK_GRAFT_CPUS", "32")
    conditions["java"] = spark.sparkContext._jvm.java.lang.System.getProperty(
        "java.version"
    )
    conditions["spark"] = spark.version
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": round(total, 3),
                # cross-round continuity (VERDICT r4 #7): subtotal of the
                # original 17 names, comparable verbatim back to BENCH_r01
                "value_original17": round(
                    sum(times[n] for n in HEADLINE[:17]), 3
                ),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "conditions": conditions,
            }
        )
    )


if __name__ == "__main__":
    main()
