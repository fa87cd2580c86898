#!/usr/bin/env python
"""Discriminating bench regime (r15, VERDICT r14 #3): per-query FRESH-JVM
min-of-3 over the headline set.

Why this exists: at sf0.1 the shared-session bench is scheduling-bound —
every r14 scaling ratio was <=1.87 against a 4x core ratio, the 8-core
total matched 32-core, and session-to-session swings on byte-identical
code exceeded any single query's realistic win (VERDICT r14 "Scaling
block"). This harness removes the two dominant noise sources:

  * cross-query JVM state (GC pressure, code-cache, accumulated broadcast
    cleanup) — each query gets its OWN JVM via a subprocess;
  * box load drift — each subprocess waits for load_avg_1m to fall below
    a gate before its timed runs.

The per-query methodology inside the subprocess is bench.py's, verbatim:
sf0.001 warm pass, clearCache() between runs, count() action — but
min-of-3 instead of min-of-2.

This tool ADDS a regime; bench.py and its JSON contract are untouched
(the driver's numbers stay comparable round-over-round). Output: one JSON
line in the bench.py shape plus {"mode": "solo_fresh_jvm"}.

Usage: python tools/solo_bench.py [--only a,b] [--runs 3] [--gate 4.0]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = r"""
import json, os, sys, time
repo, name, sf_dir, runs, gate = sys.argv[1:6]
runs, gate = int(runs), float(gate)
sys.path.insert(0, repo)
os.chdir(repo)
for _ in range(120):
    if os.getloadavg()[0] <= gate:
        break
    time.sleep(5)
from cassabon_spark import get_spark
from cassabon_spark.queries import load_registry
registry = load_registry()
spark = get_spark(app_name="solo-bench")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
try:
    registry[name].fn(spark, "/root/testdata/sf0.001").count()
except Exception:
    pass
walls = []
for _ in range(runs):
    spark.catalog.clearCache()
    t0 = time.time()
    registry[name].fn(spark, sf_dir).count()
    walls.append(time.time() - t0)
print(json.dumps({"name": name, "wall": round(min(walls), 3),
                  "walls": [round(w, 3) for w in walls],
                  "load0": round(os.getloadavg()[0], 2)}))
"""


def main():
    from bench import HEADLINE

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--gate", type=float, default=4.0)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    names = args.only.split(",") if args.only else list(HEADLINE)

    times = {}
    details = {}
    for name in names:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, REPO, name, args.sf,
             str(args.runs), str(args.gate)],
            capture_output=True, text=True,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except (ValueError, IndexError):
            print(f"FAIL {name}: {out.stderr[-500:]}", file=sys.stderr)
            continue
        times[name] = rec["wall"]
        details[name] = rec
        print(f"  {name}: {rec['walls']} (load0 {rec['load0']})", file=sys.stderr)

    sf = args.sf.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_query_wall_seconds",
        "mode": "solo_fresh_jvm",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "runs_per_query": args.runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
