#!/usr/bin/env python
"""Prove snapshot-table commit metadata is O(delta), not O(live files).

VERDICT r4's one `weak` mark: the r4 manifest serialized the FULL live
file list per commit and re-parsed it per read — at ~100k files (100 TB /
1 GB) that is a multi-ten-MB JSON on the ingest hot path. This bench
builds a synthetic ~100k-file table through the REAL commit protocol (no
data IO — the metadata path is what's measured) and times, for both the
r5 action-log format and a simulated r4 full-manifest format:

  * hot-path commit: one 10-file append at a 100k-file head
  * cold head load: fresh SnapshotTable instance -> snapshot() files

Usage: python tools/manifest_bench.py [--files 100000] [--batch 1000]
Prints one JSON line; SCALE_r05.md records the numbers.
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

from cassabon_spark.sources.snapshot import SnapshotTable  # noqa: E402

SCHEMA = {
    "type": "struct",
    "fields": [
        {"name": "path", "type": "string", "nullable": True, "metadata": {}},
        {"name": "time", "type": "timestamp", "nullable": True, "metadata": {}},
        {"name": "stat", "type": "double", "nullable": True, "metadata": {}},
    ],
}


def entries(n: int, start: int = 0) -> list[dict]:
    """Realistic manifest entries: partition values + per-file stats, the
    same shape _stage() harvests from parquet footers."""
    out = []
    for i in range(start, start + n):
        day = f"2020-01-{(i % 28) + 1:02d}"
        out.append(
            {
                "path": f"resolution_s=10/date_bucket={day}/{i:010d}-part.parquet",
                "partition": {"resolution_s": "10", "date_bucket": day},
                "bytes": 1 << 30,
                "stats": {
                    "rows": 1_000_000,
                    "min": {"time": f"2020-01-01 00:{i % 60:02d}:00", "stat": 0.0},
                    "max": {"time": f"2020-01-01 23:{i % 60:02d}:59", "stat": 1.0e6},
                },
            }
        )
    return out


def bench_delta(root: str, n_files: int, batch: int) -> dict:
    t = SnapshotTable(spark=None, root=root)
    build_t0 = time.perf_counter()
    parent, added = None, 0
    commit_times = []
    while added < n_files:
        b = entries(min(batch, n_files - added), start=added)
        c0 = time.perf_counter()
        parent = t._commit(
            parent, {"op": "append", "add": b, "remove": [], "schema": SCHEMA}
        )
        commit_times.append(time.perf_counter() - c0)
        added += len(b)
    build_s = time.perf_counter() - build_t0

    # hot-path commit at full head (memo warm — the streaming shape)
    c0 = time.perf_counter()
    parent = t._commit(
        parent,
        {"op": "append", "add": entries(10, start=added), "remove": [], "schema": SCHEMA},
    )
    hot_commit_s = time.perf_counter() - c0

    # cold head load: new instance, empty memo -> checkpoint + <=15 deltas
    t2 = SnapshotTable(spark=None, root=root)
    c0 = time.perf_counter()
    files = t2.snapshot()["files"]
    cold_load_s = time.perf_counter() - c0
    assert len(files) == n_files + 10, len(files)

    # warm re-load (memo hit + one version() stat — the per-query shape)
    c0 = time.perf_counter()
    files = t2.snapshot()["files"]
    warm_load_s = time.perf_counter() - c0

    manifest_bytes = sorted(
        os.path.getsize(os.path.join(root, "_manifests", f))
        for f in os.listdir(os.path.join(root, "_manifests"))
        if f.startswith("v")
    )
    return {
        "build_s": round(build_s, 3),
        "commit_p50_s": round(sorted(commit_times)[len(commit_times) // 2], 5),
        "commit_p99_s": round(
            sorted(commit_times)[max(0, int(len(commit_times) * 0.99) - 1)], 5
        ),
        "commit_max_s": round(max(commit_times), 5),
        "hot_commit_s": round(hot_commit_s, 5),
        "cold_head_load_s": round(cold_load_s, 4),
        "warm_head_load_s": round(warm_load_s, 5),
        "manifest_bytes_p50": manifest_bytes[len(manifest_bytes) // 2],
        "manifest_bytes_max": manifest_bytes[-1],
    }


def bench_legacy(root: str, n_files: int) -> dict:
    """Simulate the r4 format: one full-file-list manifest, then time a
    10-file append done the r4 way (read full list, write full list) and a
    cold head parse. One seed manifest only — building the full 100-commit
    legacy history would write ~2 GB of JSON for no extra information."""
    t = SnapshotTable(spark=None, root=root)
    base = entries(n_files)
    v = t._commit(None, {"op": "append", "files": base, "schema": SCHEMA})

    c0 = time.perf_counter()
    snap = t.snapshot(v)  # r4 append re-reads the head...
    t._commit(
        v,
        {
            "op": "append",
            "files": snap["files"] + entries(10, start=n_files),
            "schema": SCHEMA,
        },
    )
    hot_commit_s = time.perf_counter() - c0

    t2 = SnapshotTable(spark=None, root=root)
    c0 = time.perf_counter()
    files = t2.snapshot()["files"]
    cold_load_s = time.perf_counter() - c0
    assert len(files) == n_files + 10
    head_mb = os.path.getsize(
        os.path.join(root, "_manifests", "v000000000001.json")
    ) / 1e6
    return {
        "hot_commit_s": round(hot_commit_s, 4),
        "cold_head_load_s": round(cold_load_s, 4),
        "head_manifest_mb": round(head_mb, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=1_000)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="manifest_bench_")
    try:
        delta = bench_delta(os.path.join(work, "delta"), args.files, args.batch)
        legacy = bench_legacy(os.path.join(work, "legacy"), args.files)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    out = {
        "metric": "snapshot_manifest_bench",
        "files": args.files,
        "batch": args.batch,
        "delta": delta,
        "legacy_r4": legacy,
        "hot_commit_speedup": round(
            legacy["hot_commit_s"] / max(delta["hot_commit_s"], 1e-9), 1
        ),
        "cold_load_speedup": round(
            legacy["cold_head_load_s"] / max(delta["cold_head_load_s"], 1e-9), 1
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
