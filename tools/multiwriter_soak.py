#!/usr/bin/env python
"""Multi-writer soak: a maintenance writer racing the TTL absorb loop
(r13, VERDICT r12 #3).

tests/test_snapshot_concurrency.py pins each commit-race interleaving
ONCE with a deterministic hook; production runs compaction / vacuum
BESIDE the absorb loop continuously. This harness closes that gap: the
same 100-batch schedule as tools/ttl_soak.py runs TWICE —

  1. reference: single writer (the real `_sndi_make_processor(ttl=N)`
     with its own expiry compaction, exactly the ttl_soak shape);
  2. racing: the same processor on a fresh table set while a MAINTENANCE
     THREAD hammers separate SnapshotTable instances on the same roots —
     threshold compaction (coalesce-only rewrites, semantically neutral)
     with an aggressive 4-file trigger on all three state tables plus
     grace-windowed vacuum on all four — the absorb-loop-vs-cron race at
     full commit rates instead of one staged interleaving.

Gates (exit 1 on failure):
  * CONVERGENCE — the racing run's pair output equals the reference's
    exactly, and each state table's LIVE row set (bid > last - ttl,
    arrays canonicalized) matches: live rows are append-deterministic
    and monotone expiry means no compaction timing can drop one, so any
    divergence is a lost/duplicated/resurrected row;
  * LINEAR HISTORY — each racing table's manifest versions are exactly
    0..head with no gaps (every commit serialized by the version CAS);
  * BOUNDED RETRIES — the run completes (no append exhausted its retry
    budget, no maintenance exception) with conflict counts reported;
  * LIVENESS — the maintenance writer actually rewrote partitions
    (>= MIN_REWRITES) and real commit conflicts fired (>= MIN_CONFLICTS)
    — a soak where the race never happens proves nothing.

Usage: python tools/multiwriter_soak.py [--batches 100] [--rows 300] [--ttl 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIN_REWRITES = 20
MIN_CONFLICTS = 1


def _batch_df(spark, F, b: int, rows: int):
    """ttl_soak's deterministic mix: 10% hot content (refresh-on-touch
    every batch), one near-dup family doc per batch, unique filler."""
    hot = " ".join(f"hot{i}" for i in range(20))
    fam = " ".join(f"fam{i}" for i in range(19))
    base = spark.range(rows).select(
        (F.col("id") + b * rows).alias("doc_id"), F.col("id").alias("i")
    )
    text = (
        F.when(F.col("i") < rows // 10, F.lit(hot))
        .when(
            F.col("i") == rows // 10,
            F.concat_ws(" ", F.lit(fam), F.lit(f"gen{b % 7}")),
        )
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


def _count_conflicts(tbl, ctr: dict, key: str):
    """Wrap tbl._commit so every CommitConflict increments ctr[key] —
    the bounded-retries evidence (losers rebase internally)."""
    from cassabon_spark.sources.snapshot import CommitConflict

    orig = tbl._commit

    def wrapper(parent, payload):
        try:
            return orig(parent, payload)
        except CommitConflict:
            ctr[key] = ctr.get(key, 0) + 1
            raise

    tbl._commit = wrapper


def _live_state(tbls, last_bid: int, ttl: int):
    """Canonical live row sets per state table (arrays sorted, rows
    sorted) — append-deterministic across runs, compaction-timing-proof
    (a row live at the final batch is live at every earlier batch, so no
    expiry rewrite may have dropped it)."""
    out = {}
    for name in ("mem", "idx", "rp"):
        t = tbls[name]
        if t.version() is None:
            out[name] = []
            continue
        rows = []
        for r in t.read().filter(f"bid > {last_bid - ttl}").collect():
            d = r.asDict()
            rows.append(
                tuple(
                    tuple(sorted(v)) if isinstance(v, list) else v
                    for _, v in sorted(d.items())
                )
            )
        out[name] = sorted(rows)
    return out


def _run(spark, F, root, batches, rows, ttl, racing: bool):
    from cassabon_spark.queries.extensions import _sndi_make_processor
    from cassabon_spark.sources.snapshot import SnapshotTable

    tbls = {
        n: SnapshotTable(spark, os.path.join(root, n))
        for n in ("pairs", "idx", "mem", "rp")
    }
    conflicts: dict = {}
    for n, t in tbls.items():
        _count_conflicts(t, conflicts, f"absorb:{n}")
    width = spark.sparkContext.defaultParallelism
    proc = _sndi_make_processor(
        spark, tbls["pairs"], tbls["idx"], tbls["mem"], tbls["rp"],
        16, 16, width, app="mw_soak", ttl=ttl,
    )

    stop = threading.Event()
    stats = {"rewrites": 0, "vacuums": 0, "errors": []}
    maint_tbls = None
    if racing:
        # SEPARATE table instances: a real second writer, not shared state
        maint_tbls = {
            n: SnapshotTable(spark, os.path.join(root, n))
            for n in ("pairs", "idx", "mem", "rp")
        }
        for n, t in maint_tbls.items():
            _count_conflicts(t, conflicts, f"maint:{n}")
            # widen the maintenance writer's commit window (head is chosen
            # by the caller BEFORE _commit): a real CAS window is
            # milliseconds, so collisions would be luck at soak scale —
            # the 1 s sleep makes the absorb loop actually land commits
            # inside it, exercising the rebase/back-off paths for real
            # (the realistic direction: appends win, maintenance rebases)
            orig = t._commit

            def widened(parent, payload, _orig=orig):
                time.sleep(1.0)
                return _orig(parent, payload)

            t._commit = widened
        pcols = {"idx": ("pk",), "mem": ("ckpk",), "rp": ("ckpk",), "pairs": ()}

        def maintenance():
            i = 0
            while not stop.is_set():
                for n in ("idx", "mem", "rp"):
                    try:
                        if maint_tbls[n].version() is None:
                            continue
                        done = maint_tbls[n].auto_compact(
                            lambda d: d.coalesce(1),
                            partition_cols=pcols[n],
                            max_files_per_partition=4,
                            vacuum_retain=0,  # vacuum separately below
                        )
                        stats["rewrites"] += done
                    except Exception as e:  # noqa: BLE001
                        stats["errors"].append(f"compact {n}: {e!r}")
                if i % 20 == 19:
                    for n in ("pairs", "idx", "mem", "rp"):
                        try:
                            if maint_tbls[n].version() is None:
                                continue
                            maint_tbls[n].vacuum(retain_last=8, grace_s=600)
                            stats["vacuums"] += 1
                        except Exception as e:  # noqa: BLE001
                            stats["errors"].append(f"vacuum {n}: {e!r}")
                i += 1
                time.sleep(0.05)

        th = threading.Thread(target=maintenance, daemon=True)
        th.start()

    walls = []
    try:
        for b in range(batches):
            df = _batch_df(spark, F, b, rows)
            t0 = time.time()
            proc(df, b)
            walls.append(time.time() - t0)
    finally:
        stop.set()
        if racing:
            th.join(timeout=60)

    pairs = sorted(
        (r[0], r[1], r[2])
        for r in tbls["pairs"].read().select("d1", "d2", "jaccard").collect()
    )
    state = _live_state(tbls, batches - 1, ttl)
    versions = {n: tbls[n].versions() for n in tbls}
    return {
        "pairs": pairs,
        "state": state,
        "versions": versions,
        "walls": walls,
        "conflicts": conflicts,
        "maint": stats,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=100)
    ap.add_argument("--rows", type=int, default=300)
    ap.add_argument("--ttl", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cassabon_spark.session import get_spark, prep

    spark = get_spark()
    prep(spark)
    root = tempfile.mkdtemp(prefix="cassabon_mw_soak_")

    ref = _run(spark, F, os.path.join(root, "ref"),
               args.batches, args.rows, args.ttl, racing=False)
    rac = _run(spark, F, os.path.join(root, "rac"),
               args.batches, args.rows, args.ttl, racing=True)

    print(f"# multi-writer soak — {args.batches} batches x {args.rows} docs, "
          f"ttl={args.ttl}; maintenance thread: 4-file auto_compact on "
          "idx/mem/rp + grace-windowed vacuum on all four\n")
    print("| run | pairs | decade medians (s/batch) | commit conflicts | "
          "maint rewrites / vacuums |")
    print("|---|---|---|---|---|")
    for label, r in (("single-writer", ref), ("racing", rac)):
        w = r["walls"]
        decs = [w[i:i + 10] for i in range(0, len(w) - len(w) % 10, 10)]
        meds = " ".join(f"{statistics.median(d):.2f}" for d in decs)
        print(f"| {label} | {len(r['pairs'])} | {meds} | "
              f"{sum(r['conflicts'].values())} {dict(sorted(r['conflicts'].items()))} | "
              f"{r['maint']['rewrites']} / {r['maint']['vacuums']} |")

    fails = []
    if rac["pairs"] != ref["pairs"]:
        only_r = set(rac["pairs"]) - set(ref["pairs"])
        only_s = set(ref["pairs"]) - set(rac["pairs"])
        fails.append(
            f"pair divergence: racing-only={len(only_r)} single-only={len(only_s)}"
        )
    for n in ("mem", "idx", "rp"):
        if rac["state"][n] != ref["state"][n]:
            fails.append(
                f"live-state divergence in {n}: racing {len(rac['state'][n])} "
                f"rows vs single {len(ref['state'][n])}"
            )
        else:
            print(f"\nlive {n}: {len(rac['state'][n])} rows, identical across runs", end="")
    print()
    for n, vs in rac["versions"].items():
        # vacuum prunes manifests below the retain window, so history
        # starts at vs[0]; linearity = contiguous versions up to head
        if not vs or vs != list(range(vs[0], vs[0] + len(vs))):
            fails.append(f"non-linear history in {n}: {vs[:10]}...{vs[-5:]}")
    if rac["maint"]["errors"]:
        fails.append(f"maintenance errors: {rac['maint']['errors'][:5]}")
    if rac["maint"]["rewrites"] < MIN_REWRITES:
        fails.append(
            f"maintenance did only {rac['maint']['rewrites']} rewrites "
            f"(< {MIN_REWRITES}) — the race never exercised compaction"
        )
    if sum(rac["conflicts"].values()) < MIN_CONFLICTS:
        fails.append(
            "zero commit conflicts fired — the two writers never actually raced"
        )
    hist = {n: len(vs) for n, vs in rac["versions"].items()}
    print(f"racing history lengths: {hist}")
    print(f"\n**Gate failures: {len(fails)}**")
    for f in fails:
        print(f"- {f}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
