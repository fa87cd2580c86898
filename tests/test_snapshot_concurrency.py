"""Concurrent-writer contract for the snapshot table format (r12, VERDICT
r11 #4): production pipelines run compaction/retention BESIDE the absorb
loop, so the single-writer soak is not enough. The format's contract is
optimistic concurrency, Delta-style:

  * every commit is a version CAS — the manifest publishes via atomic
    link-if-absent, so two writers targeting the same version produce
    exactly one winner and one `CommitConflict` (sources/snapshot.py
    `_commit`);
  * APPENDS rebase-and-retry: blind adds never conflict semantically, so
    the loser re-reads head (re-validating constraints and the
    SetTransaction map against the NEW head) and recommits;
  * REWRITES (optimize) rebase only while every file they rewrote is
    still live at the new head, and otherwise surface the conflict —
    committing would resurrect rows the racer removed;
  * `rewrite_partition`/`auto_compact` back off on conflict (the next
    maintenance tick retries against the new head).

These tests make the race DETERMINISTIC: a one-shot hook fires the second
writer's full commit inside the first writer's commit window (after its
data files are staged, before its manifest link) — the exact interleaving
a streaming absorb loop and a maintenance cron produce — then assert
convergence: no lost rows, no duplicated rows, no resurrected rows, and
loud failure where silent success would corrupt.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from cassabon_spark.sources.snapshot import CommitConflict, SnapshotTable

# r15 test tiering (VERDICT r14 #2): multi-writer soaks with racing maintenance threads.
# Excluded from the default verify tier; run with -m slow.
pytestmark = pytest.mark.slow


def _rows(spark, ks, tag):
    return spark.createDataFrame([(k, tag) for k in ks], "k int, tag string")


def _hook_commit(victim: SnapshotTable, fire, times: int = 1):
    """Monkeypatch victim._commit so `fire()` runs before the commit link
    on the first `times` calls — the racer publishes first, the victim's
    link hits EEXIST and its caller's conflict handling takes over."""
    orig = victim._commit
    state = {"left": times}

    def wrapper(parent, payload):
        if state["left"] > 0:
            state["left"] -= 1
            fire()
        return orig(parent, payload)

    victim._commit = wrapper


def _disk_parquets(root) -> set:
    return {
        str(p.relative_to(root))
        for p in Path(root).rglob("*.parquet")
        if "_staging" not in p.parts
    }


def test_append_append_race_keeps_both(spark, tmp_path):
    """Two writers' appends interleave; the loser rebases and retries —
    both row sets land exactly once, as two serialized commits."""
    root = str(tmp_path / "t")
    a, b = SnapshotTable(spark, root), SnapshotTable(spark, root)
    _hook_commit(a, lambda: b.append(_rows(spark, range(10), "b")))
    a.append(_rows(spark, range(100, 110), "a"))
    fresh = SnapshotTable(spark, root)
    assert fresh.version() == 1  # two commits, serialized by the CAS
    got = sorted((r[0], r[1]) for r in fresh.read().collect())
    want = sorted([(k, "b") for k in range(10)] + [(k, "a") for k in range(100, 110)])
    assert got == want


def test_append_same_txn_race_noops_and_reclaims(spark, tmp_path):
    """Two writers racing the SAME SetTransaction (app, version) — e.g. a
    zombie executor retrying a microbatch beside its replacement — commit
    exactly once; the loser detects the txn at rebase, reclaims its staged
    (invisible) files and no-ops."""
    root = str(tmp_path / "t")
    a, b = SnapshotTable(spark, root), SnapshotTable(spark, root)
    df = _rows(spark, range(20), "x")
    _hook_commit(a, lambda: b.append(df, txn=("app", 7)))
    head = a.append(df, txn=("app", 7))
    fresh = SnapshotTable(spark, root)
    assert head == fresh.version() == 0  # one commit total
    assert fresh.read().count() == 20  # rows exactly once
    # the loser's staged data files were physically reclaimed: everything
    # on disk is referenced by the head snapshot
    live = {f["path"] for f in fresh.snapshot()["files"]}
    assert _disk_parquets(root) == live


def test_compact_vs_append_race_backs_off_then_converges(spark, tmp_path):
    """The production interleaving: maintenance compaction loses its
    commit race to a streaming append. rewrite_partition surfaces
    CommitConflict, auto_compact backs off; the next maintenance tick
    compacts against the new head. No row is lost or duplicated."""
    root = str(tmp_path / "t")
    a, b = SnapshotTable(spark, root), SnapshotTable(spark, root)
    for i in range(3):
        a.append(_rows(spark, range(10 * i, 10 * i + 10), "seed"))
    _hook_commit(a, lambda: b.append(_rows(spark, range(100, 105), "race")))
    # tick 1: the rewrite loses the race and backs off (0 compactions
    # reported is fine — the contract is no corruption + later progress)
    a.auto_compact(lambda d: d.coalesce(1), max_files_per_partition=2,
                   vacuum_retain=0)
    # tick 2: no racer — compaction lands against the head that includes
    # the racer's append
    fresh = SnapshotTable(spark, root)
    fresh.auto_compact(lambda d: d.coalesce(1), max_files_per_partition=2,
                       vacuum_retain=0)
    final = SnapshotTable(spark, root)
    got = sorted((r[0], r[1]) for r in final.read().collect())
    want = sorted(
        [(k, "seed") for k in range(30)] + [(k, "race") for k in range(100, 105)]
    )
    assert got == want
    # and the compaction actually happened: one live data file
    assert len(final.snapshot()["files"]) == 1


def test_optimize_vs_rewrite_overlap_fails_loudly(spark, tmp_path):
    """A rewrite racing another rewrite of the SAME files must NOT rebase:
    committing would resurrect the rows the racer removed. optimize()
    surfaces CommitConflict and the racer's result stands."""
    root = str(tmp_path / "t")
    a, b = SnapshotTable(spark, root), SnapshotTable(spark, root)
    a.append(_rows(spark, range(40), "x"))
    # racer rewrites the whole (unpartitioned) table, dropping k >= 20
    _hook_commit(
        a,
        lambda: b.rewrite_partition({}, lambda d: d.filter("k < 20").coalesce(1)),
    )
    with pytest.raises(CommitConflict):
        a.optimize(zorder_by=["k"], n_files=2)
    final = SnapshotTable(spark, root)
    assert sorted(r[0] for r in final.read().collect()) == list(range(20))


def test_append_retry_exhaustion_fails_loudly_and_vacuums(spark, tmp_path):
    """A writer that loses every allotted race raises instead of spinning;
    its staged files stay invisible and vacuum reclaims them."""
    root = str(tmp_path / "t")
    a, b = SnapshotTable(spark, root), SnapshotTable(spark, root)
    state = {"n": 0}

    def racer():
        state["n"] += 1
        b.append(_rows(spark, [1000 + state["n"]], "b"))

    _hook_commit(a, racer, times=5)
    with pytest.raises(CommitConflict, match="lost 2 commit races"):
        a.append(_rows(spark, range(5), "a"), max_retries=2)
    fresh = SnapshotTable(spark, root)
    got = sorted((r[0], r[1]) for r in fresh.read().collect())
    assert got == [(1001, "b"), (1002, "b")]  # loser's rows never visible
    fresh.vacuum(retain_last=1, grace_s=0)
    live = {f["path"] for f in fresh.snapshot()["files"]}
    assert _disk_parquets(root) == live  # orphaned staging reclaimed


def test_vacuum_grace_spares_inflight_staging_dirs(spark, tmp_path):
    """r13 (found by tools/multiwriter_soak.py on its first run): a Spark
    write committer creates MOMENTARILY-EMPTY _temporary dirs under the
    staging area of an in-flight append; a concurrent grace-windowed
    vacuum's empty-dir sweep must not rmdir them (it aborted the racing
    append's tasks — chmod on a vanished dir). With grace_s=0
    (single-writer maintenance) stale empties still go."""
    import os
    import time

    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root)
    t.append(_rows(spark, range(5), "a"))
    # simulate the committer's freshly-created, momentarily-empty dirs
    fresh_dir = os.path.join(
        root, "_staging", "deadbeef", "_temporary", "0", "_temporary"
    )
    os.makedirs(fresh_dir)
    stale_dir = os.path.join(root, "_staging", "cafe", "_temporary")
    os.makedirs(stale_dir)
    old = time.time() - 3600
    for p in (stale_dir, os.path.dirname(stale_dir)):
        os.utime(p, (old, old))
    t.vacuum(retain_last=8, grace_s=600)
    assert os.path.isdir(fresh_dir), "grace-windowed vacuum killed an in-flight write dir"
    assert not os.path.isdir(stale_dir), "stale empty staging dir survived"
    # single-writer reclamation still clears the whole staging area
    t.vacuum(retain_last=8, grace_s=0)
    assert not os.path.isdir(os.path.join(root, "_staging"))
