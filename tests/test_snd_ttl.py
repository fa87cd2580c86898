"""Rolling-window (TTL) retention for the incremental dedup loop (r11,
VERDICT r10 #1).

The window semantic — a pair (d1@b1, d2@b2) is emitted iff the contents
near-dup AND |b1 - b2| < ttl — is pinned against an INDEPENDENT python
mirror of the whole md5-MinHash/LSH pipeline (hashlib, no Spark), over
crafted batch schedules that hit every subtle case worked out in
`_sndi_make_processor`'s docstring:

  * refresh-on-touch: a content with members in consecutive batches must
    keep its band-index entry alive past the FIRST member's expiry, or a
    later near-dup silently misses it (the rep-index-freshness trap).
  * dead re-introduction: a content whose members all expired re-arrives,
    is re-probed as NEW, and re-pairs with live near-dups — while its
    still-unexpired historical rep-pair rows must NOT also emit
    (creation stamps both directions, so a pair row can outlive its
    side's own members — the stale-pair double-emission hazard).
  * the e2 variant of that hazard: the dead content's partner is itself
    in the same batch, so the stale row would double-emit the
    batch-x-batch block.

Plus: the exactly-once crash/replay matrix stays green with ttl set, and
compaction physically drops expired state (bounded-window space claim).
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from cassabon_spark.queries.extensions import _sndi_make_processor
from cassabon_spark.sources.snapshot import SnapshotTable

# r15 test tiering (VERDICT r14 #2): TTL soak/restart/replay schedules run multi-batch streaming processors — minutes per test.
# Excluded from the default verify tier; run with -m slow.
pytestmark = pytest.mark.slow

# ------------------------------------------------------------ python mirror
# Independent re-implementation of tokens -> 3-gram shingles -> 8 md5
# minhashes -> 4 bands -> candidate -> exact-Jaccard verify. Deliberately
# NOT importing any engine expression: agreement is evidence, not tautology.


def _toks(t: str) -> list[str]:
    t = t.lower().strip()
    return [] if not t else re.split(r"\s+", t)


def _shingles(t: str) -> set[str]:
    tk = _toks(t)
    if len(tk) < 3:
        return set()
    return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}


def _chunk(s: str, i: int) -> int:
    h = hashlib.md5(f"{i // 4}|{s}".encode()).hexdigest()
    return int(h[8 * (i % 4) : 8 * (i % 4) + 8], 16)


def _bands(t: str) -> list[str]:
    shs = _shingles(t)
    hs = [min(_chunk(s, i) for s in shs) for i in range(8)]
    return [
        hashlib.md5(f"{hs[2 * b]},{hs[2 * b + 1]}".encode()).hexdigest()
        for b in range(4)
    ]


def _mirror_pairs(sched: dict, ttl: int) -> dict:
    """Expected {(d1, d2): jaccard} for a {doc_id: (batch, lang, text)}
    schedule under a ttl-batch window."""
    out = {}
    ids = sorted(sched)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            b1, l1, t1 = sched[d1]
            b2, l2, t2 = sched[d2]
            if l1 != l2 or abs(b1 - b2) >= ttl:
                continue
            s1, s2 = _shingles(t1), _shingles(t2)
            if not s1 or not s2:
                continue
            if not any(x == y for x, y in zip(_bands(t1), _bands(t2))):
                continue
            j = len(s1 & s2) / len(s1 | s2)
            if j >= 0.7:
                out[(d1, d2)] = j
    return out


# ------------------------------------------------------------ drive harness

_BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
_NEAR = _BASE + " victor"  # j=0.9474 vs _BASE, shares all 4 bands
_OTHER = (
    "one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
)


def _run_ttl(spark, tmp_path, name, sched, ttl, crash_plan=None):
    """Drive the processor over a {doc_id: (batch, lang, text)} schedule;
    returns ({(d1,d2): jaccard}, tables). crash_plan: {batch: action} with
    action in {'replay', 'crash-out', 'crash-idx', 'crash-mem', 'crash-rp'}
    (same retry contract as tests/test_snd_modes.py)."""
    base = tmp_path / name
    t = {
        "out": SnapshotTable(spark, str(base / "pairs")),
        "idx": SnapshotTable(spark, str(base / "idx")),
        "mem": SnapshotTable(spark, str(base / "mem")),
        "rp": SnapshotTable(spark, str(base / "rp")),
    }
    proc = _sndi_make_processor(
        spark, t["out"], t["idx"], t["mem"], t["rp"],
        16, 16, spark.sparkContext.defaultParallelism, app=name, ttl=ttl,
    )
    n_batches = max(b for b, _, _ in sched.values()) + 1
    for b in range(n_batches):
        rows = [
            (d, lang, text)
            for d, (bb, lang, text) in sched.items()
            if bb == b
        ]
        df = spark.createDataFrame(
            rows or [], "doc_id bigint, lang string, text string"
        )
        action = (crash_plan or {}).get(b, "ok")
        if action == "ok":
            proc(df, b)
        elif action == "replay":
            proc(df, b)
            proc(df, b)
        elif action.startswith("crash-"):
            victim = t[action.split("-", 1)[1]]
            orig = victim.append
            state = {"armed": True}

            def flaky(*a, **k):
                if state["armed"]:
                    state["armed"] = False
                    raise RuntimeError("injected append crash")
                return orig(*a, **k)

            victim.append = flaky
            with pytest.raises(RuntimeError, match="injected"):
                proc(df, b)
            victim.append = orig
            proc(df, b)
        else:  # pragma: no cover
            raise ValueError(action)
    if t["out"].version() is None:
        return {}, t
    got = {}
    for r in t["out"].read().select("d1", "d2", "jaccard").collect():
        key = (r[0], r[1])
        assert key not in got, f"duplicate pair emitted: {key}"
        got[key] = r[2]
    return got, t


def _assert_matches(got: dict, expected: dict):
    assert set(got) == set(expected), (
        f"pair-set mismatch: engine-only={set(got) - set(expected)} "
        f"mirror-only={set(expected) - set(got)}"
    )
    for k, j in expected.items():
        assert abs(got[k] - j) < 1e-3, (k, got[k], j)


# ------------------------------------------------------------------- tests


def test_sanity_crafted_texts_band_match():
    """The scenario texts must actually candidate under LSH, or the
    scenario tests would pass vacuously."""
    assert any(x == y for x, y in zip(_bands(_BASE), _bands(_NEAR)))
    s1, s2 = _shingles(_BASE), _shingles(_NEAR)
    assert len(s1 & s2) / len(s1 | s2) >= 0.7
    assert not any(x == y for x, y in zip(_bands(_BASE), _bands(_OTHER)))


def test_refresh_on_touch_keeps_index_alive(spark, tmp_path):
    """a@{0,1}, near-dup b@2, ttl=2: (a1, b2) pairs ONLY if a's band-index
    entry was refreshed at a's batch-1 touch — a0's original entry is
    expired by batch 2. (a0, b2) and (a0, a1)-beyond-window must not leak."""
    sched = {
        10: (0, "en", _BASE),
        11: (1, "en", _BASE),
        12: (2, "en", _NEAR),
    }
    got, _ = _run_ttl(spark, tmp_path, "refresh", sched, ttl=2)
    expected = _mirror_pairs(sched, ttl=2)
    assert (11, 12) in expected and (10, 12) not in expected  # scenario real
    assert (10, 11) in expected
    _assert_matches(got, expected)


def test_dead_reintroduction_no_double_emit(spark, tmp_path):
    """b@0, near-dup a@2, b-content again@4, ttl=3: b is DEAD at batch 4
    (its batch-0 member expired) so doc 24 re-probes as new and re-pairs
    with a — exactly once, though the stale rep-pair row (stamped at a's
    batch-2 arrival) is still inside the bid window."""
    sched = {
        20: (0, "en", _BASE),
        21: (2, "en", _NEAR),
        24: (4, "en", _BASE),
    }
    got, _ = _run_ttl(spark, tmp_path, "dead", sched, ttl=3)
    expected = _mirror_pairs(sched, ttl=3)
    assert set(expected) == {(20, 21), (21, 24)}  # scenario shape
    _assert_matches(got, expected)


def test_dead_partner_in_same_batch_no_double_emit(spark, tmp_path):
    """The e2 hazard: X@{2,4} near-dups b@{0,4}; at batch 4, b is dead
    and re-arrives ALONGSIDE X's fresh member, so the stale (X,b) row
    would double-emit the batch-x-batch block that the fresh probe pair
    also expands."""
    sched = {
        30: (0, "en", _BASE),      # b content
        31: (2, "en", _NEAR),      # X content
        34: (4, "en", _NEAR),      # X again (alive touch)
        35: (4, "en", _BASE),      # b again (dead re-introduction)
    }
    got, _ = _run_ttl(spark, tmp_path, "e2hazard", sched, ttl=3)
    expected = _mirror_pairs(sched, ttl=3)
    assert set(expected) == {(30, 31), (31, 34), (31, 35), (34, 35)}
    _assert_matches(got, expected)


def test_mixed_corpus_matches_mirror(spark, tmp_path):
    """Broad sweep: dup farm spread over batches, near-dups, an unrelated
    content, a shingle-less tiny doc, and a cross-lang copy (must never
    pair) — engine == mirror over a 6-batch ttl=3 schedule."""
    sched = {}
    # dup farm: same content at batches 0..5 (windowed 1.0 pairs only)
    for b in range(6):
        sched[100 + b] = (b, "en", _BASE)
    # near-dup arrivals at 1 and 4
    sched[110] = (1, "en", _NEAR)
    sched[111] = (4, "en", _NEAR)
    # unrelated content and tiny doc
    sched[120] = (2, "en", _OTHER)
    sched[121] = (3, "en", "too tiny")
    # same text, different lang: must never pair with the en farm
    sched[130] = (2, "fr", _BASE)
    got, _ = _run_ttl(spark, tmp_path, "mixed", sched, ttl=3)
    expected = _mirror_pairs(sched, ttl=3)
    # scenario sanity: window excludes far-apart farm pairs, keeps near ones
    assert (100, 101) in expected and (100, 105) not in expected
    assert all(130 not in k for k in expected)
    _assert_matches(got, expected)


def test_ttl_crash_replay_matrix(spark, tmp_path):
    """Exactly-once with ttl set: full replay and a crash at every append
    point (including batches where refresh rows ride the appends) converge
    to the clean run's pair set."""
    sched = {
        40: (0, "en", _BASE),
        41: (1, "en", _BASE),      # touch -> refresh appends active
        42: (2, "en", _NEAR),
        43: (4, "en", _BASE),      # dead re-introduction
    }
    clean, _ = _run_ttl(spark, tmp_path, "clean", sched, ttl=2)
    assert clean  # non-trivial
    for i, plan in enumerate(
        [
            {0: "replay", 1: "crash-rp", 2: "crash-out"},
            {1: "crash-idx", 2: "crash-mem", 4: "replay"},
        ]
    ):
        messy, _ = _run_ttl(
            spark, tmp_path, f"messy{i}", sched, ttl=2, crash_plan=plan
        )
        assert messy == clean


def test_ttl_compaction_drops_expired_state(spark, tmp_path):
    """The bounded-window space claim: a hot content touched every batch
    accumulates member/index/rep state, and once the per-partition file
    count trips auto-compaction, rows outside the bid window are
    PHYSICALLY dropped — state is bounded by live-window mass, not by
    stream length."""
    n, ttl = 20, 3
    # two near-dup contents arriving EVERY batch, so every state
    # partition (members by ckpk, index by pk, rep pairs by ckpk — the
    # latter refreshed on touch each batch) accumulates a file per batch
    # and trips the 16-file threshold; partitions below the threshold
    # keep their expired rows by design (space is compaction's job,
    # semantics are the read predicate's)
    sched = {200 + b: (b, "en", _BASE) for b in range(n)}
    for b in range(n):
        sched[300 + b] = (b, "en", _NEAR)
    got, t = _run_ttl(spark, tmp_path, "expire", sched, ttl=ttl)
    # semantics: only within-window pairs
    _assert_matches(got, _mirror_pairs(sched, ttl=ttl))
    # space: the last compaction (>= batch 16) dropped every row expired
    # at that point, i.e. bid <= 16 - ttl; 2n appended member rows must
    # not all survive
    mem = t["mem"].read().select("bid").collect()
    assert len(mem) < 2 * n, "compaction never dropped expired member rows"
    assert min(r[0] for r in mem) > n - 1 - 2 * ttl
    rp = t["rp"].read().select("bid").collect()
    assert rp and min(r[0] for r in rp) > n - 1 - 2 * ttl
    # file counts bounded (the r9 lifecycle claim, now with expiry)
    for name in ("mem", "idx", "rp"):
        per_part: dict = {}
        for f in t[name].snapshot()["files"]:
            key = tuple(sorted(f["partition"].items()))
            per_part[key] = per_part.get(key, 0) + 1
        assert max(per_part.values()) <= 17, (name, per_part)


def test_ttl_nb_ceil_parity_with_duckdb():
    """The corpus-scaled NB must be computed identically by python's exact
    integer ceil and the oracle's double-division CEIL — including at the
    exact-multiple boundaries where a rounding slip would flip NB."""
    import duckdb

    from cassabon_spark.queries.extensions import (
        _SNDI_TTL_DOCS_PER_BATCH as D,
        _sndi_ttl_nb,
    )

    con = duckdb.connect()
    ns = [1, 5, D - 1, D, D + 1, 6 * D - 1, 6 * D, 6 * D + 1,
          60_000, 70_001, 123_456_789, 10**12, 10**12 + 1]
    for n in ns:
        sql_nb = con.execute(
            f"SELECT GREATEST(6, CAST(CEIL({n} / {D}.0) AS BIGINT))"
        ).fetchone()[0]
        assert _sndi_ttl_nb(n) == sql_nb, (n, _sndi_ttl_nb(n), sql_nb)


# ------------------------- event-time (watermark) window (r12)
# VERDICT r11 #2: same mirror philosophy, wall-clock semantics — a pair
# emits iff same batch, or the earlier-batch member's event time is
# inside the window under the LAG-ONE watermark (max event time over
# strictly prior batches) at the later member's batch.


def _mirror_pairs_event(sched: dict, ttl_ts: int) -> dict:
    """Expected {(d1, d2): jaccard} for a {doc_id: (batch, lang, text, ts)}
    schedule under an event-time window with a lag-one watermark."""
    bmax: dict = {}
    for b, _, _, ts in sched.values():
        bmax[b] = max(bmax.get(b, float("-inf")), ts)
    wm, run = {}, float("-inf")
    for b in sorted(bmax):
        wm[b] = run
        run = max(run, bmax[b])
    out = {}
    ids = sorted(sched)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            b1, l1, t1, ts1 = sched[d1]
            b2, l2, t2, ts2 = sched[d2]
            if l1 != l2:
                continue
            if b1 != b2:
                ets_earlier = ts1 if b1 < b2 else ts2
                if not (ets_earlier > wm[max(b1, b2)] - ttl_ts):
                    continue
            s1, s2 = _shingles(t1), _shingles(t2)
            if not s1 or not s2:
                continue
            if not any(x == y for x, y in zip(_bands(t1), _bands(t2))):
                continue
            j = len(s1 & s2) / len(s1 | s2)
            if j >= 0.7:
                out[(d1, d2)] = j
    return out


def _run_ttl_event(spark, tmp_path, name, sched, ttl_ts, crash_plan=None,
                   restart_at=None):
    """Drive the event-time processor over a {doc_id: (batch, lang, text,
    ts)} schedule. restart_at=k builds a FRESH processor before batch k
    (exercising the watermark reconstruction from the member table);
    crash_plan has the same contract as _run_ttl."""
    base = tmp_path / name
    t = {
        "out": SnapshotTable(spark, str(base / "pairs")),
        "idx": SnapshotTable(spark, str(base / "idx")),
        "mem": SnapshotTable(spark, str(base / "mem")),
        "rp": SnapshotTable(spark, str(base / "rp")),
    }

    def make_proc():
        return _sndi_make_processor(
            spark, t["out"], t["idx"], t["mem"], t["rp"],
            16, 16, spark.sparkContext.defaultParallelism, app=name,
            ttl_ts=ttl_ts,
        )

    proc = make_proc()
    n_batches = max(b for b, _, _, _ in sched.values()) + 1
    for b in range(n_batches):
        if restart_at is not None and b == restart_at:
            proc = make_proc()
        rows = [
            (d, lang, text, ts)
            for d, (bb, lang, text, ts) in sched.items()
            if bb == b
        ]
        df = spark.createDataFrame(
            rows or [], "doc_id bigint, lang string, text string, ets bigint"
        )
        action = (crash_plan or {}).get(b, "ok")
        if action == "ok":
            proc(df, b)
        elif action == "replay":
            proc(df, b)
            proc(df, b)
        elif action.startswith("crash-"):
            victim = t[action.split("-", 1)[1]]
            orig = victim.append
            state = {"armed": True}

            def flaky(*a, **k):
                if state["armed"]:
                    state["armed"] = False
                    raise RuntimeError("injected append crash")
                return orig(*a, **k)

            victim.append = flaky
            with pytest.raises(RuntimeError, match="injected"):
                proc(df, b)
            victim.append = orig
            proc(df, b)
        else:  # pragma: no cover
            raise ValueError(action)
    if t["out"].version() is None:
        return {}, t
    got = {}
    for r in t["out"].read().select("d1", "d2", "jaccard").collect():
        key = (r[0], r[1])
        assert key not in got, f"duplicate pair emitted: {key}"
        got[key] = r[2]
    return got, t


_WHISKEY = _BASE + " whiskey"  # near-dup of both _BASE (0.947) and _NEAR (0.9)


def test_event_window_boundary(spark, tmp_path):
    """The event-time window must cut on TIME, not batch count: with
    ttl_ts=45, a 2-batch gap whose earlier member is time-stale
    (ts=10 vs watermark 60) must NOT pair while the 1-batch gap does."""
    sched = {
        1: (0, "en", _BASE, 10),
        2: (1, "en", _NEAR, 60),
        3: (2, "en", _WHISKEY, 120),
    }
    expected = _mirror_pairs_event(sched, ttl_ts=45)
    assert (1, 2) in expected and (2, 3) in expected
    assert (1, 3) not in expected  # 10 <= wm(2)=60 - 45: time-expired
    got, _ = _run_ttl_event(spark, tmp_path, "evt_bound", sched, ttl_ts=45)
    _assert_matches(got, expected)


def test_event_out_of_order_late_arrival(spark, tmp_path):
    """A doc arriving LATER than its event time + window (too late under
    the watermark) still pairs against live state in its own batch, but
    its state rows are dead on arrival: nothing in later batches may pair
    with it. The watermark itself must not regress either."""
    sched = {
        1: (0, "en", _BASE, 10),
        2: (1, "en", _NEAR, 60),
        3: (2, "en", _WHISKEY, 120),
        4: (3, "en", _BASE, 5),    # too late: wm(3)=120, 5 <= 120-45
        5: (4, "en", _BASE, 200),
    }
    expected = _mirror_pairs_event(sched, ttl_ts=45)
    # scenario sanity: the late doc pairs backward with the live doc 3
    # (ts=120 > wm(3)-45=75) but nothing pairs forward with it
    assert (3, 4) in expected and (4, 5) not in expected
    assert (1, 4) not in expected  # same content, earlier member expired
    assert (3, 5) in expected
    got, _ = _run_ttl_event(spark, tmp_path, "evt_late", sched, ttl_ts=45)
    _assert_matches(got, expected)


def test_event_refresh_and_dead_reintroduction(spark, tmp_path):
    """The r11 hazard schedules under event time: refresh-on-touch must
    re-stamp a touched group's horizon (keep-alive), and a dead content's
    re-arrival re-probes as new without double emission."""
    sched = {
        10: (0, "en", _BASE, 0),
        11: (1, "en", _BASE, 200),    # touch: horizon -> 200
        12: (2, "en", _NEAR, 300),    # wm=200: pairs with 11, not 10 (0<=50)
        13: (3, "en", _OTHER, 400),   # advances the watermark only
        24: (4, "en", _BASE, 500),    # wm=400: _BASE dead (0,200<=250),
                                      # re-probes as new, re-pairs with 12
    }
    expected = _mirror_pairs_event(sched, ttl_ts=150)
    assert (11, 12) in expected and (10, 12) not in expected
    assert (12, 24) in expected and (10, 24) not in expected
    assert (11, 24) not in expected and all(13 not in k for k in expected)
    got, _ = _run_ttl_event(spark, tmp_path, "evt_dead", sched, ttl_ts=150)
    _assert_matches(got, expected)


def test_event_crash_replay_and_restart(spark, tmp_path):
    """Exactly-once under event time: crash at each append point and a
    full replay converge; a FRESH processor mid-stream (watermark
    reconstructed from the member table's max stamp) changes nothing."""
    sched = {
        40: (0, "en", _BASE, 0),
        41: (1, "en", _BASE, 100),
        42: (2, "en", _NEAR, 200),
        43: (4, "en", _BASE, 400),
    }
    clean, _ = _run_ttl_event(spark, tmp_path, "evt_clean", sched, ttl_ts=150)
    assert clean  # non-trivial
    messy, _ = _run_ttl_event(
        spark, tmp_path, "evt_messy", sched, ttl_ts=150,
        crash_plan={0: "replay", 1: "crash-rp", 2: "crash-out", 4: "crash-idx"},
    )
    assert messy == clean
    restarted, _ = _run_ttl_event(
        spark, tmp_path, "evt_restart", sched, ttl_ts=150, restart_at=2
    )
    assert restarted == clean


def test_event_restart_watermark_from_tiny_doc(spark, tmp_path):
    """ADVICE r12 (medium): a TINY (<3-token) doc can carry the running
    max event time, but it never lands in the member table — a restarted
    processor that reconstructed the watermark from member stamps alone
    would under-read wm and resurrect expired state (emit pairs the
    semantics exclude). The per-batch sentinel row persists the
    full-batch max: a mid-stream restart must change nothing."""
    sched = {
        1: (0, "en", _BASE, 10),
        2: (1, "en", _NEAR, 60),
        3: (1, "en", "too tiny", 500),  # tiny doc holds the batch-1 max
        4: (2, "en", _WHISKEY, 400),
    }
    expected = _mirror_pairs_event(sched, ttl_ts=150)
    # scenario real: under wm(2)=500 both docs 1 and 2 are time-expired
    # (10, 60 <= 350) — a wm reconstructed from member stamps alone
    # (max 60) would leak both pairs
    assert (1, 2) in expected
    assert (1, 4) not in expected and (2, 4) not in expected
    got, _ = _run_ttl_event(
        spark, tmp_path, "evt_wm_tiny", sched, ttl_ts=150, restart_at=2
    )
    _assert_matches(got, expected)


def test_event_restart_watermark_from_all_tiny_batch(spark, tmp_path):
    """The all-tiny-batch variant of the same ADVICE r12 hazard: a batch
    with no >=3-token doc appends no member rows at all, yet its arrivals
    advance the watermark — the sentinel append (txn-keyed, replay-safe)
    must persist it across a restart."""
    sched = {
        1: (0, "en", _BASE, 10),
        2: (1, "en", "too tiny", 500),  # all-tiny batch carries the max
        3: (2, "en", _NEAR, 400),
        4: (2, "en", _WHISKEY, 420),
    }
    expected = _mirror_pairs_event(sched, ttl_ts=150)
    # doc 1 is expired under wm(2)=500 (10 <= 350); the batch-2 docs pair
    # with each other in-batch
    assert (3, 4) in expected
    assert (1, 3) not in expected and (1, 4) not in expected
    got, _ = _run_ttl_event(
        spark, tmp_path, "evt_wm_tinybatch", sched, ttl_ts=150, restart_at=2
    )
    _assert_matches(got, expected)
    # and a replay of the all-tiny batch is a txn no-op (not a double
    # sentinel / double advance)
    replayed, _ = _run_ttl_event(
        spark, tmp_path, "evt_wm_tinyreplay", sched, ttl_ts=150,
        crash_plan={1: "replay"},
    )
    assert replayed == got


def test_event_randomized_schedules_match_mirror(spark, tmp_path):
    """Seeded random schedules with random (possibly out-of-order) event
    times vs the mirror."""
    import random

    rng = random.Random(1208)
    pool = [_BASE, _NEAR, _WHISKEY, _OTHER, "too tiny"]
    for trial in range(2):
        ttl_ts = rng.choice([80, 150])
        sched, doc = {}, trial * 1000
        for b in range(6):
            for _ in range(rng.randint(0, 3)):
                sched[doc] = (b, "en", rng.choice(pool), rng.randint(0, 60 * b + 40))
                doc += 1
        if not sched:
            continue
        got, _ = _run_ttl_event(
            spark, tmp_path, f"evt_rand{trial}", sched, ttl_ts=ttl_ts
        )
        _assert_matches(got, _mirror_pairs_event(sched, ttl_ts))


def test_event_compaction_drops_expired_state(spark, tmp_path):
    """Bounded-window space under event time: expired rows are physically
    dropped once auto-compaction trips."""
    n, ttl_ts = 20, 250
    sched = {200 + b: (b, "en", _BASE, 100 * b) for b in range(n)}
    for b in range(n):
        sched[300 + b] = (b, "en", _NEAR, 100 * b + 50)
    got, t = _run_ttl_event(spark, tmp_path, "evt_expire", sched, ttl_ts=ttl_ts)
    _assert_matches(got, _mirror_pairs_event(sched, ttl_ts))
    mem = t["mem"].read().select("bid").collect()
    assert len(mem) < 2 * n, "compaction never dropped expired member rows"
    # the last compaction ran at some batch in [16, n): its watermark was
    # at least wm_16 = 100*15+50, so no stamp at or below wm_16 - ttl_ts
    # survives; loose bound (compaction timing varies with file layout)
    assert min(r[0] for r in mem) > 100 * (n - 1) + 50 - 3 * ttl_ts


def test_event_ttl_param_validation(spark):
    """ttl_ts must be a positive int; ttl and ttl_ts are exclusive."""
    for kw in ({"ttl_ts": 0}, {"ttl_ts": -5}, {"ttl_ts": 1.5},
               {"ttl": 2, "ttl_ts": 100},
               # ADVICE r13: bool is an int subclass — ttl=True must be
               # rejected, not run as a silent 1-batch window
               {"ttl": True}, {"ttl_ts": True}):
        with pytest.raises((ValueError, TypeError)):
            _sndi_make_processor(
                spark, None, None, None, None, 16, 16, 4, "app", **kw
            )


# ------------------------- static-index probe path under TTL (r12)
# Same window spec, second engine: `_snd_ttl_index_processor` is the raw
# per-doc probe-then-absorb loop (no collapse, the band index is the only
# state) — the SAME mirror applies verbatim, and the hazard schedules the
# incremental loop needed (refresh, dead re-introduction) double here as
# regression coverage that the raw path emits them right WITHOUT any of
# that machinery.


def _run_lsh_ttl(spark, tmp_path, name, sched, ttl, crash_plan=None):
    """Drive the static-index TTL processor over a {doc_id: (batch, lang,
    text)} schedule; same crash contract as _run_ttl ('crash-out',
    'crash-idx', 'replay')."""
    from cassabon_spark.queries.extensions import _snd_ttl_index_processor

    base = tmp_path / name
    t = {
        "out": SnapshotTable(spark, str(base / "pairs")),
        "idx": SnapshotTable(spark, str(base / "idx")),
    }
    proc = _snd_ttl_index_processor(
        spark, t["out"], t["idx"], 16,
        spark.sparkContext.defaultParallelism, app=name, ttl=ttl,
    )
    n_batches = max(b for b, _, _ in sched.values()) + 1
    for b in range(n_batches):
        rows = [
            (d, lang, text)
            for d, (bb, lang, text) in sched.items()
            if bb == b
        ]
        df = spark.createDataFrame(
            rows or [], "doc_id bigint, lang string, text string"
        )
        action = (crash_plan or {}).get(b, "ok")
        if action == "ok":
            proc(df, b)
        elif action == "replay":
            proc(df, b)
            proc(df, b)
        elif action.startswith("crash-"):
            victim = t[action.split("-", 1)[1]]
            orig = victim.append
            state = {"armed": True}

            def flaky(*a, **k):
                if state["armed"]:
                    state["armed"] = False
                    raise RuntimeError("injected append crash")
                return orig(*a, **k)

            victim.append = flaky
            with pytest.raises(RuntimeError, match="injected"):
                proc(df, b)
            victim.append = orig
            proc(df, b)
        else:  # pragma: no cover
            raise ValueError(action)
    if t["out"].version() is None:
        return {}, t
    got = {}
    for r in t["out"].read().select("d1", "d2", "jaccard").collect():
        key = (r[0], r[1])
        assert key not in got, f"duplicate pair emitted: {key}"
        got[key] = r[2]
    return got, t


def test_lsh_ttl_hazard_schedules_match_mirror(spark, tmp_path):
    """The incremental loop's crafted hazard schedules, replayed through
    the raw static-index processor: window expiry across re-arrivals of
    identical content must come out right with no refresh/dead machinery
    (each doc row expires individually)."""
    scheds = {
        "refresh": {10: (0, "en", _BASE), 11: (1, "en", _BASE), 12: (2, "en", _NEAR)},
        "dead": {20: (0, "en", _BASE), 21: (2, "en", _NEAR), 24: (4, "en", _BASE)},
        "e2hazard": {
            30: (0, "en", _BASE),
            31: (2, "en", _NEAR),
            34: (4, "en", _NEAR),
            35: (4, "en", _BASE),
        },
    }
    for name, sched in scheds.items():
        ttl = 2 if name == "refresh" else 3
        got, _ = _run_lsh_ttl(spark, tmp_path, f"lsh_{name}", sched, ttl=ttl)
        _assert_matches(got, _mirror_pairs(sched, ttl=ttl))


def test_lsh_ttl_mixed_corpus_and_randomized(spark, tmp_path):
    """Broad sweep + seeded random schedules vs the mirror (the same
    coverage style as the incremental loop's)."""
    import random

    sched = {}
    for b in range(6):
        sched[100 + b] = (b, "en", _BASE)
    sched[110] = (1, "en", _NEAR)
    sched[111] = (4, "en", _NEAR)
    sched[120] = (2, "en", _OTHER)
    sched[121] = (3, "en", "too tiny")
    sched[130] = (2, "fr", _BASE)
    got, _ = _run_lsh_ttl(spark, tmp_path, "lsh_mixed", sched, ttl=3)
    _assert_matches(got, _mirror_pairs(sched, ttl=3))

    rng = random.Random(1207)
    pool = [_BASE, _NEAR, _BASE + " whiskey", _OTHER, "too tiny"]
    for trial in range(2):
        ttl = rng.choice([2, 3])
        rs, doc = {}, trial * 1000
        for b in range(7):
            for _ in range(rng.randint(0, 3)):
                rs[doc] = (b, "en", rng.choice(pool))
                doc += 1
        if not rs:
            continue
        got, _ = _run_lsh_ttl(spark, tmp_path, f"lsh_rand{trial}", rs, ttl=ttl)
        _assert_matches(got, _mirror_pairs(rs, ttl))


def test_lsh_ttl_crash_replay_matrix(spark, tmp_path):
    """Exactly-once for the static-index TTL loop: replay and a crash at
    each append point converge to the clean run's pair set."""
    sched = {
        40: (0, "en", _BASE),
        41: (1, "en", _BASE),
        42: (2, "en", _NEAR),
        43: (4, "en", _BASE),
    }
    clean, _ = _run_lsh_ttl(spark, tmp_path, "lsh_clean", sched, ttl=2)
    assert clean  # non-trivial
    for i, plan in enumerate(
        [{0: "replay", 2: "crash-out"}, {1: "crash-idx", 4: "replay"}]
    ):
        messy, _ = _run_lsh_ttl(
            spark, tmp_path, f"lsh_messy{i}", sched, ttl=2, crash_plan=plan
        )
        assert messy == clean


def test_lsh_ttl_compaction_drops_expired_index(spark, tmp_path):
    """Bounded-window space for the static-index loop: a content arriving
    every batch accumulates index files until auto-compaction trips, and
    the rewrite physically drops rows outside the bid window."""
    n, ttl = 20, 3
    sched = {200 + b: (b, "en", _BASE) for b in range(n)}
    for b in range(n):
        sched[300 + b] = (b, "en", _NEAR)
    got, t = _run_lsh_ttl(spark, tmp_path, "lsh_expire", sched, ttl=ttl)
    _assert_matches(got, _mirror_pairs(sched, ttl=ttl))
    idx = t["idx"].read().select("bid").collect()
    assert len(idx) < 2 * n * 4, "compaction never dropped expired index rows"
    assert min(r[0] for r in idx) > n - 1 - 2 * ttl
    per_part: dict = {}
    for f in t["idx"].snapshot()["files"]:
        key = tuple(sorted(f["partition"].items()))
        per_part[key] = per_part.get(key, 0) + 1
    assert max(per_part.values()) <= 17, per_part


# ------------------- static-index probe path, EVENT-TIME window (r13)
# VERDICT r12 #2: the same event mirror, third engine — the raw per-doc
# probe loop windowed by watermark instead of batch count. No collapse,
# so the mirror's doc-level predicate applies verbatim.


def _run_lsh_ttl_event(spark, tmp_path, name, sched, ttl_ts, crash_plan=None,
                       restart_at=None):
    """Drive the static-index EVENT-TIME processor over a {doc_id:
    (batch, lang, text, ts)} schedule; same crash/restart contract as
    _run_ttl_event ('crash-out', 'crash-idx', 'replay', restart_at)."""
    from cassabon_spark.queries.extensions import _snd_ttl_index_processor

    base = tmp_path / name
    t = {
        "out": SnapshotTable(spark, str(base / "pairs")),
        "idx": SnapshotTable(spark, str(base / "idx")),
    }

    def make_proc():
        return _snd_ttl_index_processor(
            spark, t["out"], t["idx"], 16,
            spark.sparkContext.defaultParallelism, app=name, ttl_ts=ttl_ts,
        )

    proc = make_proc()
    n_batches = max(b for b, _, _, _ in sched.values()) + 1
    for b in range(n_batches):
        if restart_at is not None and b == restart_at:
            proc = make_proc()
        rows = [
            (d, lang, text, ts)
            for d, (bb, lang, text, ts) in sched.items()
            if bb == b
        ]
        df = spark.createDataFrame(
            rows or [], "doc_id bigint, lang string, text string, ets bigint"
        )
        action = (crash_plan or {}).get(b, "ok")
        if action == "ok":
            proc(df, b)
        elif action == "replay":
            proc(df, b)
            proc(df, b)
        elif action.startswith("crash-"):
            victim = t[action.split("-", 1)[1]]
            orig = victim.append
            state = {"armed": True}

            def flaky(*a, **k):
                if state["armed"]:
                    state["armed"] = False
                    raise RuntimeError("injected append crash")
                return orig(*a, **k)

            victim.append = flaky
            with pytest.raises(RuntimeError, match="injected"):
                proc(df, b)
            victim.append = orig
            proc(df, b)
        else:  # pragma: no cover
            raise ValueError(action)
    if t["out"].version() is None:
        return {}, t
    got = {}
    for r in t["out"].read().select("d1", "d2", "jaccard").collect():
        key = (r[0], r[1])
        assert key not in got, f"duplicate pair emitted: {key}"
        got[key] = r[2]
    return got, t


def test_lsh_ttl_event_window_and_late_arrivals(spark, tmp_path):
    """The incremental loop's event-boundary and late-arrival schedules,
    replayed through the raw static-index processor: the window must cut
    on TIME (not batch count) and a too-late doc pairs backward but is
    dead on arrival forward."""
    bound = {
        1: (0, "en", _BASE, 10),
        2: (1, "en", _NEAR, 60),
        3: (2, "en", _WHISKEY, 120),
    }
    expected = _mirror_pairs_event(bound, ttl_ts=45)
    assert (1, 2) in expected and (2, 3) in expected and (1, 3) not in expected
    got, _ = _run_lsh_ttl_event(spark, tmp_path, "levt_bound", bound, ttl_ts=45)
    _assert_matches(got, expected)

    late = {
        1: (0, "en", _BASE, 10),
        2: (1, "en", _NEAR, 60),
        3: (2, "en", _WHISKEY, 120),
        4: (3, "en", _BASE, 5),    # too late: wm(3)=120, 5 <= 120-45
        5: (4, "en", _BASE, 200),
    }
    expected = _mirror_pairs_event(late, ttl_ts=45)
    assert (3, 4) in expected and (4, 5) not in expected
    got, _ = _run_lsh_ttl_event(spark, tmp_path, "levt_late", late, ttl_ts=45)
    _assert_matches(got, expected)


def test_lsh_ttl_event_restart_watermark_from_tiny_doc(spark, tmp_path):
    """The ADVICE r12 watermark-reconstruction hazard, on the raw path:
    tiny docs never reach the band index, so without the sentinel a
    restart would under-read wm from index stamps alone and resurrect
    expired rows. Covers both the tiny-doc-in-batch and the all-tiny-
    batch carrier."""
    sched = {
        1: (0, "en", _BASE, 10),
        2: (1, "en", _NEAR, 60),
        3: (1, "en", "too tiny", 500),  # tiny doc holds the batch-1 max
        4: (2, "en", _WHISKEY, 400),
    }
    expected = _mirror_pairs_event(sched, ttl_ts=150)
    assert (1, 2) in expected
    assert (1, 4) not in expected and (2, 4) not in expected
    got, _ = _run_lsh_ttl_event(
        spark, tmp_path, "levt_wm_tiny", sched, ttl_ts=150, restart_at=2
    )
    _assert_matches(got, expected)

    allt = {
        1: (0, "en", _BASE, 10),
        2: (1, "en", "too tiny", 500),  # all-tiny batch carries the max
        3: (2, "en", _NEAR, 400),
        4: (2, "en", _WHISKEY, 420),
    }
    expected = _mirror_pairs_event(allt, ttl_ts=150)
    assert (3, 4) in expected
    assert (1, 3) not in expected and (1, 4) not in expected
    got, _ = _run_lsh_ttl_event(
        spark, tmp_path, "levt_wm_tinybatch", allt, ttl_ts=150, restart_at=2
    )
    _assert_matches(got, expected)


def test_lsh_ttl_event_crash_replay_and_randomized(spark, tmp_path):
    """Exactly-once for the raw event-time loop (replay + crash at each
    append point converge, mid-stream restart changes nothing), plus
    seeded random schedules with out-of-order event times vs the mirror."""
    import random

    sched = {
        40: (0, "en", _BASE, 0),
        41: (1, "en", _BASE, 100),
        42: (2, "en", _NEAR, 200),
        43: (4, "en", _BASE, 400),
    }
    clean, _ = _run_lsh_ttl_event(
        spark, tmp_path, "levt_clean", sched, ttl_ts=150
    )
    assert clean  # non-trivial
    messy, _ = _run_lsh_ttl_event(
        spark, tmp_path, "levt_messy", sched, ttl_ts=150,
        crash_plan={0: "replay", 1: "crash-idx", 2: "crash-out"},
    )
    assert messy == clean
    restarted, _ = _run_lsh_ttl_event(
        spark, tmp_path, "levt_restart", sched, ttl_ts=150, restart_at=2
    )
    assert restarted == clean

    rng = random.Random(1306)
    pool = [_BASE, _NEAR, _WHISKEY, _OTHER, "too tiny"]
    for trial in range(2):
        ttl_ts = rng.choice([80, 150])
        rs, doc = {}, trial * 1000
        for b in range(6):
            for _ in range(rng.randint(0, 3)):
                rs[doc] = (b, "en", rng.choice(pool), rng.randint(0, 60 * b + 40))
                doc += 1
        if not rs:
            continue
        got, _ = _run_lsh_ttl_event(
            spark, tmp_path, f"levt_rand{trial}", rs, ttl_ts=ttl_ts
        )
        _assert_matches(got, _mirror_pairs_event(rs, ttl_ts))


def test_lsh_ttl_event_compaction_drops_expired_index(spark, tmp_path):
    """Bounded-window space for the raw event-time loop: expired index
    rows (and expired watermark sentinels) are physically dropped once
    auto-compaction trips; the newest sentinel always survives."""
    n, ttl_ts = 20, 250
    sched = {200 + b: (b, "en", _BASE, 100 * b) for b in range(n)}
    for b in range(n):
        sched[300 + b] = (b, "en", _NEAR, 100 * b + 50)
    got, t = _run_lsh_ttl_event(
        spark, tmp_path, "levt_expire", sched, ttl_ts=ttl_ts
    )
    _assert_matches(got, _mirror_pairs_event(sched, ttl_ts))
    idx = t["idx"].read().select("bid").collect()
    # 2 docs x 4 band rows + 1 sentinel per batch appended; compaction
    # must have dropped expired rows
    assert len(idx) < n * 9, "compaction never dropped expired index rows"
    assert min(r[0] for r in idx) > 100 * (n - 1) + 50 - 3 * ttl_ts
    # the max-stamp sentinel survives (watermark reconstruction intact)
    assert max(r[0] for r in idx) == 100 * (n - 1) + 50


def test_lsh_ttl_param_validation(spark):
    """Exactly one of ttl / ttl_ts, both positive ints."""
    from cassabon_spark.queries.extensions import _snd_ttl_index_processor

    for kw in ({}, {"ttl": 0}, {"ttl_ts": 0}, {"ttl_ts": -5},
               {"ttl": 1.5}, {"ttl": 2, "ttl_ts": 100},
               {"ttl": True}, {"ttl_ts": True}):  # ADVICE r13: bool rejected
        with pytest.raises((ValueError, TypeError)):
            _snd_ttl_index_processor(spark, None, None, 16, 4, "app", **kw)


def test_ttl_randomized_schedules_match_mirror(spark, tmp_path):
    """Seeded random batch schedules (contents drawn from a small pool of
    identical/near-dup/unrelated texts, batches with gaps) must match the
    independent mirror — randomized coverage beyond the crafted hazard
    scenarios."""
    import random

    rng = random.Random(1107)
    pool = [_BASE, _NEAR, _BASE + " whiskey", _OTHER, "too tiny"]
    for trial in range(3):
        ttl = rng.choice([2, 3])
        sched = {}
        doc = trial * 1000
        for b in range(7):
            for _ in range(rng.randint(0, 3)):
                sched[doc] = (b, "en", rng.choice(pool))
                doc += 1
        if not sched:
            continue
        got, _ = _run_ttl(spark, tmp_path, f"rand{trial}", sched, ttl=ttl)
        _assert_matches(got, _mirror_pairs(sched, ttl))
