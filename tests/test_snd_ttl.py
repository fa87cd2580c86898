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
