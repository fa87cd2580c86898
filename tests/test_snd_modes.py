"""streaming_neardup_lsh hybrid static-index modes (r9, VERDICT r8 #1).

The entry auto-selects between the cached band frame (index below
_SND_CACHED_MAX_BAND_ROWS — every shipped SF) and the pk-partitioned
on-disk index whose per-batch scan is pruned to the batch's own band-key
partitions (the 100 TB path). Because auto mode resolves to `cached` at
every shipped scale factor, the PRUNED path would be gate-dead code
without these tests (the ADVICE r8 #2 lesson from the quantizer's
two-level branch): force each mode and pin

  (a) pruned == cached pair sets on the same corpus,
  (b) pruned mode exact against the entry's own DuckDB oracle,
  (c) pruned mode invariant to microbatch slicing,
  (d) the corpus-scaled n_pk arithmetic.

tools/snd_perbatch.py measures the scale claim itself (per-batch cost
flat across 1x/10x/100x indexes); SCALE_r09.md records it.
"""

from __future__ import annotations

import pytest

from cassabon_spark.queries import extensions as ext
from cassabon_spark.queries import load_registry

SF = "/root/testdata/sf0.001"


@pytest.fixture
def forced_mode():
    def _set(mode):
        ext._SND_MODE[0] = mode

    yield _set
    ext._SND_MODE[0] = None


def _pairs(spark, sf=SF):
    df = load_registry()["streaming_neardup_lsh"].fn(spark, sf)
    return sorted(tuple(r) for r in df.collect())


def test_pruned_equals_cached(spark, forced_mode):
    forced_mode("pruned")
    pruned = _pairs(spark)
    forced_mode("cached")
    cached = _pairs(spark)
    assert pruned == cached
    assert len(pruned) > 0


def test_pruned_matches_oracle(spark, forced_mode):
    import duckdb

    forced_mode("pruned")
    got = _pairs(spark)
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = sorted(tuple(r) for r in con.execute(
        load_registry()["streaming_neardup_lsh"].sql
    ).fetchall())
    con.close()
    assert got == want


@pytest.mark.slow  # r15 tiering: multi-stream / multi-schedule
def test_pruned_slicing_invariance(spark, forced_mode):
    forced_mode("pruned")
    results = []
    for files_per_trigger in (1, 8):
        ext._STREAM_FILES_PER_TRIGGER[0] = files_per_trigger
        try:
            results.append(_pairs(spark))
        finally:
            ext._STREAM_FILES_PER_TRIGGER[0] = 2
    assert results[0] == results[1] and len(results[0]) > 0


@pytest.mark.slow  # r15 tiering: multi-stream / multi-schedule
def test_incremental_entry_slicing_invariance(spark):
    # the full probe-then-absorb loop must emit the SAME pair set under
    # any microbatch slicing (each unordered pair emits exactly once,
    # when its later-arriving member arrives) — and equal the static-
    # index entry's set (both reproduce the batch _MINHASH_SQL pairs)
    results = []
    for files_per_trigger in (1, 8):
        ext._STREAM_FILES_PER_TRIGGER[0] = files_per_trigger
        try:
            df = load_registry()["streaming_neardup_incremental"].fn(spark, SF)
            results.append(sorted(tuple(r) for r in df.collect()))
        finally:
            ext._STREAM_FILES_PER_TRIGGER[0] = 2
    assert results[0] == results[1] and len(results[0]) > 0
    assert results[0] == _pairs(spark)


@pytest.mark.slow  # r15 tiering: multi-stream / multi-schedule
def test_incremental_index_append(spark, tmp_path):
    # the production loop's second half (probe, then ABSORB): an index
    # built on corpus A then appended with batch B must probe identically
    # to an index built on A ∪ B in one shot, and the append must touch
    # only B's own pk partitions (cost bounded by the batch, not the
    # index)
    import os

    from pyspark.sql import functions as F

    from cassabon_spark.sources.snapshot import SnapshotTable

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    a = docs.filter(F.col("doc_id") % 3 != 0)
    b = docs.filter(F.col("doc_id") % 3 == 0)
    n_pk = ext._snd_n_pk(docs.count())
    inc_dir = str(tmp_path / "inc")
    full_dir = str(tmp_path / "full")
    ext._snd_build_index(a, inc_dir, n_pk)
    before = {d for d in os.listdir(inc_dir) if d.startswith("pk=")}
    ext._snd_append_index(b, inc_dir, n_pk)
    after = {d for d in os.listdir(inc_dir) if d.startswith("pk=")}
    ext._snd_build_index(docs, full_dir, n_pk)

    # identical index contents (band-row level), not just pair-level —
    # read through the snapshot MANIFEST (r10 carrier): the manifest is
    # the index's source of truth, not the directory tree
    cols = ["doc_id", "band", "bkey", "pk"]
    inc_rows = sorted(
        map(tuple, SnapshotTable(spark, inc_dir).read().select(*cols).collect())
    )
    full_rows = sorted(
        map(tuple, SnapshotTable(spark, full_dir).read().select(*cols).collect())
    )
    assert inc_rows == full_rows and len(inc_rows) > 0
    # the append flipped exactly one new manifest version (build=v0, append=v1)
    assert SnapshotTable(spark, inc_dir).version() == 1

    # identical probe output for a fresh arrival batch
    probe = docs.filter(F.col("doc_id") % 7 == 1)
    width = spark.sparkContext.defaultParallelism
    out = {}
    for label, idx in (("inc", inc_dir), ("full", full_dir)):
        got = []
        ext._snd_probe_batch(
            spark, probe, idx, n_pk, width,
            sink=lambda p: got.extend(tuple(r) for r in p.collect()),
        )
        out[label] = sorted(got)
    assert out["inc"] == out["full"]

    # append touched only B's own pk partitions: every NEW partition dir
    # must hash from B's band keys, and B's band keys' dirs all exist
    b_pks = {
        f"pk={r[0]}"
        for r in ext._snd_band_frame(b, width=width)
        .select(F.pmod(F.xxhash64("bkey"), F.lit(n_pk)).cast("int").alias("pk"))
        .distinct()
        .collect()
    }
    assert after - before <= b_pks
    assert b_pks <= after


def test_n_pk_scaling():
    # corpus-scaled partition count: ~constant rows per partition, floor 16
    n_bands = ext._N_HASHES // ext._BAND_W
    assert ext._snd_n_pk(0) == 16
    assert ext._snd_n_pk(5_000) == max(
        16, -(-5_000 * n_bands // ext._SND_ROWS_PER_PK)
    )
    big = ext._snd_n_pk(10**9)
    assert big * ext._SND_ROWS_PER_PK >= 10**9 * n_bands
    assert (big - 1) * ext._SND_ROWS_PER_PK < 10**9 * n_bands + ext._SND_ROWS_PER_PK


@pytest.mark.slow  # r15 tiering: multi-stream / multi-schedule
def test_incremental_state_tables_bounded(spark, tmp_path):
    """Band-index lifecycle (VERDICT r9 #3): under unbounded streaming
    appends, the per-batch auto_compact cadence the incremental entry
    wires must bound BOTH the per-partition file count (threshold-
    triggered rewrite) and the manifest count (vacuum retain window) —
    the ingest sink's 20-microbatch bounded-file test, matched for the
    near-dup state tables."""
    from pyspark.sql import functions as F

    from cassabon_spark.sources.snapshot import SnapshotTable

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    tbl = SnapshotTable(spark, str(tmp_path / "idx"))
    n_pk = 8
    width = spark.sparkContext.defaultParallelism
    for b in range(20):
        batch = docs.filter(F.col("doc_id") % 20 == b)
        bands = ext._snd_band_frame(batch, width=width).withColumn(
            "pk", F.pmod(F.xxhash64("bkey"), F.lit(n_pk)).cast("int")
        )
        tbl.append(
            bands.repartition(min(n_pk, 8 * width), "pk"),
            partition_cols=("pk",),
            txn=("t", b),
        )
        tbl.auto_compact(lambda d: d.coalesce(1), partition_cols=("pk",))
    snap = tbl.snapshot()
    per_part: dict = {}
    for f in snap["files"]:
        pk = f["partition"]["pk"]
        per_part[pk] = per_part.get(pk, 0) + 1
    # threshold 16 + at most a few post-compaction appends per partition
    assert max(per_part.values()) <= 17
    # manifests pruned to the retain window: 20 appends + the compaction
    # commits total well over 20 manifests without the vacuum; retained =
    # retain window (16) + commits since the last compaction-triggered
    # vacuum (a handful)
    assert len(tbl.versions()) <= 20
    # and the table still reads back complete
    n_bands = ext._N_HASHES // ext._BAND_W
    expect = (
        docs.filter(F.size(F.split("text", " ")) >= 3).count()
    )
    assert tbl.read().select("doc_id").distinct().count() <= docs.count()
    assert tbl.read().count() > 0 and tbl.read().count() % n_bands == 0


# ------------------------------------------------- replay / crash semantics


def _sndi_tables(spark, base):
    from cassabon_spark.sources.snapshot import SnapshotTable

    return {
        "out": SnapshotTable(spark, str(base / "pairs")),
        "idx": SnapshotTable(spark, str(base / "idx")),
        "mem": SnapshotTable(spark, str(base / "mem")),
        "rp": SnapshotTable(spark, str(base / "rp")),
    }


def _sndi_corpus_batches(spark):
    """sf0.001 docs UNION an exact-content copy shifted by +10000 doc_ids:
    10000 % 3 == 1, so every copy lands in a DIFFERENT batch than its
    original — the cross-batch same-content path (collapse + member
    expansion) is exercised, not just the near-dup path."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    copy = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "lang", "text"
    )
    corpus = docs.unionByName(copy)
    return [corpus.filter(F.col("doc_id") % 3 == i) for i in range(3)]


def _sndi_run(spark, tmp_path, name, schedule):
    """Run the incremental processor over the 3-batch corpus under a
    (batch_index, action) schedule and return the four state tables'
    sorted contents. action: 'ok' | 'replay' (process twice) |
    'crash-idx' / 'crash-mem' / 'crash-out' (inject one append failure,
    then replay the batch — the foreachBatch retry contract)."""
    import pytest as _pytest

    from cassabon_spark.queries.extensions import (
        _snd_n_ckpk,
        _snd_n_pk,
        _sndi_make_processor,
    )

    batches = _sndi_corpus_batches(spark)
    n_docs = sum(b.count() for b in batches)
    t = _sndi_tables(spark, tmp_path / name)
    proc = _sndi_make_processor(
        spark,
        t["out"],
        t["idx"],
        t["mem"],
        t["rp"],
        _snd_n_pk(n_docs),
        _snd_n_ckpk(n_docs),
        spark.sparkContext.defaultParallelism,
        app=name,
    )
    for i, action in schedule:
        if action == "ok":
            proc(batches[i], i)
        elif action == "replay":
            proc(batches[i], i)
            proc(batches[i], i)  # checkpoint replay after full success
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
            with _pytest.raises(RuntimeError, match="injected"):
                proc(batches[i], i)
            victim.append = orig
            proc(batches[i], i)  # the retry/replay
        else:  # pragma: no cover
            raise ValueError(action)

    def rows(tbl, cols):
        if tbl.version() is None:
            return []
        return sorted(map(tuple, tbl.read().select(*cols).collect()))

    from pyspark.sql import functions as F

    return {
        "pairs": rows(t["out"], ["d1", "d2", "jaccard"]),
        "mem": rows(t["mem"], ["ck", "doc_id"]),
        "idx": rows(t["idx"], ["doc_id", "band", "bkey", "pk"]),
        "rp": (
            []
            if t["rp"].version() is None
            else sorted(
                map(
                    tuple,
                    t["rp"]
                    .read()
                    .select("cka", "ckb", F.round("jraw", 6).alias("j"))
                    .collect(),
                )
            )
        ),
    }


@pytest.mark.slow  # r15 tiering: multi-stream / multi-schedule
def test_incremental_replay_and_partial_crash(spark, tmp_path):
    """The exactly-once contract, EXECUTED (r10): a fully-replayed batch
    and a batch whose append sequence crashes between any two txn-keyed
    appends must both converge to the clean run's exact state on retry —
    the dependency-ordered appends (pairs -> rep_pairs -> idx -> members)
    guarantee every polluted recomputation only feeds already-committed
    (no-op) appends. Each crash point is injected for a DIFFERENT batch
    so one run covers: full replay (b0), crash before any commit (b1
    pairs append), crash mid-sequence (b2 idx append, replayed with
    rep_pairs already committed — the scenario where the probe reads the
    batch's own rep pairs back as 'old')."""
    clean = _sndi_run(
        spark, tmp_path, "clean", [(0, "ok"), (1, "ok"), (2, "ok")]
    )
    assert len(clean["pairs"]) > 0 and len(clean["mem"]) > 0
    messy = _sndi_run(
        spark,
        tmp_path,
        "messy",
        [(0, "replay"), (1, "crash-out"), (2, "crash-idx")],
    )
    assert messy == clean
    messy2 = _sndi_run(spark, tmp_path, "messy2", [(0, "crash-mem"), (1, "ok"), (2, "crash-rp")])
    assert messy2 == clean
