"""The 100 TB carrier for the streaming near-dup band index: file-stats
skipping on the snapshot table (r9).

SCALE_r09.md records that the pruned mode's per-batch TASK time is flat
across a 1x/10x/100x index but the 100x per-batch WALL is driver-bound on
LISTING ~4k literal pk directories — and claims the same bounded IN-list
pruning maps onto per-FILE min/max stats skipping in a real table layout
(sources/snapshot.py), which prunes at row-group granularity without a
directory explosion. This test makes that claim executable:

  - band rows land in a SnapshotTable range-clustered on
    bknum = xxhash64(bkey) (footer min/max stats harvested at append,
    zero extra scan — the Delta/Iceberg stats model);
  - a probe batch's band-key set prunes the FILE LIST driver-side from
    the few-KB manifest (union of files_for(prune=[('bknum','=',k)])
    over the batch's keys — OR-of-equalities, each a superset guarantee);
  - the pruned slice must (a) actually skip files and (b) produce
    EXACTLY the same probe rows and verified pairs as the full index.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassabon_spark.queries import extensions as ext
from cassabon_spark.sources.snapshot import SnapshotTable
import pytest

# r15 test tiering (VERDICT r14 #2): 64-file stats-skipping index builds + probe streams.
# Excluded from the default verify tier; run with -m slow.
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"
N_FILES = 64


def _bands(spark, df):
    width = spark.sparkContext.defaultParallelism
    return ext._snd_band_frame(df, width=width).withColumn(
        "bknum", F.xxhash64("bkey")
    )


def test_band_index_stats_skipping(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    tbl = SnapshotTable(spark, str(tmp_path / "bandidx"))
    # range-cluster on the probe key so each file's (min, max) bknum
    # envelope is narrow — the layout OPTIMIZE ZORDER would maintain
    clustered = (
        _bands(spark, docs)
        .repartitionByRange(N_FILES, "bknum")
        .sortWithinPartitions("bknum")
    )
    tbl.append(clustered)
    all_files = tbl.files_for()
    assert len(all_files) > 4  # enough files for skipping to mean something

    # a SMALL drop (the production shape: batch keys << file count —
    # skipping is exactly the regime where the index dwarfs any batch),
    # seeded with a few docs KNOWN to have older near-dups so the
    # end-to-end pair check below is non-vacuous
    from cassabon_spark.queries import load_registry

    dup_ids = [
        r.d2
        for r in load_registry()["dedup_minhash_lsh"].fn(spark, SF).limit(3).collect()
    ]
    assert dup_ids
    batch = docs.filter(
        (F.col("doc_id") % 101 == 1) | F.col("doc_id").isin(dup_ids)
    )
    keys = [
        r[0]
        for r in _bands(spark, batch).select("bknum").distinct().collect()
    ]
    assert keys
    # OR-of-equalities pruning: a file survives if ANY probe key may hit
    pruned = {}
    for k in keys:
        for f in tbl.files_for(prune=[("bknum", "=", k)]):
            pruned[f["path"]] = f
    assert 0 < len(pruned) < len(all_files)  # skipping actually happened

    full_rows = (
        tbl.read()
        .filter(F.col("bknum").isin(keys))
        .select("doc_id", "band", "bkey")
    )
    pruned_rows = (
        tbl.read_files(list(pruned.values()))
        .filter(F.col("bknum").isin(keys))
        .select("doc_id", "band", "bkey")
    )
    assert sorted(map(tuple, pruned_rows.collect())) == sorted(
        map(tuple, full_rows.collect())
    )

    # end-to-end: verified pairs from the pruned slice == from the full
    # table (the slice is a superset of every row the join can touch)
    arr = _bands(spark, batch)
    want = sorted(
        tuple(r) for r in ext._snd_pairs(arr, tbl.read()).collect()
    )
    got = sorted(
        tuple(r)
        for r in ext._snd_pairs(arr, tbl.read_files(list(pruned.values()))).collect()
    )
    assert got == want and len(got) > 0
