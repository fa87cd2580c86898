"""r11 entry-level semantic tests (beyond the oracle gate).

The band-ablation collapse path (VERDICT r10 #4): on a corpus that trips
the content-collapse threshold, the entry computes every count at the
content-representative level and recovers member-level numbers by
expansion arithmetic — these tests pin that against (a) the entry's own
member-level DuckDB oracle run on the same corpus, and (b) hand-computed
dup-farm counts.
"""

from __future__ import annotations

import duckdb
import pytest

from cassabon_spark.queries import load_registry
from cassabon_spark.queries.extensions import _minhash_pair_frames


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _farm_corpus():
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    rows = [(i, base, "en", "s", 0) for i in range(120)]  # trips collapse
    rows.append((200, near, "en", "s", 0))
    rows += [
        (300 + j, " ".join(f"u{j}x{i}" for i in range(30)), "en", "s", 0)
        for j in range(5)
    ]
    rows += [(500, "hi there", "en", "s", 0)]  # shingle-less
    return rows


def test_band_ablation_collapse_matches_member_level_oracle(spark, tmp_path):
    """Collapse-mode counts == the member-level DuckDB oracle on a
    dup-farm corpus (the expansion-arithmetic equivalence, executed)."""
    _write_docs(spark, tmp_path, _farm_corpus())
    reg = load_registry()["dedup_lsh_band_ablation"]
    got = {
        (r["n_bands"], r["rows_per_band"]): r.asDict()
        for r in reg.fn(spark, str(tmp_path)).collect()
    }
    # the collapse path must actually be the one under test
    assert _minhash_pair_frames(spark, str(tmp_path))["collapse"] is True

    con = duckdb.connect()
    # Spark writes a part-file directory, unlike the driver's single files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    cols = None
    for row in con.execute(reg.sql).fetchall():
        cols = cols or [d[0] for d in con.description]
        d = dict(zip(cols, row))
        g = got[(d["n_bands"], d["rows_per_band"])]
        for k in ("n_candidates", "n_truth", "n_hits"):
            assert g[k] == d[k], (d["n_bands"], d["rows_per_band"], k, g[k], d[k])
        for k in ("recall", "precision", "s_curve_at_07"):
            assert abs(g[k] - d[k]) < 1e-9, (k, g[k], d[k])
    assert cols is not None and len(got) == 3

    # hand checks: the 120-farm contributes C(120,2) to every config's
    # candidates/truth/hits; the near doc adds 120 truth pairs; the
    # shingle-less doc adds nothing
    farm = 120 * 119 // 2
    for cfg, g in got.items():
        assert g["n_candidates"] >= farm
        assert g["n_truth"] >= farm + 120
        assert g["n_hits"] >= farm


def test_minhash_memo_exposes_signature_stages(spark, tmp_path):
    """VERDICT r10 #5: both memo paths carry the sh/mh signature frames
    so the ablation (and future banding consumers) reuse one build."""
    # collapse path
    _write_docs(spark, tmp_path, _farm_corpus())
    fr = _minhash_pair_frames(spark, str(tmp_path))
    assert fr["collapse"] and fr["sh"] is not None and fr["mh"] is not None
    # r14: the per-doc shingle-set size `n` is fused into the signature
    # aggregation (one less full scan of sh in the verify stage)
    assert set(fr["mh"].columns) == {"doc_id", "lang", "n"} | {
        f"h{i}" for i in range(8)
    }
    # direct path (tiny unique corpus)
    rows = [
        (j, " ".join(f"d{j}t{i}" for i in range(20)), "en", "s", 0)
        for j in range(30)
    ]
    _write_docs(spark, tmp_path / "direct", rows)
    fr2 = _minhash_pair_frames(spark, str(tmp_path / "direct"))
    assert not fr2["collapse"]
    assert fr2["sh"] is not None and fr2["mh"] is not None


@pytest.mark.slow  # r15 tiering: two full normalized incremental streams (~90 s)
def test_normalized_entry_slicing_invariance(spark):
    """VERDICT r10 #2 done-criterion: the normalized incremental loop must
    emit the same pair set under any microbatch slicing (the collapse key
    and signatures are functions of normalized content alone, so the
    slicing argument of the raw entry transfers verbatim)."""
    from cassabon_spark.queries import extensions as ext

    results = []
    for files_per_trigger in (1, 8):
        ext._STREAM_FILES_PER_TRIGGER[0] = files_per_trigger
        try:
            df = load_registry()["streaming_neardup_normalized"].fn(
                spark, "/root/testdata/sf0.001"
            )
            results.append(sorted(tuple(r) for r in df.collect()))
        finally:
            ext._STREAM_FILES_PER_TRIGGER[0] = 2
    assert results[0] == results[1] and len(results[0]) > 0
