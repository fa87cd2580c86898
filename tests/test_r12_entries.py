"""r12 entry-level semantic tests (beyond the oracle gate).

Pins the two ADVICE r11 correctness edges:
  * band ablation, collapse mode, EMPTY rep-level candidate set — every
    (bands, rows) config must still emit a row (within-group pairs are
    candidates under every config), matching the member-level DuckDB
    oracle on the same corpus.
  * _sndi_make_processor rejects ttl=0 loudly instead of silently
    treating it as unbounded.
"""

from __future__ import annotations

import duckdb
import pytest

from cassabon_spark.queries import load_registry
from cassabon_spark.queries.extensions import (
    _minhash_pair_frames,
    _sndi_make_processor,
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_band_ablation_emits_all_configs_on_empty_rep_candidates(
    spark, tmp_path
):
    """ADVICE r11 (medium): a corpus that trips collapse but has ZERO
    cross-rep candidate pairs (one 100-copy farm + shingle-less uniques:
    only ONE content is ever banded, so the rep-level self-join is empty
    by construction) must still emit one row per config with
    n_candidates = n_hits = n_truth = C(100, 2), exactly like the
    member-level oracle."""
    base = " ".join(f"w{i}" for i in range(40))
    rows = [(i, base, "en", "s", 0) for i in range(100)]
    rows += [(200 + j, f"hi {j}", "en", "s", 0) for j in range(5)]  # < 3 tokens
    _write_docs(spark, tmp_path, rows)
    assert _minhash_pair_frames(spark, str(tmp_path))["collapse"] is True

    reg = load_registry()["dedup_lsh_band_ablation"]
    got = {
        (r["n_bands"], r["rows_per_band"]): r.asDict()
        for r in reg.fn(spark, str(tmp_path)).collect()
    }
    farm = 100 * 99 // 2
    assert len(got) == 3
    for g in got.values():
        assert g["n_candidates"] == farm
        assert g["n_truth"] == farm
        assert g["n_hits"] == farm
        assert g["recall"] == 1.0 and g["precision"] == 1.0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    oracle_rows = con.execute(reg.sql).fetchall()
    cols = [d[0] for d in con.description]
    assert len(oracle_rows) == 3
    for row in oracle_rows:
        d = dict(zip(cols, row))
        g = got[(d["n_bands"], d["rows_per_band"])]
        for k in ("n_candidates", "n_truth", "n_hits"):
            assert g[k] == d[k], (d["n_bands"], d["rows_per_band"], k)


def test_sndi_processor_rejects_ttl_zero(spark):
    """ADVICE r11 (low): ttl=0 is neither unbounded nor an empty window —
    it must raise, not silently flip to the unbounded semantics."""
    for bad in (0, -1, 1.5):
        with pytest.raises((ValueError, TypeError)):
            _sndi_make_processor(
                spark, None, None, None, None, 16, 16, 4, "app", ttl=bad
            )
