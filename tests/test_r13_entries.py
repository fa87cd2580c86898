"""r13 entry-level semantic tests (beyond the oracle gate).

Pins the ADVICE r12 correctness edges that are reachable only on crafted
corpora:
  * band ablation, NON-collapse mode, empty candidate sets — every
    (bands, rows) config must still emit a row with n_candidates = 0 and
    NULL ratios, matching the member-level DuckDB oracle (the r11 fix
    covered only the collapse arm).
"""

from __future__ import annotations

import duckdb

from cassabon_spark.queries import load_registry
from cassabon_spark.queries.extensions import _minhash_pair_frames


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_band_ablation_emits_all_configs_noncollapse_empty(spark, tmp_path):
    """ADVICE r12 (low): a corpus with NO duplicate mass (collapse off)
    and disjoint vocabularies (no two docs share a shingle, so every
    config's candidate set and the truth set are empty) must still emit
    one row per config with n_candidates = n_hits = 0, n_truth = 0 and
    NULL recall/precision — exactly like the member-level oracle, which
    anchors its aggregate on the config list instead of the candidates."""
    rows = [
        (i, " ".join(f"v{i}w{k}" for k in range(12)), "en", "s", 0)
        for i in range(6)
    ]
    _write_docs(spark, tmp_path, rows)
    assert _minhash_pair_frames(spark, str(tmp_path))["collapse"] is False

    reg = load_registry()["dedup_lsh_band_ablation"]
    got = {
        (r["n_bands"], r["rows_per_band"]): r.asDict()
        for r in reg.fn(spark, str(tmp_path)).collect()
    }
    assert len(got) == 3
    for g in got.values():
        assert g["n_candidates"] == 0
        assert g["n_truth"] == 0
        assert g["n_hits"] == 0
        assert g["recall"] is None and g["precision"] is None

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
        assert d["recall"] is None and d["precision"] is None
