"""Round-4 entry semantics that deserve a constructed fixture on top of
the registry oracle: ExactSubstr span merging."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_exact_substring_merges_overlapping_positions_into_spans(spark, tmp_path):
    """Two docs share one 25-token passage: 6 duplicated 20-gram positions
    per doc must merge into ONE span covering exactly the 25 shared
    tokens; a doc with no repeated grams reports zeros."""
    from cassabon_spark.queries import load_registry

    shared = " ".join(f"tok{i}" for i in range(25))
    uniq_a = " ".join(f"aa{i}" for i in range(10))
    uniq_b = " ".join(f"bb{i}" for i in range(10))
    clean = " ".join(f"cc{i}" for i in range(30))
    rows = [
        (1, f"{uniq_a} {shared}", "en", "s", 0),
        (2, f"{shared} {uniq_b}", "en", "s", 0),
        (3, clean, "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in load_registry()["dedup_exact_substring"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # doc 1: shared passage at positions 11..35 -> 20-gram starts 11..16
    assert out[1]["n_dup_grams"] == 6
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_tokens"] == 25
    assert out[2]["n_dup_grams"] == 6 and out[2]["dup_tokens"] == 25
    assert out[3]["n_dup_grams"] == 0 and out[3]["dup_tokens"] == 0
    assert abs(out[1]["dup_ratio"] - 25 / 35) < 1e-4  # entry rounds to 4dp
