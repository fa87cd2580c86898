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
import pytest

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


@pytest.mark.slow  # r15 tiering: crafted densified corpus, two full adaptive runs (~85 s)
def test_adaptive_band_scheme_picks_strict_on_densified_corpus(
    spark, tmp_path
):
    """The adaptive entry's STRICT side (r13): no oracle corpus is dense
    enough to trip the switch (ratios 15.7/15.6/111 vs THETA 500), so the
    strict branch is pinned here on a crafted mutation farm — 1100 docs
    sharing 30 base tokens plus one late-sorting unique token collapse to
    ~one (4,2) band bucket of ~1100 DISTINCT reps, pushing mean candidate
    mass per rep to ~n/2 > 500. The adaptive output must equal the fixed
    strict entry's output row-for-row (and the probe statistic must
    actually exceed the threshold with the default scheme's machinery)."""
    from pyspark.sql import functions as F

    from cassabon_spark.functions.text import tokens_expr
    from cassabon_spark.queries.extensions import (
        _SNDN_ADAPT_THETA,
        _snd_band_frame,
    )

    base = " ".join(f"w{i:02d}" for i in range(30))
    rows = [(i, f"{base} zz{i:04d}", "en", "s", 0) for i in range(1100)]
    _write_docs(spark, tmp_path, rows)

    # probe sanity: the crafted corpus really is over-threshold
    norm = F.array_join(F.array_sort(F.array_distinct(tokens_expr("text"))), " ")
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    reps = (
        docs.select("doc_id", "lang", norm.alias("text"))
        .filter(F.size(tokens_expr("text")) >= 3)
        .groupBy("lang", "text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "lang", "text")
    )
    n_reps = reps.count()
    assert n_reps == 1100  # all contents distinct after normalization
    mass = (
        _snd_band_frame(reps, width=8)
        .groupBy("band", "bkey", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.sum(F.expr("c * (c - 1) div 2")), F.lit(0)))
        .first()[0]
    )
    assert mass > _SNDN_ADAPT_THETA * n_reps, (mass, n_reps)

    reg = load_registry()
    got_adaptive = sorted(
        tuple(r)
        for r in reg["streaming_neardup_normalized_adaptive"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    got_strict = sorted(
        tuple(r)
        for r in reg["streaming_neardup_normalized_strict"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    assert got_adaptive == got_strict
    assert got_adaptive  # non-vacuous: the farm produces pairs


def test_prefix_join_equals_plain_blocked_join_on_hot_shingles(
    spark, tmp_path
):
    """dedup_ngram_jaccard_prefix shares its sibling's oracle, but the SF
    corpora exercise few near-threshold/hot-shingle shapes — pin equality
    on a crafted corpus with (a) a globally hot shingle shared by every
    doc (prefix filtering must still find all true pairs through the RARE
    prefix shingles), (b) exact-threshold pairs at j=0.8, and (c) df
    ties."""
    from cassabon_spark.queries import load_registry as _lr

    hot = "the quick brown"  # one shared 3-token stem in every doc
    rows = []
    for i in range(40):
        # near-dup pairs differing in their LAST token: n tokens shared
        # except one -> jaccard (n-5)/(n+1). tail=25 (n=29) sits EXACTLY
        # at 24/30 = 0.8 (the >= boundary); tail=26 (n=30) at 25/31.
        tail = " ".join(f"t{i}x{k}" for k in range(25 + i % 2))
        rows.append((2 * i, f"{hot} {tail} u{i}a", "en", "s", 0))
        rows.append((2 * i + 1, f"{hot} {tail} u{i}b", "en", "s", 0))
    _write_docs(spark, tmp_path, rows)

    reg = _lr()
    plain = sorted(
        tuple(r)
        for r in reg["dedup_ngram_jaccard"].fn(spark, str(tmp_path)).collect()
    )
    pfx = sorted(
        tuple(r)
        for r in reg["dedup_ngram_jaccard_prefix"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    assert plain == pfx
    assert plain  # non-vacuous: the crafted pairs clear the 0.8 threshold
