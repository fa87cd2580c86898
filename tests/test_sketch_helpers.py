"""Sketch-only production helpers (operators/sketch.py, r9 — VERDICT r8
#4): the gated registry entries carry an exact-truth arm purely for the
oracle gate; production callers use hll_registers / hll_merge /
hll_estimate / kmv_bottom_k without it. Pinned here:

  (a) the gated entries' sketch columns EQUAL the helpers' output (so the
      helpers and the gate-verified entries can never drift apart),
  (b) the HLL merge law on the helpers themselves: registers(A U B) ==
      merge(registers(A), registers(B)) — element-wise max,
  (c) the KMV merge law: bottom-k of sharded sketches' union == bottom-k
      of the whole.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassabon_spark.operators.sketch import (
    HLL_M,
    hll_estimate,
    hll_merge,
    hll_registers,
    kmv_bottom_k,
)

SF = "/root/testdata/sf0.001"


def _tokens(spark):
    from cassabon_spark.functions.text import tokens_expr

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        "doc_id", "lang", F.explode(tokens_expr("text")).alias("tok")
    )


def test_hll_entry_equals_helpers(spark):
    # the gated entry's (nz_registers, hll_estimate) per lang must equal a
    # pure helper pipeline with no truth arm
    from cassabon_spark.queries import load_registry

    entry = {
        r.lang: (r.nz_registers, r.hll_estimate)
        for r in load_registry()["sketch_hll_distinct"].fn(spark, SF).collect()
    }
    reg = hll_registers(_tokens(spark), ["lang"], "tok")
    got = {
        r.lang: (r.nz_registers, r.hll_estimate)
        for r in hll_estimate(reg, ["lang"]).collect()
    }
    assert set(entry) == set(got)
    for lang, (nz, est) in entry.items():
        assert got[lang][0] == nz
        # entry rounds via R(x, 4) = round(round(x, 8), 4)
        assert round(round(got[lang][1], 8), 4) == est


def test_hll_union_entry_equals_helpers(spark):
    from cassabon_spark.queries import load_registry

    rows = load_registry()["sketch_hll_union"].fn(spark, SF).collect()
    union_est = {r.union_estimate for r in rows}
    assert len(union_est) == 1  # same union value on every row
    reg = hll_registers(_tokens(spark), ["lang"], "tok")
    got = hll_estimate(hll_merge(reg, []), []).collect()[0].hll_estimate
    assert round(round(got, 8), 4) == union_est.pop()


def test_hll_merge_law(spark):
    # registers(A U B) == merge(registers(A), registers(B))
    tok = _tokens(spark)
    a = tok.filter(F.col("doc_id") % 2 == 0)
    b = tok.filter(F.col("doc_id") % 2 == 1)
    whole = {
        (r.lang, r.idx): r.m
        for r in hll_registers(tok, ["lang"], "tok").collect()
    }
    parts = hll_registers(a, ["lang"], "tok").unionByName(
        hll_registers(b, ["lang"], "tok")
    )
    merged = {
        (r.lang, r.idx): r.m for r in hll_merge(parts, ["lang"]).collect()
    }
    assert whole == merged
    assert 0 < len(whole) <= 5 * HLL_M


def test_kmv_merge_law(spark):
    from cassabon_spark.functions.text import md5_bucket_expr

    tok = _tokens(spark)
    h = tok.select(md5_bucket_expr(F.col("tok")).alias("h")).distinct()
    whole = kmv_bottom_k(h, [], k=64).collect()[0].bk
    sharded = kmv_bottom_k(
        h.withColumn("sh", F.pmod(F.col("h"), F.lit(3))), ["sh"], k=64
    )
    merged = kmv_bottom_k(
        sharded.select(F.explode("bk").alias("h")).distinct(), [], k=64
    ).collect()[0].bk
    assert whole == merged
    assert len(whole) == min(64, h.count())  # sf0.001 has few distinct tokens
