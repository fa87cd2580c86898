"""Salted two-phase aggregation: equality with plain groupBy on skewed data,
two-exchange plan shape, and determinism under replay."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cassabon_spark.operators.skew import salted_agg

AGGS = {
    "total": ("v", "sum"),
    "n": ("v", "count"),
    "lo": ("v", "min"),
    "hi": ("v", "max"),
    "mean": ("v", "avg"),
}


def _skewed(spark):
    # one hot key carrying 90% of rows + a long tail
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_matches_plain_groupby(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["total"], r["n"], r["lo"], r["hi"], round(r["mean"], 9))
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("v").alias("mean"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["total"], r["n"], r["lo"], r["hi"], round(r["mean"], 9))
        for r in salted_agg(df, ["k"], AGGS, n_salt=16).collect()
    }
    assert salted == plain


def test_salted_agg_two_phase_plan(spark):
    df = _skewed(spark)
    plan = (
        salted_agg(df, ["k"], AGGS, n_salt=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # phase 1 shuffles on (k, salt), phase 2 on (k): two exchanges, no rand()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "rand(" not in plan


def test_salted_agg_deterministic(spark):
    df = _skewed(spark)
    a = sorted(map(tuple, salted_agg(df, ["k"], AGGS).collect()))
    b = sorted(map(tuple, salted_agg(df, ["k"], AGGS).collect()))
    assert a == b


def test_salted_agg_rejects_non_decomposable(spark):
    df = _skewed(spark)
    try:
        salted_agg(df, ["k"], {"bad": ("v", "median")})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ---------------------------------------------------- salted self-pairs


def test_salted_self_pairs_matches_naive(spark):
    from cassabon_spark.operators.skew import salted_self_pairs

    # mixed buckets: several small, one over-cap
    df = spark.range(200).select(
        (F.col("id") % 7).cast("string").alias("bkey"),
        F.col("id").alias("doc_id"),
    )
    got = salted_self_pairs(df, ["bkey"], "doc_id", cap=10, n_cells=4)
    a, b = df.alias("a"), df.alias("b")
    want = (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.mark.slow  # r15 tiering: degenerate-bucket stress, ~30 s
def test_salted_self_pairs_degenerate_bucket(spark):
    """10k identical docs in ONE band bucket (VERDICT r1 #6): ~50M real
    candidate pairs. The grid split must spread the quadratic tail over
    n_cells tasks; with the plain self-join one task owns all of it."""
    from cassabon_spark.operators.skew import salted_self_pairs

    n = 10_000
    df = spark.range(n).select(
        F.lit("degenerate").alias("bkey"), F.col("id").alias("doc_id")
    )
    pairs = salted_self_pairs(df, ["bkey"], "doc_id", cap=64, n_cells=16)
    # count() aggregates the pair stream without materializing it anywhere
    assert pairs.count() == n * (n - 1) // 2
    # the left side must carry 16 distinct cells so the join fans out
    sizes = (
        df.withColumn(
            "__cell", F.pmod(F.xxhash64("doc_id"), F.lit(16)).cast("int")
        )
        .groupBy("__cell")
        .count()
    )
    cells = sizes.count()
    assert cells == 16
    # hash salt spreads near-uniformly: no cell above 2x the mean
    top = sizes.agg(F.max("count")).first()[0]
    assert top < 2 * (n / 16)


def test_dedup_minhash_survives_identical_corpus(spark, tmp_path):
    """End-to-end: the minhash band join finishes on an adversarial corpus
    of identical documents (all shared signatures -> one hot band key)."""
    import pandas as pd

    n = 2_000
    text = "the same exact document body repeated verbatim for every row"
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "lang": ["en"] * n,
            "text": [text] * n,
            "title": [f"t{i}" for i in range(n)],
            "url": [f"u{i}" for i in range(n)],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pdf.to_parquet(sf / "documents.parquet")
    from cassabon_spark.queries import load_registry

    reg = load_registry()
    out = reg["dedup_minhash_lsh"].fn(spark, str(sf))
    # identical docs: every pair is a jaccard-1.0 duplicate
    assert out.count() == n * (n - 1) // 2


def test_salted_self_pairs_pins_pair_stage_width(spark):
    # SCALE_r06 regression pin: the pair stage's inputs are tiny in BYTES
    # but quadratic in COMPUTE, so AQE's byte-based coalescing shrank it
    # to ~5 tasks on some runs (dedup_semdedup at the 10x stress) until
    # salted_self_pairs switched to explicit user-specified repartitions,
    # which AQE must not coalesce. The join output keeps the full
    # configured width even though the data is a few KB.
    import random

    from cassabon_spark.operators.skew import salted_self_pairs

    rng = random.Random(77)
    rows = [(i, f"k{rng.randrange(4)}") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, key string")
    pairs = salted_self_pairs(df, ["key"], "id", cap=50, unique_pairs=True)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert pairs.rdd.getNumPartitions() == n_parts


# ---------------------------------------------------------------- salted_join


def test_salted_join_matches_plain_join(spark):
    """r10: the two-sided skew-safe join must equal the plain inner
    equi-join on a mixed workload — one hot key whose match volume
    (200 x 300) dwarfs the cap, plus a long tail of small buckets."""
    from cassabon_spark.operators.skew import salted_join

    left = spark.range(400).select(
        F.when(F.col("id") < 200, F.lit("hot"))
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 40).cast("string")))
        .alias("k"),
        F.col("id").alias("lid"),
    )
    right = spark.range(500).select(
        F.when(F.col("id") < 300, F.lit("hot"))
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 40).cast("string")))
        .alias("k"),
        (F.col("id") + 10_000).alias("rid"),
    )
    got = sorted(
        map(
            tuple,
            salted_join(left, right, ["k"], left_salt_col="lid", cap=8)
            .select("k", "lid", "rid")
            .collect(),
        )
    )
    want = sorted(
        map(tuple, left.join(right, "k").select("k", "lid", "rid").collect())
    )
    assert got == want and len(got) == 200 * 300 + sum(
        (200 // 40) * (200 // 40) for _ in range(40)
    )


def test_salted_join_spreads_hot_bucket(spark):
    """The hot bucket's rows must land in more than one cell (the whole
    point: no single task owns the cross-product tail)."""
    from cassabon_spark.operators.skew import salted_join

    left = spark.range(1000).select(
        F.lit("hot").alias("k"), F.col("id").alias("lid")
    )
    right = spark.range(1000).select(
        F.lit("hot").alias("k"), (F.col("id") + 10_000).alias("rid")
    )
    out = salted_join(left, right, ["k"], left_salt_col="lid", cap=8)
    assert out.count() == 1_000_000
    # every (lid, rid) pair exactly once despite the right-side replication
    assert out.select("lid", "rid").distinct().count() == 1_000_000


def test_salted_join_deterministic(spark):
    from cassabon_spark.operators.skew import salted_join

    left = spark.range(300).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("lid")
    )
    right = spark.range(300).select(
        (F.col("id") % 3).alias("k"), (F.col("id") + 500).alias("rid")
    )
    a = sorted(map(tuple, salted_join(left, right, ["k"], "lid", cap=4).collect()))
    b = sorted(map(tuple, salted_join(left, right, ["k"], "lid", cap=4).collect()))
    assert a == b
