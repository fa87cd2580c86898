"""Salted two-phase aggregation: equality with plain groupBy on skewed data,
two-exchange plan shape, and determinism under replay."""

from __future__ import annotations

import pyspark.sql.functions as F

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
