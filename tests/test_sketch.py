"""Mergeable histogram percentile sketch: merge-lossless property, accuracy
bound, and under/overflow clamping."""

from __future__ import annotations

import pyspark.sql.functions as F

from cassabon_spark.operators.sketch import (
    histogram_sketch,
    merge_sketches,
    sketch_quantiles,
)

LO, HI, NBINS = 0.0, 100.0, 50  # width 2.0


def _data(spark):
    # two groups x two sub-windows of deterministic values
    rows = []
    for g in ("a", "b"):
        for w in (1, 2):
            base = 10.0 if g == "a" else 40.0
            rows += [(g, w, base + (i % 25) * 1.7) for i in range(200)]
    return spark.createDataFrame(rows, "g string, w int, v double")


def test_merge_equals_direct(spark):
    df = _data(spark)
    fine = histogram_sketch(df, ["g", "w"], "v", LO, HI, NBINS)
    merged = merge_sketches(fine.drop("w"), ["g"])
    direct = histogram_sketch(df, ["g"], "v", LO, HI, NBINS)
    a = {(r["g"], r["bin"]): r["cnt"] for r in merged.collect()}
    b = {(r["g"], r["bin"]): r["cnt"] for r in direct.collect()}
    assert a == b  # count-addition merge is lossless by construction


def test_quantile_within_bin_width(spark):
    df = _data(spark)
    sk = histogram_sketch(df, ["g"], "v", LO, HI, NBINS)
    est = {
        r["g"]: (r["q50"], r["q95"])
        for r in sketch_quantiles(sk, ["g"], [0.5, 0.95], LO, HI, NBINS).collect()
    }
    exact = {
        r["g"]: (r["e50"], r["e95"])
        for r in df.groupBy("g")
        .agg(
            F.expr("percentile(v, 0.5)").alias("e50"),
            F.expr("percentile(v, 0.95)").alias("e95"),
        )
        .collect()
    }
    width = (HI - LO) / NBINS
    for g in ("a", "b"):
        assert abs(est[g][0] - exact[g][0]) <= width
        assert abs(est[g][1] - exact[g][1]) <= width


def test_out_of_range_clamps(spark):
    rows = [("x", -5.0)] * 10 + [("x", 50.0)] * 10 + [("x", 500.0)] * 10
    df = spark.createDataFrame(rows, "g string, v double")
    sk = histogram_sketch(df, ["g"], "v", LO, HI, NBINS)
    bins = {r["bin"]: r["cnt"] for r in sk.collect()}
    assert bins[0] == 10 and bins[NBINS + 1] == 10
    q = sketch_quantiles(sk, ["g"], [0.05, 0.99], LO, HI, NBINS).collect()[0]
    assert q["q5"] == LO  # underflow clamp
    assert q["q99"] == HI  # overflow clamp
