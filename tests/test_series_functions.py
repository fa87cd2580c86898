"""Graphite-style series functions over the gap-filled grid: goldens for
each transform + chaining."""

from __future__ import annotations

import pyspark.sql.functions as F

from cassabon_spark.functions.series import (
    absolute,
    derivative,
    keep_last_value,
    moving_average,
    non_negative_derivative,
    offset,
    scale,
    summarize,
    top_series,
)


def _grid(spark, rows):
    return spark.createDataFrame(rows, "path string, slot_s bigint, stat double")


def _series(df, path="p"):
    return [
        r["stat"]
        for r in df.filter(F.col("path") == path).orderBy("slot_s").collect()
    ]


GRID = [
    ("p", 10, 1.0),
    ("p", 20, 4.0),
    ("p", 30, None),
    ("p", 40, 2.0),
    ("p", 50, 7.0),
]


def test_derivative_and_non_negative(spark):
    g = _grid(spark, GRID)
    assert _series(derivative(g)) == [None, 3.0, None, None, 5.0]
    # the 4.0 -> 2.0 drop crosses a gap; direct negative deltas also null
    g2 = _grid(spark, [("p", 10, 5.0), ("p", 20, 3.0), ("p", 30, 9.0)])
    assert _series(non_negative_derivative(g2)) == [None, None, 6.0]


def test_moving_average_ignores_nulls(spark):
    g = _grid(spark, GRID)
    # trailing 3-frame: avg of non-null values inside the frame
    assert _series(moving_average(g, 3)) == [1.0, 2.5, 2.5, 3.0, 4.5]


def test_scale_offset_absolute(spark):
    g = _grid(spark, [("p", 10, -2.0), ("p", 20, 3.0)])
    assert _series(scale(g, 10)) == [-20.0, 30.0]
    assert _series(offset(g, 1)) == [-1.0, 4.0]
    assert _series(absolute(g)) == [2.0, 3.0]


def test_keep_last_value(spark):
    g = _grid(spark, [("p", 10, 1.0), ("p", 20, None), ("p", 30, None), ("p", 40, 9.0)])
    assert _series(keep_last_value(g)) == [1.0, 1.0, 1.0, 9.0]
    assert _series(keep_last_value(g, limit=1)) == [1.0, 1.0, None, 9.0]


def test_summarize_close_labeled(spark):
    g = _grid(spark, GRID)
    out = {r["slot_s"]: r["stat"] for r in summarize(g, 20, "sum").collect()}
    # closes: 10->20, 20->20, 30->40, 40->40, 50->60
    assert out == {20: 5.0, 40: 2.0, 60: 7.0}


def test_top_series_and_chaining(spark):
    rows = GRID + [("q", 10, 100.0), ("q", 20, 100.0), ("r", 10, 0.0)]
    g = _grid(spark, rows)
    kept = {r["path"] for r in top_series(g, 2, "avg").select("path").distinct().collect()}
    assert kept == {"q", "p"}
    chained = top_series(moving_average(g, 2), 1, "max")
    assert {r["path"] for r in chained.select("path").distinct().collect()} == {"q"}
