"""Graphite function batch 4: powSeries, mapSeries/reduceSeries, pie
reductions, aliasQuery (per-series sub-query aliasing)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from cassabon_spark.functions.graphite import (
    TargetSyntaxError,
    evaluate_target,
    parse_target,
)


def _resolver(spark, rows):
    from cassabon_spark.operators.index import glob_to_regex

    df = spark.createDataFrame(rows, "path string, slot_s bigint, stat double")

    def grid_for_glob(glob):
        return df.filter(F.col("path").rlike(glob_to_regex(glob)))

    return grid_for_glob


def _ev(spark, rows, target):
    return evaluate_target(parse_target(target), _resolver(spark, rows))


def test_pow_series_folds_in_path_order(spark):
    rows = [("a", 10, 2.0), ("b", 10, 3.0), ("c", 10, 2.0)]
    out = _ev(spark, rows, "powSeries(*)").collect()
    # fold order is path-asc: (2^3)^2 = 64, NOT 2^(3^2)
    assert [(r["path"], r["slot_s"], r["stat"]) for r in out] == [
        ("powSeries", 10, 64.0)
    ]


def test_pow_series_null_slot_nulls_result(spark):
    rows = [("a", 10, 2.0), ("b", 10, None)]
    out = _ev(spark, rows, "powSeries(*)").collect()
    assert out[0]["stat"] is None


def test_map_reduce_as_percent(spark):
    # classic graphite map/reduce: disk used as a percent of total per host
    rows = [
        ("srv.host1.disk.bytes_used", 10, 30.0),
        ("srv.host1.disk.bytes_total", 10, 120.0),
        ("srv.host2.disk.bytes_used", 10, 50.0),
        ("srv.host2.disk.bytes_total", 10, 200.0),
    ]
    out = _ev(
        spark,
        rows,
        "reduceSeries(mapSeries(srv.*.disk.bytes_*, 1), "
        "'asPercent', 3, 'bytes_used', 'bytes_total')",
    ).collect()
    got = {(r["path"], r["slot_s"]): r["stat"] for r in out}
    assert got == {
        ("srv.host1.disk.reduce.asPercent", 10): 25.0,
        ("srv.host2.disk.reduce.asPercent", 10): 25.0,
    }


def test_reduce_series_divide_and_diff(spark):
    rows = [
        ("m.a.hit", 10, 6.0),
        ("m.a.total", 10, 3.0),
    ]
    div = _ev(
        spark, rows, "reduceSeries(mapSeries(m.*, 1), 'divideSeries', 2, 'hit', 'total')"
    ).collect()
    assert div[0]["path"] == "m.a.reduce.divideSeries"
    assert div[0]["stat"] == 2.0
    diff = _ev(
        spark, rows, "reduceSeries(mapSeries(m.*, 1), 'diffSeries', 2, 'hit', 'total')"
    ).collect()
    assert diff[0]["stat"] == 3.0


def test_reduce_series_unknown_fn_is_400(spark):
    rows = [("m.a.hit", 10, 1.0)]
    with pytest.raises((TargetSyntaxError, ValueError)):
        _ev(
            spark, rows, "reduceSeries(mapSeries(m.*, 1), 'nope', 2, 'hit', 'x')"
        ).collect()


def test_pie_reductions(spark):
    rows = [("a", 10, 1.0), ("a", 20, 3.0), ("b", 10, 5.0), ("b", 20, None)]
    avg = {r["path"]: r["stat"] for r in _ev(spark, rows, "pieAverage(*)").collect()}
    assert avg == {"a": 2.0, "b": 5.0}
    mx = {r["path"]: r["stat"] for r in _ev(spark, rows, "pieMaximum(*)").collect()}
    assert mx == {"a": 3.0, "b": 5.0}
    # single row per series, anchored at the first slot
    slots = {r["path"]: r["slot_s"] for r in _ev(spark, rows, "pieMinimum(*)").collect()}
    assert slots == {"a": 10, "b": 10}


def test_alias_query_formats_last_value(spark):
    # alias cpu series by the core-count metric the name maps to
    rows = [
        ("cpu.host1.load", 10, 0.5),
        ("cpu.host1.load", 20, 0.7),
        ("cores.host1", 10, 8.0),
    ]
    out = _ev(
        spark,
        rows,
        "aliasQuery(cpu.*.load, 'cpu\\.([^.]+)\\.load', 'cores.\\1', '%d cores')",
    ).collect()
    assert {r["path"] for r in out} == {"8 cores"}
    # data rows untouched — only the name changed
    assert sorted(r["stat"] for r in out) == [0.5, 0.7]


def test_alias_query_missing_value_is_400(spark):
    rows = [("cpu.host1.load", 10, 0.5)]
    with pytest.raises(TargetSyntaxError):
        _ev(
            spark,
            rows,
            "aliasQuery(cpu.*.load, 'cpu\\.([^.]+)\\.load', 'nothing.\\1', '%d')",
        )
