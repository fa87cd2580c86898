"""Graphite-style series functions over the gap-filled grid: goldens for
each transform + chaining."""

from __future__ import annotations

import pyspark.sql.functions as F

from cassabon_spark.functions.series import (
    absolute,
    alias_by_node,
    alias_series,
    average_series,
    bottom_series,
    count_series,
    delay,
    derivative,
    diff_series,
    exclude,
    grep,
    group_by_node,
    hitcount,
    integral,
    invert,
    keep_last_value,
    linear_regression,
    logarithm,
    moving_average,
    moving_max,
    moving_median,
    moving_min,
    moving_sum,
    non_negative_derivative,
    offset,
    per_second,
    percentile_of_series,
    power,
    range_series,
    remove_above_value,
    remove_below_value,
    scale,
    square_root,
    stdev,
    sum_series,
    summarize,
    time_shift,
    top_series,
    transform_null,
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


def test_per_second_uses_inferred_step(spark):
    g = _grid(spark, [("p", 10, 0.0), ("p", 20, 50.0), ("p", 30, 40.0)])
    # step is 10s; 0->50 is +50 => 5.0/s; 50->40 is negative => null
    assert _series(per_second(g)) == [None, 5.0, None]


def test_integral_running_sum_keeps_nulls(spark):
    g = _grid(spark, GRID)
    assert _series(integral(g)) == [1.0, 5.0, None, 7.0, 14.0]


def test_moving_family(spark):
    g = _grid(spark, GRID)
    assert _series(moving_max(g, 2)) == [1.0, 4.0, 4.0, 2.0, 7.0]
    assert _series(moving_sum(g, 2)) == [1.0, 5.0, 4.0, 2.0, 9.0]
    assert _series(moving_median(g, 3)) == [1.0, 2.5, 2.5, 3.0, 4.5]
    s = _series(stdev(g, 2))
    assert s[0] == 0.0 and round(s[1], 3) == 1.5


def test_scalar_transforms(spark):
    g = _grid(spark, [("p", 10, -2.0), ("p", 20, 0.0), ("p", 30, 4.0)])
    assert _series(invert(g)) == [-0.5, None, 0.25]
    assert _series(logarithm(g, 2)) == [None, None, 2.0]
    assert _series(power(g, 2)) == [4.0, 0.0, 16.0]
    assert _series(square_root(g)) == [None, 0.0, 2.0]
    assert _series(transform_null(_grid(spark, [("p", 10, None)]), -1)) == [-1.0]
    assert _series(remove_above_value(g, 1)) == [-2.0, 0.0, None]
    assert _series(remove_below_value(g, 0)) == [None, 0.0, 4.0]


def test_time_shift_and_delay(spark):
    g = _grid(spark, GRID)
    shifted = time_shift(g, 100)
    assert [r["slot_s"] for r in shifted.orderBy("slot_s").collect()] == [
        110, 120, 130, 140, 150,
    ]
    assert _series(delay(g, 1)) == [None, 1.0, 4.0, None, 2.0]


def test_hitcount_rate_to_total(spark):
    # 10s steps at 2/s and 3/s -> 20s buckets
    g = _grid(spark, [("p", 10, 2.0), ("p", 20, 3.0), ("p", 30, 1.0)])
    out = {r["slot_s"]: r["stat"] for r in hitcount(g, 20).collect()}
    assert out == {20: 50.0, 40: 10.0}


def test_path_manipulation(spark):
    g = _grid(spark, [("a.s1.cpu", 10, 1.0), ("a.s2.cpu", 10, 3.0), ("a.s1.mem", 10, 9.0)])
    assert set(r["path"] for r in alias_series(g, "x").collect()) == {"x"}
    assert set(r["path"] for r in alias_by_node(g, 1, 2).collect()) == {
        "s1.cpu", "s2.cpu", "s1.mem",
    }
    assert set(r["path"] for r in exclude(g, r"\.mem$").collect()) == {
        "a.s1.cpu", "a.s2.cpu",
    }
    assert set(r["path"] for r in grep(g, r"\.mem$").collect()) == {"a.s1.mem"}
    out = {(r["path"], r["stat"]) for r in group_by_node(g, 2, "sum").collect()}
    assert out == {("cpu", 4.0), ("mem", 9.0)}


def test_combine_series(spark):
    g = _grid(
        spark,
        [("p", 10, 1.0), ("q", 10, 3.0), ("p", 20, None), ("q", 20, 5.0)],
    )
    assert _series(sum_series(g), "sumSeries") == [4.0, 5.0]
    assert _series(average_series(g), "averageSeries") == [2.0, 5.0]
    assert _series(count_series(g), "countSeries") == [2.0, 1.0]
    assert _series(range_series(g), "rangeOfSeries") == [2.0, 0.0]
    assert _series(diff_series(g, "q"), "diffSeries") == [2.0, 5.0]
    assert _series(percentile_of_series(g, 50), "percentileOfSeries") == [2.0, 5.0]


def test_bottom_series(spark):
    rows = GRID + [("q", 10, 100.0), ("r", 10, 0.0)]
    kept = {
        r["path"]
        for r in bottom_series(_grid(spark, rows), 2, "avg")
        .select("path").distinct().collect()
    }
    assert kept == {"r", "p"}


def test_holt_winters_constant_series_is_fixed_point(spark):
    from cassabon_spark.functions.series import (
        holt_winters_aberration,
        holt_winters_forecast,
    )

    g = _grid(spark, [("p", 10 * i, 5.0) for i in range(1, 13)])
    fc = _series(holt_winters_forecast(g, season_slots=4))
    assert [round(v, 9) for v in fc] == [5.0] * 12
    ab = _series(holt_winters_aberration(g, season_slots=4))
    assert [round(v, 9) for v in ab] == [0.0] * 12


def test_holt_winters_nulls_advance_forecast(spark):
    from cassabon_spark.functions.series import holt_winters_forecast

    g = _grid(spark, [("p", 10, 5.0), ("p", 20, None), ("p", 30, 5.0)])
    fc = _series(holt_winters_forecast(g, season_slots=2))
    assert [round(v, 9) for v in fc] == [5.0, 5.0, 5.0]


def test_holt_winters_bands_bracket_forecast(spark):
    from cassabon_spark.functions.series import holt_winters_confidence_bands

    rows = [("p", 10 * i, float(5 + (i % 4))) for i in range(1, 17)]
    bands = holt_winters_confidence_bands(_grid(spark, rows), season_slots=4)
    for r in bands.collect():
        if r["upper"] is not None and r["lower"] is not None:
            assert r["upper"] >= r["lower"]


def test_linear_regression_exact_on_line(spark):
    g = _grid(spark, [("p", 10, 2.0), ("p", 20, 4.0), ("p", 30, None), ("p", 40, 8.0)])
    fitted = [round(v, 6) for v in _series(linear_regression(g))]
    # points lie exactly on stat = 0.2*slot: fit reproduces them, fills the gap
    assert fitted == [2.0, 4.0, 6.0, 8.0]


def test_series_invariants(spark):
    """Cross-function invariants on a fixed pseudo-random grid."""
    import random

    from cassabon_spark.functions.series import as_percent, time_shift

    rnd = random.Random(7)
    rows = [
        (p, 10 * (i + 1), rnd.uniform(-5, 5) if rnd.random() > 0.2 else None)
        for p in ("p", "q", "r")
        for i in range(20)
    ]
    g = _grid(spark, rows)

    # time_shift round-trips
    back = time_shift(time_shift(g, 170), -170)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, g.collect()))

    # hitcount == summarize(scale(g, step), bucket, sum): total hits are
    # rate x step re-bucketed
    h = {(r["path"], r["slot_s"]): r["stat"] for r in hitcount(g, 40).collect()}
    s = {
        (r["path"], r["slot_s"]): r["stat"]
        for r in summarize(scale(g, 10), 40, "sum").collect()
    }
    assert set(h) == set(s)
    for k in h:
        if h[k] is not None:
            assert abs(h[k] - s[k]) < 1e-9

    # moving_max dominates moving_min pointwise
    mx = _series(moving_max(g, 3))
    mn = _series(moving_min(g, 3))
    for a, b in zip(mx, mn):
        assert (a is None) == (b is None)
        if a is not None:
            assert a >= b

    # asPercent sums to 100 per slot over non-null slots with nonzero total
    pct = as_percent(g)
    tot = {
        r["slot_s"]: r["t"]
        for r in pct.groupBy("slot_s").agg(F.sum("stat").alias("t")).collect()
    }
    raw_tot = {
        r["slot_s"]: r["t"]
        for r in g.groupBy("slot_s").agg(F.sum("stat").alias("t")).collect()
    }
    for slot, t in tot.items():
        if t is not None and raw_tot[slot] not in (None, 0.0):
            assert abs(t - 100.0) < 1e-6


def test_top_series_and_chaining(spark):
    rows = GRID + [("q", 10, 100.0), ("q", 20, 100.0), ("r", 10, 0.0)]
    g = _grid(spark, rows)
    kept = {r["path"] for r in top_series(g, 2, "avg").select("path").distinct().collect()}
    assert kept == {"q", "p"}
    chained = top_series(moving_average(g, 2), 1, "max")
    assert {r["path"] for r in chained.select("path").distinct().collect()} == {"q"}


def test_interpolate_interior_gaps_only(spark):
    from cassabon_spark.functions.series import interpolate

    g = _grid(spark, [
        ("p", 10, None), ("p", 20, 2.0), ("p", 30, None), ("p", 40, None),
        ("p", 50, 8.0), ("p", 60, None),
    ])
    assert _series(interpolate(g)) == [None, 2.0, 4.0, 6.0, 8.0, None]


def test_offset_to_zero_and_changed(spark):
    from cassabon_spark.functions.series import changed, offset_to_zero

    g = _grid(spark, [("p", 10, 3.0), ("p", 20, 5.0), ("p", 30, 5.0), ("p", 40, None)])
    assert _series(offset_to_zero(g)) == [0.0, 2.0, 2.0, None]
    assert _series(changed(g)) == [0.0, 1.0, 0.0, None]


def test_integral_by_interval_resets(spark):
    from cassabon_spark.functions.series import integral_by_interval

    g = _grid(spark, [("p", 10, 1.0), ("p", 20, 2.0), ("p", 30, 3.0), ("p", 40, 4.0)])
    # 20s buckets labelled by close: {10,20} then {30,40}
    assert _series(integral_by_interval(g, 20)) == [1.0, 3.0, 3.0, 7.0]


def test_min_above_max_below(spark):
    from cassabon_spark.functions.series import maximum_below, minimum_above

    g = _grid(spark, [
        ("hi", 10, 5.0), ("hi", 20, 9.0),
        ("lo", 10, 1.0), ("lo", 20, 3.0),
    ])
    assert {r["path"] for r in minimum_above(g, 4).select("path").distinct().collect()} == {"hi"}
    assert {r["path"] for r in maximum_below(g, 4).select("path").distinct().collect()} == {"lo"}


def test_percentile_value_filters(spark):
    from cassabon_spark.functions.series import (
        average_outside_percentile,
        remove_above_percentile,
        remove_below_percentile,
        remove_between_percentile,
    )

    g = _grid(spark, [("p", 10 * i, float(i)) for i in range(1, 11)])  # 1..10
    # p50 of 1..10 = 5.5
    assert _series(remove_above_percentile(g, 50)) == [
        1.0, 2.0, 3.0, 4.0, 5.0, None, None, None, None, None,
    ]
    assert _series(remove_below_percentile(g, 50)) == [
        None, None, None, None, None, 6.0, 7.0, 8.0, 9.0, 10.0,
    ]
    # p80=8.2, p20=2.8: keep only the extremes
    assert _series(remove_between_percentile(g, 80)) == [
        1.0, 2.0, None, None, None, None, None, None, 9.0, 10.0,
    ]
    rows = (
        [("mid1", 10, 5.0), ("mid2", 10, 5.2), ("mid3", 10, 4.8)]
        + [("hot", 10, 50.0), ("cold", 10, -40.0)]
    )
    kept = {
        r["path"]
        for r in average_outside_percentile(_grid(spark, rows), 75)
        .select("path").distinct().collect()
    }
    assert kept == {"hot", "cold"}


def test_series_conservation_properties(spark):
    """Conservation/invariance checks on a seeded random grid."""
    import random

    from cassabon_spark.functions.series import interpolate

    rnd = random.Random(11)
    rows = [
        (p, 10 * (i + 1), round(rnd.uniform(0, 10), 3) if rnd.random() > 0.3 else None)
        for p in ("p", "q")
        for i in range(30)
    ]
    g = _grid(spark, rows)

    # summarize(sum) conserves the series total
    for p in ("p", "q"):
        raw_total = sum(v for v in _series(g, p) if v is not None)
        summed = summarize(g, 70, "sum")
        agg_total = sum(v for v in _series(summed, p) if v is not None)
        assert abs(raw_total - agg_total) < 1e-9

    # interpolate preserves every non-null point and fills only interior nulls
    base = {(r["path"], r["slot_s"]): r["stat"] for r in g.collect()}
    filled = {(r["path"], r["slot_s"]): r["stat"] for r in interpolate(g).collect()}
    for k, v in base.items():
        if v is not None:
            assert filled[k] == v
    # integral is monotone non-decreasing over non-null slots when values >= 0
    nonneg = _grid(spark, [(p, s, abs(v) if v is not None else None) for p, s, v in rows])
    prev = None
    for v in _series(integral(nonneg), "p"):
        if v is not None:
            assert prev is None or v >= prev - 1e-9
            prev = v


def test_as_percent_of_series_multi_series_total_sums_not_fans_out(spark):
    """ADVICE r4: a multi-series total grid must be aggregated per slot
    (graphite sums a multi-series total via sumSeries) — a raw left join
    would fan out and duplicate every grid row."""
    from cassabon_spark.functions.series import as_percent_of_series

    g = spark.createDataFrame(
        [("a", 10, 5.0), ("a", 20, 2.0)], "path string, slot_s bigint, stat double"
    )
    tot = spark.createDataFrame(
        [("t1", 10, 10.0), ("t2", 10, 40.0), ("t1", 20, None)],
        "path string, slot_s bigint, stat double",
    )
    out = {(r["path"], r["slot_s"]): r["stat"]
           for r in as_percent_of_series(g, tot).collect()}
    assert len(out) == 2  # no fan-out: one row per input grid row
    assert out[("a", 10)] == 5.0 * 100.0 / 50.0  # total summed across series
    assert out[("a", 20)] is None  # all-null total slot -> null, not zero
