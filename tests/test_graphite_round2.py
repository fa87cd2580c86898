"""Round-2 graphite surface: timeShift fetch-window semantics, maxDataPoints
guard, consolidateBy, derived step, sort ordering, generators, applyByNode."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from cassabon_spark.functions.graphite import (
    TargetSyntaxError,
    evaluate_target,
    parse_target,
    target_consolidation,
)


def _resolver(spark, rows):
    """Window-less resolver (full data; offset ignored)."""
    from cassabon_spark.operators.index import glob_to_regex

    df = spark.createDataFrame(rows, "path string, slot_s bigint, stat double")

    def grid_for_glob(glob):
        return df.filter(F.col("path").rlike(glob_to_regex(glob)))

    return grid_for_glob


def _windowed_resolver(spark, rows, from_s, to_s, fetch_log=None):
    """Offset-aware resolver that restricts to the (shifted) window — the
    engine's contract."""
    from cassabon_spark.operators.index import glob_to_regex

    df = spark.createDataFrame(rows, "path string, slot_s bigint, stat double")

    def grid_for_glob(glob, offset_s=0):
        if fetch_log is not None:
            fetch_log.append(offset_s)
        f, t = from_s + offset_s, to_s + offset_s
        return df.filter(
            F.col("path").rlike(glob_to_regex(glob))
            & F.col("slot_s").between(f, t)
        )

    return grid_for_glob


def test_time_shift_fetches_prior_window(spark):
    # data exists only BEFORE the render window; an unsigned '100s' shift
    # must fetch [from-100, to-100] and display it inside [from, to]
    rows = [("m", 10, 1.0), ("m", 20, 2.0), ("m", 30, 3.0)]
    log = []
    g = evaluate_target(
        parse_target("timeShift(m, '100s')"),
        _windowed_resolver(spark, rows, 110, 130, log),
    )
    out = {r["slot_s"]: r["stat"] for r in g.collect()}
    assert out == {110: 1.0, 120: 2.0, 130: 3.0}
    assert log == [-100]  # implied minus: fetch window moved BACK


def test_time_shift_explicit_plus_fetches_future(spark):
    rows = [("m", 110, 5.0)]
    g = evaluate_target(
        parse_target("timeShift(m, '+100s')"),
        _windowed_resolver(spark, rows, 0, 30),
    )
    out = {r["slot_s"]: r["stat"] for r in g.collect()}
    assert out == {10: 5.0}


def test_time_stack_overlays_prior_periods(spark):
    # window [100, 120]; one prior period at [80, 100) holds older data
    rows = [
        ("m", 100, 10.0), ("m", 110, 11.0), ("m", 120, 12.0),
        ("m", 80, 8.0), ("m", 90, 9.0),
    ]
    g = evaluate_target(
        parse_target("timeStack(m, '20s', 0, 2)"),
        _windowed_resolver(spark, rows, 100, 120),
    )
    out = {(r["path"], r["slot_s"]): r["stat"] for r in g.collect()}
    # shift_0 = the window itself; shift_1 = data from 20 s earlier,
    # overlaid onto [100, 120]
    assert out[("m_shift_0", 100)] == 10.0
    assert out[("m_shift_1", 100)] == 8.0
    assert out[("m_shift_1", 110)] == 9.0
    assert out[("m_shift_1", 120)] == 10.0


def test_summarize_count_and_bad_method(spark):
    rows = [("m", 10, 1.0), ("m", 20, None), ("m", 30, 3.0), ("m", 40, 4.0)]
    g = evaluate_target(
        parse_target("summarize(m, '20s', 'count')"), _resolver(spark, rows)
    )
    out = {r["slot_s"]: r["stat"] for r in g.collect()}
    assert out == {20: 1.0, 40: 2.0}
    with pytest.raises(TargetSyntaxError, match="summarize"):
        evaluate_target(
            parse_target("summarize(m, '20s', 'bogus')"), _resolver(spark, rows)
        ).collect()
    with pytest.raises(TargetSyntaxError, match="aggregateLine"):
        evaluate_target(
            parse_target("aggregateLine(m, 'bogus')"), _resolver(spark, rows)
        ).collect()


def test_smart_summarize_aligns_to_from(spark):
    """ADVICE r2 #2: smartSummarize buckets align to the query 'from' (no
    partial leading bucket) — NOT epoch multiples like summarize."""
    rows = [("m", 15, 1.0), ("m", 25, 2.0), ("m", 35, 3.0), ("m", 45, 4.0)]
    ctx = {"from_s": 15, "to_s": 45, "step": 10}
    g = evaluate_target(
        parse_target("smartSummarize(m, '20s', 'sum')"), _resolver(spark, rows), ctx
    )
    # from-aligned buckets (origin 15): (15,35]=2+3, (35,55]=4; slot 15
    # itself closes the zero-width head bucket -> labels at origin
    out = {r["slot_s"]: r["stat"] for r in g.collect()}
    assert out == {15: 1.0, 35: 5.0, 55: 4.0}
    # without a context the origin defaults to 0 (epoch) — summarize-like
    g0 = evaluate_target(
        parse_target("smartSummarize(m, '20s', 'sum')"), _resolver(spark, rows)
    )
    assert {r["slot_s"]: r["stat"] for r in g0.collect()} == {20: 1.0, 40: 5.0, 60: 4.0}


def test_sort_by_total_orders_series(spark):
    rows = [
        ("a", 10, 1.0), ("a", 20, 1.0),
        ("b", 10, 10.0), ("b", 20, 10.0),
        ("c", 10, 5.0), ("c", 20, 5.0),
    ]
    g = evaluate_target(parse_target("sortByTotal(group(a, b, c))"), _resolver(spark, rows))
    assert "__ord" in g.columns
    ranks = {r["path"]: r["__ord"] for r in g.select("path", "__ord").distinct().collect()}
    assert ranks == {"b": 1, "c": 2, "a": 3}
    g2 = evaluate_target(parse_target("sortByName(group(b, a, c))"), _resolver(spark, rows))
    ranks2 = {r["path"]: r["__ord"] for r in g2.select("path", "__ord").distinct().collect()}
    assert ranks2 == {"a": 1, "b": 2, "c": 3}


def test_sort_by_name_natural_numeric_widths(spark):
    """ADVICE r2 #1: srv2 must sort before srv10 under natural=1 — digit
    runs of DIFFERENT widths compare numerically."""
    rows = [
        ("srv10", 10, 1.0), ("srv2", 10, 1.0), ("srv1", 10, 1.0),
        ("srv10a2", 10, 1.0), ("srv10a10", 10, 1.0),
    ]
    g = evaluate_target(
        parse_target("sortByName(group(srv10, srv2, srv1, srv10a2, srv10a10), 1)"),
        _resolver(spark, rows),
    )
    ranks = {r["path"]: r["__ord"] for r in g.select("path", "__ord").distinct().collect()}
    assert ranks == {"srv1": 1, "srv2": 2, "srv10": 3, "srv10a2": 4, "srv10a10": 5}
    # non-natural stays purely lexical
    g2 = evaluate_target(
        parse_target("sortByName(group(srv10, srv2, srv1))"), _resolver(spark, rows)
    )
    ranks2 = {r["path"]: r["__ord"] for r in g2.select("path", "__ord").distinct().collect()}
    assert ranks2 == {"srv1": 1, "srv10": 2, "srv2": 3}


def test_generators_and_interval_windows(spark):
    rows = [("m", 10, 1.0), ("m", 20, 4.0), ("m", 30, 9.0)]
    ctx = {"spark": spark, "from_s": 10, "to_s": 30, "step": 10}
    g = evaluate_target(parse_target("constantLine(7)"), _resolver(spark, rows), ctx)
    vals = [(r["path"], r["slot_s"], r["stat"]) for r in g.orderBy("slot_s").collect()]
    assert vals == [
        ("constantLine(7)", 10, 7.0),
        ("constantLine(7)", 20, 7.0),
        ("constantLine(7)", 30, 7.0),
    ]
    g2 = evaluate_target(
        parse_target("threshold(3, 'limit')"), _resolver(spark, rows), ctx
    )
    assert g2.select("path").distinct().collect()[0]["path"] == "limit"
    g3 = evaluate_target(parse_target("timeFunction('now')"), _resolver(spark, rows), ctx)
    assert {r["slot_s"]: r["stat"] for r in g3.collect()} == {10: 10.0, 20: 20.0, 30: 30.0}
    # movingAverage with an interval string window: '20s' / step 10 = 2 slots
    g4 = evaluate_target(
        parse_target("movingAverage(m, '20s')"), _resolver(spark, rows), ctx
    )
    assert [r["stat"] for r in g4.orderBy("slot_s").collect()] == [1.0, 2.5, 6.5]
    with pytest.raises(TargetSyntaxError, match="interval-string"):
        evaluate_target(
            parse_target("movingAverage(m, '20s')"), _resolver(spark, rows), {}
        )


def test_apply_by_node(spark):
    rows = [
        ("svc.a.ok", 10, 1.0), ("svc.a.err", 10, 3.0),
        ("svc.b.ok", 10, 10.0), ("svc.b.err", 10, 30.0),
    ]
    g = evaluate_target(
        parse_target("applyByNode(svc.*.*, 1, 'sumSeries(%.*)')"),
        _resolver(spark, rows),
    )
    # sumSeries collapses each group to one 'sumSeries' path; alias it per
    # group via the template to tell them apart
    g2 = evaluate_target(
        parse_target("applyByNode(svc.*.*, 1, 'alias(sumSeries(%.*), \"%\")')"),
        _resolver(spark, rows),
    )
    out = {r["path"]: r["stat"] for r in g2.collect()}
    assert out == {"svc.a": 4.0, "svc.b": 40.0}
    assert g.count() == 2


def test_consolidation_scan():
    assert target_consolidation(parse_target("consolidateBy(evt.a, 'max')")) == "max"
    assert (
        target_consolidation(parse_target("scale(consolidateBy(evt.a, 'sum'), 2)"))
        == "sum"
    )
    assert target_consolidation(parse_target("scale(evt.a, 2)")) is None


def _mk_engine(spark, tmp_path, windows=("10s:1h",), method="average"):
    from cassabon_spark.config import RollupConfig
    from cassabon_spark.engine import Engine

    cfg = RollupConfig.from_dict(
        {"default": {"method": method, "windows": list(windows)}}
    )
    return Engine(spark, cfg, str(tmp_path / "store"), str(tmp_path / "index"))


BASE = 1_700_000_000 - (1_700_000_000 % 100)


def test_engine_max_datapoints_coarsens(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path)
    lines = [f"evt.a {i} {BASE + i * 10}" for i in range(12)]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    full = eng.render_target("evt.a", BASE - 10, BASE + 120, now_s=BASE + 130)
    assert full["step"] == 10 and len(full["series"]["evt.a"]) == 13
    # max_datapoints=5 over 14 slots -> ceil(14/5)=3x coarsening -> step 30
    capped = eng.render_target(
        "evt.a", BASE - 10, BASE + 120, now_s=BASE + 130, max_datapoints=5
    )
    assert capped["step"] == 30
    assert len(capped["series"]["evt.a"]) <= 5
    # the coarse slots re-aggregate with the route method (average)
    assert capped["series"]["evt.a"][0] is not None


def test_engine_render_cells_guard(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path)
    lines = [f"evt.a 1 {BASE}", f"evt.b 2 {BASE}"]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    eng.MAX_RENDER_CELLS = 5
    with pytest.raises(ValueError, match="MAX_RENDER_CELLS"):
        eng.render_target(
            "evt.*", BASE - 10, BASE + 1000, now_s=BASE + 1100, max_datapoints=0
        )


def test_engine_consolidate_by(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path)
    lines = [f"evt.a {i} {BASE + i * 10}" for i in range(12)]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    capped = eng.render_target(
        "consolidateBy(evt.a, 'max')",
        BASE - 10,
        BASE + 120,
        now_s=BASE + 130,
        max_datapoints=5,
    )
    assert capped["step"] == 30
    # store rows close at BASE+10(i+1); coarse buckets are epoch-30-aligned,
    # so bucket (BASE+10, BASE+40] holds values 1,2,3 -> max 3 (avg would
    # give 2) — consolidateBy('max') must drive the re-aggregation
    assert capped["series"]["evt.a"][1] == 3.0
    default = eng.render_target(
        "evt.a", BASE - 10, BASE + 120, now_s=BASE + 130, max_datapoints=5
    )
    assert default["series"]["evt.a"][1] == 2.0
    with pytest.raises(TargetSyntaxError):
        eng.render_target(
            "consolidateBy(evt.a, 'bogus')", BASE, BASE + 100, now_s=BASE + 130
        )


def test_engine_consolidate_by_scoped_to_subtree(spark, tmp_path):
    """ADVICE r2 #5: consolidateBy applies only beneath its node — sibling
    globs in the same target keep the route default."""
    eng = _mk_engine(spark, tmp_path)
    lines = [f"evt.a {i} {BASE + i * 10}" for i in range(12)] + [
        f"evt.b {i} {BASE + i * 10}" for i in range(12)
    ]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    out = eng.render_target(
        "group(consolidateBy(evt.a, 'max'), evt.b)",
        BASE - 10,
        BASE + 120,
        now_s=BASE + 130,
        max_datapoints=5,
    )
    # coarse bucket (BASE+10, BASE+40] holds values 1,2,3
    assert out["series"]["evt.a"][1] == 3.0  # max under consolidateBy
    assert out["series"]["evt.b"][1] == 2.0  # sibling keeps route avg
    # two consolidateBy calls with different methods each scope their own
    out2 = eng.render_target(
        "group(consolidateBy(evt.a, 'max'), consolidateBy(evt.b, 'min'))",
        BASE - 10,
        BASE + 120,
        now_s=BASE + 130,
        max_datapoints=5,
    )
    assert out2["series"]["evt.a"][1] == 3.0
    assert out2["series"]["evt.b"][1] == 1.0


def test_divide_series_lists_length_mismatch(spark):
    rows = [
        ("num.a", 10, 10.0), ("num.b", 10, 20.0), ("den.a", 10, 2.0),
    ]
    with pytest.raises(TargetSyntaxError, match="same length"):
        evaluate_target(
            parse_target("divideSeriesLists(num.*, den.*)"), _resolver(spark, rows)
        )


def test_engine_derived_step_after_summarize(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path, method="sum")
    lines = [f"evt.a 1 {BASE + i * 10}" for i in range(12)]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    out = eng.render_target(
        "summarize(evt.a, '30s', 'sum')", BASE - 10, BASE + 120, now_s=BASE + 130
    )
    # response step must describe the OUTPUT grid (30 s), not the fetch tier
    assert out["step"] == 30
    assert out["from"] % 30 == 0


def test_engine_render_targets_per_target_steps(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path, method="sum")
    lines = [f"evt.a 1 {BASE + i * 10}" for i in range(12)]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    resp = eng.render_targets(
        ["evt.a", "summarize(alias(evt.a, 'coarse'), '30s', 'sum')"],
        BASE - 10,
        BASE + 120,
        now_s=BASE + 130,
    )
    assert [t["target"] for t in resp["targets"]][0] == "evt.a"
    steps = {t["target"]: t["step"] for t in resp["targets"]}
    assert steps["evt.a"] == 10
    assert steps["summarize(alias(evt.a, 'coarse'), '30s', 'sum')"] == 30
    # mixed steps surface a per-series map
    assert resp["steps"]["coarse"] == 30 and resp["steps"]["evt.a"] == 10


def test_engine_time_shift_end_to_end(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path, method="sum")
    # data only in the PRIOR 2 minutes
    lines = [f"evt.a {i + 1} {BASE + i * 10}" for i in range(6)]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    frm, to = BASE + 120, BASE + 180
    plain = eng.render_target("evt.a", frm, to, now_s=BASE + 200)
    assert all(v is None for v in plain["series"]["evt.a"])
    shifted = eng.render_target(
        "timeShift(evt.a, '120s')", frm, to, now_s=BASE + 200
    )
    vals = [v for v in shifted["series"]["evt.a"] if v is not None]
    # slots inside [from, to] now carry the prior window's data
    assert vals and set(vals) <= {1.0, 2.0, 3.0, 4.0, 5.0, 6.0}


def test_new_series_functions(spark):
    rows = [
        ("a", 10, 2.0), ("a", 20, 3.0),
        ("b", 10, 4.0), ("b", 20, None),
    ]
    g = evaluate_target(parse_target("multiplySeries(a, b)"), _resolver(spark, rows))
    out = {r["slot_s"]: r["stat"] for r in g.collect()}
    assert out == {10: 8.0, 20: None}
    g2 = evaluate_target(parse_target("isNonNull(b)"), _resolver(spark, rows))
    assert {r["slot_s"]: r["stat"] for r in g2.collect()} == {10: 1.0, 20: 0.0}
    g3 = evaluate_target(parse_target("aliasSub(a, 'a', 'x')"), _resolver(spark, rows))
    assert {r["path"] for r in g3.collect()} == {"x"}
    g4 = evaluate_target(
        parse_target("scaleToSeconds(a, 60)"), _resolver(spark, rows)
    )
    # step 10 -> factor 6
    assert {r["slot_s"]: r["stat"] for r in g4.collect()} == {10: 12.0, 20: 18.0}
    g5 = evaluate_target(
        parse_target("aliasByMetric(svc.host.cpu)"),
        _resolver(spark, [("svc.host.cpu", 10, 1.0)]),
    )
    assert g5.collect()[0]["path"] == "cpu"
    g6 = evaluate_target(
        parse_target("highestCurrent(group(a, b), 1)"), _resolver(spark, rows)
    )
    # b's current (latest non-null) is 4.0 at slot 10; a's is 3.0 -> b wins
    assert {r["path"] for r in g6.collect()} == {"b"}


def test_batch2_combines_and_filters(spark):
    rows = [
        ("svc.a.cpu", 10, 1.0), ("svc.a.mem", 10, 2.0),
        ("svc.b.cpu", 10, 10.0), ("svc.b.mem", 10, 20.0),
    ]
    g = evaluate_target(
        parse_target("groupByNodes(svc.*.*, 'sum', 0, 2)"), _resolver(spark, rows)
    )
    out = {r["path"]: r["stat"] for r in g.collect()}
    assert out == {"svc.cpu": 11.0, "svc.mem": 22.0}
    g2 = evaluate_target(
        parse_target("sumSeriesWithWildcards(svc.*.*, 1)"), _resolver(spark, rows)
    )
    out2 = {r["path"]: r["stat"] for r in g2.collect()}
    assert out2 == {"svc.cpu": 11.0, "svc.mem": 22.0}
    g3 = evaluate_target(
        parse_target("filterSeries(svc.*.*, 'max', '>', 5)"), _resolver(spark, rows)
    )
    assert {r["path"] for r in g3.collect()} == {"svc.b.cpu", "svc.b.mem"}
    g4 = evaluate_target(
        parse_target("aggregate(svc.*.*, 'median')"), _resolver(spark, rows)
    )
    assert g4.collect()[0]["stat"] == 6.0


def test_batch2_counter_wrap_and_transforms(spark):
    # 8-bit counter wrapping: 250 -> 4 means delta 10 at maxValue 255
    rows = [("c", 10, 250.0), ("c", 20, 4.0), ("c", 30, 14.0)]
    g = evaluate_target(
        parse_target("nonNegativeDerivative(c, 255)"), _resolver(spark, rows)
    )
    assert [r["stat"] for r in g.orderBy("slot_s").collect()] == [None, 10.0, 10.0]
    g2 = evaluate_target(parse_target("round(sigmoid(c), 2)"),
                         _resolver(spark, [("c", 10, 0.0)]))
    assert g2.collect()[0]["stat"] == 0.5
    g3 = evaluate_target(parse_target("minMax(c)"),
                         _resolver(spark, [("c", 10, 5.0), ("c", 20, 15.0)]))
    assert {r["slot_s"]: r["stat"] for r in g3.collect()} == {10: 0.0, 20: 1.0}
    g4 = evaluate_target(parse_target("timeSlice(c, '15s', '25s')"),
                         _resolver(spark, [("c", 10, 1.0), ("c", 20, 2.0), ("c", 30, 3.0)]))
    assert {r["slot_s"]: r["stat"] for r in g4.collect()} == {10: None, 20: 2.0, 30: None}


def _graphite_ema(vals, n):
    """Reference loop, straight from graphite-web functions.py: SMA of the
    first n points seeds the EMA; None emits None without updating."""
    alpha = 2.0 / (n + 1.0)
    head = [v for v in vals[:n] if v is not None]
    ema = sum(head) / len(head) if head else 0.0
    out = [None] * (n - 1) + [ema]
    for v in vals[n:]:
        if v is None:
            out.append(None)
        else:
            ema = alpha * v + (1 - alpha) * ema
            out.append(ema)
    return out


def test_batch2_ema_matches_graphite_sma_seed(spark):
    vals = [10.0, 12.0, 9.0, 14.0, None, 11.0, 13.0]
    rows = [("m", (i + 1) * 10, v) for i, v in enumerate(vals)]
    g = evaluate_target(
        parse_target("exponentialMovingAverage(m, 3)"), _resolver(spark, rows)
    )
    got = [r["stat"] for r in g.orderBy("slot_s").collect()]
    want = _graphite_ema(vals, 3)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert (a is None) == (b is None)
        if a is not None:
            assert abs(a - b) < 1e-9


def test_batch2_ema_first_seed_matches_recursive(spark):
    from cassabon_spark.functions.series import exponential_moving_average

    vals = [10.0, 12.0, 9.0, 14.0, 11.0, 13.0]
    rows = [("m", (i + 1) * 10, v) for i, v in enumerate(vals)]
    grid = spark.createDataFrame(rows, "path string, slot_s bigint, stat double")
    g = exponential_moving_average(grid, 3, seed="first")
    got = [r["stat"] for r in g.orderBy("slot_s").collect()]
    alpha = 2.0 / 4.0
    want = [vals[0]]
    for v in vals[1:]:
        want.append(alpha * v + (1 - alpha) * want[-1])
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, want))


def test_batch2_divide_series_lists(spark):
    rows = [
        ("num.a", 10, 10.0), ("num.b", 10, 20.0),
        ("den.a", 10, 2.0), ("den.b", 10, 4.0),
    ]
    g = evaluate_target(
        parse_target("divideSeriesLists(num.*, den.*)"), _resolver(spark, rows)
    )
    out = {r["path"]: r["stat"] for r in g.collect()}
    assert out == {"num.a": 5.0, "num.b": 5.0}


def test_batch2_generators_and_presentation(spark):
    ctx = {"spark": spark, "from_s": 0, "to_s": 20, "step": 10}
    rows = [("m", 10, 1.0)]
    g = evaluate_target(
        parse_target("sinFunction('wave', 2)"), _resolver(spark, rows), ctx
    )
    import math

    out = {r["slot_s"]: r["stat"] for r in g.collect()}
    assert abs(out[10] - 2 * math.sin(10)) < 1e-12
    # presentation no-ops pass series through untouched
    g2 = evaluate_target(
        parse_target("secondYAxis(lineWidth(dashed(m), 2))"), _resolver(spark, rows)
    )
    assert g2.collect()[0]["stat"] == 1.0
    g3 = evaluate_target(
        parse_target("holtWintersConfidenceBands(m, 2, 3)"),
        _resolver(spark, [("m", 10 * i, float(i % 3)) for i in range(1, 13)]),
    )
    paths = {r["path"] for r in g3.select("path").distinct().collect()}
    assert paths == {"m upper", "m lower"}


def test_remove_empty_fallback_use_above(spark):
    rows = [
        ("a", 10, None), ("a", 20, None),
        ("b", 10, 1.0), ("b", 20, 2.0),
        ("b.detail", 10, 7.0),
    ]
    g = evaluate_target(parse_target("removeEmptySeries(group(a, b))"),
                        _resolver(spark, rows))
    assert {r["path"] for r in g.collect()} == {"b"}
    g2 = evaluate_target(parse_target("fallbackSeries(nosuch.path, b)"),
                         _resolver(spark, rows))
    assert {r["path"] for r in g2.collect()} == {"b"}
    g3 = evaluate_target(parse_target("fallbackSeries(b, a)"),
                         _resolver(spark, rows))
    assert {r["path"] for r in g3.collect()} == {"b"}
    # b's max 2.0 > 1.5 -> fetch 'b.detail' instead (search 'b' -> 'b.detail')
    g4 = evaluate_target(
        parse_target("useSeriesAbove(b, 1.5, 'b', 'b.detail')"),
        _resolver(spark, rows),
    )
    assert {(r["path"], r["stat"]) for r in g4.collect()} == {("b.detail", 7.0)}


def test_engine_render_sort_order(spark, tmp_path):
    """sortByTotal's __ord drives the collect order: the response series
    dict iterates biggest-total first."""
    eng = _mk_engine(spark, tmp_path, method="sum")
    lines = [f"evt.small 1 {BASE}", f"evt.big 100 {BASE}", f"evt.mid 10 {BASE}"]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    out = eng.render_target(
        "sortByTotal(evt.*)", BASE - 10, BASE + 20, now_s=BASE + 30
    )
    assert list(out["series"]) == ["evt.big", "evt.mid", "evt.small"]


# ------------------------------------------------- round-3 function batch


def test_batch3_moving_window_and_add(spark):
    rows = [("m", 10, 1.0), ("m", 20, 3.0), ("m", 30, 5.0)]
    g = evaluate_target(
        parse_target("movingWindow(m, 2, 'sum')"), _resolver(spark, rows)
    )
    assert {r["slot_s"]: r["stat"] for r in g.collect()} == {10: 1.0, 20: 4.0, 30: 8.0}
    g2 = evaluate_target(parse_target("add(m, 10)"), _resolver(spark, rows))
    assert {r["slot_s"]: r["stat"] for r in g2.collect()} == {10: 11.0, 20: 13.0, 30: 15.0}


def test_batch3_aggregate_series_lists(spark):
    rows = [
        ("num.a", 10, 10.0), ("num.b", 10, 20.0),
        ("den.a", 10, 2.0), ("den.b", 10, 4.0),
    ]
    g = evaluate_target(
        parse_target("aggregateSeriesLists(num.*, den.*, 'diff')"),
        _resolver(spark, rows),
    )
    assert {r["path"]: r["stat"] for r in g.collect()} == {"num.a": 8.0, "num.b": 16.0}
    with pytest.raises(TargetSyntaxError, match="same length"):
        evaluate_target(
            parse_target("aggregateSeriesLists(num.*, den.a, 'sum')"),
            _resolver(spark, rows),
        )


def test_batch3_group_by_tags(spark):
    rows = [
        ("disk.used;dc=east;host=w1", 10, 1.0),
        ("disk.used;dc=east;host=w2", 10, 2.0),
        ("disk.used;dc=west;host=w3", 10, 5.0),
    ]
    g = evaluate_target(
        parse_target("groupByTags(disk.*, 'sum', 'dc')"),
        _resolver(spark, [(p, s, v) for p, s, v in rows]),
    )
    assert {r["path"]: r["stat"] for r in g.collect()} == {"east": 3.0, "west": 5.0}


def test_batch3_cumulative_scopes_sum(spark, tmp_path):
    eng = _mk_engine(spark, tmp_path)
    lines = [f"evt.a {i} {BASE + i * 10}" for i in range(12)]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    capped = eng.render_target(
        "cumulative(evt.a)", BASE - 10, BASE + 120, now_s=BASE + 130, max_datapoints=5
    )
    # coarse bucket (BASE+10, BASE+40] holds 1,2,3 -> sum 6 (avg would be 2)
    assert capped["series"]["evt.a"][1] == 6.0


def test_batch3_generators_time_and_random_walk(spark):
    ctx = {"spark": spark, "from_s": 10, "to_s": 40, "step": 10}
    g = evaluate_target(parse_target("time('t')"), lambda gl: None, ctx)
    assert [(r["slot_s"], r["stat"]) for r in g.orderBy("slot_s").collect()] == [
        (10, 10.0), (20, 20.0), (30, 30.0), (40, 40.0)
    ]
    rw = evaluate_target(parse_target("randomWalk('w')"), lambda gl: None, ctx)
    vals = [r["stat"] for r in rw.orderBy("slot_s").collect()]
    assert len(vals) == 4 and all(v is not None for v in vals)
    # deterministic: same context -> same walk
    rw2 = evaluate_target(parse_target("randomWalk('w')"), lambda gl: None, ctx)
    assert [r["stat"] for r in rw2.orderBy("slot_s").collect()] == vals
    # it is a walk: steps bounded by 0.5
    steps = [b - a for a, b in zip(vals, vals[1:])]
    assert all(abs(s) <= 0.5 for s in steps)
