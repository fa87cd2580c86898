"""Graphite target-string grammar: parse + evaluate over grid DataFrames."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from cassabon_spark.functions.graphite import (
    Call,
    PathGlob,
    TargetSyntaxError,
    evaluate_target,
    parse_target,
    target_globs,
)


def test_parse_shapes():
    n = parse_target("movingAverage(scale(evt.click, 10), 3)")
    assert isinstance(n, Call) and n.name == "movingAverage"
    inner, window = n.args
    assert isinstance(inner, Call) and inner.name == "scale"
    assert isinstance(inner.args[0], PathGlob) and inner.args[0].glob == "evt.click"
    assert inner.args[1] == 10
    assert window == 3

    n = parse_target('summarize(evt.*, "1h", "sum")')
    assert n.args[1] == "1h" and n.args[2] == "sum"

    n = parse_target("offset(evt.a, -2.5)")
    assert n.args[1] == -2.5

    assert isinstance(parse_target("evt.server-1.cpu_load.*"), PathGlob)
    assert target_globs(parse_target("sumSeries(a.b, diffSeries(c.d, e.*))")) == [
        "a.b", "c.d", "e.*",
    ]


def test_parse_errors():
    for bad in ["f(", "f(a,,b)", 'summarize(x, "1h']:
        with pytest.raises(TargetSyntaxError):
            parse_target(bad)
    with pytest.raises(TargetSyntaxError):
        parse_target("movingAverage(evt.a, 3) trailing")


def _resolver(spark, rows):
    from cassabon_spark.operators.index import glob_to_regex

    df = spark.createDataFrame(rows, "path string, slot_s bigint, stat double")

    def grid_for_glob(glob):
        return df.filter(F.col("path").rlike(glob_to_regex(glob)))

    return grid_for_glob


def _vals(grid, path):
    return [
        r["stat"] for r in grid.filter(F.col("path") == path).orderBy("slot_s").collect()
    ]


def test_evaluate_chain(spark):
    rows = [("evt.a", 10, 1.0), ("evt.a", 20, 4.0), ("evt.b", 10, 2.0), ("evt.b", 20, 6.0)]
    g = evaluate_target(
        parse_target("scale(sumSeries(evt.*), 10)"), _resolver(spark, rows)
    )
    assert _vals(g, "sumSeries") == [30.0, 100.0]


def test_evaluate_summarize_interval_and_how(spark):
    rows = [("evt.a", 10, 1.0), ("evt.a", 20, 4.0), ("evt.a", 30, 2.0)]
    g = evaluate_target(
        parse_target('summarize(evt.a, "20s", "max")'), _resolver(spark, rows)
    )
    out = {r["slot_s"]: r["stat"] for r in g.collect()}
    assert out == {20: 4.0, 40: 2.0}


def test_evaluate_diff_series_base_not_glob(spark):
    rows = [("evt.a", 10, 10.0), ("evt.b", 10, 3.0)]
    g = evaluate_target(
        parse_target("diffSeries(evt.a, evt.b)"), _resolver(spark, rows)
    )
    assert _vals(g, "diffSeries") == [7.0]
    with pytest.raises(TargetSyntaxError):
        evaluate_target(parse_target("diffSeries(evt.*, evt.b)"), _resolver(spark, rows))


def test_evaluate_unknown_function(spark):
    with pytest.raises(TargetSyntaxError):
        evaluate_target(parse_target("noSuchFn(evt.a)"), _resolver(spark, []))


def test_divide_series_and_as_percent(spark):
    rows = [
        ("evt.a", 10, 8.0), ("evt.a", 20, 9.0),
        ("evt.total", 10, 2.0), ("evt.total", 20, 0.0),
    ]
    g = evaluate_target(
        parse_target("divideSeries(evt.a, evt.total)"), _resolver(spark, rows)
    )
    assert _vals(g, "evt.a") == [4.0, None]  # /0 -> null
    with pytest.raises(TargetSyntaxError):
        parse_target("divideSeries(evt.a)")  # parse ok...
        evaluate_target(parse_target("divideSeries(evt.a)"), _resolver(spark, rows))

    rows2 = [("evt.a", 10, 1.0), ("evt.b", 10, 3.0)]
    g2 = evaluate_target(parse_target("asPercent(evt.*)"), _resolver(spark, rows2))
    assert _vals(g2, "evt.a") == [25.0] and _vals(g2, "evt.b") == [75.0]


def test_threshold_filters(spark):
    rows = [
        ("evt.hot", 10, 10.0), ("evt.hot", 20, 20.0),
        ("evt.cold", 10, 1.0), ("evt.cold", 20, 0.0),
    ]
    g = evaluate_target(parse_target("averageAbove(evt.*, 5)"), _resolver(spark, rows))
    assert {r["path"] for r in g.select("path").distinct().collect()} == {"evt.hot"}
    g2 = evaluate_target(parse_target("currentBelow(evt.*, 5)"), _resolver(spark, rows))
    assert {r["path"] for r in g2.select("path").distinct().collect()} == {"evt.cold"}


def test_engine_render_target(spark, tmp_path):
    from cassabon_spark.config import RollupConfig
    from cassabon_spark.engine import Engine

    cfg = RollupConfig.from_dict(
        {"default": {"method": "average", "windows": ["10s:1h"]}}
    )
    eng = Engine(spark, cfg, str(tmp_path / "store"), str(tmp_path / "index"))
    base = 1_700_000_000 - (1_700_000_000 % 10)
    lines = [
        f"evt.a {v} {base + i * 10}" for i, v in enumerate([1, 2, 3, 4, 5, 6])
    ] + [
        f"evt.b {v} {base + i * 10}" for i, v in enumerate([10, 20, 30, 40, 50, 60])
    ]
    eng.ingest_lines(spark.createDataFrame([(l,) for l in lines], "line string"))
    out = eng.render_target(
        "sumSeries(evt.*)", base - 10, base + 60, now_s=base + 70
    )
    assert out["step"] == 10
    # values at ts=base+10i land in windows closing base+10(i+1); the grid's
    # first slot (base) is empty (A12 always-advance normalization)
    assert out["series"]["sumSeries"] == [None, 11.0, 22.0, 33.0, 44.0, 55.0, 66.0]
    out2 = eng.render_target(
        'aliasByNode(movingSum(evt.a, 2), 1)', base - 10, base + 60, now_s=base + 70
    )
    assert out2["series"]["a"] == [None, 1.0, 3.0, 5.0, 7.0, 9.0, 11.0]


def test_group_and_limit(spark):
    rows = [("evt.a", 10, 1.0), ("evt.b", 10, 2.0), ("evt.c", 10, 3.0)]
    g = evaluate_target(
        parse_target("limit(group(evt.a, evt.b, evt.c), 2)"), _resolver(spark, rows)
    )
    assert sorted(r["path"] for r in g.collect()) == ["evt.a", "evt.b"]


def test_parser_roundtrip_property():
    """Random nested targets print -> parse -> identical AST (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.sampled_from(["movingAverage", "sumSeries", "alias", "summarize", "f"])
    seg = st.from_regex(r"[a-z][a-z0-9_-]{0,5}", fullmatch=True)
    paths = st.builds(".".join, st.lists(seg, min_size=1, max_size=4))

    def to_str(node):
        if isinstance(node, Call):
            return f"{node.name}({', '.join(to_str(a) for a in node.args)})"
        if isinstance(node, PathGlob):
            return node.glob
        if isinstance(node, str):
            return f"'{node}'"
        return repr(node)

    leaf = st.one_of(
        paths.map(PathGlob),
        st.integers(-1000, 1000),
        st.from_regex(r"[a-z0-9 .]{0,8}", fullmatch=True),
    )

    def calls(children):
        return st.builds(
            Call, names, st.lists(children, min_size=1, max_size=3)
        )

    target = st.recursive(paths.map(PathGlob), calls, max_leaves=8).flatmap(
        lambda base: st.one_of(st.just(base), calls(st.one_of(leaf, st.just(base))))
    )

    @settings(max_examples=60, deadline=None)
    @given(target)
    def check(node):
        printed = to_str(node)
        reparsed = parse_target(printed)

        def norm(n):
            if isinstance(n, Call):
                return ("call", n.name, tuple(norm(a) for a in n.args))
            if isinstance(n, PathGlob):
                return ("path", n.glob)
            if isinstance(n, float) and n.is_integer():
                return ("num", int(n))
            if isinstance(n, int):
                return ("num", n)
            return ("str", n)

        # a bare path segment inside quotes stays a string; bare ints parse
        # back as ints — compare normalized trees
        assert norm(reparsed) == norm(node)

    check()


def test_npercentile_aggregateline_mostdeviant(spark):
    rows = [
        ("flat", 10, 5.0), ("flat", 20, 5.0), ("flat", 30, 5.0), ("flat", 40, None),
        ("wild", 10, 0.0), ("wild", 20, 100.0), ("wild", 30, 0.0), ("wild", 40, 100.0),
    ]
    g = evaluate_target(parse_target("nPercentile(flat, 50)"), _resolver(spark, rows))
    assert _vals(g, "flat") == [5.0, 5.0, 5.0, None]
    g2 = evaluate_target(
        parse_target("aggregateLine(wild, 'max')"), _resolver(spark, rows)
    )
    assert _vals(g2, "wild") == [100.0] * 4
    g3 = evaluate_target(parse_target("mostDeviant(group(flat, wild), 1)"), _resolver(spark, rows))
    assert {r["path"] for r in g3.select("path").distinct().collect()} == {"wild"}


def test_weighted_average(spark):
    rows = [
        # value series
        ("lat.s1.avg", 10, 10.0), ("lat.s2.avg", 10, 20.0),
        # weight series (request counts): s1 three times the weight of s2
        ("lat.s1.n", 10, 3.0), ("lat.s2.n", 10, 1.0),
    ]
    g = evaluate_target(
        parse_target("weightedAverage(lat.*.avg, lat.*.n, 1)"),
        _resolver(spark, rows),
    )
    # (10*3 + 20*1) / (3+1) = 12.5
    out = {r["slot_s"]: r["stat"] for r in g.collect()}
    assert out == {10: 12.5}


def test_time_stack(spark):
    rows = [("m", 10, 1.0), ("m", 20, 2.0)]
    g = evaluate_target(
        parse_target("timeStack(m, '10s', 0, 2)"), _resolver(spark, rows)
    )
    out = {(r["path"], r["slot_s"]): r["stat"] for r in g.collect()}
    assert out == {
        ("m_shift_0", 10): 1.0, ("m_shift_0", 20): 2.0,
        ("m_shift_1", 20): 1.0, ("m_shift_1", 30): 2.0,
    }


def test_engine_render_targets_merge(spark, tmp_path):
    from cassabon_spark.config import RollupConfig
    from cassabon_spark.engine import Engine

    cfg = RollupConfig.from_dict({"default": {"method": "sum", "windows": ["10s:1h"]}})
    eng = Engine(spark, cfg, str(tmp_path / "s"), str(tmp_path / "i"))
    base = 1_700_000_000 - (1_700_000_000 % 10)
    eng.ingest_lines(spark.createDataFrame(
        [(f"m.a 1 {base}",), (f"m.b 2 {base}",)], "line string"))
    out = eng.render_targets(
        ["alias(m.a, 'x')", "alias(m.b, 'y')"], base - 10, base + 10, now_s=base + 20
    )
    assert set(out["series"]) == {"x", "y"}
