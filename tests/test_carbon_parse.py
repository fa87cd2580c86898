"""A3 parse/validate over the reference's malformed-line corpus
(listener/carbon_plaintext_test.go:65-76 via FIXTURES.md §1.2)."""

from __future__ import annotations

from cassabon_spark.sources.carbon import parse_carbon_lines

CORPUS = [
    ("foo.bar 1.5 1000", ("foo.bar", 1.5, 1000.0)),
    ("foo.bar 1.5e2 1000.5", ("foo.bar", 150.0, 1000.5)),  # scientific + float ts
    ("  spaced \t 2.5   1007  ", ("spaced", 2.5, 1007.0)),  # whitespace runs (strings.Fields)
    ("two fields", None),
    ("a b c d", None),  # 4 fields
    ("carbon.terrible 9 Qsplork", None),  # non-numeric ts
    ("bad_value xyz 1000", None),  # non-numeric value
    ("justonefield", None),
    ('<<peerlist={"A":"127.0.0.1:2003"}>>', None),  # peer-control traffic
    ("nan.metric NaN 1000", ("nan.metric", None, 1000.0)),  # NaN parses (checked below)
]


def test_parse_corpus(spark):
    import math

    lines = spark.createDataFrame([(l,) for l, _ in CORPUS], "line string")
    metrics, obs = parse_carbon_lines(lines, observe=True)
    got = {
        (r["path"], "NaN" if math.isnan(r["value"]) else r["value"], r["ts"])
        for r in metrics.collect()
    }
    expected = {
        (p, "NaN" if v is None else v, t) for _, e in CORPUS if e is not None for p, v, t in [e]
    }
    assert got == expected
    # observe: 10 lines, 1 peer-control excluded pre-count, 5 malformed dropped
    got = obs.get
    assert got["total"] == 9
    assert got["malformed"] == 5


def test_parse_is_pure_catalyst(spark):
    """The hot path must stay in whole-stage codegen — no Python UDFs."""
    lines = spark.createDataFrame([("a 1 2",)], "line string")
    metrics, _ = parse_carbon_lines(lines)
    plan = metrics._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
