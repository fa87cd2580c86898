"""Rollup semantics goldens: the 5 methods over the stresstest triangle wave
(devtools/stresstest.go:86-135 via SURVEY §5), window close stamping,
multi-tier lossless re-aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cassabon_spark.config import RollupConfig
from cassabon_spark.operators.rollup import rollup_all_tiers, rollup_finest, route

CFG = RollupConfig.from_dict(
    {
        r"^tri\.average$": {"method": "average", "windows": ["6s:30m", "60s:30d"]},
        r"^tri\.max$": {"method": "max", "windows": ["6s:30m", "60s:30d"]},
        r"^tri\.min$": {"method": "min", "windows": ["6s:30m", "60s:30d"]},
        r"^tri\.sum$": {"method": "sum", "windows": ["6s:30m", "60s:30d"]},
        r"^tri\.last$": {"method": "last", "windows": ["6s:30m", "60s:30d"]},
        "default": {"method": "average", "windows": ["6s:30m", "60s:30d"]},
    }
)


def triangle_wave(n):
    """1..100 up, 99..2 down, repeating — the stresstest shape."""
    cycle = list(range(1, 101)) + list(range(99, 1, -1))
    return [cycle[i % len(cycle)] for i in range(n)]


@pytest.fixture(scope="module")
def rollups(spark):
    # one sample per second per path over 120 s starting at t=600
    vals = triangle_wave(120)
    rows = []
    for i, v in enumerate(vals):
        for m in ["average", "max", "min", "sum", "last"]:
            rows.append((f"tri.{m}", float(v), 600.0 + i))
    metrics = spark.createDataFrame(rows, "path string, value double, ts double")
    return rollup_all_tiers(metrics, CFG).cache()


def _stat(rollups, path, res, time_s):
    rows = rollups.filter(
        (F.col("path") == path)
        & (F.col("resolution_s") == res)
        & (F.unix_timestamp("time") == time_s)
    ).collect()
    assert len(rows) == 1, f"{path}@{time_s}/{res}: {rows}"
    return rows[0]


def test_five_methods_first_window(rollups):
    # window [600, 606) closes at 606; values 1..6
    w = list(range(1, 7))
    assert _stat(rollups, "tri.average", 6, 606)["stat"] == sum(w) / 6
    assert _stat(rollups, "tri.max", 6, 606)["stat"] == 6
    assert _stat(rollups, "tri.min", 6, 606)["stat"] == 1
    assert _stat(rollups, "tri.sum", 6, 606)["stat"] == sum(w)
    assert _stat(rollups, "tri.last", 6, 606)["stat"] == 6  # latest-by-ts


def test_descending_leg_last_vs_max(rollups):
    # window [702, 708): i = 102..107 -> values 97,96,95,94,93,92 (descending)
    assert _stat(rollups, "tri.max", 6, 708)["stat"] == 97
    assert _stat(rollups, "tri.last", 6, 708)["stat"] == 92  # NOT the max


def test_window_close_time_stamping(rollups):
    closes = [
        r["t"]
        for r in rollups.filter((F.col("path") == "tri.sum") & (F.col("resolution_s") == 6))
        .select(F.unix_timestamp("time").alias("t"))
        .collect()
    ]
    assert all(c % 6 == 0 for c in closes)
    assert min(closes) == 606 and max(closes) == 720


def test_coarse_tier_lossless(rollups):
    # 60s tier [600,660) closes at 660: values 1..60
    w = list(range(1, 61))
    assert _stat(rollups, "tri.sum", 60, 660)["stat"] == sum(w)
    assert _stat(rollups, "tri.average", 60, 660)["stat"] == sum(w) / 60
    assert _stat(rollups, "tri.max", 60, 660)["stat"] == 60
    assert _stat(rollups, "tri.min", 60, 660)["stat"] == 1
    assert _stat(rollups, "tri.last", 60, 660)["stat"] == 60
    # average carries (vsum, cnt): exact weighted re-agg, not avg-of-avgs
    r = _stat(rollups, "tri.average", 60, 660)
    assert r["cnt"] == 60 and r["vsum"] == sum(w)


def test_out_of_order_last_is_latest_by_ts(spark):
    """SURVEY §2 note ①: reference LAST is arrival-order; engine defines
    latest-by-timestamp (deterministic refinement)."""
    metrics = spark.createDataFrame(
        [("p", 1.0, 100.0), ("p", 99.0, 105.0), ("p", 2.0, 103.0)],
        "path string, value double, ts double",
    )
    cfg = RollupConfig.from_dict({"default": {"method": "last", "windows": ["10s:1h"]}})
    out = rollup_finest(route(metrics, cfg), cfg).collect()
    assert len(out) == 1
    assert out[0]["stat"] == 99.0  # value at max ts, regardless of row order


def test_routing_is_jvm_side(spark):
    metrics = spark.createDataFrame([("tri.max", 1.0, 0.0)], "path string, value double, ts double")
    routed = route(metrics, CFG)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
