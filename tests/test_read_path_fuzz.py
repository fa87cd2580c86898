"""Randomized differential testing of the read path (A10-A15) against an
independent DuckDB implementation of the same semantics.

The fixed oracle queries cover specific (step, method, range) combinations;
this harness fuzzes the fiddly space — off-grid tier rows, step larger /
equal to the tier, every rollup method, boundary-aligned and unaligned
from/to — and cross-checks the ENTIRE pipeline: ingest rollup -> scan ->
always-advance normalization -> merge-to-next-boundary -> gap-fill ->
NaN scrub. SURVEY §7 hard-part 1 is exactly this code."""

from __future__ import annotations

import math

import duckdb
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassabon_spark.config import RollupConfig
from cassabon_spark.operators.query import normalize_from, query_metrics_df
from cassabon_spark.operators.rollup import rollup_finest, route
import pytest

# r15 test tiering (VERDICT r14 #2): randomized read-path fuzz vs DuckDB.
# Excluded from the default verify tier; run with -m slow.
pytestmark = pytest.mark.slow

TIER_S = 10  # finest tier everywhere; steps probe at/above tier size

series_strategy = st.lists(
    st.tuples(
        st.sampled_from(["p.a", "p.b"]),
        st.one_of(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.just(float("nan")),
        ),
        st.integers(min_value=1000, max_value=1240),
    ),
    min_size=1,
    max_size=40,
)

params_strategy = st.tuples(
    st.sampled_from(["average", "sum", "min", "max", "last"]),
    st.sampled_from([10, 20, 30]),  # step == tier and coarser (off-grid merge)
    st.integers(min_value=990, max_value=1060),  # from
    st.integers(min_value=60, max_value=240),  # range length
)


def _duckdb_expected(rows, method, step, from_s, to_s):
    """Independent DuckDB implementation: tier rollup (10s windows with
    close-time stamping, carried sum/count and latest-by-ts last), then
    merge slot = ceil(close/step)*step with the method, then dense grid.

    LAST ties on the timestamp break to the larger value — max over the
    (ts, value) struct, NaN greatest — matching the engine's deterministic
    refinement (operators/rollup.py)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE m(path VARCHAR, value DOUBLE, ts BIGINT)")
    con.executemany("INSERT INTO m VALUES (?, ?, ?)", rows)
    nfrom = from_s + (step - from_s % step)
    if nfrom > to_s:
        return {}
    stat = {
        "average": "SUM(vsum) / SUM(cnt)",
        "sum": "SUM(vsum2)",
        "min": "MIN(vmin)",
        "max": "MAX(vmax)",
        "last": "MAX({'ts': last_ts, 'v': vlast}).v",
    }[method]
    q = f"""
    WITH tier AS (
      SELECT path,
             CAST(FLOOR(ts / {TIER_S}) * {TIER_S} + {TIER_S} AS BIGINT) AS close_s,
             COUNT(*) AS cnt, SUM(value) AS vsum, SUM(value) AS vsum2,
             MIN(value) AS vmin, MAX(value) AS vmax,
             MAX({{'ts': ts, 'v': value}}).v AS vlast, MAX(ts) AS last_ts
      FROM m GROUP BY 1, 2
      HAVING close_s >= {from_s} AND close_s <= {to_s}
    ),
    merged AS (
      SELECT path,
             CAST(FLOOR((close_s + {step} - 1) / {step}) * {step} AS BIGINT) AS slot_s,
             {stat} AS stat
      FROM tier GROUP BY 1, 2
      HAVING slot_s >= {nfrom} AND slot_s <= {to_s}
    )
    SELECT path, slot_s, CASE WHEN ISNAN(stat) THEN NULL ELSE stat END AS stat
    FROM merged
    """
    out = {}
    for path, slot, stat_v in con.execute(q).fetchall():
        out[(path, slot)] = stat_v
    con.close()
    return out


CFG_BY_METHOD = {
    m: RollupConfig.from_dict({"default": {"method": m, "windows": [f"{TIER_S}s:1d"]}})
    for m in ["average", "sum", "min", "max", "last"]
}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(series_strategy, params_strategy)
def test_read_path_matches_independent_duckdb(spark, rows, params):
    method, step, from_s, length = params
    to_s = from_s + length
    cfg = CFG_BY_METHOD[method]
    metrics = spark.createDataFrame(
        [(p, float(v), float(ts)) for p, v, ts in rows],
        "path string, value double, ts double",
    )
    finest = rollup_finest(route(metrics, cfg), cfg)
    grid = query_metrics_df(
        spark, finest, ["p.a", "p.b"], from_s, to_s, step, method
    ).collect()

    # NaN values poison the tier row; duckdb mirrors because SUM/MIN/MAX/ARG_MAX
    # propagate NaN the same way, and both scrub NaN -> null at the end
    expected = _duckdb_expected(
        [(p, v, ts) for p, v, ts in rows], method, step, from_s, to_s
    )
    nfrom = normalize_from(from_s, step)
    n_slots = (to_s - nfrom) // step + 1 if nfrom <= to_s else 0
    assert len(grid) == 2 * n_slots
    for r in grid:
        exp = expected.get((r["path"], r["slot_s"]))
        got = r["stat"]
        if exp is None or got is None:
            assert exp is None and got is None, (r, exp)
        else:
            assert math.isclose(got, exp, rel_tol=1e-9, abs_tol=1e-9), (r, exp)
