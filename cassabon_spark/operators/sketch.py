"""Mergeable percentile sketches for multi-tier rollups.

The engine's exact percentile rollup (queries/carbon.py
carbon_percentile_rollup) computes interpolated p50/p95/p99 per (path,
window) at ONE tier. Exact percentiles do NOT re-aggregate: p95 of 6h
cannot be derived from six 1h p95 values (the reference's 5 methods —
metricstore.go:25-43 — are all decomposable; percentiles are not). The
reference never faces this because it has no percentile method at all.

This module stores what IS decomposable: a fixed-range linear-bin
histogram. Counts merge across windows/tiers by addition (lossless), and
any quantile is answered from the merged counts with one cumulative walk.
Accuracy is bounded by the bin width ((hi-lo)/nbins absolute error — the
statsd-histogram contract, where the operator declares its value range up
front, e.g. timer milliseconds).

Bin edges are computed with IEEE add/mul/div only — NO log/exp — so the
same arithmetic in another engine (the DuckDB oracle) lands every value in
the same bin bit-for-bit. A log-spaced variant would give relative-error
bounds but needs libm, whose ulp differences across engines flip boundary
bins; if relative error matters, pre-transform the value column with the
SAME expression on both sides and accept the boundary hazard.

Scale shape: sketch build is one groupBy (keys, bin) count — map-side
partial aggregation absorbs the fan-in; merged sketches are (keys x
nbins)-sized, orders of magnitude smaller than the points. Quantile
extraction is a window cumulative-sum over nbins rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bin_expr(value_col, lo: float, hi: float, nbins: int):
    """Bin index: 0 = underflow (< lo), nbins+1 = overflow (>= hi), else
    1 + floor((v - lo) / (hi - lo) * nbins). Pure IEEE arithmetic."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    scaled = (v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(nbins))
    return (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(nbins + 1))
        .otherwise(F.floor(scaled).cast("int") + 1)
        .cast("int")
    )


def histogram_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """(keys..., bin, cnt): the mergeable rollup record. Nulls are dropped
    (a percentile over nulls is undefined, matching percentile())."""
    b = bin_expr(value_col, lo, hi, nbins)
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_sketches(sketch: DataFrame, keys: list[str]) -> DataFrame:
    """Re-key a sketch onto coarser keys (e.g. 1h windows -> 6h windows)
    and add counts — the lossless percentile re-aggregation the exact
    rollup cannot do. `sketch` must already carry the new key columns."""
    return sketch.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def sketch_quantiles(
    sketch: DataFrame,
    keys: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """One row per key group with a column per requested quantile.

    Estimator: target rank = q * total; walk bins in order; inside the
    first bin whose cumulative count reaches the target, interpolate
    linearly: est = bin_lo + (target - cum_below) / cnt_bin * width.
    Underflow clamps to lo, overflow to hi. All IEEE arithmetic — the
    oracle reproduces it exactly.
    """
    width = (hi - lo) / nbins
    w = Window.partitionBy(*keys).orderBy("bin")
    whole = Window.partitionBy(*keys)
    cum = F.sum("cnt").over(w)
    total = F.sum("cnt").over(whole)
    annotated = sketch.select(
        *keys,
        "bin",
        "cnt",
        cum.alias("cum"),
        (cum - F.col("cnt")).alias("cum_below"),
        total.alias("total"),
    )
    outs = []
    for q in qs:
        target = F.lit(float(q)) * F.col("total")
        # value estimate for THIS bin if it is the target bin
        bin_lo = F.lit(float(lo)) + (F.col("bin") - 1) * F.lit(float(width))
        inner = bin_lo + (target - F.col("cum_below")) / F.col("cnt") * F.lit(
            float(width)
        )
        est = (
            F.when(F.col("bin") == 0, F.lit(float(lo)))
            .when(F.col("bin") == nbins + 1, F.lit(float(hi)))
            .otherwise(F.least(F.greatest(inner, F.lit(float(lo))), F.lit(float(hi))))
        )
        hit = (F.col("cum") >= target) & (F.col("cum_below") < target)
        outs.append(F.min(F.when(hit, est)).alias(f"q{int(q * 100)}"))
    return annotated.groupBy(*keys).agg(*outs)


def sketch_quantiles_sql(
    source_sql: str,
    keys: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    nbins: int,
    value_col: str = "value",
) -> str:
    """The DuckDB twin of histogram_sketch + sketch_quantiles, emitted as a
    WITH-chain over `source_sql` (which must yield keys + value_col).
    Keeps oracle arithmetic literally identical to the Spark expressions.
    """
    keycols = ", ".join(keys)
    width = (hi - lo) / nbins
    qcols = ",\n  ".join(
        f"MIN(CASE WHEN cum >= {q} * total AND cum_below < {q} * total THEN "
        f"CASE WHEN bin = 0 THEN {lo} WHEN bin = {nbins + 1} THEN {hi} "
        f"ELSE LEAST(GREATEST(({lo} + (bin - 1) * {width}) + "
        f"({q} * total - cum_below) / cnt * {width}, {lo}), {hi}) END END) "
        f"AS q{int(q * 100)}"
        for q in qs
    )
    return f"""
WITH src AS ({source_sql}),
sk AS (
  SELECT {keycols},
         CASE WHEN {value_col} < {lo} THEN 0
              WHEN {value_col} >= {hi} THEN {nbins + 1}
              ELSE CAST(FLOOR(({value_col} - {lo}) / {hi - lo} * {nbins}) AS INT) + 1
         END AS bin,
         COUNT(*) AS cnt
  FROM src WHERE {value_col} IS NOT NULL
  GROUP BY ALL
),
ann AS (
  SELECT {keycols}, bin, cnt,
         SUM(cnt) OVER (PARTITION BY {keycols} ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY {keycols} ORDER BY bin) - cnt AS cum_below,
         SUM(cnt) OVER (PARTITION BY {keycols}) AS total
  FROM sk
)
SELECT {keycols},
  {qcols}
FROM ann
GROUP BY ALL
"""
