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


# ------------- HyperLogLog / KMV production helpers (r9, VERDICT r8 #4)
#
# The gated registry entries (sketch_hll_distinct / sketch_hll_union /
# sketch_kmv_distinct, queries/extensions.py) carry an EXACT-computation
# truth arm (countDistinct over all raw values) purely so the estimator
# sits under the exact-oracle gate — at scale that arm is the single most
# expensive part of the query and exists only for verification. These are
# the engine-facing forms a production caller uses INSTEAD of copying a
# gated entry: sketch build + merge + estimate, no truth arm. The gated
# entries are built ON these helpers, and tests/test_sketch_helpers.py
# pins that the entries' sketch columns equal the helpers' output.

# HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007): m=256 registers
# indexed by the low 8 bits of the portable 48-bit md5 hash; register =
# max rho over the remaining 40 value bits (rho = leading-zero count + 1,
# here 41 - bitlength). Raw estimator alpha_m * m^2 / sum 2^-M_j, no bias
# correction — the estimate is a deterministic formula both engines share
# bit-for-bit, so it can sit under an exact gate; its accuracy is a
# REPORTED number (rel_err in the gated entries), not an assumption.
HLL_M = 256
HLL_ALPHA = 0.7213 / (1 + 1.079 / 256)


def hll_registers(
    df: DataFrame, keys: list[str], value_col: str, prefix: str = "hll:"
) -> DataFrame:
    """(keys..., idx, m): the mergeable HLL register table for the
    distinct count of `value_col` per key group. One linear hash-agg —
    map-side partials absorb the fan-in; the sketch is <= m rows per
    group regardless of input size."""
    from cassabon_spark.functions.text import md5_bucket_expr

    hh = md5_bucket_expr(F.col(value_col), prefix=prefix)
    val = F.shiftright(hh, 8)  # == hh // m for the nonneg 48-bit hash
    rho = F.when(val == 0, F.lit(41)).otherwise(F.lit(41) - F.length(F.bin(val)))
    return (
        df.select(*keys, F.pmod(hh, F.lit(HLL_M)).alias("idx"), rho.alias("r"))
        .groupBy(*keys, "idx")
        .agg(F.max("r").alias("m"))
    )


def hll_merge(reg: DataFrame, keys: list[str]) -> DataFrame:
    """Merge register tables onto coarser keys by element-wise max — the
    reason HLL exists at 100 TB: per-shard/per-day/per-source sketches
    combine at m numbers per group, never touching raw values again.
    `reg` must already carry the target key columns; [] merges everything
    into one global sketch."""
    return reg.groupBy(*keys, "idx").agg(F.max("m").alias("m"))


def hll_estimate(reg: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., nz_registers, hll_estimate): the raw-HLL estimate per key
    group of a register table. The 2^-m sum is exact in double arithmetic
    regardless of order (<= m power-of-two terms spanning 41 bits), so the
    same formula in another engine reproduces it bit-for-bit."""
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("nz_registers"),
        (
            F.lit(HLL_ALPHA)
            * HLL_M
            * HLL_M
            / (F.sum(F.pow(F.lit(2.0), -F.col("m"))) + (HLL_M - F.count(F.lit(1))))
        ).alias("hll_estimate"),
    ]
    return reg.groupBy(*keys).agg(*aggs) if keys else reg.agg(*aggs)


def kmv_bottom_k(
    df: DataFrame,
    shard_cols: list[str],
    hcol: str = "h",
    k: int = 128,
    n_salts: int = 16,
) -> DataFrame:
    """(shard_cols..., bk): bottom-k distinct hash sketch (KMV) — the
    deterministic alternative to HLL; estimate (k-1) * space / bk[k-1],
    merge = array union + re-sort + re-truncate.

    Two-phase distributed bottom-k: partial bottom-k per (shard, salt)
    cell via sorted collect_set slices, then merge cells by flatten +
    re-sort + re-truncate. No global sort; the merge input is at most
    n_salts * k hashes per shard. NOTE on state (ADVICE r9): the per-cell
    collect_set accumulates every distinct hash of its (shard, salt) cell
    before the sort + slice — agg state is bounded by the cell's distinct
    count (~shard distincts / n_salts), NOT by k; the salt divides the
    worst cell by n_salts but does not cap it. A genuinely k-bounded
    partial needs a custom typed aggregator (JVM UDAF territory) — until
    a shard's distinct count per salt cell outgrows executor memory this
    two-phase shape is the cheaper plan, and n_salts is the pressure
    valve."""
    partial = (
        df.withColumn("salt", F.pmod(F.col(hcol), F.lit(n_salts)))
        .groupBy(*shard_cols, "salt")
        .agg(F.slice(F.array_sort(F.collect_set(hcol)), 1, k).alias("bk"))
    )
    return partial.groupBy(*shard_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("bk")))),
            1,
            k,
        ).alias("bk")
    )


def kmv_jaccard_cols(bk_a, bk_b, k: int = 128):
    """(sketch_k, overlap, est_jaccard) Columns from two KMV bottom-k
    arrays (Beyer et al. 2007): the union's bottom-k is a uniform sample
    of the union hash space, so |B_k(A ∪ B) ∩ A ∩ B| / k estimates
    J(A, B) — row-local array expressions, no join work beyond bringing
    the two sketch rows together. Fully deterministic (md5 hash space):
    the estimate itself can sit under an exact cross-engine gate."""
    bku = F.slice(F.array_sort(F.array_distinct(F.concat(bk_a, bk_b))), 1, k)
    overlap = F.size(F.array_intersect(F.array_intersect(bku, bk_a), bk_b))
    return (
        F.size(bku).alias("sketch_k"),
        overlap.alias("overlap"),
        (overlap / F.size(bku)).alias("est_jaccard"),
    )


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
