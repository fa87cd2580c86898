"""Graphite-style series functions over the read path's gap-filled grid.

The reference serves raw `(path, slot_s, stat)` series and leaves function
application to the Graphite front-end (graphite-web's function library);
these composable transforms run the same post-processing in-engine, as
window functions / aggregations over the grid DataFrame returned by
`operators.query.query_metrics_df` — columnar, whole-stage-codegen, no
collect. Each takes and returns a grid frame (path, slot_s, stat), so they
chain: `top_series(moving_average(grid, 3), 5)`.

Graphite function parity (graphite-web names):
  derivative / nonNegativeDerivative / movingAverage / scale / offset /
  absolute / keepLastValue / summarize / highest(Average|Max)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(order: str = "slot_s"):
    return Window.partitionBy("path").orderBy(order)


def derivative(grid: DataFrame) -> DataFrame:
    """Per-step delta; null at the series head and across gaps (Graphite
    derivative())."""
    return grid.withColumn("stat", F.col("stat") - F.lag("stat").over(_w()))


def non_negative_derivative(grid: DataFrame) -> DataFrame:
    """derivative() with negative deltas nulled — Graphite's counter-reset
    guard (nonNegativeDerivative())."""
    d = F.col("stat") - F.lag("stat").over(_w())
    return grid.withColumn("stat", F.when(d >= 0, d))


def moving_average(grid: DataFrame, n: int) -> DataFrame:
    """Trailing n-slot mean, nulls excluded (movingAverage(n))."""
    w = _w().rowsBetween(-(n - 1), 0)
    return grid.withColumn("stat", F.avg("stat").over(w))


def scale(grid: DataFrame, factor: float) -> DataFrame:
    return grid.withColumn("stat", F.col("stat") * factor)


def offset(grid: DataFrame, amount: float) -> DataFrame:
    return grid.withColumn("stat", F.col("stat") + amount)


def absolute(grid: DataFrame) -> DataFrame:
    return grid.withColumn("stat", F.abs("stat"))


def keep_last_value(grid: DataFrame, limit: int | None = None) -> DataFrame:
    """Fill nulls with the most recent non-null value (keepLastValue());
    `limit` bounds how many consecutive slots may be filled."""
    filled = F.last("stat", ignorenulls=True).over(
        _w().rowsBetween(Window.unboundedPreceding, 0)
    )
    if limit is None:
        return grid.withColumn("stat", filled)
    # distance to the last non-null slot; fill only within the limit
    slot_of_value = F.when(F.col("stat").isNotNull(), F.col("slot_s"))
    last_slot = F.last(slot_of_value, ignorenulls=True).over(
        _w().rowsBetween(Window.unboundedPreceding, 0)
    )
    step = F.col("slot_s") - F.lag("slot_s").over(_w())
    step_any = F.first(step, ignorenulls=True).over(
        Window.partitionBy("path").orderBy("slot_s").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    within = (F.col("slot_s") - last_slot) <= limit * step_any
    return grid.withColumn(
        "stat", F.when(F.col("stat").isNotNull(), F.col("stat")).otherwise(
            F.when(within, filled)
        )
    )


def summarize(grid: DataFrame, bucket_s: int, how: str = "sum") -> DataFrame:
    """Re-bucket the grid to a coarser step (summarize(bucket)); buckets
    label with their CLOSE time like the engine's windows. Nulls excluded
    (Graphite sums the non-null points)."""
    agg = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "last": F.last}[how]
    close = (F.floor((F.col("slot_s") + bucket_s - 1) / bucket_s) * bucket_s).cast(
        "bigint"
    )
    return (
        grid.withColumn("slot_s", close)
        .groupBy("path", "slot_s")
        .agg(agg("stat").alias("stat"))
    )


def top_series(grid: DataFrame, k: int, how: str = "avg") -> DataFrame:
    """Keep the k series with the highest aggregate value
    (highestAverage/highestMax): rank whole series, semi-join the grid —
    two shuffles on `path`, no collect."""
    agg = {"avg": F.avg, "max": F.max, "sum": F.sum}[how]
    ranked = (
        grid.groupBy("path")
        .agg(agg("stat").alias("__v"))
        .orderBy(F.desc_nulls_last("__v"), "path")
        .limit(k)
        .select("path")
    )
    return grid.join(F.broadcast(ranked), "path", "left_semi")
