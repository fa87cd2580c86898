"""As-of join (the time-series join the reference lacks; SURVEY §2 Part B).

For each left row, attach the latest right row with
right.on <= left.on (backward as-of), matching on equality keys.

Spark-first implementation — the "union + last_value" trick:
  1. Tag left rows (side=1) and right rows (side=0), union by the shared
     (keys, on) axis.
  2. One window partitioned by keys ordered by (on, side) carries the most
     recent right payload forward with last(ignorenulls=True).
  3. Keep the left rows.

Cost: a single shuffle on the equality keys + one sort — the same cost as a
sort-merge join, with no range-explosion. This scales to 100 TB: no
cross-product, no per-key collect, skew handled by AQE. (A per-group
pandas merge_asof would ship both sides through Python — only worth it when
the probe side is tiny.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str | None = None,
    by: list[str] | None = None,
    right_by: list[str] | None = None,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join.

    left rows keep all their columns; for each value col V from `right`,
    a column f"{V}{suffix}" holds the value from the latest right row with
    right_on <= on and matching by-keys (null when none precedes).
    """
    right_on = right_on or on
    by = by or []
    right_by = right_by or by
    value_cols = value_cols or [
        c for c in right.columns if c not in set(right_by) | {right_on}
    ]

    lkey = [F.col(c).alias(f"k{i}") for i, c in enumerate(by)]
    rkey = [F.col(c).alias(f"k{i}") for i, c in enumerate(right_by)]

    l_tag = left.select(
        *lkey,
        F.col(on).cast("double").alias("_on"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(v) for v in value_cols]).alias("s")).schema["s"].dataType
        ).alias("_rpayload"),
    )
    r_tag = right.select(
        *rkey,
        F.col(right_on).cast("double").alias("_on"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(*[F.col(v) for v in value_cols]).alias("_rpayload"),
    )

    keys = [f"k{i}" for i in range(len(by))]
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_on").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_rpayload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{v}").alias(f"{v}{suffix}") for v in value_cols],
    )
    return out
