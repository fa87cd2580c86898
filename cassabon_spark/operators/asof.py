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


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str | None = None,
    by: list[str] | None = None,
    right_by: list[str] | None = None,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join via grouped-map applyInPandas (pandas merge_asof
    per equality-key group).

    Same semantics as asof_join. Use ONLY when per-group data is small and
    Python-side logic is unavoidable — it ships both sides through Arrow and
    Python workers, where asof_join stays entirely JVM-side. Exists as the
    documented grouped-map UDF pattern (SURVEY §2 Part B, UDF row) and as a
    differential-testing oracle for asof_join.
    """
    import pandas as pd

    right_on = right_on or on
    by = by or []
    right_by = right_by or by
    value_cols = value_cols or [
        c for c in right.columns if c not in set(right_by) | {right_on}
    ]

    from pyspark.sql.types import StructType

    # copy: StructType.add mutates in place, and left.schema is the frame's
    # cached schema object — adding to it directly corrupts left.columns
    out_schema = StructType(list(left.schema.fields))
    for v in value_cols:
        out_schema = out_schema.add(f"{v}{suffix}", right.schema[v].dataType)

    lkey = [F.col(c).alias(f"__k{i}") for i, c in enumerate(by)]
    rkey = [F.col(c).alias(f"__k{i}") for i, c in enumerate(right_by)]
    l_tag = left.select("*", *lkey, F.lit(1).alias("__side"))
    r_tag = right.select("*", *rkey, F.lit(0).alias("__side"))
    keys = [f"__k{i}" for i in range(len(by))]
    # one cogroup-style frame per key: union the tagged sides, group, split
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    left_cols = list(left.columns)

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["__side"] == 1]
        rpdf = pdf[pdf["__side"] == 0]
        lpdf = lpdf[left_cols].sort_values(on, kind="mergesort")
        rsel = rpdf[[right_on, *value_cols]].sort_values(right_on, kind="mergesort")
        rsel = rsel.rename(columns={v: f"{v}{suffix}" for v in value_cols})
        if lpdf.empty:
            return lpdf.assign(**{f"{v}{suffix}": [] for v in value_cols})
        merged = pd.merge_asof(
            lpdf,
            rsel,
            left_on=on,
            right_on=right_on,
            direction="backward",
            suffixes=("", "__r"),
        )
        if right_on in left_cols:
            drop = [c for c in merged.columns if c.endswith("__r")]
            merged = merged.drop(columns=drop)
        elif right_on not in [f"{v}{suffix}" for v in value_cols]:
            merged = merged.drop(columns=[right_on], errors="ignore")
        return merged[list(left_cols) + [f"{v}{suffix}" for v in value_cols]]

    return unioned.groupBy(*keys).applyInPandas(_merge, out_schema)
