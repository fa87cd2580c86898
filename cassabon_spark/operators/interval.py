"""Bucketized interval join — the pure range join with NO equi key.

Spark plans `L join R on R.ts between L.ts+lo and L.ts+hi` with no equality
component as a BroadcastNestedLoopJoin: O(|L| x |R|) comparisons, a
scale-killer the moment neither side broadcasts. The standard fix (Flink's
interval join; Databricks' range-join hint) is epoch bucketization:

  * bucket width W = hi - lo (the interval span), so every left row's
    window covers at most 2 consecutive buckets;
  * each right row lands in exactly ONE bucket -> a candidate pair appears
    in exactly one joined bucket: no post-join dedup;
  * join becomes an equi-shuffle on the bucket id with the true interval
    predicate as a residual filter — fan-out bounded by 2x|L| + |R| rows,
    candidates bounded by local bucket co-occupancy instead of |L| x |R|.

Skew note: a bucket only degenerates if one W-wide wall-clock span holds a
large fraction of BOTH sides; widen to finer sub-buckets plus salting
(operators/skew.py) in that regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lo_s: int,
    hi_s: int,
) -> DataFrame:
    """Pairs (left x right) with unix(right_ts) in [unix(left_ts)+lo_s,
    unix(left_ts)+hi_s). Columns of both inputs are preserved; callers
    select/aggregate after. lo_s < hi_s required.

    Column names other than the two timestamps must be disjoint between
    the inputs (standard Spark join-output caveat — duplicate names come
    back ambiguous to select). The timestamps themselves MAY collide
    (including left_ts == right_ts): the residual predicate is built from
    DataFrame-qualified references captured before the join, so it binds
    to the correct side either way."""
    if not lo_s < hi_s:
        raise ValueError("need lo_s < hi_s")
    w = hi_s - lo_s
    lb = left.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor((F.unix_timestamp(F.col(left_ts)) + lo_s) / w).cast("long"),
                F.floor((F.unix_timestamp(F.col(left_ts)) + hi_s) / w).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "__bkt", F.floor(F.unix_timestamp(F.col(right_ts)) / w).cast("long")
    )
    # qualified refs: unambiguous even when left_ts == right_ts or the
    # name exists on both sides (ADVICE r3)
    lu = F.unix_timestamp(lb[left_ts])
    ru = F.unix_timestamp(rb[right_ts])
    cond = (ru >= lu + lo_s) & (ru < lu + hi_s)
    return lb.join(rb, lb["__bkt"] == rb["__bkt"]).filter(cond).drop("__bkt")
