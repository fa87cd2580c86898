"""Streaming windowed aggregation surface (SURVEY §2 Part B, streaming-only
row): watermarked tumbling / sliding / session windows, streaming dedup, and
a custom stateful accumulator via applyInPandasWithState.

The reference's only streaming construct is the hand-rolled tumbling-window
accumulator with a timer flush (datastore/metricstore.go:61-185,
metricmanager.go:293-315) and NO late-data policy (late rows merge at read,
metricquery.go:163-210). These builders expose the full Spark surface the
engine supports on top of that:

  * windowed_rollup_stream — watermark + window()/session_window() agg in
    append mode: the state-store-backed alternative to the stateless
    partial-append ingest in streaming.ingest (trade: bounded lateness and
    exactly one row per closed window at write time, vs unbounded lateness
    and merge-at-read).
  * dedup_stream — dropDuplicates[WithinWatermark] on (path, ts): streaming
    exact dedup for at-least-once upstreams.
  * arrival_order_rollup — applyInPandasWithState accumulator that
    replicates the reference's ARRIVAL-ORDER LAST (metricstore.go:39-40)
    exactly — the one semantic the declarative batch path deliberately
    refines to latest-by-timestamp (SURVEY §2 note ①). State is one row of
    (cnt, vsum, vmin, vmax, vlast) per (path, window) — the same shape as
    the reference's `rollup` struct (metricmanager.go:18-22) — and flushes
    on event-time timeout like the reference's nextTimeBoundary timer.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_rollup_stream(
    metrics: DataFrame,
    window_s: int,
    slide_s: int | None = None,
    session_gap_s: int | None = None,
    watermark_s: int = 60,
) -> DataFrame:
    """Watermarked windowed aggregation over a streaming CarbonMetric frame
    (path, value, ts DOUBLE epoch). Tumbling by default; sliding when
    slide_s is given; session windows when session_gap_s is given.

    Returns an append-mode-capable aggregate: one final row per closed
    window once the watermark passes its end. State size is bounded by
    (open windows x live paths) — the watermark is what makes this safe at
    100 TB path cardinality (SURVEY §7 hard-part 4).
    """
    ts = F.timestamp_seconds(F.col("ts"))
    wm = metrics.withColumn("event_time", ts).withWatermark(
        "event_time", f"{watermark_s} seconds"
    )
    if session_gap_s is not None:
        win = F.session_window("event_time", f"{session_gap_s} seconds")
    elif slide_s is not None:
        win = F.window("event_time", f"{window_s} seconds", f"{slide_s} seconds")
    else:
        win = F.window("event_time", f"{window_s} seconds")
    return (
        wm.groupBy(F.col("path"), win.alias("win"))
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("vsum"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.max_by("value", F.struct("ts", "value")).alias("vlast"),
        )
        .select(
            "path",
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("time"),
            "cnt",
            "vsum",
            "vmin",
            "vmax",
            "vlast",
        )
    )


def dedup_stream(metrics: DataFrame, watermark_s: int = 60) -> DataFrame:
    """Streaming exact dedup on (path, ts) within the watermark horizon —
    the at-least-once-upstream guard (SURVEY §2 Part B streaming row).
    State: one key per distinct (path, ts) inside the watermark window."""
    return (
        metrics.withColumn("event_time", F.timestamp_seconds(F.col("ts")))
        .withWatermark("event_time", f"{watermark_s} seconds")
        .dropDuplicatesWithinWatermark(["path", "ts"])
    )


_STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("vsum", DoubleType()),
        StructField("vmin", DoubleType()),
        StructField("vmax", DoubleType()),
        StructField("vlast", DoubleType()),
    ]
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("time", TimestampType()),
        StructField("cnt", LongType()),
        StructField("vsum", DoubleType()),
        StructField("vmin", DoubleType()),
        StructField("vmax", DoubleType()),
        StructField("vlast", DoubleType()),
    ]
)


def _accumulate(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Per-(path, window-close) accumulator. Replicates the reference's
    applyMethod exactly (metricstore.go:25-43): LAST is overwritten in
    ARRIVAL order — each batch is processed in received row order, not
    timestamp order. Emits the closed window on event-time timeout, like the
    reference's nextTimeBoundary flush (metricstore.go:85-116)."""
    path, close_time = key
    if state.hasTimedOut:
        cnt, vsum, vmin, vmax, vlast = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "path": path,
                    "time": close_time,
                    "cnt": cnt,
                    "vsum": vsum,
                    "vmin": vmin,
                    "vmax": vmax,
                    "vlast": vlast,
                }
            ]
        )
        return
    if state.exists:
        cnt, vsum, vmin, vmax, vlast = state.get
    else:
        cnt, vsum, vmin, vmax, vlast = 0, 0.0, float("inf"), float("-inf"), float("nan")
    for pdf in pdfs:
        for v in pdf["value"]:
            v = float(v)
            cnt += 1
            vsum += v
            vmin = min(vmin, v)
            vmax = max(vmax, v)
            vlast = v  # arrival order — the reference's LAST semantics
    state.update((cnt, vsum, vmin, vmax, vlast))
    # flush when the watermark passes the window close (+1s slack)
    state.setTimeoutTimestamp(int(close_time.timestamp() * 1000) + 1000)
    return
    yield  # pragma: no cover — make this a generator on the non-timeout path


def arrival_order_rollup(
    metrics: DataFrame, window_s: int, watermark_s: int = 60
) -> DataFrame:
    """Custom stateful rollup via applyInPandasWithState, keyed by
    (path, window close), flushing each window when event time passes its
    close — a faithful port of the reference accumulator's semantics
    including arrival-order LAST. Use windowed_rollup_stream unless that
    exact semantic is required: built-in windowed agg state is JVM-side and
    cheaper than Arrow-batched Python state."""
    close = F.timestamp_seconds(
        (F.floor(F.col("ts") / window_s) * window_s + window_s).cast("bigint")
    )
    keyed = (
        metrics.withColumn("event_time", F.timestamp_seconds(F.col("ts")))
        .withWatermark("event_time", f"{watermark_s} seconds")
        .withColumn("close_time", close)
    )
    return keyed.groupBy("path", "close_time").applyInPandasWithState(
        _accumulate,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "path",
    within_s: int = 1800,
    watermark_s: int = 60,
) -> DataFrame:
    """Stream-stream INNER interval join: each left event pairs with right
    events on the same key whose time falls in [left_ts, left_ts+within_s]
    — the attribution pattern (click -> purchase within 30 min).

    Both sides carry watermarks and the join condition carries the time
    range, so Spark can bound state: a buffered left row is dropped once
    the right watermark passes left_ts + within_s, and vice versa. Without
    BOTH (watermarks + range condition) stream-stream join state grows
    forever — this is the 100 TB footgun this builder exists to avoid.

    Inputs are CarbonMetric-shaped (path, value, ts DOUBLE epoch). Output:
    (path, l_value, r_value, l_ts, r_ts, lag_s).
    """
    l = (
        left.select(
            F.col(key).alias("l_key"),
            F.col("value").alias("l_value"),
            F.col("ts").alias("l_ts"),
            F.timestamp_seconds("ts").alias("l_time"),
        ).withWatermark("l_time", f"{watermark_s} seconds")
    )
    r = (
        right.select(
            F.col(key).alias("r_key"),
            F.col("value").alias("r_value"),
            F.col("ts").alias("r_ts"),
            F.timestamp_seconds("ts").alias("r_time"),
        ).withWatermark("r_time", f"{watermark_s} seconds")
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_time") >= F.col("l_time"))
        & (F.col("r_time") <= F.col("l_time") + F.expr(f"INTERVAL {within_s} SECONDS"))
    )
    return l.join(r, cond, "inner").select(
        F.col("l_key").alias("path"),
        "l_value",
        "r_value",
        "l_ts",
        "r_ts",
        (F.col("r_ts") - F.col("l_ts")).alias("lag_s"),
    )
