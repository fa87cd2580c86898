"""Streaming windowed aggregation surface: watermarked tumbling / sliding /
session windows, streaming dedup, and the arrival-order stateful accumulator
(applyInPandasWithState).

Append-mode emission mechanics: a window only emits once the WATERMARK
passes its end, and the watermark only advances between microbatches. The
window-agg tests therefore run in update mode (every aggregate visible after
one availableNow batch); the stateful-timeout test drives multiple
microbatches (maxFilesPerTrigger=1, mtime-ordered files) with trailing
flush rows that push the watermark past the data windows' closes.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

import pytest

from cassabon_spark.streaming.windows import (
    arrival_order_rollup,
    dedup_stream,
    interval_join_stream,
    windowed_rollup_stream,
)

# r15 test tiering (VERDICT r14 #2): windowed streaming queries, one
# stream per test. Excluded from the default verify tier; run with -m slow.
pytestmark = pytest.mark.slow


def _run_stream(spark, df, name, mode="update"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _metrics_stream(spark, files, d, max_files_per_trigger=None):
    """files: list of row-lists; each inner list becomes one file (one
    microbatch when max_files_per_trigger=1), mtime-ordered."""
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(files):
        p = os.path.join(d, f"f{i}.txt")
        with open(p, "w") as f:
            for path, value, ts in rows:
                f.write(f"{path},{value},{ts}\n")
        os.utime(p, (1000 + i, 1000 + i))  # deterministic processing order
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.text(d)
    parts = F.split("value", ",")
    return raw.select(
        parts[0].alias("path"),
        parts[1].cast("double").alias("value"),
        parts[2].cast("double").alias("ts"),
    )


ROWS = [
    ("a", 1.0, 5.0),
    ("a", 3.0, 8.0),
    ("a", 5.0, 12.0),
    ("b", 7.0, 14.0),
    # out-of-order arrival inside window [0,10): arrives last, ts earlier
    ("a", 9.0, 6.0),
]


def test_tumbling_watermark_agg(spark, tmp_path):
    m = _metrics_stream(spark, [ROWS], str(tmp_path / "drop"))
    agg = windowed_rollup_stream(m, window_s=10, watermark_s=5)
    out = _run_stream(spark, agg, "t_tumbling")
    got = {
        (r["path"], r["time"].timestamp()): (r["cnt"], r["vsum"], r["vlast"])
        for r in out.collect()
    }
    # window [0,10) for a: values 1,3,9 — vlast is latest-by-TIMESTAMP (ts 8 -> 3.0)
    assert got[("a", 10.0)] == (3, 13.0, 3.0)
    assert got[("a", 20.0)] == (1, 5.0, 5.0)
    assert got[("b", 20.0)] == (1, 7.0, 7.0)


def test_sliding_window_agg(spark, tmp_path):
    m = _metrics_stream(spark, [ROWS[:2]], str(tmp_path / "drop"))  # ts 5, 8
    agg = windowed_rollup_stream(m, window_s=10, slide_s=5, watermark_s=5)
    out = _run_stream(spark, agg, "t_sliding")
    wins = {
        (r["win_start"].timestamp(), r["time"].timestamp()): r["cnt"]
        for r in out.filter(F.col("path") == "a").collect()
    }
    # ts=5 and ts=8 both land in overlapping windows [0,10) and [5,15)
    assert wins[(0.0, 10.0)] == 2
    assert wins[(5.0, 15.0)] == 2


def test_session_window_agg(spark, tmp_path):
    # session windows only support append mode: later microbatches advance
    # the watermark past both sessions so they finalize and emit
    files = [
        [("s", 1.0, 10.0), ("s", 2.0, 12.0), ("s", 4.0, 100.0)],
        [("zz.flush", 0.0, 1000.0)],
        [("zz.flush", 0.0, 2000.0)],
    ]
    m = _metrics_stream(spark, files, str(tmp_path / "drop"), max_files_per_trigger=1)
    agg = windowed_rollup_stream(m, window_s=0, session_gap_s=30, watermark_s=5)
    out = _run_stream(spark, agg, "t_session", mode="append")
    sessions = sorted(
        (r["win_start"].timestamp(), r["time"].timestamp(), r["cnt"])
        for r in out.filter(~F.col("path").startswith("zz")).collect()
    )
    # gap 30s: ts 10,12 fuse into one session [10, 42); ts 100 alone [100, 130)
    assert sessions == [(10.0, 42.0, 2), (100.0, 130.0, 1)]


def test_dedup_stream_drops_duplicates(spark, tmp_path):
    rows = [("d", 1.0, 10.0), ("d", 1.0, 10.0), ("d", 2.0, 11.0)]
    m = _metrics_stream(spark, [rows], str(tmp_path / "drop"))
    out = _run_stream(spark, dedup_stream(m, watermark_s=60), "t_dedup", mode="append")
    assert out.count() == 2


def test_arrival_order_rollup_last_semantics(spark, tmp_path):
    """The applyInPandasWithState accumulator must reproduce the reference's
    arrival-order LAST (metricstore.go:39-40): the out-of-order row ('a',
    9.0, ts=6) arrives LAST in file order, so vlast == 9.0 — unlike the
    declarative path's latest-by-timestamp 3.0. Flush rows in later
    microbatches push the watermark past the data windows so the event-time
    timeouts fire."""
    files = [
        ROWS,
        [("zz.flush", 0.0, 1000.0)],
        [("zz.flush", 0.0, 2000.0)],
    ]
    m = _metrics_stream(spark, files, str(tmp_path / "drop"), max_files_per_trigger=1)
    agg = arrival_order_rollup(m, window_s=10, watermark_s=5)
    out = _run_stream(spark, agg, "t_arrival", mode="append")
    got = {
        (r["path"], r["time"].timestamp()): (r["cnt"], r["vsum"], r["vlast"])
        for r in out.filter(~F.col("path").startswith("zz")).collect()
    }
    assert got[("a", 10.0)] == (3, 13.0, 9.0)  # arrival-order LAST
    assert got[("a", 20.0)] == (1, 5.0, 5.0)
    assert got[("b", 20.0)] == (1, 7.0, 7.0)


def test_windowed_stream_matches_batch_rollup(spark, tmp_path):
    """State-store path parity: the watermarked streaming aggregation must
    produce exactly the batch rollup's rows for the same input (both define
    LAST as latest-by-timestamp)."""
    from cassabon_spark.config import RollupConfig
    from cassabon_spark.operators.rollup import rollup_finest, route

    cfg = RollupConfig.from_dict(
        {"default": {"method": "average", "windows": ["10s:1h"]}}
    )
    m_stream = _metrics_stream(spark, [ROWS], str(tmp_path / "drop"))
    out = _run_stream(
        spark, windowed_rollup_stream(m_stream, window_s=10, watermark_s=5), "t_parity"
    )
    streaming = {
        (r["path"], r["time"].timestamp()): (r["cnt"], r["vsum"], r["vmin"], r["vmax"], r["vlast"])
        for r in out.collect()
    }
    m_batch = spark.createDataFrame(ROWS, "path string, value double, ts double")
    batch = {
        (r["path"], r["time"].timestamp()): (r["cnt"], r["vsum"], r["vmin"], r["vmax"], r["vlast"])
        for r in rollup_finest(route(m_batch, cfg), cfg).collect()
    }
    assert streaming == batch


def test_interval_join_stream_attribution(spark, tmp_path):
    # clicks on two keys; purchases: one inside the 30s horizon, one outside,
    # one on the wrong key
    clicks = _metrics_stream(
        spark, [[("u1", 1.0, 100.0), ("u2", 2.0, 100.0)]], str(tmp_path / "l")
    )
    purchases = _metrics_stream(
        spark,
        [[("u1", 50.0, 120.0), ("u1", 60.0, 200.0), ("u3", 70.0, 110.0)]],
        str(tmp_path / "r"),
    )
    joined = interval_join_stream(clicks, purchases, within_s=30, watermark_s=10)
    out = _run_stream(spark, joined, "ivj", mode="append").collect()
    assert [(r["path"], r["l_value"], r["r_value"], r["lag_s"]) for r in out] == [
        ("u1", 1.0, 50.0, 20.0)
    ]


def test_watermark_drops_too_late_rows(spark, tmp_path):
    """Append-mode semantics the engine documents as its trade vs the
    reference (which accepts any lateness and merges at read): once the
    watermark passes a window's close, a later row for that window is
    DROPPED by the streaming agg — it does not re-emit or mutate."""
    files = [
        [("a", 1.0, 5.0)],              # window [0,10)
        [("a", 2.0, 1000.0)],           # event time jumps far ahead
        [("a", 2.5, 1100.0)],           # extra batch: watermark commit lags
                                        # one batch behind the data that moved it
        [("a", 100.0, 6.0)],            # too late for [0,10): dropped
        [("a", 3.0, 2000.0)],           # advance watermark, flush remaining
        [("a", 4.0, 3000.0)],
    ]
    m = _metrics_stream(spark, files, str(tmp_path / "drop"), max_files_per_trigger=1)
    agg = windowed_rollup_stream(m, window_s=10, watermark_s=5)
    out = _run_stream(spark, agg, "t_late_drop", mode="append")
    got = {
        (r["path"], r["time"].timestamp()): (r["cnt"], r["vsum"])
        for r in out.collect()
    }
    # window [0,10) emitted exactly once, WITHOUT the late 100.0
    assert got[("a", 10.0)] == (1, 1.0)
