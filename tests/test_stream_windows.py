"""Watermarked windowed aggregation (streaming/windows.py): append-mode
finalization, late-data drops, and stream == batch on finalized windows."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from rrdtool_1_x_spark.streaming.windows import (
    start_session_stream,
    start_windowed_counts,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "ts_s long, event_type string, value double")
    df.select(
        F.timestamp_seconds("ts_s").alias("ts"), "event_type", "value"
    ).coalesce(1).write.mode("append").parquet(path)


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    # batch 0: window [0,10) gets 3 events; t=100 advances event time
    _write_batch(spark, src, [(1, "click", 1.0), (4, "click", 2.0),
                              (9, "click", 3.0), (100, "view", 1.0)])
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_windowed_counts(
        stream, sink, ck, window="10 seconds", watermark="5 seconds"
    )
    _drain(q)
    # batch 1: a LATE click at t=5 (watermark is already 95) + new data;
    # batch 2: sentinel far ahead to finalize everything else
    _write_batch(spark, src, [(5, "click", 99.0), (110, "view", 1.0)])
    _write_batch(spark, src, [(1000, "flush", 0.0)])
    q = start_windowed_counts(
        stream, sink, ck, window="10 seconds", watermark="5 seconds"
    )
    _drain(q)
    out = {
        (int(r["win_start"].timestamp()), r["event_type"]):
        (r["n_events"], r["value_sum"])
        for r in spark.read.parquet(sink).collect()
    }
    # the late t=5 click was dropped: count stays 3 and its value 99
    # never lands
    assert out[(0, "click")] == (3, 6.0)
    assert out[(100, "view")] == (1, 1.0)
    assert out[(110, "view")] == (1, 1.0)
    assert (1000, "flush") not in out  # never finalized


def test_session_stream_matches_batch_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    rows = [(0, "u", 1.0), (5, "u", 1.0), (8, "u", 1.0),
            (40, "u", 1.0), (3, "w", 1.0)]
    df = spark.createDataFrame(rows, "ts_s long, user_id string, value double")
    df.select(
        F.timestamp_seconds("ts_s").alias("ts"), "user_id"
    ).coalesce(1).write.mode("append").parquet(src)
    # sentinel advances the watermark far enough to close every session
    spark.createDataFrame([(10_000, "zz")], "ts_s long, user_id string").select(
        F.timestamp_seconds("ts_s").alias("ts"), "user_id"
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, user_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_session_stream(
        stream, sink, ck, gap="10 seconds", watermark="5 seconds"
    )
    _drain(q)
    got = {
        (r["user_id"], int(r["start_ts"].timestamp())): (
            int(r["end_ts"].timestamp()), r["n_events"]
        )
        for r in spark.read.parquet(sink).collect()
    }
    # u: events 0,5,8 coalesce (gaps < 10) into [0, 18); then 40 -> [40, 50)
    assert got[("u", 0)] == (18, 3)
    assert got[("u", 40)] == (50, 1)
    assert got[("w", 3)] == (13, 1)
    # batch twin agrees on (key, n_events) per session
    from rrdtool_1_x_spark.operators.sessions import session_stats

    batch = session_stats(
        df.select("user_id", (F.col("ts_s") * 1_000_000).alias("tus")),
        by=["user_id"], gap=10_000_000,
    ).collect()
    want = sorted((r["user_id"], r["n_events"]) for r in batch)
    have = sorted((u, n) for (u, _s), (_e, n) in got.items() if u != "zz")
    assert want == have
