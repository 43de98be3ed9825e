"""Watermarked windowed aggregation over event streams — the Structured
Streaming late-data pattern: event-time windows finalize once the
watermark (max seen event time minus the allowed lateness) passes their
end; later-arriving rows for a finalized window are DROPPED, which is
what makes append-mode output immutable and a downstream consumer's read
exactly-once.

Two shapes:
* ``start_windowed_counts`` — fixed/sliding event-time windows
  (``F.window``) per key: the streaming twin of a batch
  ``groupBy(window(ts), key)`` rollup.
* ``start_session_stream`` — event-time session windows
  (``F.session_window``): the streaming twin of
  ``operators.sessions.session_stats`` (gap semantics match: a new
  session opens when the inter-event gap exceeds the timeout).

Both write append-mode parquet with a checkpoint, so replays after a
crash are idempotent. State size is bounded by the watermark horizon —
the late-data allowance IS the state-retention dial at 100 TB/day rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def start_windowed_counts(
    stream: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str | None = "value",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Per-(window, key) counts (+ value sum) with an event-time
    watermark. Append mode: a window row is written exactly once, when
    the watermark passes its end; rows later than ``watermark`` behind
    the stream's max event time are dropped, never restated."""
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *keys)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            *keys,
            "n_events",
            *([] if value_col is None else ["value_sum"]),
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_session_stream(
    stream: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Event-time session windows per key (``F.session_window``): a
    session closes once the watermark passes its end + gap; the emitted
    row carries the same (start, end, n_events, duration) shape as the
    batch ``session_stats``."""
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *by)
        .agg(F.count("*").alias("n_events"))
        .select(
            *by,
            F.col("session_window.start").alias("start_ts"),
            F.col("session_window.end").alias("end_ts"),
            "n_events",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
