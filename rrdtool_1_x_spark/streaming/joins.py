"""Watermarked stream-stream joins — the Structured Streaming twin of the
batch interval/as-of joins in ``operators/asof.py``.

An inner stream-stream join is EXACT relational semantics: once both
watermarks pass an event's horizon its join candidates are complete, so a
full drain emits exactly the batch join's rows regardless of arrival
order — which is what lets the driver gate compare the drained sink
against a plain SQL interval join.

State size is the whole point at 100 TB/day: each side buffers only rows
younger than (watermark + join interval); the watermark is the state
eviction dial. Without the time-range condition Spark would have to keep
every row forever — the interval bound is mandatory, not an
optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def start_interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    interval: str = "10 minutes",
    watermark: str = "10 minutes",
    by: str = "user_id",
    ts_col: str = "ts",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Inner-join two event streams on a key + backward time interval:
    a LEFT row (e.g. click) matches RIGHT rows (e.g. views) of the same
    key whose event time falls in ``[left.ts - interval, left.ts]`` —
    the stream form of a point-in-interval range join.

    ``left``/``right`` must carry (``<id cols>``, ``by``, ``ts_col``)
    with ``ts_col`` a TIMESTAMP (event time). Column names other than
    ``by``/``ts_col`` must be disjoint across the two sides. Output:
    left's columns + right's columns with the right's ts as
    ``r_<ts_col>``, written append-mode parquet (exactly-once under
    replay via the checkpoint).
    """
    lw = left.withWatermark(ts_col, watermark).alias("l")
    rw = (
        right.withColumnRenamed(by, f"_r_{by}")
        .withColumnRenamed(ts_col, f"r_{ts_col}")
        .withWatermark(f"r_{ts_col}", watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{by}") == F.col(f"r._r_{by}"))
        & (F.col(f"r.r_{ts_col}") >= F.col(f"l.{ts_col}") - F.expr(f"INTERVAL {interval}"))
        & (F.col(f"r.r_{ts_col}") <= F.col(f"l.{ts_col}"))
    )
    joined = lw.join(rw, cond, "inner").drop(f"_r_{by}")
    writer = (
        joined.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
