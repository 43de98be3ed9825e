"""DST rate conversion: raw readings → per-interval rates.

Reference semantics: update_pdp_prep (src/rrd_update.c:1433-1596). Each raw
reading applies to the interval since the previous reading of the same
series. GAUGE passes the value through; COUNTER/DERIVE difference against the
previous reading (COUNTER heals 32/64-bit wraps); DCOUNTER/DDERIVE are float
counters (DCOUNTER treats a direction flip as a reset → unknown); ABSOLUTE
divides the value by the interval. Rates outside [min,max] and intervals
longer than the heartbeat become unknown (src/rrd_update.c:1447-1451,
1562-1571).

Spark design: a per-series ordered window with ``lag`` — shuffles once on the
series key and stays entirely in whole-stage codegen. At 100 TB the partition
key (series_id, ds_name) has high cardinality, so the single shuffle is the
theoretical minimum for a stateful per-series computation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_WRAP32 = 4294967295.0  # 2^32-1  (src/rrd_update.c:1496)
_WRAP64 = 18446744069414584320.0  # 2^64-2^32 (src/rrd_update.c:1498)

SERIES_KEYS = ("series_id", "ds_name")


def _counter_rate(value: Column, prev: Column, interval: Column, signed_: bool) -> Column:
    diff = value - prev
    if not signed_:  # COUNTER: heal 32/64-bit wraparound
        diff = F.when(diff < 0, diff + _WRAP32).otherwise(diff)
        diff = F.when(diff < 0, diff + _WRAP64).otherwise(diff)
    return diff / interval


def _counter_rate_exact(
    raw: Column, prev_raw: Column, interval: Column, signed_: bool
) -> Column:
    """COUNTER/DERIVE diff computed exactly from the raw decimal-string
    reading (≙ rrd_diff, src/rrd_diff.c + src/rrd_update.c:1486-1498).

    64-bit SNMP counters exceed double precision (2^53), so the reference
    differences the ASCII decimal strings and only then converts to double;
    here the strings cast to decimal(38,0), the subtraction is exact, and
    the single double rounding happens on the (small) diff — the same
    precision contract. Mixed-sign inputs are unknown exactly like
    rrd_diff; junk that doesn't parse as an integer is unknown too."""
    a = F.regexp_extract(raw.cast("string"), r"^\s*(-?\d+)", 1).cast("decimal(38,0)")
    b = F.regexp_extract(prev_raw.cast("string"), r"^\s*(-?\d+)", 1).cast("decimal(38,0)")
    mixed = ((a < 0) & (b >= 0)) | ((a >= 0) & (b < 0))
    diff = F.when(mixed, F.lit(None)).otherwise((a - b).cast("double"))
    if not signed_:
        diff = F.when(diff < 0, diff + _WRAP32).otherwise(diff)
        diff = F.when(diff < 0, diff + _WRAP64).otherwise(diff)
    return diff / interval


def _dcounter_rate(value: Column, prev: Column, interval: Column) -> Column:
    # direction change = reset → unknown (src/rrd_update.c:1534-1546)
    reset = ((value > 0) & (prev > value)) | ((value < 0) & (value > prev))
    return F.when(reset, F.lit(None)).otherwise((value - prev) / interval)


def rate_expr(
    dst: str,
    value: Column,
    prev_value: Column,
    interval: Column,
    heartbeat: float,
    min_val: float | None = None,
    max_val: float | None = None,
    raw_value: Column | None = None,
    prev_raw: Column | None = None,
) -> Column:
    """Column expression for the rate of one interval under DST ``dst``.

    ``value``/``prev_value`` must already be NaN-normalized to NULL; NULL in
    → NULL rate (reference 'U' readings). When ``raw_value``/``prev_raw``
    (the untouched decimal-string readings) are given, COUNTER/DERIVE
    difference them exactly in decimal(38,0) — required for >2^53 counters.
    """
    dst = dst.upper()
    if dst == "GAUGE":
        rate = value
    elif dst in ("COUNTER", "DERIVE"):
        if raw_value is not None:
            rate = _counter_rate_exact(
                raw_value, prev_raw, interval, signed_=(dst == "DERIVE")
            )
        else:
            rate = _counter_rate(value, prev_value, interval, signed_=(dst == "DERIVE"))
    elif dst in ("DCOUNTER", "DDERIVE"):
        if dst == "DCOUNTER":
            rate = _dcounter_rate(value, prev_value, interval)
        else:
            rate = (value - prev_value) / interval
    elif dst == "ABSOLUTE":
        rate = value / interval
    else:
        raise ValueError(f"unsupported DST {dst!r}")

    # interval > heartbeat → unknown (src/rrd_update.c:1447-1451)
    rate = F.when(interval > F.lit(float(heartbeat)), F.lit(None)).otherwise(rate)
    # min/max clamp → unknown (src/rrd_update.c:1562-1571)
    if min_val is not None:
        rate = F.when(rate < F.lit(float(min_val)), F.lit(None)).otherwise(rate)
    if max_val is not None:
        rate = F.when(rate > F.lit(float(max_val)), F.lit(None)).otherwise(rate)
    return rate


def with_rates(
    samples: DataFrame,
    dst: str,
    heartbeat: float,
    min_val: float | None = None,
    max_val: float | None = None,
    start: float | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = SERIES_KEYS,
    raw_col: str | None = None,
) -> DataFrame:
    """samples(keys..., ts: epoch seconds double, value double) →
    + (prev_ts, interval, rate).

    ``start`` (dataset create time) seeds prev_ts for each series' first
    sample; rows at or before the previous timestamp are dropped, mirroring
    the reference's strictly-increasing-update rule
    (src/rrd_update.c:1416-1423). ``raw_col`` names an optional
    decimal-string reading column for the exact >2^53 COUNTER/DERIVE path.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col)
    ts, val = F.col(ts_col), F.col(value_col)
    prev_ts = F.lag(ts).over(w)
    if start is not None:
        prev_ts = F.coalesce(prev_ts, F.lit(float(start)))
    out = samples.withColumn("prev_ts", prev_ts).withColumn("prev_value", F.lag(val).over(w))
    raw, prev_raw = None, None
    if raw_col is not None:
        raw = F.col(raw_col)
        out = out.withColumn("prev_raw", F.lag(raw).over(w))
        prev_raw = F.col("prev_raw")
    out = out.filter(F.col("prev_ts").isNull() | (ts > F.col("prev_ts")))
    interval = F.when(F.col("prev_ts").isNotNull(), ts - F.col("prev_ts"))
    out = out.withColumn("interval", interval)
    rate = rate_expr(
        dst, val, F.col("prev_value"), F.col("interval"), heartbeat, min_val, max_val,
        raw_value=raw, prev_raw=prev_raw,
    )
    # no previous timestamp (first ever sample, no dataset start) → no interval
    rate = F.when(F.col("interval").isNull(), F.lit(None)).otherwise(rate)
    return out.withColumn("rate", rate)
