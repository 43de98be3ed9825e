"""Stateful streaming PDP normalization via applyInPandasWithState.

The in-memory-state alternative to streaming/ingest.py's table-state
design: per-series operator state ≙ the reference's pdp_prep
(last reading, partial rate·seconds, unknown seconds —
src/rrd_format.h:308-315), updated per micro-batch with finalized PDPs
emitted downstream. No lookback re-read of the samples table; the
checkpoint persists the state (≙ the daemon's journal).

The per-update algorithm is the reference's, sequentially
(update_pdp_prep → calculate_elapsed_steps → the multi-step split →
process_pdp_st, src/rrd_update.c:1433-1830 and 1178-1253); the batch
operator (operators/pdp.py) encodes the same rules per-step — the two are
equivalence-tested.

Use this when series are hot (state stays small and resident); use the
foreachBatch path when replay-idempotence against the table is preferred.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "last_ts double, last_value double, scratch_val double, scratch_unk double"
)
OUTPUT_SCHEMA = "series_id string, ds_name string, ts double, value double"


def _rate(dst: str, v, prev, interval: float, hb: float, mn, mx):
    if interval > hb or v is None or math.isnan(v):
        return math.nan
    dst = dst.upper()
    if dst == "GAUGE":
        r = v
    elif dst in ("COUNTER", "DERIVE", "DCOUNTER", "DDERIVE"):
        if prev is None or math.isnan(prev):
            return math.nan
        d = v - prev
        if dst == "COUNTER":
            if d < 0:
                d += 4294967295.0
            if d < 0:
                d += 18446744069414584320.0
        if dst == "DCOUNTER" and ((v > 0 and prev > v) or (v < 0 and v > prev)):
            return math.nan
        r = d / interval
    elif dst == "ABSOLUTE":
        r = v / interval
    else:
        raise ValueError(dst)
    if mn is not None and r < mn:
        return math.nan
    if mx is not None and r > mx:
        return math.nan
    return r


def _process_series(
    ts_vals: list[tuple[float, float | None]],
    st: tuple[float, float, float, float] | None,
    step: float,
    dst: str,
    hb: float,
    mn,
    mx,
    start: float | None,
):
    """Run the reference's per-update state machine; returns (emitted
    [(step_end, value)], new_state)."""
    out: list[tuple[float, float]] = []
    if st is None:
        last_ts = float(start) if start is not None else math.nan
        last_v = math.nan
        s_val = math.nan
        s_unk = (last_ts % step) if not math.isnan(last_ts) else 0.0
    else:
        last_ts, last_v, s_val, s_unk = st

    def finalize(val_num: float, span_secs: float, unk: float, pre_unk: float, viol: bool):
        if viol or s_unk_threshold_exceeded or (span_secs - unk - pre_unk) <= 0:
            return math.nan
        return val_num / (span_secs - unk - pre_unk)

    for t, v in ts_vals:
        if math.isnan(last_ts):
            # first ever sample with no dataset start: opens the clock
            last_ts, last_v, s_val, s_unk = t, (math.nan if v is None else v), 0.0, t % step
            continue
        if t <= last_ts:
            continue  # strictly-increasing rule (src/rrd_update.c:1416-1423)
        interval = t - last_ts
        r = _rate(dst, v, last_v, interval, hb, mn, mx)
        occu = math.floor(t / step) * step
        proc = math.floor(last_ts / step) * step
        if occu <= proc:
            # no boundary crossed (simple_update, src/rrd_update.c:1656-1687)
            if math.isnan(r):
                s_unk += interval
            else:
                s_val = (0.0 if math.isnan(s_val) else s_val) + r * interval
        else:
            elapsed = int(round((occu - proc) / step))
            pre = occu - last_ts
            L = pre % step
            if elapsed > 1 and L > 0:
                # split: the open first step gets its share
                # (src/rrd_update.c:1180-1253)
                s_unk_threshold_exceeded = s_unk > step / 2.0
                num = (0.0 if math.isnan(s_val) else s_val) + (
                    0.0 if math.isnan(r) else r * L
                )
                pre_unk = L if math.isnan(r) else 0.0
                val = finalize(num, step, s_unk, pre_unk, L > hb)
                if not math.isnan(val):
                    out.append((proc + step, val))
                # remaining steps: uniform rate
                rest_secs = (elapsed - 1) * step
                s_unk_threshold_exceeded = False
                if math.isnan(r) or (interval - L) > hb:
                    val2 = math.nan
                else:
                    val2 = r
                if not math.isnan(val2):
                    for k in range(1, elapsed):
                        out.append((proc + step + k * step, val2))
            else:
                # single step or L == 0: one shared value
                s_unk_threshold_exceeded = s_unk > step / 2.0
                num = (0.0 if math.isnan(s_val) else s_val) + (
                    0.0 if math.isnan(r) else r * pre
                )
                pre_unk = pre if math.isnan(r) else 0.0
                val = finalize(num, elapsed * step, s_unk, pre_unk, interval > hb)
                if not math.isnan(val):
                    for k in range(elapsed):
                        out.append((proc + step + k * step, val))
            # seed the next step (post_int)
            post = t - occu
            if math.isnan(r):
                s_val, s_unk = math.nan, post
            else:
                s_val, s_unk = r * post, 0.0
        last_ts = t
        last_v = math.nan if v is None else v
    return out, (last_ts, last_v, s_val, s_unk)


def stateful_pdp_stream(
    stream: DataFrame,
    step: int,
    dst: str,
    heartbeat: float,
    min_val: float | None = None,
    max_val: float | None = None,
    start: float | None = None,
) -> DataFrame:
    """streaming (series_id, ds_name, ts, value) → streaming finalized PDPs.

    Rows within and across micro-batches must be in per-series time order
    for exact reference semantics (out-of-order rows are dropped by the
    strictly-increasing rule, like the daemon)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows: list[tuple[float, float | None]] = []
        for pdf in pdfs:
            for t, v in zip(pdf["ts"], pdf["value"]):
                rows.append((float(t), None if pd.isna(v) else float(v)))
        rows.sort(key=lambda x: x[0])
        st = state.get if state.exists else None
        out, new_state = _process_series(
            rows, st, float(step), dst, float(heartbeat), min_val, max_val, start
        )
        state.update(new_state)
        if out:
            yield pd.DataFrame(
                {
                    "series_id": key[0],
                    "ds_name": key[1],
                    "ts": [o[0] for o in out],
                    "value": [o[1] for o in out],
                }
            )

    return stream.groupBy("series_id", "ds_name").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
