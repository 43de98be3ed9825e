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


CDP_STATE_SCHEMA = (
    "win_end double, known long, fix long, fsum double,"
    " vmin double, vmax double, vlast double"
)
CDP_OUTPUT_SCHEMA = "series_id string, ds_name string, ts double, value double"


def _cdp_series(
    pdps: list[tuple[float, float]],
    st: tuple | None,
    step: float,
    pdp_cnt: int,
    cf: str,
    xff: float,
    exact: bool,
    exact_scale: float,
):
    """The reference's cdp_prep scratch (src/rrd_format.h:381-386) as a pure
    state machine: per finalized PDP, accumulate into the open CDP window;
    when a PDP belonging to a later window arrives, the window is complete —
    apply the xff rule and emit. Mirrors operators/cdp.py consolidate
    exactly, including the fixed-point exact mean (integer-domain half-up)
    and the clock rule (the trailing in-progress window stays in state, the
    analogue of write_to_rras only writing past window ends,
    src/rrd_update.c:2333-2411).

    Returns (emitted [(window_end, value)], new_state). PDPs are known by
    construction (the PDP stream omits unknown steps); late PDPs (older than
    the open window) are dropped like out-of-order raw updates.
    """
    cf = cf.upper()
    if cf not in ("AVERAGE", "MIN", "MAX", "LAST"):
        raise ValueError(f"stateful CDP handles basic CFs, got {cf!r}")
    res = step * pdp_cnt
    out: list[tuple[float, float]] = []
    if st is None or st[0] is None or math.isnan(st[0]):
        win_end: float | None = None
        known, fix, fsum = 0, 0, 0.0
        vmin, vmax, vlast = math.inf, -math.inf, math.nan
    else:
        win_end, known, fix, fsum, vmin, vmax, vlast = st
        known, fix = int(known), int(fix)

    def flush() -> None:
        if win_end is None or known == 0:
            return
        if (pdp_cnt - known) > pdp_cnt * xff:
            return
        if cf == "AVERAGE":
            if exact:
                v = (
                    math.floor(float(fix * 2 + known) / float(known * 2))
                    / exact_scale
                )
            else:
                v = fsum / known
        elif cf == "MIN":
            v = vmin
        elif cf == "MAX":
            v = vmax
        else:  # LAST: literal final-step PDP; unknown stays unknown
            if math.isnan(vlast):
                return
            v = vlast
        out.append((win_end, v))

    for t, v in pdps:
        we = math.ceil(t / res) * res
        if win_end is None or we > win_end:
            flush()
            win_end = we
            known, fix, fsum = 0, 0, 0.0
            vmin, vmax, vlast = math.inf, -math.inf, math.nan
        elif we < win_end:
            continue
        known += 1
        fix += int(round(v * exact_scale))
        fsum += v
        vmin = min(vmin, v)
        vmax = max(vmax, v)
        if t == win_end:
            vlast = v
    return out, (
        math.nan if win_end is None else win_end,
        known,
        fix,
        fsum,
        vmin,
        vmax,
        vlast,
    )


def stateful_cdp_stream(
    pdp_stream: DataFrame,
    step: int,
    pdp_cnt: int,
    cf: str = "AVERAGE",
    xff: float = 0.5,
    exact: bool = False,
    exact_scale: float = 1e6,
) -> DataFrame:
    """streaming finalized PDPs → streaming finalized CDPs (one RRA).

    The in-memory-state maintenance of an archive rollup: per-series
    cdp_prep scratch lives in operator state, one output row per completed
    window. ``pdp_cnt == 1`` is the identity, like the batch operator.
    Chain from a PDP stream persisted by the ingest path (Spark does not
    allow two applyInPandasWithState operators in one query); run one
    stateful query per RRA off the same PDP topic — each maintains its own
    scratch, the streaming analogue of rrd_update maintaining every RRA
    per update (src/rrd_update.c:1840-1915)."""
    if pdp_cnt == 1:
        return pdp_stream.select("series_id", "ds_name", "ts", "value")

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows: list[tuple[float, float]] = []
        for pdf in pdfs:
            for t, v in zip(pdf["ts"], pdf["value"]):
                if not pd.isna(v):
                    rows.append((float(t), float(v)))
        rows.sort(key=lambda x: x[0])
        st = state.get if state.exists else None
        out, new_state = _cdp_series(
            rows, st, float(step), int(pdp_cnt), cf, float(xff), exact, exact_scale
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

    return pdp_stream.groupBy("series_id", "ds_name").applyInPandasWithState(
        fn,
        outputStructType=CDP_OUTPUT_SCHEMA,
        stateStructType=CDP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HW_STATE_SCHEMA = (
    "i long, a double, b double, k long,"
    " s array<double>, d array<double>, viol array<long>,"
    " stale_s double, stale_d double, last_ts double"
)
HW_OUTPUT_SCHEMA = (
    "series_id string, ts double, prediction double, seasonal double,"
    " devpredict double, devseasonal double, failures double"
)


def stateful_hw_stream(
    pdp_stream: DataFrame,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    delta_pos: float = 2.0,
    delta_neg: float = 2.0,
    threshold: int = 7,
    window_len: int = 9,
    multiplicative: bool = False,
    smooth_window: float = 0.0,
    smooth_idx: int = 0,
) -> DataFrame:
    """streaming per-step PDPs → streaming Holt-Winters aberrant outputs.

    The online form of operators/hw.py: the full HWPREDICT-family scratch —
    intercept/slope/null-count plus the SEASONAL and DEVSEASONAL
    coefficient arrays and the FAILURES violation ring (the reference keeps
    these in the RRA cdp_preps, src/rrd_hw_update.c:38-475) — lives in
    operator state, one output row per step. Input must be the padded
    per-step stream (unknown steps present with NULL value, in order):
    the recurrence advances its phase every step, known or not."""
    import numpy as np

    from rrdtool_1_x_spark.operators.hw import _hw_loop

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows: list[tuple[float, float]] = []
        for pdf in pdfs:
            for t, v in zip(pdf["ts"], pdf["value"]):
                rows.append((float(t), math.nan if pd.isna(v) else float(v)))
        rows.sort(key=lambda x: x[0])
        st = None
        last_ts = -math.inf
        if state.exists:
            i0, a, b, k, s, d, viol, stale_s, stale_d, last_ts = state.get
            st = (int(i0), a, b, int(k), s, d, viol, stale_s, stale_d)
        # strictly-increasing rule: a late step would advance the phase out
        # of line with wall time — drop it like the PDP stream drops late
        # raw updates
        rows = [r for r in rows if r[0] > last_ts]
        if rows:
            last_ts = rows[-1][0]
        out, (i1, a, b, k, s, d, viol, stale_s, stale_d) = _hw_loop(
            np.array([r[0] for r in rows]),
            np.array([r[1] for r in rows]),
            alpha, beta, gamma, period, delta_pos, delta_neg,
            threshold, window_len, multiplicative, smooth_window, state=st,
            smooth_idx=smooth_idx,
        )
        state.update(
            (int(i1), float(a), float(b), int(k),
             [float(x) for x in s], [float(x) for x in d],
             [int(x) for x in viol], float(stale_s), float(stale_d),
             float(last_ts))
        )
        if len(out):
            out.insert(0, "series_id", key[0])
            yield out

    return pdp_stream.groupBy("series_id").applyInPandasWithState(
        fn,
        outputStructType=HW_OUTPUT_SCHEMA,
        stateStructType=HW_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


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
