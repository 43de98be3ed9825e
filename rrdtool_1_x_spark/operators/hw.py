"""Holt-Winters aberrant-behavior detection (HWPREDICT family).

Reference: recurrences in src/rrd_hw_math.c:21-143, update driver in
src/rrd_hw_update.c:38-475, archive wiring in src/rrd_create.c:508-554.
Per step, with phase p = step index mod period, state
(intercept a, slope b, null_count k, seasonal S[p], deviation D[p]):

* prediction  = a + b·k + S[p]            (additive; multiplicative:
                                           (a + b·k)·S[p])
* on a known observation x:
    a' = α(x − S[p]) + (1−α)(a + b·k);  b' = β(a' − a) + (1−β)b;  k = 1
    S[p] = γ(x − a') + (1−γ)S[p]          (init: x − a when S[p] unknown)
    D[p] = γ|pred − x| + (1−γ)D[p]        (init: |pred − x|)
  on unknown x: k += 1, S/D unchanged.
* bootstrap: first known x sets a = x, b = 0 (init_slope_intercept,
  src/rrd_hw_update.c:10-25); while S[p] is unknown the prediction is
  unknown and a/b are frozen (src/rrd_hw_update.c:70-76).
* FAILURES: violation iff x outside pred ± δ±·D[p] (using the deviation
  from the PREVIOUS cycle, hw_is_violation src/rrd_hw_update.c:27-36);
  failure = 1 when ≥ threshold violations in the last window_len steps.
* DEVPREDICT simply republishes D (src/rrd_hw_update.c:232-260).

Spark design: the recurrence is inherently sequential per series — the one
operator family with no Catalyst primitive (SURVEY §4). It runs as an
Arrow-batched applyInPandas over series groups: one shuffle on the series
key, then a vectorized-state numpy loop per group. At 100 TB the
parallelism is across series (millions of groups), which is exactly how the
reference scales too (one file per series).

Smoother schedule: SEASONAL and DEVSEASONAL each track their own due
condition — rotating-row wrap during the BURNIN_CYCLES burn-in
(NaN-skipped fires still consume burn-in slots), then anchored where the
row pointer crosses smooth_idx = FnvHash(filename) % row_cnt
(do_schedule_smooth, src/rrd_update.c:1920-1952; seed
src/rrd_create.c:598-599), from their own random initial rows
(rrd_select_initial_row) exposed as ``r0_seasonal``/``r0_devseasonal``.
But the APPLICATION is one dataset-level flag: when ANY stream is due,
apply_smoother runs over BOTH arrays (rrd_update.c:948 + :2469-2485),
each gated by its own all-slots-known NA check. The smoother rewrites the
trailing archive rows (back-patched into already-emitted rows of the
current batch), and — because every update's coefficients come from the
scratch cache filled by the PREVIOUS update's archive read
(update_seasonal src/rrd_hw_update.c:138-141) — the step right after a
fire computes with the PRE-smooth coefficient, which feeds back into the
intercept/seasonal state. Both behaviors are emulated exactly (the
``stale_s``/``stale_d`` carries) and verified value-for-value over 40
cycles with a real smoothing window against a -DDEBUG reference build
(tests/test_fetch_differential.py::test_hw_long_run_values_match_reference).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rrdtool_1_x_spark.operators.dst import SERIES_KEYS

OUT_FIELDS = ("ts double, prediction double, seasonal double, "
              "devpredict double, devseasonal double, failures double")

BURNIN_CYCLES = 3  # src/rrd_hw.h:47


def fnv32(s: str) -> int:
    """FNV-1 32-bit (public-domain Fowler–Noll–Vo; ≙ FnvHash,
    src/hash_32.c:152). The reference anchors each dataset's post-burn-in
    seasonal-smoothing row at FnvHash(filename) % row_cnt
    (src/rrd_create.c:598-599); pass ``fnv32(name) % period`` as
    ``smooth_idx`` for bit parity with a reference file of that name."""
    h = 0x811C9DC5
    for b in s.encode():
        h = (h * 0x01000193) & 0xFFFFFFFF
        h ^= b
    return h


def _hw_series(
    ts: np.ndarray,
    vals: np.ndarray,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    delta_pos: float,
    delta_neg: float,
    threshold: int,
    window_len: int,
    multiplicative: bool,
    smooth_window: float = 0.0,
    smooth_idx: int = 0,
    r0_seasonal: int | None = None,
    r0_devseasonal: int | None = None,
) -> pd.DataFrame:
    out, _state = _hw_loop(
        ts, vals, alpha, beta, gamma, period, delta_pos, delta_neg,
        threshold, window_len, multiplicative, smooth_window, state=None,
        smooth_idx=smooth_idx, r0_seasonal=r0_seasonal,
        r0_devseasonal=r0_devseasonal,
    )
    return out


def _hw_loop(
    ts: np.ndarray,
    vals: np.ndarray,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    delta_pos: float,
    delta_neg: float,
    threshold: int,
    window_len: int,
    multiplicative: bool,
    smooth_window: float = 0.0,
    state: tuple | None = None,
    smooth_idx: int = 0,
    r0_seasonal: int | None = None,
    r0_devseasonal: int | None = None,
) -> tuple[pd.DataFrame, tuple]:
    """The HW recurrence with explicit carried state — shared by the batch
    operator (fresh state) and the streaming variant (state from the
    operator store). ``state`` = (i0, a, b, k, S, D, viol[, stale_s,
    stale_d]): global step index, intercept, slope, null-count,
    seasonal/deviation arrays of length ``period``, violation ring of
    length ``window_len``, and the one-step-delayed coefficient carries
    (NaN = none pending; legacy 7-tuples load as none pending)."""
    n = len(ts)
    pred = np.full(n, np.nan)
    seas_out = np.full(n, np.nan)
    dev_out = np.full(n, np.nan)
    devs_out = np.full(n, np.nan)
    fail = np.zeros(n)
    stale_s = stale_d = np.nan
    if state is None:
        i0 = 0
        S = np.full(period, np.nan)
        D = np.full(period, np.nan)
        a = b = np.nan
        k = 0
        viol = np.zeros(window_len, dtype=np.int64)
    else:
        i0, a, b, k, S, D, viol, *carry = state
        S, D = np.asarray(S, dtype=float).copy(), np.asarray(D, dtype=float).copy()
        viol = np.asarray(viol, dtype=np.int64).copy()
        if carry:
            stale_s, stale_d = float(carry[0]), float(carry[1])
    smooth_offset = int(np.floor(smooth_window / 2.0 * period))
    # smoother schedule phases (1-based update count mod period): burn-in at
    # each archive-row wrap, post-burn-in where the row pointer crosses
    # smooth_idx; r0_* is each archive's (random) initial row. Defaults put
    # burn-in at cycle ends and the post anchor at phase smooth_idx. The
    # consumed-burn-in count is derived from the carried step index, so the
    # streaming state needs no extra field.
    r0_s = (period - 1) if r0_seasonal is None else r0_seasonal % period
    r0_d = (period - 1) if r0_devseasonal is None else r0_devseasonal % period
    burn_s = (period - 1 - r0_s) % period
    post_s = (smooth_idx - r0_s - 1) % period
    burn_d = (period - 1 - r0_d) % period
    post_d = (smooth_idx - r0_d - 1) % period

    def _consumed(burn_phase: int) -> int:
        if i0 <= 0:
            return 0
        if burn_phase == 0:
            cnt = i0 // period
        else:
            cnt = i0 // period + (1 if i0 % period >= burn_phase else 0)
        return min(BURNIN_CYCLES, cnt)

    fires_s = _consumed(burn_s)
    fires_d = _consumed(burn_d)

    def _smooth(arr: np.ndarray) -> tuple[np.ndarray, float]:
        # circular centered moving average of width 2*offset+1 over the
        # coefficient array (apply_smoother, src/rrd_hw.c:128-245); only
        # applied when every slot is known, like the reference
        m = len(arr)
        sm = np.empty(m)
        for kk in range(m):
            idx = (np.arange(kk - smooth_offset, kk + smooth_offset + 1)) % m
            sm[kk] = arr[idx].mean()
        return sm, float(sm.mean())

    for i in range(n):
        p = (i0 + i) % period
        x = vals[i]
        # one-step-delayed coefficient read (the reference's lookahead
        # cache: update t uses the CDP_hw_seasonal scratch filled by the
        # ARCHIVE read during update t-1, update_seasonal
        # src/rrd_hw_update.c:138-141 — so the step right after a smoothing
        # fire computes with the PRE-smooth coefficient, and that stale
        # value feeds back into the intercept/seasonal recurrences)
        sc = S[p]
        if not np.isnan(stale_s):
            sc = stale_s
            stale_s = np.nan
        # ---- HWPREDICT (src/rrd_hw_update.c:38-115)
        last_a = a
        if np.isnan(a) or np.isnan(b) or np.isnan(sc):
            pr = np.nan
            if np.isnan(a) and not np.isnan(x):
                a = last_a = x
                b = 0.0
                k = 1
        else:
            if multiplicative:
                pr = (a + b * k) * sc
            else:
                pr = a + b * k + sc
            if np.isnan(x):
                k += 1
            else:
                if multiplicative:
                    a_new = np.nan if sc <= 0 else alpha * (x / sc) + (1 - alpha) * (a + b * k)
                else:
                    a_new = alpha * (x - sc) + (1 - alpha) * (a + b * k)
                b = beta * (a_new - last_a) + (1 - beta) * b
                a = a_new
                k = 1
        pred[i] = pr
        # ---- FAILURES uses the deviation before this step's update
        # (same one-step-delayed read as the seasonal coefficient)
        dv = D[p]
        if not np.isnan(stale_d):
            dv = stale_d
            stale_d = np.nan
        v = 0
        if not (np.isnan(x) or np.isnan(pr) or np.isnan(dv)):
            v = int(x > pr + delta_pos * dv or x < pr - delta_neg * dv)
        viol = np.roll(viol, 1)
        viol[0] = v
        fail[i] = 1.0 if viol.sum() >= threshold else 0.0
        # ---- SEASONAL (src/rrd_hw_update.c:117-230)
        if not np.isnan(x):
            if np.isnan(sc):
                if not np.isnan(last_a):
                    if multiplicative:
                        S[p] = np.nan if last_a <= 0 else x / last_a
                    else:
                        S[p] = x - last_a
            elif not np.isnan(a):
                if multiplicative:
                    S[p] = np.nan if a <= 0 else gamma * (x / a) + (1 - gamma) * sc
                else:
                    S[p] = gamma * (x - a) + (1 - gamma) * sc
        else:
            # "no update, store the old value unchanged"
            # (src/rrd_hw_update.c:143-148) — with a pending stale carry
            # this writes the pre-smooth value back over the smoothed slot
            S[p] = sc
        seas_out[i] = S[p]
        # ---- DEVSEASONAL (src/rrd_hw_update.c:262-365); DEVPREDICT
        # publishes the deviation as of BEFORE this step's update
        # (CDP_last_seasonal_deviation, src/rrd_hw_update.c:232-260)
        dev_out[i] = dv
        if not (np.isnan(x) or np.isnan(pr)):
            if np.isnan(dv):
                D[p] = abs(pr - x)
            else:
                D[p] = gamma * abs(pr - x) + (1 - gamma) * dv
        else:
            # store the old (possibly stale) value unchanged, like SEASONAL
            D[p] = dv
        devs_out[i] = D[p]
        # ---- periodic seasonal smoother (apply_smoother src/rrd_hw.c:
        # 128-330; schedule do_schedule_smooth src/rrd_update.c:1920-1952).
        # Observed reference behavior (verified against a -DDEBUG build):
        # the SEASONAL and DEVSEASONAL archives schedule INDEPENDENTLY,
        # each firing at its own rotating-row wrap for the first
        # BURNIN_CYCLES fires (a fire skipped for NaN still consumes a
        # burn-in slot), then anchoring where its row pointer crosses
        # smooth_idx = FnvHash(filename) % row_cnt. The row origin is
        # random per RRA (rrd_select_initial_row, src/rrd_open.c:1200) —
        # ``r0_seasonal``/``r0_devseasonal`` expose it; the defaults make
        # burn-in fire at cycle ends and the post-burn-in anchor land at
        # phase smooth_idx. The smoother also REWRITES the trailing
        # row_cnt archive rows in place, so already-emitted outputs within
        # this batch are back-patched (a streaming emitter cannot patch
        # rows emitted in earlier batches).
        g1 = i0 + i + 1
        if smooth_offset > 0:
            due_s = g1 % period == (burn_s if fires_s < BURNIN_CYCLES else post_s)
            due_d = g1 % period == (burn_d if fires_d < BURNIN_CYCLES else post_d)
            if due_s and fires_s < BURNIN_CYCLES:
                fires_s += 1
            if due_d and fires_d < BURNIN_CYCLES:
                fires_d += 1
            # ONE schedule flag for the whole dataset: when ANY
            # seasonal-family stream is due, the smoother runs over BOTH
            # the SEASONAL and DEVSEASONAL arrays (rrd_update.c:948 +
            # :2469-2485 — smooth_all_rras loops every CF_SEASONAL /
            # CF_DEVSEASONAL rra); only the due stream's burn counter
            # advances. Each array keeps its own all-known NA gate.
            if due_s or due_d:
                if not np.isnan(S).any():
                    # the NEXT step's coefficient was already read into the
                    # scratch cache before this rewrite — carry the
                    # pre-smooth value so step i+1 computes with it
                    stale_s = S[(i0 + i + 1) % period]
                    sm, baseline = _smooth(S)
                    # SEASONAL: recenter around 0 and move the baseline
                    # into the intercept (src/rrd_hw.c:248-282)
                    if multiplicative:
                        S = sm / baseline if baseline > 0 else sm
                    else:
                        S = sm - baseline
                    if not np.isnan(a):
                        a += baseline
                    for o in range(min(period, i + 1)):
                        seas_out[i - o] = S[(i0 + i - o) % period]
                if not np.isnan(D).any():
                    stale_d = D[(i0 + i + 1) % period]
                    D, _ = _smooth(D)
                    for o in range(min(period, i + 1)):
                        devs_out[i - o] = D[(i0 + i - o) % period]
    out = pd.DataFrame(
        {
            "ts": ts,
            "prediction": pred,
            "seasonal": seas_out,
            "devpredict": dev_out,
            "devseasonal": devs_out,
            "failures": fail,
        }
    )
    return out, (i0 + n, a, b, k, S, D, viol, stale_s, stale_d)


def hw_predict(
    pdp: DataFrame,
    alpha: float = 0.1,
    beta: float = 0.0035,
    gamma: float | None = None,
    period: int = 288,
    delta_pos: float = 2.0,
    delta_neg: float = 2.0,
    threshold: int = 7,
    window_len: int = 9,
    multiplicative: bool = False,
    smooth_window: float = 0.0,
    smooth_idx: int = 0,
    r0_seasonal: int | None = None,
    r0_devseasonal: int | None = None,
    keys: tuple[str, ...] = SERIES_KEYS,
    step: float | None = None,
    start: float | None = None,
) -> DataFrame:
    """Run the HW family over a complete PDP grid per series.

    ``pdp``: (keys..., ts, value) — the PDP step table, which may omit
    unknown steps; the grid is completed internally (the recurrence must see
    every step, like the reference's per-step RRA updates). ``start``/
    ``step`` pin the grid origin; default: each series' first step.
    Returns (keys..., ts, prediction, seasonal, devpredict, failures) where
    failures is the 0/1 failure flag.
    """
    if gamma is None:
        gamma = alpha
    schema = ", ".join(f"{k} string" for k in keys) + ", " + OUT_FIELDS

    keys_l = list(keys)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        ts = pdf["ts"].to_numpy(dtype=np.float64)
        vals = pdf["value"].to_numpy(dtype=np.float64)
        if step is not None:
            s = float(step)
        elif len(ts) > 1:
            s = float(np.min(np.diff(ts)))
        else:
            s = 1.0
        t0 = float(start) if start is not None else ts[0] - s
        grid = np.arange(t0 + s, ts[-1] + s / 2, s)
        full = np.full(len(grid), np.nan)
        idx = np.searchsorted(grid, ts)
        # tolerate sub-step jitter by snapping to the nearest slot
        idx = np.clip(idx, 0, len(grid) - 1)
        full[idx] = vals
        out = _hw_series(
            grid, full, alpha, beta, gamma, period,
            delta_pos, delta_neg, threshold, window_len, multiplicative,
            smooth_window, smooth_idx=smooth_idx,
            r0_seasonal=r0_seasonal, r0_devseasonal=r0_devseasonal,
        )
        for k in keys_l:
            out[k] = pdf[k].iloc[0]
        return out[keys_l + ["ts", "prediction", "seasonal", "devpredict", "devseasonal", "failures"]]

    return pdp.groupBy(*keys).applyInPandas(run, schema=schema)
