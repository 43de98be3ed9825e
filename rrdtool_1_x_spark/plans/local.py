"""Driver-local query tier — the interactive-latency twin of plans.graph.Query.

The reference engine answers an xport/graphv query in one process over one
mmap'd file (src/rrd_xport.c, src/rrd_graph.c); the engine's distributed
``Query`` pays a Spark job per query, which is the right trade at cluster
scale and the wrong one for a human asking about one series. This module
is the ``fetch_local`` pattern (sources/store.py:424) extended to the full
xport pipeline: pyarrow read → numpy RPN → numpy VDEF → pandas frame, no
Spark job anywhere. Semantics mirror the distributed path operator for
operator (the differential suite drives both against the reference build):

- unknown is IEEE NaN here, exactly like the reference (the distributed
  path's NULL encoding is a Spark-ism; see functions/nanops.py) — the
  NaN-propagation tables of src/rrd_rpncalc.c:745-1446 fall out of IEEE
  arithmetic plus explicit rules for ADDNAN/UN/IF/LIMIT/cmp.
- DEF fetch = ``DatasetStore.fetch_local`` (strict end alignment,
  src/rrd_fetch.c:447-448), reduce = rrd_reduce_data's NaN-skipping CFs
  (src/rrd_graph.c:786-956), VDEFs over the DEF's padded fetch universe
  (src/rrd_graph.c:5875), output trimmed to (start, end].

Unsupported RPN tokens raise ``LocalUnsupported`` (a ValueError) —
callers fall back to the distributed ``Query``, which compiles the full
op set (``cli.xport_result`` does exactly that for ``xport --local``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from rrdtool_1_x_spark.plans.graph import _format_print, rrd_lcd

_REDUCE_CFS = {
    "AVERAGE", "HWPREDICT", "MHWPREDICT", "SEASONAL", "DEVSEASONAL",
    "DEVPREDICT", "MIN", "MAX", "FAILURES", "LAST",
}


class LocalUnsupported(ValueError):
    """An RPN token (or construct) outside the local tier's op set —
    the query itself is valid, so callers rebuild on the distributed
    ``Query`` instead of surfacing an error (genuine user errors stay
    plain ValueError and are never retried)."""


def _c_round(x: float) -> int:
    """C round(): half away from zero (np.round is half-even)."""
    return int(math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1))


def reduce_local(
    ts: np.ndarray, vals: np.ndarray, cur_step: int, wish_step: int,
    cf: str, start: int | None = None, end: int | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """rrd_reduce_data (src/rrd_graph.c:786-956) over numpy arrays:
    NaN-skipping CFs, destination windows aligned to the new step on the
    window-END grid, and the boundary rule of src/rrd_graph.c:840-861 —
    destination windows only partially inside the source fetch range
    (start, end] are forced unknown and their partial source rows
    DISCARDED. Mirrors operators.fetch.reduce_data row for row."""
    factor = math.ceil(wish_step / cur_step)
    if factor <= 1:
        return ts, vals, cur_step
    new_step = cur_step * factor
    win_end = np.ceil(ts / new_step) * new_step
    keep = np.ones(len(ts), dtype=bool)
    if start is not None:
        keep &= win_end - new_step >= start
    if end is not None:
        keep &= win_end <= end
    ts, vals, win_end = ts[keep], vals[keep], win_end[keep]
    cf = cf.upper()
    if cf not in _REDUCE_CFS:
        raise ValueError(f"unknown CF {cf!r}")
    s = pd.Series(vals, index=win_end)
    g = s.groupby(level=0)
    if cf == "MIN":
        red = g.min()
    elif cf in ("MAX", "FAILURES"):
        red = g.max()
    elif cf == "LAST":
        red = g.last()  # pandas: last non-NaN in window order
    else:
        red = g.mean()
    red = red.dropna()
    return red.index.to_numpy(float), red.to_numpy(float), new_step


_CMP = {"LT": np.less, "LE": np.less_equal, "GT": np.greater,
        "GE": np.greater_equal, "EQ": np.equal, "NE": np.not_equal}
_UNARY = {"SIN": np.sin, "COS": np.cos, "LOG": np.log, "EXP": np.exp,
          "SQRT": np.sqrt, "ABS": np.abs, "FLOOR": np.floor,
          "CEIL": np.ceil, "ATAN": np.arctan,
          "DEG2RAD": np.deg2rad, "RAD2DEG": np.rad2deg}


def rpn_eval_local(
    rpn: str,
    env: dict[str, np.ndarray],
    ts: np.ndarray,
    step: float,
) -> np.ndarray:
    """Evaluate one CDEF RPN over numpy arrays (NaN = unknown).

    Supports the mainstream scalar op set (arithmetic, comparisons with
    the unknown-propagation rules of src/rrd_rpncalc.c:860-919, IF/UN/
    LIMIT/MIN/MAX/MINNAN/MAXNAN, math functions, TIME/STEPWIDTH/COUNT,
    DUP/POP/EXC) plus the TREND/TRENDNAN sliding means (cumsum-based,
    one pass). Anything else raises ValueError — use the distributed
    Query for PREV/PREDICT ops."""
    n = len(ts)
    stack: list[np.ndarray] = []
    # parallel literal-provenance stack: float when the entry came from a
    # bare numeric token (TREND's duration operand must be a constant,
    # same validation as the compiled path), else None
    consts: list[float | None] = []

    def pop(k):
        if len(stack) < k:
            raise ValueError(f"RPN stack underflow in {rpn!r}")
        out = stack[-k:]
        del stack[-k:]
        del consts[-k:]
        return out

    def pop_const(opname):
        if not consts or consts[-1] is None:
            raise ValueError(f"{opname} needs a literal constant operand")
        c = consts[-1]
        pop(1)
        return c

    def push(arr, const=None):
        stack.append(arr)
        consts.append(const)

    with np.errstate(all="ignore"):
        for tok in rpn.split(","):
            up = tok.upper()
            if tok in env:
                push(np.asarray(env[tok], float))
            elif up in ("+", "-", "*", "/", "%"):
                a, b = pop(2)
                f = {"+": np.add, "-": np.subtract, "*": np.multiply,
                     "/": np.divide, "%": np.fmod}[up]
                push(f(a, b))
            elif up == "ADDNAN":
                a, b = pop(2)
                both = np.isnan(a) & np.isnan(b)
                # NOT nan_to_num: it would also clobber ±inf to DBL_MAX
                r = np.where(np.isnan(a), 0.0, a) + np.where(
                    np.isnan(b), 0.0, b
                )
                push(np.where(both, np.nan, r))
            elif up == "POW":
                a, b = pop(2)
                push(np.power(a, b))
            elif up == "ATAN2":
                a, b = pop(2)
                push(np.arctan2(a, b))
            elif up in _UNARY:
                (a,) = pop(1)
                push(_UNARY[up](a))
            elif up in _CMP:
                a, b = pop(2)
                unk = np.isnan(a) | np.isnan(b)
                push(
                    np.where(unk, np.nan, _CMP[up](a, b).astype(float))
                )
            elif up == "UN":
                (a,) = pop(1)
                push(np.isnan(a).astype(float))
            elif up == "ISINF":
                (a,) = pop(1)
                push(
                    np.where(np.isnan(a), np.nan,
                             np.isinf(a).astype(float))
                )
            elif up == "IF":
                c, t, f = pop(3)
                cond = ~np.isnan(c) & (c != 0.0)
                push(np.where(cond, t, f))
            elif up == "LIMIT":
                v, lo, hi = pop(3)
                ok = (~np.isnan(v) & ~np.isnan(lo) & ~np.isnan(hi)
                      & (v >= lo) & (v <= hi))
                push(np.where(ok, v, np.nan))
            elif up in ("MIN", "MAX"):
                a, b = pop(2)
                f = np.minimum if up == "MIN" else np.maximum
                push(f(a, b))  # IEEE: NaN contaminates
            elif up in ("MINNAN", "MAXNAN"):
                a, b = pop(2)
                f = np.fmin if up == "MINNAN" else np.fmax
                push(f(a, b))
            elif up == "UNKN":
                push(np.full(n, np.nan))
            elif up == "INF":
                push(np.full(n, np.inf))
            elif up == "NEGINF":
                push(np.full(n, -np.inf))
            elif up == "TIME":
                push(ts.astype(float))
            elif up == "STEPWIDTH":
                push(np.full(n, float(step)))
            elif up == "COUNT":
                push(np.arange(1, n + 1, dtype=float))
            elif up == "DUP":
                # provenance survives DUP/EXC, as in the compiled path
                # (a TREND duration may legally pass through them)
                c = consts[-1] if consts else None
                (a,) = pop(1)
                push(a, c); push(a.copy(), c)
            elif up == "POP":
                pop(1)
            elif up == "EXC":
                ca, cb = (consts[-2], consts[-1]) if len(consts) >= 2 else (None, None)
                a, b = pop(2)
                push(b, cb); push(a, ca)
            elif up in ("TREND", "TRENDNAN"):
                # sliding mean over ceil(dur/step) trailing rows; NULL
                # until the window is full; TREND contaminates on any
                # unknown in the window (rpn.py:360-373 twin)
                dur = pop_const(up)
                (v,) = pop(1)
                k = int(math.ceil(dur / float(step)))
                if k <= 0:
                    raise ValueError(
                        f"{up} duration must cover at least one step"
                        f" (got {dur} at step {step})"
                    )
                if n == 0:
                    push(v)
                    continue
                known = ~np.isnan(v)
                vz = np.where(known, v, 0.0)
                # per-window LEFT-TO-RIGHT accumulation — float-identical
                # to the distributed window aggregate's sequential buffer
                # (a cumsum difference cancels differently in the last
                # ulp and would break `xport --local` byte-identity)
                k_eff = min(k, n)
                sw = np.lib.stride_tricks.sliding_window_view(vz, k_eff)
                wsum_full = np.zeros(len(sw))
                for j in range(k_eff):
                    wsum_full = wsum_full + sw[:, j]
                wcnt_full = (
                    np.lib.stride_tricks.sliding_window_view(
                        known.astype(np.int64), k_eff
                    ).sum(axis=1)
                )
                wsum = np.full(n, np.nan)
                wcnt = np.zeros(n, dtype=np.int64)
                wsum[k_eff - 1:] = wsum_full
                wcnt[k_eff - 1:] = wcnt_full
                with np.errstate(invalid="ignore", divide="ignore"):
                    mean = np.where(wcnt > 0, wsum / wcnt, np.nan)
                full = np.arange(1, n + 1) >= k
                if up == "TREND":
                    mean = np.where(wcnt == k, mean, np.nan)
                push(np.where(full, mean, np.nan))
            else:
                try:
                    push(np.full(n, float(tok)), const=float(tok))
                except ValueError:
                    raise LocalUnsupported(
                        f"RPN op {tok!r} unsupported in the local tier"
                        " — use the distributed Query"
                    ) from None
    if len(stack) != 1:
        raise ValueError(f"RPN {rpn!r} leaves {len(stack)} stack entries")
    return stack[0]


def vdef_local(
    vals: np.ndarray, ts: np.ndarray, op: str,
    param: float | None, step: float,
) -> tuple[float, float | None]:
    """One VDEF over (ts, vals) — numpy mirror of operators.vdef.vdef
    (itself pinned to src/rrd_graph.c:5863-6060 by goldens). Returns
    (value, when); NaN value means unknown."""
    op = op.upper()
    known = ~np.isnan(vals)
    m = int(known.sum())
    if op in ("MAXIMUM", "MINIMUM"):
        # seed = FIRST known slot (may be ±inf: isnan-only prefix scan);
        # improvements are FINITE-gated (src/rrd_graph.c:5940-5963,
        # 6005-6028) — result = extremum of {seed} ∪ {finite slots}
        if m == 0:
            return float("nan"), None
        i = int(np.argmax(known))
        best = float(vals[i])
        fmask = np.isfinite(vals)
        if fmask.any():
            fv = vals[fmask]
            cand = float(np.max(fv) if op == "MAXIMUM" else np.min(fv))
            if (cand > best) if op == "MAXIMUM" else (cand < best):
                best = cand
                i = int(np.nonzero(fmask & (vals == cand))[0][0])
        return best, float(ts[i])
    if op == "FIRST":
        if m == 0:
            return float("nan"), None
        i = int(np.argmax(known))
        return float(vals[i]), float(ts[i] - step)
    if op == "LAST":
        if m == 0:
            return float("nan"), None
        i = len(vals) - 1 - int(np.argmax(known[::-1]))
        return float(vals[i]), float(ts[i])
    # AVERAGE/STDEV/TOTAL/LSL* skip NON-finite slots (±inf too): the
    # reference scans with finite(), not isnan (src/rrd_graph.c:5971,6079)
    fin = np.isfinite(vals)
    mf = int(fin.sum())
    if op == "AVERAGE":
        return (float(np.mean(vals[fin])) if mf else float("nan")), None
    if op == "STDEV":
        return (float(np.std(vals[fin])) if mf else float("nan")), None
    if op == "TOTAL":
        return (float(np.sum(vals[fin]) * step) if mf else float("nan")), None
    if op in ("PERCENT", "PERCENTNAN"):
        if param is None:
            raise ValueError(f"{op} needs a percentile parameter")
        kn = np.sort(vals[known])
        n = len(vals)
        if op == "PERCENT":
            idx0 = _c_round(param * (n - 1) / 100.0)
            if idx0 < n - m:  # target rank falls among the unknowns
                return float("nan"), None
            return float(kn[idx0 - (n - m)]), None
        if m == 0:
            return float("nan"), None
        return float(kn[_c_round(param * (m - 1) / 100.0)]), None
    if op in ("LSLSLOPE", "LSLINT", "LSLCORREL"):
        if mf == 0:
            return float("nan"), None
        x = np.arange(len(vals), dtype=float)[fin]
        y = vals[fin]
        cnt, sx, sy = float(mf), x.sum(), y.sum()
        sxx, sxy, syy = (x * x).sum(), (x * y).sum(), (y * y).sum()
        with np.errstate(all="ignore"):
            slope = (sx * sy - cnt * sxy) / (sx * sx - cnt * sxx)
            if op == "LSLSLOPE":
                return float(slope), None
            if op == "LSLINT":
                return float((sy - slope * sx) / cnt), None
            correl = (sxy - sx * sy / cnt) / math.sqrt(
                (sxx - sx * sx / cnt) * (syy - sy * sy / cnt)
            ) if (sxx - sx * sx / cnt) * (syy - sy * sy / cnt) > 0 else float("nan")
        return float(correl), None
    raise ValueError(f"unknown VDEF {op!r}")


@dataclass
class LocalResult:
    frame: pd.DataFrame  # ts + one column per xport vname
    legends: list[str]
    scalars: dict[str, dict]
    prints: list[str]
    start: int
    end: int
    step: int


@dataclass
class _LDef:
    vname: str
    ds_name: str
    cf: str
    step_wish: int | None
    reduce_cf: str | None
    series_id: str | None
    store: object | None = None


class LocalQuery:
    """xport/PRINT query over DatasetStores, executed on the driver.

    Same builder surface as plans.graph.Query (def_/cdef/vdef/xport/
    print_) minus graph elements; ``execute()`` touches no Spark session.
    The per-query cost is a pyarrow scan + numpy passes — the engine's
    answer to the reference's single-process rrd_xport latency.
    ``store`` is the default for every DEF; a per-DEF ``store=``
    override reads additional files (multi-file xport, like the CLI).
    ``maxrows`` floors each DEF's fetch wish at
    ceil((end-start)/maxrows), the Query/-m semantics."""

    def __init__(self, store, start: int, end: int, step: int | None = None,
                 maxrows: int | None = None):
        self.store = store
        self.start = int(start)
        self.end = int(end)
        self.step_wish = int(step) if step else None
        self.maxrows = int(maxrows) if maxrows else None
        self._defs: list[_LDef] = []
        self._cdefs: list[tuple[str, str]] = []
        self._vdefs: list[tuple[str, str, str, float | None]] = []
        self._xports: list[tuple[str, str]] = []
        self._prints: list[tuple[str, str, str | None]] = []

    def def_(self, vname, ds_name, cf="AVERAGE", step=None,
             reduce_cf=None, series_id=None, store=None):
        self._defs.append(_LDef(vname, ds_name, cf.upper(),
                                int(step) if step else None,
                                reduce_cf and reduce_cf.upper(), series_id,
                                store))
        return self

    def cdef(self, vname, rpn):
        self._cdefs.append((vname, rpn))
        return self

    def vdef(self, vname, rpn):
        # VDEF:v=source,OP | source,p,PERCENT (vdef_parse,
        # src/rrd_graph.c:5760-5860)
        toks = rpn.split(",")
        if len(toks) == 2:
            src, op, param = toks[0], toks[1], None
        elif len(toks) == 3:
            src, param, op = toks[0], float(toks[1]), toks[2]
        else:
            raise ValueError(f"bad VDEF {rpn!r}")
        self._vdefs.append((vname, src, op.upper(), param))
        return self

    def xport(self, vname, legend=""):
        self._xports.append((vname, legend))
        return self

    def print_(self, vname, fmt="%lf", mode=None):
        self._prints.append((vname, fmt, mode))
        return self

    def execute(self) -> LocalResult:
        frames: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
        min_step = None
        if self.maxrows:
            min_step = math.ceil((self.end - self.start) / self.maxrows)
        # fetch memo, the Query._fetch_defs twin: several DEFs over the
        # same (store, ds, cf, wish, series) — comparing CFs, feeding
        # multiple CDEFs — cost ONE pyarrow scan on this hot path
        memo: dict[tuple, tuple] = {}
        for d in self._defs:
            wish = max(d.step_wish or 0, self.step_wish or 0) or None
            if min_step is not None:
                wish = max(wish or 0, min_step)
            store = d.store or self.store
            key = (id(store), d.cf, wish, d.reduce_cf, d.series_id,
                   d.ds_name)
            if key in memo:
                frames[d.vname] = memo[key]
                continue
            ts, vals, plan = store._fetch_arrays(
                d.cf, self.start, self.end, wish,
                series_id=d.series_id, ds_name=d.ds_name,
            )
            step = plan.step
            if wish and wish > step:
                ts, vals, step = reduce_local(
                    ts, vals, step, wish, d.reduce_cf or d.cf,
                    start=plan.start, end=plan.end,
                )
                # re-pad the reduced rows onto their aligned universe
                fstart = plan.start - plan.start % step
                fend = plan.end + ((step - plan.end % step) % step)
                grid = np.arange(fstart + step, fend + step, step, float)
                full = np.full(len(grid), np.nan)
                idx = ((ts - fstart) / step - 1).astype(int)
                ok = (idx >= 0) & (idx < len(grid))
                full[idx[ok]] = vals[ok]
                ts, vals = grid, full
            frames[d.vname] = memo[key] = (ts, vals, int(step))

        step = self.step_wish or min(s for _, _, s in frames.values())
        step = rrd_lcd([*[s for _, _, s in frames.values()], step])
        a_start = self.start - self.start % step
        a_end = self.end + ((step - self.end % step) % step)
        grid = np.arange(a_start + step, a_end + step, step, dtype=float)

        env: dict[str, np.ndarray] = {}
        for vname, (fts, fvals, fstep) in frames.items():
            # sample-and-hold onto the grid: fine ts -> owning coarse
            # interval end (src/rrd_rpncalc.c:650-677)
            src_ts = np.ceil(grid / fstep) * fstep
            f0 = fts[0] - fstep if len(fts) else 0.0
            idx = ((src_ts - f0) / fstep - 1).astype(int)
            ok = (idx >= 0) & (idx < len(fts))
            col = np.full(len(grid), np.nan)
            col[ok] = fvals[idx[ok]]
            env[vname] = col

        scalars: dict[str, dict] = {}
        vdef_by_name = {v[0]: v for v in self._vdefs}
        cdef_by_name = dict(self._cdefs)
        done: set[str] = set()
        resolving: set[str] = set()

        def ensure(name: str) -> None:
            if name in env or name in done:
                return
            if name in cdef_by_name:
                # 'done' is only set after evaluation completes, so a
                # mutually-referencing pair (A=B,..., B=A,...) would
                # re-enter here forever — fail with a clean diagnostic
                if name in resolving:
                    raise ValueError(
                        f"circular CDEF reference involving {name!r}"
                    )
                resolving.add(name)
                # resolve upstream CDEFs and VDEF-scalar refs first
                toks = cdef_by_name[name].split(",")
                for t in toks:
                    if t != name and t in cdef_by_name:
                        ensure(t)
                    if t in vdef_by_name and t not in scalars:
                        eval_vdef(t)
                senv = dict(env)
                for v, sc in scalars.items():
                    senv[v] = np.full(len(grid), sc["value"])
                env[name] = rpn_eval_local(
                    cdef_by_name[name], senv, grid, float(step)
                )
                resolving.discard(name)
                done.add(name)

        def eval_vdef(name: str) -> None:
            _, src, op, param = vdef_by_name[name]
            if src in frames:
                fts, fvals, fstep = frames[src]
                val, when = vdef_local(fvals, fts, op, param, float(fstep))
            else:
                ensure(src)
                val, when = vdef_local(env[src], grid, op, param, float(step))
            scalars[name] = {"value": val, "when": when}

        for name, _, _, _ in self._vdefs:
            ensure(vdef_by_name[name][1])
            eval_vdef(name)

        cols = {"ts": grid}
        legends = []
        for vname, legend in self._xports:
            ensure(vname)
            cols[vname] = env[vname]
            legends.append(legend or vname)
        frame = pd.DataFrame(cols)
        frame = frame[(frame["ts"] > self.start) & (frame["ts"] <= a_end)]
        prints = [
            _format_print(
                fmt,
                None if scalars[v]["value"] != scalars[v]["value"]
                else scalars[v]["value"],
                scalars[v]["when"],
                mode,
            )
            for v, fmt, mode in self._prints
        ]
        return LocalResult(
            frame=frame.reset_index(drop=True),
            legends=legends,
            scalars=scalars,
            prints=prints,
            start=a_start + step,
            end=a_end,
            step=step,
        )
