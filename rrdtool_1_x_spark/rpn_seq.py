"""Sequential RPN evaluation — the fallback path for self-referential PREV.

Reference: OP_PREV reads the expression's own previous OUTPUT
(src/rrd_rpncalc.c:685-691), a recurrence with no Catalyst primitive
(SURVEY §4 / §7 hazards). Everything else in the RPN language compiles to
Columns (rpn.compile_rpn); expressions containing bare ``PREV`` route here:
an Arrow-batched applyInPandas per series with a row-at-a-time stack
machine. Supported ops: the scalar set (arithmetic, comparisons, IF,
MIN/MAX/MINNAN/MAXNAN, LIMIT, UN/ISINF, constants, stack manipulation),
TIME/COUNT/STEPWIDTH, PREV and PREV(vname). Sliding-window ops belong in
the compiled path.

Unknown is represented as NaN inside the loop (like the reference) and
NULL at the DataFrame boundary.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_NUM_RE = re.compile(r"^[-+]?(\d+\.?\d*([eE][-+]?\d+)?|\.\d+([eE][-+]?\d+)?)$")

_BIN = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: (a / b) if b != 0 else (math.nan if a == 0 else math.copysign(math.inf, a)),
    "%": lambda a, b: math.fmod(a, b) if b != 0 else math.nan,
    "POW": lambda a, b: math.pow(a, b) if not (a < 0 and b != int(b)) else math.nan,
    "ATAN2": math.atan2,
}
_UN = {
    "SIN": math.sin, "COS": math.cos,
    "LOG": lambda x: math.log(x) if x > 0 else math.nan,
    "EXP": math.exp,
    "SQRT": lambda x: math.sqrt(x) if x >= 0 else math.nan,
    "ATAN": math.atan, "FLOOR": math.floor, "CEIL": math.ceil,
    "ABS": abs, "ROUND": lambda x: float(round(x)),
    "DEG2RAD": math.radians, "RAD2DEG": math.degrees,
}
_CMP = {
    "LT": lambda a, b: a < b, "LE": lambda a, b: a <= b,
    "GT": lambda a, b: a > b, "GE": lambda a, b: a >= b,
    "EQ": lambda a, b: a == b, "NE": lambda a, b: a != b,
}


def _eval_row(tokens, vals: dict, prev_out: float, t: float, idx: int, step: float) -> float:
    st: list[float] = []
    for tok in tokens:
        up = tok.upper()
        if _NUM_RE.match(tok):
            st.append(float(tok))
        elif tok in vals:
            st.append(vals[tok])
        elif up == "PREV":
            st.append(prev_out)
        elif up.startswith("PREV(") and up.endswith(")"):
            st.append(vals[f"__prev_{tok[5:-1]}"])
        elif up == "UNKN":
            st.append(math.nan)
        elif up == "INF":
            st.append(math.inf)
        elif up == "NEGINF":
            st.append(-math.inf)
        elif up == "TIME":
            st.append(t)
        elif up == "COUNT":
            st.append(float(idx + 1))
        elif up == "STEPWIDTH":
            st.append(step)
        elif up in _BIN:
            b, a = st.pop(), st.pop()
            st.append(math.nan if (math.isnan(a) or math.isnan(b)) else _BIN[up](a, b))
        elif up == "ADDNAN":
            b, a = st.pop(), st.pop()
            if math.isnan(a) and math.isnan(b):
                st.append(math.nan)
            else:
                st.append((0 if math.isnan(a) else a) + (0 if math.isnan(b) else b))
        elif up in _UN:
            a = st.pop()
            st.append(math.nan if math.isnan(a) else float(_UN[up](a)))
        elif up in _CMP:
            b, a = st.pop(), st.pop()
            st.append(
                math.nan if (math.isnan(a) or math.isnan(b)) else float(_CMP[up](a, b))
            )
        elif up == "IF":
            f_, t_, c = st.pop(), st.pop(), st.pop()
            st.append(t_ if (not math.isnan(c) and c != 0) else f_)
        elif up in ("MIN", "MAX"):
            b, a = st.pop(), st.pop()
            if math.isnan(a) or math.isnan(b):
                st.append(math.nan)
            else:
                st.append(min(a, b) if up == "MIN" else max(a, b))
        elif up in ("MINNAN", "MAXNAN"):
            b, a = st.pop(), st.pop()
            known = [x for x in (a, b) if not math.isnan(x)]
            if not known:
                st.append(math.nan)
            else:
                st.append(min(known) if up == "MINNAN" else max(known))
        elif up == "LIMIT":
            hi, lo, v = st.pop(), st.pop(), st.pop()
            bad = math.isnan(v) or math.isnan(lo) or math.isnan(hi) or v < lo or v > hi
            st.append(math.nan if bad else v)
        elif up == "UN":
            st.append(float(math.isnan(st.pop())))
        elif up == "ISINF":
            a = st.pop()
            st.append(math.nan if math.isnan(a) else float(math.isinf(a)))
        elif up == "DUP":
            st.append(st[-1])
        elif up == "EXC":
            st[-1], st[-2] = st[-2], st[-1]
        elif up == "POP":
            st.pop()
        else:
            raise ValueError(f"op {tok!r} not supported in sequential RPN eval")
    if len(st) != 1:
        raise ValueError("RPN leaves more than one value")
    return st[0]


def eval_sequential(
    df: DataFrame,
    expr: str,
    var_cols: dict[str, str],
    keys: tuple[str, ...] = ("series_id",),
    ts_col: str = "ts",
    step: float | None = None,
    out_col: str = "value",
) -> DataFrame:
    """Evaluate an RPN containing PREV over each series in time order.

    ``var_cols`` maps RPN variable names → DataFrame column names.
    Returns (keys..., ts, out_col)."""
    tokens = [t for t in expr.split(",") if t != ""]
    # validate on the driver so unsupported ops fail fast with a clear error
    # instead of a worker-side stack trace
    supported = (
        set(_BIN) | set(_UN) | set(_CMP)
        | {"PREV", "UNKN", "INF", "NEGINF", "TIME", "COUNT", "STEPWIDTH",
           "ADDNAN", "IF", "MIN", "MAX", "MINNAN", "MAXNAN", "LIMIT", "UN",
           "ISINF", "DUP", "EXC", "POP"}
    )
    for tok in tokens:
        up = tok.upper()
        if not (
            _NUM_RE.match(tok)
            or tok in var_cols
            or up in supported
            or (up.startswith("PREV(") and up.endswith(")") and tok[5:-1] in var_cols)
        ):
            raise ValueError(
                f"op {tok!r} not supported in sequential RPN eval "
                "(window/set ops belong in the compiled path, rpn.compile_rpn)"
            )
    keys_l = list(keys)
    schema = ", ".join(
        [f"{k} string" for k in keys_l] + [f"{ts_col} double", f"{out_col} double"]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        ts = pdf[ts_col].to_numpy(dtype=np.float64)
        cols = {v: pdf[c].to_numpy(dtype=np.float64) for v, c in var_cols.items()}
        s = float(step) if step is not None else (float(np.min(np.diff(ts))) if len(ts) > 1 else 1.0)
        out = np.full(len(ts), np.nan)
        prev = math.nan
        prev_vals = {v: math.nan for v in var_cols}
        for i in range(len(ts)):
            vals = {v: float(cols[v][i]) for v in var_cols}
            for v in var_cols:
                vals[f"__prev_{v}"] = prev_vals[v]
            prev = _eval_row(tokens, vals, prev, float(ts[i]), i, s)
            out[i] = prev
            prev_vals = {v: vals[v] for v in var_cols}
        res = pd.DataFrame({ts_col: ts, out_col: out})
        for k in keys_l:
            res[k] = pdf[k].iloc[0]
        return res[keys_l + [ts_col, out_col]]

    return df.groupBy(*keys).applyInPandas(run, schema=schema)
