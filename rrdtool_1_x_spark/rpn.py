"""RPN (CDEF) expression compiler: rrdtool RPN strings → pyspark Columns.

Reference: parser rpn_parse (src/rrd_rpncalc.c:335-487), evaluator rpn_calc
(src/rrd_rpncalc.c:613-1446), op set enum op_en (src/rrd_rpncalc.h:13-28).

The reference interprets the RPN per time step with a double stack. We
instead run the parser ONCE over an abstract stack of ``pyspark.sql.Column``
objects: stack-manipulation ops (DUP, EXC, POP, DEPTH, COPY, INDEX, ROLL)
shape the expression DAG at compile time and cost nothing at runtime; every
value op becomes a Column expression that Catalyst folds into whole-stage
codegen. Only the sliding-window ops (TREND/TRENDNAN/PREDICT*) become window
functions, and only PREV needs an ordered lag.

Unknown semantics: the engine represents rrdtool's NaN-unknown as SQL NULL.
Ops that can produce IEEE NaN from known inputs (0/0, log of a negative,
inf-inf…) are wrapped so NaN normalizes back to NULL, matching the
reference where NaN *is* the unknown value. ±Inf remain first-class values
(OP_INF/OP_NEGINF, src/rrd_rpncalc.c:695-699).

Ops evaluated against the step's timestamp (TIME, LTIME, NEWDAY, COUNT,
STEPWIDTH, PREV, TREND…) need an :class:`RpnContext` describing the time
grid; pure scalar expressions don't.

PREV (self-reference to the expression's own previous output,
src/rrd_rpncalc.c:685-691) is a sequential recurrence with no Catalyst
primitive; it is not supported in the compiled path (raises), matching
SURVEY.md §7's hazard note. PREV(vname) compiles to lag().
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from rrdtool_1_x_spark.functions.nanops import (
    addnan,
    cmp_nan,
    if_nan,
    limit,
    max_nan_contaminating,
    min_nan_contaminating,
)

_NUM_RE = re.compile(r"^[-+]?(\d+\.?\d*([eE][-+]?\d+)?|\.\d+([eE][-+]?\d+)?)$")


@dataclass
class RpnContext:
    """Time-grid context for step-dependent ops.

    ``ts``: Column of the step's epoch seconds (step END, fetch convention);
    ``step``: step width in seconds; ``keys``: series partition columns for
    window ops; ``tz``: IANA zone for LTIME/NEWDAY… (reference uses the
    process TZ, src/rrd_rpncalc.c:1450-1478); ``now``: wall clock override.
    """

    ts: Column | None = None
    step: float | None = None
    keys: tuple[str, ...] = ()
    tz: str = "UTC"
    now: float | None = None

    def window(self):
        if self.ts is None:
            raise ValueError("this RPN op needs a time context (ts column)")
        return Window.partitionBy(*[F.col(k) for k in self.keys]).orderBy(self.ts)

    def rownum(self) -> Column:
        return F.row_number().over(self.window())

    def local_ts(self) -> Column:
        """Timestamp column shifted into the context TZ."""
        utc = F.timestamp_seconds(self.ts)
        return F.from_utc_timestamp(utc, self.tz)


def _nn(c: Column) -> Column:
    """NaN (computed from known inputs) → NULL (unknown)."""
    return F.nanvl(c, F.lit(None).cast("double"))


def _div(a: Column, b: Column) -> Column:
    # IEEE semantics like the reference's C division: x/0 = ±inf, 0/0 = NaN
    # (unknown). Spelled out with CASE WHEN so it holds under ANSI mode too
    # (the engine cannot assume the caller's session has ANSI off).
    inf = F.lit(float("inf"))
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when(b == 0, F.when(a > 0, inf).when(a < 0, -inf))
        .otherwise(_nn(a / b))
    )


def _binop_nan(a: Column, b: Column, f) -> Column:
    return F.when(a.isNull() | b.isNull(), F.lit(None)).otherwise(_nn(f(a, b)))


def _array_of(vals: list[Column]) -> Column:
    return F.array(*vals)


_FIRST_WEEKDAY: int | None = None


def first_weekday() -> int:
    """The locale's first weekday, 0=Sunday 1=Monday — the NEWWEEK boundary.

    Replays find_first_weekday (src/rrd_rpncalc.c:548-596): glibc
    nl_langinfo(_NL_TIME_FIRST_WEEKDAY / _NL_TIME_WEEK_1STDAY) with the
    reference's Monday default when the query is unavailable. Note the C
    locale yields Sunday, so the reference (and this engine) start weeks on
    Sunday on an unconfigured host. Cached like the reference's static."""
    global _FIRST_WEEKDAY
    if _FIRST_WEEKDAY is None:
        _FIRST_WEEKDAY = 1
        try:
            import ctypes

            libc = ctypes.CDLL(None)
            libc.nl_langinfo.restype = ctypes.c_char_p
            fw = libc.nl_langinfo(131176)[0]  # _NL_TIME_FIRST_WEEKDAY
            libc.nl_langinfo.restype = ctypes.c_void_p
            w1 = int(libc.nl_langinfo(131174) or 0)  # _NL_TIME_WEEK_1STDAY
            if w1 == 19971130 or (w1 >> 32) == 19971130:
                _FIRST_WEEKDAY = (0 + fw - 1) % 7
            elif w1 == 19971201 or (w1 >> 32) == 19971201:
                _FIRST_WEEKDAY = (1 + fw - 1) % 7
        except Exception:
            pass
    return _FIRST_WEEKDAY


class RpnError(ValueError):
    pass


def compile_rpn(
    expr: str,
    env: dict[str, Column] | None = None,
    ctx: RpnContext | None = None,
) -> Column:
    """Compile an RPN string to a single Column.

    ``env`` maps variable names (DEF/CDEF vnames) to Columns; VDEF scalars
    should be pre-substituted as float literals by the caller (the reference
    does the same constant folding, src/rrd_graph.c:1201-1210).
    """
    env = env or {}
    ctx = ctx or RpnContext()
    stack: list[Column] = []
    # parallel provenance stack: variable name if the entry is a bare
    # variable reference (TREND/PREDICT validate this in the reference),
    # or a float if the entry is a literal constant
    prov: list[object] = []

    def push(c: Column, p: object = None) -> None:
        stack.append(c)
        prov.append(p)

    def pop(n: int = 1) -> list[Column]:
        if len(stack) < n:
            raise RpnError(f"stack underflow in {expr!r}")
        out = stack[-n:]
        del stack[-n:]
        del prov[-n:]
        return out

    def pop_const(what: str) -> float:
        if not stack:
            raise RpnError(f"stack underflow in {expr!r}")
        p = prov[-1]
        pop(1)
        if not isinstance(p, float):
            raise RpnError(f"{what} requires a constant, got expression")
        return p

    tokens = [t for t in expr.split(",") if t != ""]
    for tok in tokens:
        up = tok.upper()
        if _NUM_RE.match(tok):
            v = float(tok)
            push(F.lit(v), v)
        elif tok in env:
            push(env[tok], tok)
        # --- constants ---
        elif up == "UNKN":
            push(F.lit(None).cast("double"))
        elif up == "INF":
            push(F.lit(float("inf")))
        elif up == "NEGINF":
            push(F.lit(float("-inf")))
        elif up == "STEPWIDTH":
            if ctx.step is None:
                raise RpnError("STEPWIDTH needs a time context")
            push(F.lit(float(ctx.step)), float(ctx.step))
        # --- arithmetic ---
        elif up in ("+", "ADD"):
            b, = pop(1); a, = pop(1)  # noqa: E702
            push(_nn(a + b))
        elif up in ("-", "SUB"):
            b, = pop(1); a, = pop(1)  # noqa: E702
            push(_nn(a - b))
        elif up in ("*", "MUL"):
            b, = pop(1); a, = pop(1)  # noqa: E702
            push(_nn(a * b))
        elif up in ("/", "DIV"):
            b, = pop(1); a, = pop(1)  # noqa: E702
            push(_div(a, b))
        elif up in ("%", "MOD"):
            b, = pop(1); a, = pop(1)  # noqa: E702
            # C fmod: sign of dividend (src/rrd_rpncalc.c:778-788); Spark's
            # double % has the same semantics, but mod-by-zero must yield
            # unknown (C: NaN) without tripping ANSI mode
            push(
                F.when(a.isNull() | b.isNull() | (b == 0), F.lit(None).cast("double")).otherwise(
                    _nn(a % b)
                )
            )
        elif up == "ADDNAN":
            b, = pop(1); a, = pop(1)  # noqa: E702
            push(addnan(a, b))
        elif up == "POW":
            b, = pop(1); a, = pop(1)  # noqa: E702
            # plain C pow (src/rrd_rpncalc.c:789-794): IEEE pow(NaN,0)=1
            # and pow(1,NaN)=1 produce KNOWN results from unknown inputs
            # — substitute NaN for NULL, compute, normalize NaN back.
            # Java's Math.pow deviates from C99 on pow(1, NaN) (returns
            # NaN), so the base==1 case is pinned explicitly
            _nan = F.lit(float("nan"))
            _base = F.coalesce(a, _nan)
            push(
                F.when(_base == 1.0, F.lit(1.0)).otherwise(
                    _nn(F.pow(_base, F.coalesce(b, _nan)))
                )
            )
        elif up in ("SIN", "COS", "LOG", "EXP", "SQRT", "ATAN", "FLOOR", "CEIL", "ABS", "ROUND"):
            a, = pop(1)  # noqa: E702
            _inf = float("inf")
            fn = {
                "SIN": F.sin, "COS": F.cos,
                # C log semantics (src/rrd_rpncalc.c:833-836): log(0) is
                # -inf (a first-class value), log(<0) is NaN -> unknown;
                # Spark's log returns NULL for BOTH non-positive cases
                "LOG": lambda c: F.when(c == 0.0, F.lit(-_inf)).otherwise(
                    F.log(c)
                ),
                "EXP": F.exp,
                "SQRT": F.sqrt, "ATAN": F.atan,
                # floor/ceil(±inf) = ±inf in C (src/rrd_rpncalc.c:829-832);
                # Spark's floor/ceil go through LONG and saturate
                "FLOOR": lambda c: F.when(
                    F.abs(c) == _inf, c
                ).otherwise(F.floor(c).cast("double")),
                "CEIL": lambda c: F.when(
                    F.abs(c) == _inf, c
                ).otherwise(F.ceil(c).cast("double")),
                "ABS": F.abs,
                "ROUND": lambda c: F.round(c, 0),
            }[up]
            push(_nn(fn(a)))
        elif up == "ATAN2":
            b, = pop(1); a, = pop(1)  # noqa: E702  (x,y ATAN2 = atan2(y=b? ref: y,x)
            # reference: y = pop, x = pop → atan2(x, y)?? rpn order: a,b,ATAN2
            # evaluates atan2(a, b) with a=y? C code: stackunderflow(1);
            # s[stptr-1] = atan2(s[stptr-1], s[stptr]) → atan2(first, second)
            push(_binop_nan(a, b, lambda x, y: F.atan2(x, y)))
        elif up == "DEG2RAD":
            a, = pop(1)  # noqa: E702
            push(_nn(F.radians(a)))
        elif up == "RAD2DEG":
            a, = pop(1)  # noqa: E702
            push(_nn(F.degrees(a)))
        # --- comparison / conditional ---
        elif up in ("LT", "LE", "GT", "GE", "EQ", "NE"):
            b, = pop(1); a, = pop(1)  # noqa: E702
            push(cmp_nan(a, b, up))
        elif up == "IF":
            f_, = pop(1); t_, = pop(1); c_, = pop(1)  # noqa: E702
            push(if_nan(c_, t_, f_))
        elif up == "MIN":
            b, = pop(1); a, = pop(1)  # noqa: E702
            push(min_nan_contaminating(a, b))
        elif up == "MAX":
            b, = pop(1); a, = pop(1)  # noqa: E702
            push(max_nan_contaminating(a, b))
        elif up == "MINNAN":
            b, = pop(1); a, = pop(1)  # noqa: E702
            push(F.least(a, b))  # least/greatest skip NULLs
        elif up == "MAXNAN":
            b, = pop(1); a, = pop(1)  # noqa: E702
            push(F.greatest(a, b))
        elif up == "LIMIT":
            hi, = pop(1); lo, = pop(1); v, = pop(1)  # noqa: E702
            push(limit(v, lo, hi))
        elif up == "UN":
            a, = pop(1)  # noqa: E702
            push(a.isNull().cast("double"))
        elif up == "ISINF":
            a, = pop(1)  # noqa: E702
            # reference returns NaN for unknown input? rpn_calc: isinf(x)?1:0 —
            # NaN is not inf → 0.0; but unknown stays unknown in our NULL model
            push(
                F.when(a.isNull(), F.lit(None)).otherwise(
                    (F.abs(a) == F.lit(float("inf"))).cast("double")
                )
            )
        # --- time ---
        elif up == "NOW":
            if ctx.now is not None:
                push(F.lit(float(ctx.now)), float(ctx.now))
            else:
                push(F.unix_timestamp().cast("double"))
        elif up == "TIME":
            if ctx.ts is None:
                raise RpnError("TIME needs a time context")
            push(ctx.ts.cast("double"))
        elif up == "LTIME":
            if ctx.ts is None:
                raise RpnError("LTIME needs a time context")
            # TIME + local utc-offset at that moment (src/rrd_rpncalc.c:709-712)
            off = F.unix_timestamp(ctx.local_ts()) - ctx.ts.cast("long")
            push((ctx.ts.cast("double") + off.cast("double")))
        elif up == "COUNT":
            push(ctx.rownum().cast("double"))
        elif up in ("NEWDAY", "NEWWEEK", "NEWMONTH", "NEWYEAR"):
            lts = ctx.local_ts()
            if ctx.step is None:
                raise RpnError(f"{up} needs a time context with step")
            prev = F.from_utc_timestamp(
                F.timestamp_seconds(ctx.ts - F.lit(float(ctx.step))), ctx.tz
            )
            unit = {"NEWDAY": "DAY", "NEWMONTH": "MONTH", "NEWYEAR": "YEAR"}.get(up)
            if unit:
                cur_t, prev_t = F.date_trunc(unit, lts), F.date_trunc(unit, prev)
            else:
                # NEWWEEK boundary = the locale's first weekday
                # (find_first_weekday, src/rrd_rpncalc.c:548-596); Spark's
                # WEEK truncation is Monday-anchored, so shift by d days,
                # truncate, shift back — d=(1-fw) mod 7 re-anchors the week
                # start to weekday fw (0=Sunday, 1=Monday, ...)
                d = (1 - first_weekday()) % 7
                cur_t = F.date_sub(F.date_trunc("WEEK", F.date_add(lts, d)).cast("date"), d)
                prev_t = F.date_sub(F.date_trunc("WEEK", F.date_add(prev, d)).cast("date"), d)
            push((cur_t != prev_t).cast("double"))
        elif up == "PREV":
            raise RpnError(
                "PREV (self-reference) is a sequential recurrence with no "
                "compiled form; evaluate with rpn_seq.eval_sequential"
            )
        elif up.startswith("PREV(") and up.endswith(")"):
            name = tok[5:-1]
            if name not in env:
                raise RpnError(f"PREV({name}): unknown variable")
            push(F.lag(env[name]).over(ctx.window()))
        # --- sliding windows over time ---
        elif up in ("TREND", "TRENDNAN"):
            dur = pop_const(up)
            v, = pop(1)  # noqa: E702
            if ctx.step is None:
                raise RpnError(f"{up} needs a time context with step")
            n = int(math.ceil(dur / float(ctx.step)))
            if n <= 0:
                raise RpnError(
                    f"{up} duration must cover at least one step"
                    f" (got {dur} at step {ctx.step})"
                )
            w = ctx.window().rowsBetween(-(n - 1), 0)
            avg = F.avg(v).over(w)
            full = ctx.rownum() >= F.lit(n)
            if up == "TRENDNAN":
                push(F.when(full, avg))
            else:  # TREND: any unknown in window → unknown
                cnt = F.count(v).over(w)
                push(F.when(full & (cnt == n), avg))
        elif up in ("PREDICT", "PREDICTSIGMA", "PREDICTPERC"):
            push(_predict(up, stack, prov, pop, pop_const, ctx))
        # --- n-ary set ops (compile-time arity) ---
        elif up == "SORT":
            # sorts the top n entries in place, unknown lowest
            # (src/rrd_rpncalc.c:990-998)
            n = int(pop_const(up))
            vals = pop(n)
            arr = F.array_sort(_array_of(vals), _nan_low_cmp)
            for i in range(n):
                push(F.element_at(arr, i + 1))
        elif up == "REV":
            # reverses the top n entries (src/rrd_rpncalc.c:999-1016);
            # pure compile-time reordering
            n = int(pop_const(up))
            if len(stack) < n:
                raise RpnError("REV underflow")
            stack[-n:] = stack[-n:][::-1]
            prov[-n:] = prov[-n:][::-1]
        elif up == "AVG":
            n = int(pop_const(up))
            vals = pop(n)
            known = F.filter(_array_of(vals), lambda x: x.isNotNull())
            push(
                F.when(
                    F.size(known) > 0,
                    F.aggregate(known, F.lit(0.0), lambda acc, x: acc + x) / F.size(known),
                )
            )
        elif up == "MEDIAN":
            n = int(pop_const(up))
            vals = pop(n)
            known = F.array_sort(F.filter(_array_of(vals), lambda x: x.isNotNull()))
            m = F.size(known)
            mid = (m / 2).cast("int")
            push(
                F.when(m == 0, F.lit(None)).otherwise(
                    F.when(
                        m % 2 == 1, F.element_at(known, mid + 1)
                    ).otherwise(
                        (F.element_at(known, mid) + F.element_at(known, mid + 1)) / 2.0
                    )
                )
            )
        elif up == "STDEV":
            n = int(pop_const(up))
            vals = pop(n)
            known = F.filter(_array_of(vals), lambda x: x.isNotNull())
            m = F.size(known)
            mean = F.aggregate(known, F.lit(0.0), lambda acc, x: acc + x) / m
            var = (
                F.aggregate(known, F.lit(0.0), lambda acc, x: acc + (x - mean) * (x - mean))
                / (m - 1)
            )
            push(F.when(m > 1, F.sqrt(var)))
        elif up == "PERCENT":
            # vN,…,v1,pct,n,PERCENT: elements popped first, then percentile
            # (src/rrd_rpncalc.c:1307-1329); nearest-rank over ALL n entries,
            # unknown sorts lowest, 1-based index round(pct*n/100)
            n = int(pop_const("PERCENT"))
            pct = pop_const("PERCENT")
            vals = pop(n)
            arr = F.array_sort(_array_of(vals), _nan_low_cmp)
            idx = max(1, int(round(pct * n / 100.0)))
            push(F.element_at(arr, min(idx, n)))
        elif up in ("SMIN", "SMAX"):
            # unknown-skipping min/max of n entries (src/rrd_rpncalc.c:1330-1362)
            n = int(pop_const(up))
            vals = pop(n)
            known = F.filter(_array_of(vals), lambda x: x.isNotNull())
            push(F.array_min(known) if up == "SMIN" else F.array_max(known))
        # --- stack manipulation (compile-time) ---
        elif up == "DUP":
            if not stack:
                raise RpnError("DUP on empty stack")
            push(stack[-1], prov[-1])
        elif up == "EXC":
            if len(stack) < 2:
                raise RpnError("EXC underflow")
            stack[-1], stack[-2] = stack[-2], stack[-1]
            prov[-1], prov[-2] = prov[-2], prov[-1]
        elif up == "POP":
            pop(1)
        elif up == "DEPTH":
            push(F.lit(float(len(stack))), float(len(stack)))
        elif up == "COPY":
            n = int(pop_const("COPY"))
            if len(stack) < n:
                raise RpnError("COPY underflow")
            for i in range(n):
                push(stack[-n], prov[-n])
        elif up == "INDEX":
            n = int(pop_const("INDEX"))
            if len(stack) < n:
                raise RpnError("INDEX underflow")
            push(stack[-n], prov[-n])
        elif up == "ROLL":
            m = int(pop_const("ROLL"))
            n = int(pop_const("ROLL"))
            if len(stack) < n:
                raise RpnError("ROLL underflow")
            if n > 0:
                m = m % n
                seg_c = stack[-n:]
                seg_p = prov[-n:]
                del stack[-n:], prov[-n:]
                stack.extend(seg_c[-m:] + seg_c[:-m] if m else seg_c)
                prov.extend(seg_p[-m:] + seg_p[:-m] if m else seg_p)
        else:
            raise RpnError(f"unknown RPN token {tok!r}")

    if len(stack) != 1:
        raise RpnError(f"RPN {expr!r} leaves {len(stack)} values on the stack")
    return stack[0].cast("double")


def _nan_low_cmp(a: Column, b: Column) -> Column:
    """Comparator: NULL (unknown) sorts lowest, then -inf…inf
    (reference vdef_percent_compar, src/rrd_graph.c:6121-6149)."""
    return (
        F.when(a.isNull() & b.isNull(), F.lit(0))
        .when(a.isNull(), F.lit(-1))
        .when(b.isNull(), F.lit(1))
        .when(a < b, F.lit(-1))
        .when(a > b, F.lit(1))
        .otherwise(F.lit(0))
    )


def _predict(op: str, stack, prov, pop, pop_const, ctx: RpnContext) -> Column:
    """PREDICT / PREDICTSIGMA / PREDICTPERC (src/rrd_rpncalc.c:1018-1162).

    Stack: shift1,…,shiftN,N,window,v[,pct for PERC — popped before window].
    Negative N means one shift value multiplied 0..|N|-1 times.
    Collects, for each shift s and local offset i in 0..ceil(window/step),
    the value lagged ceil(s/step)+i steps (strictly before the current row),
    then averages / sigma / percentiles the known ones.
    """
    # stack (top first): x, [percentile], window, N, shiftN..shift1
    v, = pop(1)  # noqa: E702  the series (top of stack)
    pct = None
    if op == "PREDICTPERC":
        pct = pop_const("PREDICTPERC percentile")
    locstepsize = pop_const(f"{op} window")
    nshifts = int(pop_const(f"{op} shift count"))
    if ctx.step is None:
        raise RpnError(f"{op} needs a time context with step")
    step = float(ctx.step)
    locstep = int(math.ceil(locstepsize / step))
    if nshifts < 0:
        mult = pop_const(f"{op} shift multiplier")
        shifts = [mult * k for k in range(-nshifts)]
    else:
        consts = []
        for _ in range(nshifts):
            consts.append(pop_const(f"{op} shift"))
        consts.reverse()
        shifts = consts
    w = ctx.window()
    rn = F.row_number().over(w)
    lags = []
    seen = set()
    for s in shifts:
        shiftstep = int(math.ceil(s / step))
        for i in range(locstep + 1):
            off = shiftstep + i
            if off < 0 or off in seen:
                continue
            seen.add(off)
            # reference requires offset < output_idx (strictly past rows)
            lags.append(F.when(rn - 1 > F.lit(off), F.lag(v, off).over(w)))
    arr = F.filter(F.array(*lags), lambda x: x.isNotNull())
    cnt = F.size(arr)
    if op == "PREDICT":
        s1 = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
        return F.when(cnt > 0, s1 / cnt)
    if op == "PREDICTSIGMA":
        s1 = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
        s2 = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x)
        val = cnt * s2 - s1 * s1
        return F.when(cnt > 1, F.when(val >= 0, F.sqrt(val / (cnt * (cnt - 1)))))
    # PREDICTPERC: interpolated percentile of the sorted sample
    sarr = F.array_sort(arr)
    p = pct / 100.0
    if p < 0:  # "next best" nearest rank on |p|
        idxf = F.abs(F.lit(p)) * (cnt - 1).cast("double")
        idx = F.round(idxf).cast("int")
        return F.when(cnt > 0, F.element_at(sarr, idx + 1))
    idxf = F.lit(p) * (cnt - 1).cast("double")
    idx = F.floor(idxf).cast("int")
    delta = idxf - idx.cast("double")
    base = F.element_at(sarr, idx + 1)
    nxt = F.element_at(sarr, F.least(idx + 2, cnt))
    return F.when(cnt > 0, base + (nxt - base) * delta)
