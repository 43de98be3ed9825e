"""plans.local parity: the numpy RPN evaluator and numpy VDEFs must
agree with the distributed (gated, reference-differential-tested)
implementations on every supported op, including the unknown (NaN/NULL)
and ±Inf edge rows the rrdtool semantics hinge on."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.plans.local import (
    reduce_local,
    rpn_eval_local,
    vdef_local,
)
from rrdtool_1_x_spark.rpn import RpnContext, compile_rpn

INF = float("inf")
# value rows exercising unknown, zero, negatives, ±inf
VALS_A = [1.5, None, 0.0, -2.0, INF, -INF, 100.0, None]
VALS_B = [None, 3.0, 0.0, 7.0, 2.0, None, -1.0, None]
STEP = 300.0
TS = [300.0 * (i + 1) for i in range(len(VALS_A))]


@pytest.fixture(scope="module")
def wide(spark):
    rows = [
        (TS[i], VALS_A[i], VALS_B[i]) for i in range(len(VALS_A))
    ]
    return spark.createDataFrame(rows, "ts double, a double, b double")


EXPRS = [
    "a,b,+", "a,b,-", "a,b,*", "a,b,/", "a,b,%", "a,b,ADDNAN",
    "a,2,POW", "a,0,POW", "1,b,POW", "a,b,POW", "a,b,ATAN2",
    "a,SIN", "a,COS", "a,EXP", "a,LOG", "a,ABS", "a,FLOOR", "a,CEIL",
    "a,ATAN", "a,DEG2RAD", "a,RAD2DEG",
    "a,b,LT", "a,b,LE", "a,b,GT", "a,b,GE", "a,b,EQ", "a,b,NE",
    "a,UN", "a,ISINF",
    "a,1,0,IF", "a,UN,0,a,IF", "a,0,10,LIMIT",
    "a,b,MIN", "a,b,MAX", "a,b,MINNAN", "a,b,MAXNAN",
    "UNKN", "INF", "NEGINF", "TIME", "STEPWIDTH", "COUNT",
    "a,DUP,+", "a,b,POP", "a,b,EXC,-",
    "a,SQRT",
    "b,600,TREND", "b,600,TRENDNAN", "b,900,TREND", "b,900,TRENDNAN",
]


@pytest.mark.parametrize("rpn", EXPRS)
def test_rpn_local_matches_distributed(spark, wide, rpn):
    env = {"a": F.col("a"), "b": F.col("b")}
    ctx = RpnContext(ts=F.col("ts"), step=STEP, keys=())
    dist = [
        r["r"]
        for r in wide.withColumn("r", compile_rpn(rpn, env, ctx))
        .orderBy("ts")
        .select("r")
        .collect()
    ]
    a = np.array([np.nan if v is None else v for v in VALS_A])
    b = np.array([np.nan if v is None else v for v in VALS_B])
    loc = rpn_eval_local(rpn, {"a": a, "b": b}, np.array(TS), STEP)
    assert len(dist) == len(loc)
    for i, (d, l) in enumerate(zip(dist, loc)):
        d = float("nan") if d is None else d
        same = (
            (d != d and l != l)
            or d == l
            or (math.isfinite(d) and math.isfinite(l)
                and abs(d - l) < 1e-9 * max(1.0, abs(d)))
        )
        assert same, f"{rpn} row {i}: distributed {d}, local {l}"


def test_rpn_local_rejects_unsupported():
    with pytest.raises(ValueError, match="unsupported in the local tier"):
        rpn_eval_local("a,PREV", {"a": np.zeros(3)}, np.arange(3.0), STEP)
    with pytest.raises(ValueError, match="stack"):
        rpn_eval_local("a,b", {"a": np.zeros(3), "b": np.zeros(3)},
                       np.arange(3.0), STEP)


VDEF_OPS = [
    ("MAXIMUM", None), ("MINIMUM", None), ("AVERAGE", None),
    ("STDEV", None), ("TOTAL", None), ("FIRST", None), ("LAST", None),
    ("PERCENT", 95.0), ("PERCENT", 10.0), ("PERCENTNAN", 95.0),
    ("LSLSLOPE", None), ("LSLINT", None), ("LSLCORREL", None),
]


@pytest.mark.parametrize("op,param", VDEF_OPS)
def test_vdef_local_matches_distributed(spark, op, param):
    from rrdtool_1_x_spark.operators.vdef import vdef

    vals = [2.0, None, 8.0, 4.0, None, 16.0, 1.0, None, 32.0, 5.5]
    ts = [300.0 * (i + 1) for i in range(len(vals))]
    df = spark.createDataFrame(
        list(zip(ts, vals)), "ts double, value double"
    )
    d = vdef(df, op, param=param, step=STEP).collect()[0]
    lv, lw = vdef_local(
        np.array([np.nan if v is None else v for v in vals]),
        np.array(ts), op, param, STEP,
    )
    dv = float("nan") if d["value"] is None else d["value"]
    assert (dv != dv and lv != lv) or abs(dv - lv) < 1e-9 * max(1.0, abs(dv)), (
        op, dv, lv
    )
    dw = d["when"]
    assert (dw is None and lw is None) or dw == lw, (op, dw, lw)


def test_reduce_local_matches_distributed(spark):
    from rrdtool_1_x_spark.operators.fetch import reduce_data

    vals = [2.0, None, 8.0, 4.0, None, 16.0, 1.0, None, 32.0, 5.5, 7.0]
    ts = [300.0 * (i + 1) for i in range(len(vals))]
    df = spark.createDataFrame(
        list(zip(ts, vals)), "ts double, value double"
    )
    for cf in ("AVERAGE", "MIN", "MAX", "LAST"):
        dist = {
            r["ts"]: r["value"]
            for r in reduce_data(df, 300, 900, cf, keys=()).collect()
        }
        lt, lv, lstep = reduce_local(
            np.array(ts),
            np.array([np.nan if v is None else v for v in vals]),
            300, 900, cf,
        )
        assert lstep == 900
        loc = dict(zip(lt, lv))
        assert set(dist) == set(loc), (cf, dist, loc)
        for k in dist:
            assert abs(dist[k] - loc[k]) < 1e-12, (cf, k)


def test_trend_local_float_identical_and_guarded(spark):
    """TREND/TRENDNAN local means must be FLOAT-IDENTICAL to the
    distributed window aggregate (ordered per-window accumulation, not
    cumsum differencing — cancellation in the last ulp would break
    `xport --local` byte-identity); duration constants survive DUP/EXC;
    non-positive durations raise a named error."""
    import random

    from rrdtool_1_x_spark.rpn import RpnContext, compile_rpn

    random.seed(11)
    n = 997
    vals = [
        random.uniform(-1e6, 1e6) if random.random() > 0.08 else None
        for _ in range(n)
    ]
    ts = [300.0 * (i + 1) for i in range(n)]
    df = spark.createDataFrame(list(zip(ts, vals)), "ts double, a double")
    a = np.array([np.nan if v is None else v for v in vals])
    for rpn in ("a,1800,TREND", "a,1800,TRENDNAN", "a,60000,TRENDNAN"):
        dist = [
            r["r"]
            for r in df.withColumn(
                "r",
                compile_rpn(
                    rpn, {"a": F.col("a")},
                    RpnContext(ts=F.col("ts"), step=300.0, keys=()),
                ),
            ).orderBy("ts").select("r").collect()
        ]
        loc = rpn_eval_local(rpn, {"a": a}, np.array(ts), 300.0)
        for i, (d, l) in enumerate(zip(dist, loc)):
            d = float("nan") if d is None else d
            assert (d != d and l != l) or d == l, (rpn, i, d, l)
    # duration through DUP: provenance preserved, both layers agree
    loc2 = rpn_eval_local(
        "a,1800,DUP,POP,TREND", {"a": a}, np.array(ts), 300.0
    )
    base = rpn_eval_local("a,1800,TREND", {"a": a}, np.array(ts), 300.0)
    assert np.array_equal(loc2, base, equal_nan=True)
    with pytest.raises(ValueError, match="at least one step"):
        rpn_eval_local("a,0,TREND", {"a": a}, np.array(ts), 300.0)
    with pytest.raises(ValueError, match="at least one step"):
        rpn_eval_local("a,-300,TRENDNAN", {"a": a}, np.array(ts), 300.0)


INF_VALS = [1.0, None, INF, 3.0, -INF, None, 5.0]
INF_TS = [300.0 * (i + 1) for i in range(len(INF_VALS))]


@pytest.mark.parametrize("op,param", VDEF_OPS)
def test_vdef_finite_rule_parity_with_inf(spark, op, param):
    """±inf rows (reachable via CDEF LOG over a 0): AVERAGE/STDEV/TOTAL
    and the LSL family skip NON-finite slots (finite() in vdef_calc's
    scan loops, src/rrd_graph.c:5971,6079); MIN/MAX/FIRST/LAST/PERCENT
    keep isnan-only rules so ±inf participates there. Both tiers must
    agree on every op over an inf-bearing series."""
    from rrdtool_1_x_spark.operators.vdef import vdef

    df = spark.createDataFrame(
        list(zip(INF_TS, INF_VALS)), "ts double, value double"
    )
    d = vdef(df, op, param=param, step=STEP).collect()[0]
    lv, lw = vdef_local(
        np.array([np.nan if v is None else v for v in INF_VALS]),
        np.array(INF_TS), op, param, STEP,
    )
    dv = float("nan") if d["value"] is None else d["value"]
    assert (dv != dv and lv != lv) or dv == lv, (op, dv, lv)
    dw = d["when"]
    assert (dw is None and lw is None) or dw == lw, (op, dw, lw)


def test_vdef_finite_rule_values(spark):
    """Pin the finite-rule numbers themselves: over [1, U, inf, 3,
    -inf, U, 5] AVERAGE=3, STDEV=population std of {1,3,5}, TOTAL=
    9*step, LSLSLOPE regresses only the finite rows (x=0,3,6 kept);
    MAXIMUM/MINIMUM seed with the FIRST known slot and improve over
    finite slots only, so the mid-series ±inf never wins — the exact
    vdef_calc loops (reference-differential-pinned in /tmp drive)."""
    from rrdtool_1_x_spark.operators.vdef import vdef

    df = spark.createDataFrame(
        list(zip(INF_TS, INF_VALS)), "ts double, value double"
    )
    get = lambda op: vdef(df, op, step=STEP).collect()[0]
    assert get("AVERAGE")["value"] == pytest.approx(3.0)
    assert get("STDEV")["value"] == pytest.approx(
        float(np.std([1.0, 3.0, 5.0]))
    )
    assert get("TOTAL")["value"] == pytest.approx(9.0 * STEP)
    # finite rows keep their x positions: x={0,3,6}, y={1,3,5} -> slope 2/3
    assert get("LSLSLOPE")["value"] == pytest.approx(2.0 / 3.0)
    # seed 1.0@ts0; finite improvements beat it for MAX (5.0), not MIN
    mx, mn = get("MAXIMUM"), get("MINIMUM")
    assert mx["value"] == 5.0 and mx["when"] == INF_TS[6]
    assert mn["value"] == 1.0 and mn["when"] == INF_TS[0]
    # a ±inf SEED survives (nothing finite beats -inf for MIN; and with
    # no finite slot at all the seed is the result even for the "wrong"
    # extremum — MINIMUM over [+inf, U, -inf] is +inf in the reference)
    df2 = spark.createDataFrame(
        [(300.0, INF), (600.0, None), (900.0, -INF)],
        "ts double, value double",
    )
    get2 = lambda op: vdef(df2, op, step=STEP).collect()[0]
    assert get2("MAXIMUM")["value"] == INF and get2("MAXIMUM")["when"] == 300.0
    assert get2("MINIMUM")["value"] == INF and get2("MINIMUM")["when"] == 300.0
    for op in ("AVERAGE", "STDEV", "TOTAL", "LSLSLOPE"):
        assert get2(op)["value"] is None, op
        lv, _ = vdef_local(
            np.array([INF, np.nan, -INF]),
            np.array([300.0, 600.0, 900.0]), op, None, STEP,
        )
        assert lv != lv, op
