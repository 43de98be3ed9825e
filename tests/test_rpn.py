"""RPN compiler unit tests — op-by-op semantics from src/rrd_rpncalc.c."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.rpn import RpnContext, RpnError, compile_rpn

from tests.goldens import close


def ev(spark, expr, a=None, b=None, c=None):
    """Evaluate an RPN over a single row with variables a, b, c."""
    df = spark.createDataFrame([(a, b, c)], "a double, b double, c double")
    env = {"a": F.col("a"), "b": F.col("b"), "c": F.col("c")}
    return df.select(compile_rpn(expr, env).alias("r")).first()["r"]


CASES = [
    # arithmetic (NaN/unknown propagating)
    ("a,b,+", 2.0, 3.0, None, 5.0),
    ("a,b,+", None, 3.0, None, None),
    ("a,b,-", 2.0, 3.0, None, -1.0),
    ("a,b,*", 2.0, 3.0, None, 6.0),
    ("a,b,/", 3.0, 2.0, None, 1.5),
    ("a,b,/", 1.0, 0.0, None, float("inf")),  # IEEE: 1/0 = inf
    ("a,b,/", 0.0, 0.0, None, None),  # 0/0 = unknown
    ("a,b,%", 7.0, 3.0, None, 1.0),
    ("a,b,%", -7.0, 3.0, None, -1.0),  # fmod: sign of dividend
    ("a,b,ADDNAN", None, 3.0, None, 3.0),
    ("a,b,ADDNAN", 2.0, None, None, 2.0),
    ("a,b,ADDNAN", None, None, None, None),
    ("a,b,POW", 2.0, 10.0, None, 1024.0),
    ("a,SQRT", 9.0, None, None, 3.0),
    ("a,SQRT", -1.0, None, None, None),  # NaN → unknown
    ("a,LOG", math.e, None, None, 1.0),
    ("a,EXP", 0.0, None, None, 1.0),
    ("a,SIN", 0.0, None, None, 0.0),
    ("a,COS", 0.0, None, None, 1.0),
    ("a,ATAN", 1.0, None, None, math.pi / 4),
    ("a,b,ATAN2", 1.0, 1.0, None, math.pi / 4),
    ("a,DEG2RAD", 180.0, None, None, math.pi),
    ("a,RAD2DEG", math.pi, None, None, 180.0),
    ("a,FLOOR", 1.7, None, None, 1.0),
    ("a,CEIL", 1.2, None, None, 2.0),
    ("a,ABS", -3.0, None, None, 3.0),
    ("a,ROUND", 2.5, None, None, 3.0),
    # comparisons: 1/0, unknown-propagating
    ("a,b,LT", 1.0, 2.0, None, 1.0),
    ("a,b,LT", 2.0, 1.0, None, 0.0),
    ("a,b,LT", None, 1.0, None, None),
    ("a,b,GE", 2.0, 2.0, None, 1.0),
    ("a,b,EQ", 2.0, 2.0, None, 1.0),
    ("a,b,NE", 2.0, 3.0, None, 1.0),
    # IF: unknown or 0 condition → false branch
    ("a,b,c,IF", 1.0, 10.0, 20.0, 10.0),
    ("a,b,c,IF", 0.0, 10.0, 20.0, 20.0),
    ("a,b,c,IF", None, 10.0, 20.0, 20.0),
    # MIN/MAX contaminate, MINNAN/MAXNAN skip
    ("a,b,MIN", 1.0, None, None, None),
    ("a,b,MINNAN", 1.0, None, None, 1.0),
    ("a,b,MAX", 1.0, None, None, None),
    ("a,b,MAXNAN", 1.0, 2.0, None, 2.0),
    # LIMIT
    ("a,b,c,LIMIT", 5.0, 0.0, 10.0, 5.0),
    ("a,b,c,LIMIT", 15.0, 0.0, 10.0, None),
    # UN / ISINF / constants
    ("a,UN", None, None, None, 1.0),
    ("a,UN", 5.0, None, None, 0.0),
    ("a,ISINF", 5.0, None, None, 0.0),
    ("INF,ISINF", None, None, None, 1.0),
    ("NEGINF", None, None, None, float("-inf")),
    ("UNKN", None, None, None, None),
    ("UNKN,UN", None, None, None, 1.0),
    # stack ops
    ("a,DUP,+", 3.0, None, None, 6.0),
    ("a,b,EXC,-", 1.0, 5.0, None, 4.0),
    ("a,b,POP", 7.0, 1.0, None, 7.0),
    ("a,b,2,INDEX,+,+", 1.0, 5.0, None, 7.0),  # INDEX copies n-th from top
    # n-ary set ops
    ("1,3,2,3,SORT,POP,POP", None, None, None, 1.0),
    ("1,3,2,3,REV,POP,POP", None, None, None, 2.0),
    ("1,3,2,a,4,AVG", None, None, None, 2.0),  # unknown skipped
    ("1,3,2,3,MEDIAN", None, None, None, 2.0),
    ("1.0,5,2,a,4,SMAX", None, None, None, 5.0),
    ("1.0,5,2,a,4,SMIN", None, None, None, 1.0),
    ("1,2,3,4,50,4,PERCENT", None, None, None, 2.0),
    ("1,2,3,4,100,4,PERCENT", None, None, None, 4.0),
]


@pytest.mark.parametrize("expr,a,b,c,want", CASES)
def test_rpn_op(spark, expr, a, b, c, want):
    got = ev(spark, expr, a, b, c)
    if want is None:
        assert got is None, f"{expr}: got {got}, want unknown"
    elif math.isinf(want):
        assert got == want, f"{expr}: got {got}"
    else:
        assert got is not None and close(got, want), f"{expr}: got {got}, want {want}"


def test_rpn_time_ops(spark):
    rows = [("s", 300.0 * i, float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    ctx = RpnContext(ts=F.col("ts"), step=300, keys=("k",))
    out = df.select(
        "ts",
        compile_rpn("TIME", {}, ctx).alias("t"),
        compile_rpn("COUNT", {}, ctx).alias("cnt"),
        compile_rpn("STEPWIDTH", {}, ctx).alias("sw"),
        compile_rpn("PREV(v)", {"v": F.col("v")}, ctx).alias("pv"),
    ).orderBy("ts").collect()
    assert [r["cnt"] for r in out] == [float(i) for i in range(1, 11)]
    assert out[0]["sw"] == 300.0
    assert out[0]["pv"] is None and out[1]["pv"] == 1.0


def test_rpn_trend(spark):
    # series 1..10; TRENDNAN over 900s (3 steps) = trailing mean of 3
    rows = [("s", 300.0 * i, float(i) if i != 4 else None) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    ctx = RpnContext(ts=F.col("ts"), step=300, keys=("k",))
    out = (
        df.select(
            "ts",
            compile_rpn("v,900,TREND", {"v": F.col("v")}, ctx).alias("t"),
            compile_rpn("v,900,TRENDNAN", {"v": F.col("v")}, ctx).alias("tn"),
        )
        .orderBy("ts")
        .collect()
    )
    # rows 1,2 incomplete → unknown
    assert out[0]["t"] is None and out[1]["t"] is None
    assert close(out[2]["t"], 2.0)  # (1+2+3)/3
    # windows containing the unknown row 4: TREND → unknown, TRENDNAN skips
    assert out[3]["t"] is None and out[4]["t"] is None and out[5]["t"] is None
    assert close(out[3]["tn"], (2 + 3) / 2)
    assert close(out[5]["tn"], (5 + 6) / 2)
    assert close(out[6]["t"], 6.0)  # (5+6+7)/3


def test_rpn_errors(spark):
    with pytest.raises(RpnError):
        ev(spark, "a,+", 1.0)
    with pytest.raises(RpnError):
        ev(spark, "bogus", 1.0)
    with pytest.raises(RpnError):
        ev(spark, "a,b", 1.0, 2.0)  # two values left
    with pytest.raises(RpnError):
        ev(spark, "PREV", 1.0)  # self-PREV unsupported in compiled path


def test_prev_self_sequential(spark):
    """Self-referential PREV via the sequential evaluator (rpn_seq):
    running max expressed as PREV,v,MAXNAN."""
    from rrdtool_1_x_spark.rpn_seq import eval_sequential

    rows = [("s", 300.0 * i, v) for i, v in enumerate([3.0, 1.0, None, 7.0, 5.0], start=1)]
    df = spark.createDataFrame(rows, "series_id string, ts double, v double")
    out = eval_sequential(df, "PREV,v,MAXNAN", {"v": "v"}, keys=("series_id",), step=300)
    got = [r["value"] for r in out.orderBy("ts").collect()]
    assert got == [3.0, 3.0, 3.0, 7.0, 7.0]


def test_prev_self_gap_fill(spark):
    """Classic gap-fill idiom: v,UN,PREV,v,IF carries the last known."""
    from rrdtool_1_x_spark.rpn_seq import eval_sequential

    rows = [("s", 300.0 * i, v) for i, v in enumerate([2.0, None, None, 9.0], start=1)]
    df = spark.createDataFrame(rows, "series_id string, ts double, v double")
    out = eval_sequential(df, "v,UN,PREV,v,IF", {"v": "v"}, keys=("series_id",), step=300)
    got = [r["value"] for r in out.orderBy("ts").collect()]
    assert got == [2.0, 2.0, 2.0, 9.0]


def test_rpn_ltime_newday_tz(spark):
    """LTIME/NEWDAY honor the query timezone (src/rrd_rpncalc.c:704-744):
    Europe/Zurich is UTC+1 in winter, and the local-midnight flag fires at
    23:00 UTC."""
    # steps around 2024-01-10 midnight Zurich (= 2024-01-09 23:00 UTC)
    base = 1704841200  # 2024-01-09 23:00:00 UTC
    rows = [("s", float(base + 3600 * i), 1.0) for i in range(-2, 3)]
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    ctx = RpnContext(ts=F.col("ts"), step=3600, keys=("k",), tz="Europe/Zurich")
    out = {
        int(r["ts"]): (r["lt"], r["nd"])
        for r in df.select(
            "ts",
            compile_rpn("LTIME", {}, ctx).alias("lt"),
            compile_rpn("NEWDAY", {}, ctx).alias("nd"),
        ).collect()
    }
    # winter: LTIME = TIME + 3600
    assert out[base][0] == base + 3600
    # the step at 23:00 UTC is the first of the new local day
    assert out[base][1] == 1.0
    assert out[base - 3600][1] == 0.0 and out[base + 3600][1] == 0.0


def test_newweek_locale_first_weekday(spark):
    """NEWWEEK fires at the locale's first weekday (find_first_weekday,
    src/rrd_rpncalc.c:548-596) — the C locale starts weeks on SUNDAY, so on
    an unconfigured host the boundary is Sunday midnight, not Monday."""
    from rrdtool_1_x_spark.rpn import RpnContext, compile_rpn, first_weekday

    fw = first_weekday()
    assert fw in range(7)
    # 2023-01-01 is a Sunday; hourly steps across the week boundary
    base = 1672444800  # 2022-12-31 00:00 UTC
    step = 3600.0
    rows = [(float(base + step * i),) for i in range(72)]
    df = spark.createDataFrame(rows, "ts double")
    ctx = RpnContext(ts=F.col("ts"), step=step, tz="UTC")
    out = df.select("ts", compile_rpn("NEWWEEK", {}, ctx).alias("nw")).collect()
    fired = [int(r["ts"]) for r in out if r["nw"] == 1.0]
    sunday = 1672531200  # 2023-01-01 00:00 UTC
    monday = sunday + 86400
    want = {0: sunday, 1: monday}.get(fw)
    if want is not None:
        assert fired == [want], (fw, fired)
    else:
        assert len(fired) == 1
