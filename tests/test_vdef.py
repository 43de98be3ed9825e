"""VDEF aggregation semantics (src/rrd_graph.c:5863-6119)."""

from __future__ import annotations

from rrdtool_1_x_spark.operators.vdef import vdef

from tests.goldens import close


def _df(spark, vals, step=300.0):
    rows = [("s", step * (i + 1), v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, ts double, value double")


def one(df, *args, **kw):
    r = vdef(df, *args, keys=("k",), **kw).first()
    return r["value"], r["when"]


def test_max_min_with_when(spark):
    df = _df(spark, [1.0, None, 5.0, 5.0, 2.0])
    v, w = one(df, "MAXIMUM")
    assert v == 5.0 and w == 900.0  # earliest max, ts = interval end
    v, w = one(df, "MINIMUM")
    assert v == 1.0 and w == 300.0


def test_first_last(spark):
    df = _df(spark, [None, 3.0, 4.0, None])
    v, w = one(df, "FIRST", step=300)
    assert v == 3.0 and w == 300.0  # interval START of first known
    v, w = one(df, "LAST")
    assert v == 4.0 and w == 900.0


def test_avg_stdev_total(spark):
    df = _df(spark, [1.0, 2.0, None, 3.0])
    v, _ = one(df, "AVERAGE")
    assert close(v, 2.0)
    v, _ = one(df, "STDEV")  # population: sqrt(2/3)
    assert close(v, (2.0 / 3.0) ** 0.5)
    v, _ = one(df, "TOTAL", step=300)
    assert close(v, 6.0 * 300)


def test_percent(spark):
    # PERCENT: NaN sorts lowest and occupies ranks
    df = _df(spark, [None, 10.0, 20.0, 30.0, 40.0])
    v, _ = one(df, "PERCENT", param=50.0)
    # sorted: [unknown,10,20,30,40]; idx = round(50*4/100)=2 → 20
    assert v == 20.0
    v, _ = one(df, "PERCENT", param=0.0)
    assert v is None  # lands on the unknown
    v, _ = one(df, "PERCENTNAN", param=50.0)
    # known only: [10,20,30,40]; idx = round(50*3/100)=2 → 30
    assert v == 30.0


def test_lsl(spark):
    # y = 2x + 1 exactly (x = 0-based index)
    df = _df(spark, [1.0, 3.0, 5.0, 7.0])
    v, _ = one(df, "LSLSLOPE")
    assert close(v, 2.0)
    v, _ = one(df, "LSLINT")
    assert close(v, 1.0)
    v, _ = one(df, "LSLCORREL")
    assert close(v, 1.0)


def test_all_unknown(spark):
    df = _df(spark, [None, None])
    for op in ("MAXIMUM", "MINIMUM", "AVERAGE", "FIRST", "LAST"):
        v, _ = one(df, op, step=300)
        assert v is None, op
