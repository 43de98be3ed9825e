"""Callback + empty sources (§2.1); the JDBC wrapper is covered by query
assembly (no RDBMS in the test environment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.sources.external import CallbackRegistry, empty_source


def test_callback_source(spark):
    reg = CallbackRegistry()

    def cb(s, start, end, step):
        return s.range(3).select(
            F.lit("cb").alias("series_id"),
            F.lit("v").alias("ds_name"),
            (F.lit(float(start)) + (F.col("id") + 1) * step).cast("double").alias("ts"),
            (F.col("id") * 1.0).alias("value"),
        )

    reg.register("cb://demo", cb)
    df = reg.fetch(spark, "cb://demo", 0, 900, 300)
    assert [int(r["ts"]) for r in df.orderBy("ts").collect()] == [300, 600, 900]
    with pytest.raises(KeyError):
        reg.fetch(spark, "cb://missing", 0, 1, 1)

    def bad(s, start, end, step):
        return s.range(1).select(F.lit("x").alias("series_id"))

    reg.register("cb://bad", bad)
    with pytest.raises(ValueError, match="missing columns"):
        reg.fetch(spark, "cb://bad", 0, 1, 1)


def test_empty_source(spark):
    df = empty_source(spark, 100, 700, 300)
    rows = df.orderBy("ts").collect()
    assert [int(r["ts"]) for r in rows] == [300, 600, 900]
    assert all(r["value"] is None for r in rows)


def test_parse_sql_path():
    """The libdbi pseudo-path grammar (src/rrd_fetch_libdbi.c:486-660):
    driver, key=value libdbi args, double-separator, table(s), timestamp,
    value, then where-terms/flags — with %XX unescaping and the ``sql||``
    separator variant."""
    from rrdtool_1_x_spark.sources.external import parse_sql_path

    s = parse_sql_path(
        "sql//mydb/host=h1/rrdminstepsize=60/rrdfillmissing=120//tab1+tab2"
        "/*created/val/id=7/derive"
    )
    assert s.driver == "mydb" and s.params == {"host": "h1"}
    assert s.minstep == 60 and s.fillmissing == 120
    assert s.tables == ["tab1", "tab2"]
    assert s.ts_is_datetime and s.ts_col == "created" and s.value_col == "val"
    assert s.where_terms == ["id=7"] and s.derive == 600

    # rrdderivemaxstep overrides the derive window; %XX unescapes
    s2 = parse_sql_path("sql//d/rrdderivemaxstep=30//t/ts/v%2fx/derive")
    assert s2.derive == 30 and s2.value_col == "v/x"
    s3 = parse_sql_path("sql||d||t|ts|v")
    assert s3.tables == ["t"] and s3.derive == 0

    with pytest.raises(ValueError, match="no longer supported"):
        parse_sql_path("sql//d//t/ts/v/prediction")
    with pytest.raises(ValueError):
        parse_sql_path("sql/x/broken")
    with pytest.raises(ValueError):
        parse_sql_path("sql//driver-only-no-double-sep/t")


@pytest.fixture
def fake_sql_driver(spark):
    """A registered SQL driver backed by an in-memory frame — the test
    stand-in for a real RDBMS (none in this container)."""
    from rrdtool_1_x_spark.sources.external import SQL_DRIVERS

    ROWS = [  # (ts, value): two bins with data, one empty, one single-row
        (310.0, 4.0), (350.0, 6.0), (430.0, 2.0), (550.0, 8.0),
        (1150.0, 10.0),
    ]

    def provider(s, spec, start, end):
        df = s.createDataFrame(ROWS, "ts double, value double")
        return df.filter((F.col("ts") > start) & (F.col("ts") < end))

    SQL_DRIVERS["testdrv"] = provider
    yield ROWS
    del SQL_DRIVERS["testdrv"]


def test_sql_def_frame_buckets(spark, fake_sql_driver):
    """min/avg/max/count/sigma bucketing (src/rrd_fetch_libdbi.c:660-786):
    values land in floor((ts-start)/step) bins, avg=sum/count, sigma only
    for count>2, empty bins count 0."""
    from rrdtool_1_x_spark.sources.external import parse_sql_path, sql_def_frame

    spec = parse_sql_path("sql//testdrv/rrdminstepsize=300//t/ts/v")
    out, start, end, step = sql_def_frame(spark, spec, 10, 1250, 60)
    assert (start, end, step) == (0, 1200, 300)  # clamped + aligned
    rows = {int(r["ts"]): r for r in out.collect()}
    assert sorted(rows) == [300, 600, 900, 1200]
    # idx = floor((ts-start)/step), shown at interval END: 310,350,430,550
    # are all idx 1 -> the row labeled 600 (covering (300, 600])
    assert rows[300]["count"] == 0.0 and rows[300]["avg"] is None
    b1 = rows[600]
    assert (b1["min"], b1["max"], b1["count"]) == (2.0, 8.0, 4.0)
    assert b1["avg"] == 5.0
    import statistics

    assert abs(b1["sigma"] - statistics.stdev([4.0, 6.0, 2.0, 8.0])) < 1e-12
    empty = rows[900]
    assert empty["count"] == 0.0 and empty["avg"] is None and empty["min"] is None
    assert rows[1200]["count"] == 1.0 and rows[1200]["avg"] == 10.0
    assert rows[1200]["sigma"] is None  # count<=2 -> NULL


def test_sql_def_frame_sigma_derive_fill(spark, fake_sql_driver):
    from rrdtool_1_x_spark.sources.external import parse_sql_path, sql_def_frame

    # derive: positive per-second deltas only, within 2*maxstep
    spec_d = parse_sql_path(
        "sql//testdrv/rrdminstepsize=300/rrdderivemaxstep=100//t/ts/v/derive"
    )
    out_d, *_ = sql_def_frame(spark, spec_d, 0, 1200, 300)
    rd = {int(r["ts"]): r for r in out_d.collect()}
    # deltas land at the current row's ts: 350: dv=2 dt=40 -> .05 ;
    # 430: dv=-4 -> dropped ; 550: dv=6 dt=120 -> .05 ;
    # 1150: dt=600 >= 2*100 -> dropped
    assert rd[600]["count"] == 2.0 and abs(rd[600]["avg"] - 0.05) < 1e-12
    assert rd[300]["count"] == 0.0 and rd[1200]["count"] == 0.0

    # fillmissing: empty bins inherit the previous real bin up to N seconds
    spec_f = parse_sql_path(
        "sql//testdrv/rrdminstepsize=300/rrdfillmissing=300//t/ts/v"
    )
    out_f, *_ = sql_def_frame(spark, spec_f, 0, 1250, 300)
    rf = {int(r["ts"]): r for r in out_f.collect()}
    assert rf[900]["count"] == 4.0 and rf[900]["avg"] == 5.0  # copied from 600
    # leading empty bins with no prior data stay empty
    assert rf[300]["count"] == 0.0 and rf[300]["avg"] is None
    # a longer gap with a 1-step fill only covers the first empty bin
    spec_f2 = parse_sql_path(
        "sql//testdrv/rrdminstepsize=150/rrdfillmissing=150//t/ts/v"
    )
    out_f2, *_ = sql_def_frame(spark, spec_f2, 0, 1250, 150)
    rf2 = {int(r["ts"]): r for r in out_f2.collect()}
    assert rf2[600]["count"] == 1.0  # the 550 row
    assert rf2[750]["count"] == 1.0  # filled from the 600 bin
    assert rf2[900]["count"] == 0.0  # beyond the fill horizon


def test_cli_pseudo_path_defs(spark, fake_sql_driver, capsys):
    """End-to-end: xport over a cb// DEF and a sql// DEF through the CLI —
    the rrd_fetch_fn pseudo-path dispatch (src/rrd_fetch.c:310-318)."""
    import json

    from rrdtool_1_x_spark.cli import main
    from rrdtool_1_x_spark.sources.external import CALLBACKS

    def cb(s, start, end, step):
        return s.range((end - start) // step).select(
            F.lit("cb").alias("series_id"),
            F.lit("v").alias("ds_name"),
            (F.lit(float(start)) + (F.col("id") + 1) * step).cast("double").alias("ts"),
            (F.col("id") * 2.0).alias("value"),
        )

    CALLBACKS.register("cb//demo", cb)
    try:
        rc = main([
            "xport", "--json", "-s", "@0", "-e", "@1200", "--step", "300",
            "DEF:a=cb//demo:v:AVERAGE",
            "DEF:b=sql//testdrv/rrdminstepsize=300//t/ts/v:avg:AVERAGE",
            "CDEF:c=a,b,ADDNAN",
            "XPORT:c:combined",
        ])
    finally:
        CALLBACKS._cbs.pop("cb//demo")
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["meta"]["step"] == 300
    vals = [v[0] for v in doc["data"]]
    # cb gives 0,2,4,6 at 300..1200; sql avg gives U, 5.0@600, U, 10@1200;
    # ADDNAN treats one-sided unknowns as 0 (rows 0+U, 2+5, 4+U, 6+10)
    assert [v for v in vals if v is not None] == [0.0, 7.0, 4.0, 16.0]
