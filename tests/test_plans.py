"""End-to-end query lifecycle: store → DEF/CDEF/VDEF → xport formats.

Uses the F1 fixture (tests/rpn1 counter series) whose engine outputs were
verified against a build of the reference.
"""

from __future__ import annotations

import json

import pytest

from rrdtool_1_x_spark.catalog import DSDef, RRADef, create
from rrdtool_1_x_spark.plans.graph import Query, _format_print
from rrdtool_1_x_spark.sources.store import DatasetStore, list_datasets
from rrdtool_1_x_spark.xport import to_csv, to_json, to_xml

from tests.goldens import close

UPDATES = [
    (920804700, 12345), (920805000, 12357), (920805300, 12363), (920805600, 12363),
    (920805900, 12363), (920806200, 12373), (920806500, 12383), (920806800, 12393),
    (920807100, 12399), (920807400, 12405), (920807700, 12411), (920808000, 12415),
    (920808300, 12420), (920808600, 12422), (920808900, 12423),
]
# reference-verified AVERAGE rates at step 300 (rrdtool tutorial values / 3600)
WANT_RATES = {
    920805000: 0.04, 920805300: 0.02, 920805600: 0.0, 920805900: 0.0,
    920806200: 1 / 30, 920806500: 1 / 30, 920806800: 1 / 30, 920807100: 0.02,
    920807400: 0.02, 920807700: 0.02, 920808000: 1 / 75, 920808300: 1 / 60,
    920808600: 1 / 150, 920808900: 1 / 300,
}


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dsroot")
    ds = create(
        "speed_ds",
        step=300,
        ds=[DSDef(name="speed", dst="COUNTER", heartbeat=600)],
        rra=[
            RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=24),
            RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=6, row_cnt=10),
        ],
        start=920804400,
    )
    st = DatasetStore.create(spark, str(root / "speed_ds"), ds)
    samples = spark.createDataFrame(
        [("speed_ds", "speed", float(t), float(v)) for t, v in UPDATES],
        "series_id string, ds_name string, ts double, value double",
    )
    st.update(samples)
    assert list_datasets(str(root)) == ["speed_ds"]
    return st


def test_store_fetch(store):
    df, plan = store.fetch("AVERAGE", 920804400, 920808900, 300)
    got = {int(r["ts"]): r["value"] for r in df.collect()}
    assert plan.step == 300
    for ts, want in WANT_RATES.items():
        assert close(got[ts], want), (ts, got[ts], want)
    assert got[920804700] is None  # first PDP unknown (counter needs a base)


def test_store_fetch_local_matches_spark(store):
    import math

    df, plan = store.fetch("AVERAGE", 920804400, 920808900, 300)
    pdf, lplan = store.fetch_local("AVERAGE", 920804400, 920808900, 300)
    assert (lplan.rra_index, lplan.step, lplan.start, lplan.end) == (
        plan.rra_index, plan.step, plan.start, plan.end,
    )
    want = {int(r["ts"]): r["value"] for r in df.collect()}
    got = {
        int(t): (None if isinstance(v, float) and math.isnan(v) else v)
        for t, v in zip(pdf["ts"], pdf["value"])
    }
    assert got == want
    # coarse-resolution request drives the same RRA selection too
    dfc, planc = store.fetch("AVERAGE", 920804400, 920808900, 1800)
    pdfc, lplanc = store.fetch_local("AVERAGE", 920804400, 920808900, 1800)
    assert lplanc.rra_index == planc.rra_index == 1
    assert len(pdfc) == dfc.count()


def test_store_meta(store):
    assert store.last() == 920808900
    info = store.info()
    assert info["ds[speed].type"] == "COUNTER"
    assert info["rra[1].pdp_per_row"] == 6
    lu = store.lastupdate().first()
    assert lu["value"] == 12423.0 and lu["ts"] == 920808900.0


def test_print_value_formatters(spark):
    """The PRINT value-formatter modes mirrored from the reference's
    tests/vformatter1 golden strings: :strftime formats the VDEF sampling
    time (never-found blanks the digits), :valstrftime the value as an
    epoch, :valstrfduration the value as a millisecond duration
    (src/rrd_graph.c:1684-2000)."""

    def prints(rows):
        q = Query(start=1420070400, end=1420071000, step=60)
        df = spark.createDataFrame(rows, "ts double, value double")
        q.def_frame("dv", df, 60)
        q.vdef("v", "dv,LAST")
        for fmt in ("%0.1lf", "%F %T:strftime", "%F %T:valstrftime",
                    "%H_%02m_%02s_%03f:valstrfduration"):
            q.print_("v", fmt)
        return q.execute(spark).prints

    # no data at all (vformatter1 "No data" block)
    assert prints([(1420070460.0, None)]) == [
        "nan", "---------- --:--:--", "nan", "nan",
    ]
    # a zero reading at 00:01:00
    assert prints([(1420070460.0, 0.0)]) == [
        "0.0", "2015-01-01 00:01:00", "1970-01-01 00:00:00", "0_00_00_000",
    ]
    # 3000 at 00:02:00: value-as-epoch 00:50:00, value-as-duration 3 s
    assert prints([(1420070460.0, 0.0), (1420070520.0, 3000.0)]) == [
        "3000.0", "2015-01-01 00:02:00", "1970-01-01 00:50:00", "0_00_03_000",
    ]
    # strfduration unit coverage: weeks/days remainder split + sign
    from rrdtool_1_x_spark.plans.graph import _strfduration

    ms = ((10 * 24 + 5) * 3600 + 42 * 60 + 7) * 1000.0 + 250
    assert _strfduration("%W w %d d %h h %m m %s s %f ms", ms) == \
        "1 w 3 d 5 h 42 m 7 s 250 ms"
    assert _strfduration("%2.1Dd", ms) == "10.2d"
    assert _strfduration("%S", -5000.0) == "-5"


def test_query_cdef_vdef_xport(spark, store):
    rollups = {i: store._read(f"rra_{i}") for i in range(2)}
    q = (
        Query(start=920804400, end=920808900, step=300)
        .def_("myspeed", rollups, store.dataset, "speed", "AVERAGE", last_up=store.last())
        .cdef("kmh", "myspeed,3600,*")
        .cdef("fast", "kmh,100,GT,kmh,0,IF")
        .vdef("vmax", "kmh,MAXIMUM")
        .xport("kmh", legend="km/h")
        .xport("fast", legend="fast only")
        .print_("vmax", "max %.2lf")
    )
    res = q.execute(spark)
    assert res.step == 300
    assert res.legends == ["km/h", "fast only"]
    assert close(res.scalars["vmax"]["value"], 144.0)
    assert res.scalars["vmax"]["when"] == 920805000.0
    assert res.prints == ["max 144.00"]
    rows = {int(r["ts"]): (r["kmh"], r["fast"]) for r in res.frame.collect()}
    assert close(rows[920805000][0], 144.0) and close(rows[920805000][1], 144.0)
    assert close(rows[920805300][0], 72.0) and rows[920805300][1] == 0.0

    js = json.loads(to_json(res))
    assert js["meta"]["legend"] == ["km/h", "fast only"]
    assert js["meta"]["step"] == 300
    assert len(js["data"]) == (res.end - res.start) // res.step + 1
    xml = to_xml(res, enumds=True)
    assert "<columns>2</columns>" in xml and "<v0>" in xml
    csv = to_csv(res)
    assert csv.splitlines()[0] == '"time","km/h","fast only"'
    assert csv.endswith("\r\n") and '"NaN"' in csv or '"' in csv


def test_write_csv_distributed(spark, store, tmp_path):
    """The executor-side CSV sink reproduces to_csv line-for-line."""
    import glob

    from rrdtool_1_x_spark.xport import write_csv

    rollups = {i: store._read(f"rra_{i}") for i in range(2)}
    q = (
        Query(start=920804400, end=920808900, step=300)
        .def_("myspeed", rollups, store.dataset, "speed", "AVERAGE", last_up=store.last())
        .cdef("kmh", "myspeed,3600,*")
        .xport("kmh", legend="km/h")
    )
    res = q.execute(spark)
    write_csv(res, str(tmp_path / "x"))
    lines = []
    for part in sorted(glob.glob(str(tmp_path / "x" / "rows" / "part-*"))):
        with open(part, newline="") as f:
            lines.extend(f.read().splitlines())
    header = open(glob.glob(str(tmp_path / "x" / "header" / "part-*"))[0], newline="").read().splitlines()
    assert [*header, *lines] == to_csv(res).splitlines()


def test_query_multi_resolution_alignment(spark, store):
    """A 300s DEF and an 1800s DEF align on the GCD grid with
    sample-and-hold upsampling of the coarse one."""
    rollups = {i: store._read(f"rra_{i}") for i in range(2)}
    q = (
        Query(start=920805000, end=920808900)
        .def_("fine", rollups, store.dataset, "speed", "AVERAGE", last_up=store.last())
        .def_("coarse", rollups, store.dataset, "speed", "AVERAGE", step=1800,
              last_up=store.last())
        .cdef("diff", "fine,coarse,-")
        .xport("fine")
        .xport("coarse")
        .xport("diff")
    )
    res = q.execute(spark)
    assert res.step == 300
    rows = {int(r["ts"]): r for r in res.frame.collect()}
    # the coarse value for the 1800s window ending 920808000 repeats at all
    # 6 fine steps inside it (sample-and-hold upsampling)
    coarse_vals = [rows[t]["coarse"] for t in range(920806500, 920808001, 300)]
    assert len(coarse_vals) == 6
    assert len({round(v, 12) for v in coarse_vals}) == 1
    # and diff = fine - coarse is defined wherever both are
    assert rows[920806500]["diff"] is not None


def test_format_print():
    assert _format_print("%.2lf", 3.14159, None) == "3.14"
    assert _format_print("%.1lf %sB", 1536.0, None) == "1.5 kB"
    assert _format_print("%.0lf %s", 2_000_000.0, None) == "2 M"


def test_maxrows_caps_output(spark, store):
    rollups = {i: store._read(f"rra_{i}") for i in range(2)}
    q = (
        Query(start=920804400, end=920808900, maxrows=5)
        .def_("v", rollups, store.dataset, "speed", "AVERAGE", last_up=store.last())
        .xport("v")
    )
    res = q.execute(spark)
    n_rows = (res.end - res.start) // res.step
    assert n_rows <= 5 + 1
    assert res.step >= (920808900 - 920804400) / 6  # coarsened


def test_xml_enumds_modes(spark, store):
    rollups = {i: store._read(f"rra_{i}") for i in range(2)}
    res = (
        Query(start=920804400, end=920808900)
        .def_("v", rollups, store.dataset, "speed", "AVERAGE", last_up=store.last())
        .xport("v")
    ).execute(spark)
    assert "<v>" in to_xml(res) and "<v0>" not in to_xml(res)
    assert "<v0>" in to_xml(res, enumds=True)


def test_data_proc_stack_semantics(spark):
    """src/rrd_graph.c:1365-1471: stacked elements ride the paint total, an
    unknown plots unknown but keeps the base for the next stacked element,
    non-stacked elements reset, TICK is excluded from the scale bounds."""
    from rrdtool_1_x_spark.plans.graph import GraphElement, data_proc

    rows = [
        (1.0, 10.0, 1.0, 100.0, 7.0),
        (2.0, 20.0, None, 200.0, 7.0),  # gap in the middle of the stack
        (3.0, None, 3.0, 300.0, 7.0),  # gap at the stack base
    ]
    df = spark.createDataFrame(rows, "ts double, a double, b double, c double, t double")
    plots, scale = data_proc(
        df,
        [
            GraphElement("AREA", "a"),
            GraphElement("STACK", "b"),
            GraphElement("STACK", "c"),
            GraphElement("LINE", 5.0),
            GraphElement("TICK", "t"),
        ],
    )
    got = {r["ts"]: r for r in plots.collect()}
    # ts=1: straightforward chain 10, 11, 111
    assert (got[1.0]["plot0"], got[1.0]["plot1"], got[1.0]["plot2"]) == (10, 11, 111)
    # ts=2: b unknown -> plot1 NULL, c stacks on a's base (20 + 200)
    assert got[2.0]["plot1"] is None and got[2.0]["plot2"] == 220.0
    # ts=3: base unknown -> plot0 NULL, b stacks on 0
    assert got[3.0]["plot0"] is None and got[3.0]["plot1"] == 3.0
    # constant LINE resets the chain; TICK column present
    assert got[1.0]["plot3"] == 5.0 and got[2.0]["plot4"] == 7.0
    s = scale.first()
    # min over plotted (3.0 from b@ts3), max 303 (c@ts3); TICK's 7 ignored
    assert (s["value_min"], s["value_max"]) == (3.0, 303.0)


def test_data_proc_empty_scale(spark):
    from rrdtool_1_x_spark.plans.graph import GraphElement, data_proc

    df = spark.createDataFrame([(1.0, None)], "ts double, a double")
    _, scale = data_proc(df, [GraphElement("LINE", "a")])
    s = scale.first()
    assert (s["value_min"], s["value_max"]) == (0.0, 1.0)


def test_showtime_and_timefmt_modes(spark, store):
    rollups = {i: store._read(f"rra_{i}") for i in range(2)}
    res = (
        Query(start=920804400, end=920808900)
        .def_("v", rollups, store.dataset, "speed", "AVERAGE", last_up=store.last())
        .xport("v")
    ).execute(spark)
    # xmljson semantics: <t> only under showtime (default True = golden shape)
    assert "<t>" in to_xml(res) and "<t>" not in to_xml(res, showtime=False)
    # JSON --showtime prepends the time as a QUOTED string
    js = to_json(res, showtime=True)
    first_row = next(l for l in js.splitlines() if l.strip().startswith("["))
    assert first_row.strip().startswith('[ "9')
    # --timefmt strftimes the time cell everywhere
    csv = to_csv(res, timefmt="%Y-%m-%d %H:%M")
    assert csv.splitlines()[1].startswith("1999-")


def test_data_proc_repeated_legend(spark):
    """The reference permits two elements sharing a legend (AREA + LINE
    outline with one label, rrd_graph.c keys by element index); the bounds
    must still resolve instead of crashing."""
    from rrdtool_1_x_spark.plans.graph import GraphElement, data_proc

    df = spark.createDataFrame([(0.0, 1.0), (300.0, 3.0)], "ts double, v double")
    plots, scale = data_proc(
        df,
        [GraphElement("AREA", "v", legend="traffic"),
         GraphElement("LINE", "v", legend="traffic")],
    )
    assert len(plots.columns) == 3  # ts + two uniquely-keyed plot columns
    row = scale.collect()[0]
    assert row["value_min"] == 1.0 and row["value_max"] == 3.0
