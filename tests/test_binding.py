"""python-rrdtool binding parity (reference bindings/python/
rrdtoolmodule.c): same function surface, argument convention, return
shapes, and exception types as the CPython extension module."""

from __future__ import annotations

import datetime

import pytest

from rrdtool_1_x_spark import binding as rrdtool

START = 920804400
UPDATES = [
    (920804700, 12345), (920805000, 12357), (920805300, 12363),
    (920805600, 12363), (920805900, 12363), (920806200, 12373),
    (920806500, 12383), (920806800, 12393), (920807100, 12399),
]


@pytest.fixture(scope="module")
def ds_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("binding") / "speed")
    # list-of-strings argument convention (convert_args flattens)
    rrdtool.create(
        p, "--start", str(START), "--step", "300",
        ["DS:speed:COUNTER:600:U:U", "RRA:AVERAGE:0.5:1:600",
         "RRA:AVERAGE:0.5:6:100"],
    )
    rrdtool.update(p, [f"{t}:{v}" for t, v in UPDATES])
    return p


def test_fetch_shape(ds_path):
    (start, end, step), names, rows = rrdtool.fetch(
        ds_path, "AVERAGE", "-r", "300",
        "-s", str(START), "-e", str(UPDATES[-1][0]),
    )
    assert step == 300 and names == ("speed",)
    assert len(rows) == (end - start) // step
    byts = {start + (i + 1) * step: r[0] for i, r in enumerate(rows)}
    assert abs(byts[920805000] - 0.04) < 1e-12  # (12357-12345)/300
    assert byts[START + 300] is None  # before the first interval: unknown


def test_scalars_and_info(ds_path):
    assert rrdtool.last(ds_path) == UPDATES[-1][0]
    assert isinstance(rrdtool.first(ds_path), int)
    inf = rrdtool.info(ds_path)
    assert inf["step"] == 300
    assert inf["ds[speed].type"] == "COUNTER"
    assert inf["rra[0].cf"] == "AVERAGE"
    lu = rrdtool.lastupdate(ds_path)
    assert isinstance(lu["date"], datetime.datetime)
    assert lu["ds"] == {"speed": 12399.0}
    assert int(lu["date"].timestamp()) == UPDATES[-1][0]


def test_updatev_dict(ds_path, spark, tmp_path):
    p = str(tmp_path / "v")
    rrdtool.create(
        p, "--start", str(START), "--step", "300",
        "DS:g:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100",
    )
    d = rrdtool.updatev(p, f"{START + 300}:5", f"{START + 600}:7")
    assert d["return_value"] == 0
    cdp = {k: v for k, v in d.items() if k != "return_value"}
    assert cdp and all(isinstance(v, float) for v in cdp.values())


def test_xport_dict(ds_path, spark):
    out = rrdtool.xport(
        "-s", str(START), "-e", str(UPDATES[-1][0]), "--step", "300",
        f"DEF:v={ds_path}:speed:AVERAGE", "CDEF:kmh=v,3600,*",
        "XPORT:kmh:speed kmh",
    )
    meta, data = out["meta"], out["data"]
    assert meta["legend"] == ["speed kmh"]
    assert meta["columns"] == 1 and meta["step"] == 300
    assert meta["rows"] == len(data)
    vals = dict(zip(range(meta["start"], meta["end"] + 1, 300), data))
    assert abs(vals[920805000][0] - 0.04 * 3600) < 1e-9


def test_graph_and_graphv(ds_path, spark, tmp_path):
    png = str(tmp_path / "g.png")
    w, h, calcpr = rrdtool.graph(
        png, "-s", str(START), "-e", str(UPDATES[-1][0]),
        "--width", "200", "--height", "80",
        f"DEF:v={ds_path}:speed:AVERAGE", "LINE1:v#ff0000:speed",
        "VDEF:m=v,MAXIMUM", "PRINT:m:%6.2lf",
    )
    assert w > 200 and h > 80  # margins added around the plot area
    assert calcpr == ["  0.04"]
    with open(png, "rb") as fh:
        assert fh.read(8) == b"\x89PNG\r\n\x1a\n"
    gv = rrdtool.graphv(
        "-", "-s", str(START), "-e", str(UPDATES[-1][0]),
        f"DEF:v={ds_path}:speed:AVERAGE", "LINE1:v#ff0000",
        "VDEF:m=v,MAXIMUM", "PRINT:m:%6.2lf",
    )
    assert gv["graph_step"] == 300
    assert gv["print[0]"] == "  0.04"
    assert isinstance(gv["value_max"], float)


def test_errors(spark, tmp_path):
    with pytest.raises(rrdtool.ProgrammingError):
        rrdtool.create(str(tmp_path / "x"), 42)
    with pytest.raises(rrdtool.OperationalError):
        rrdtool.last(str(tmp_path / "nonexistent"))
    with pytest.raises(rrdtool.OperationalError):
        rrdtool.create(str(tmp_path / "y"))  # missing DS/RRA args


def test_list_and_dump(ds_path, spark, tmp_path, capsys):
    import os

    names = rrdtool.list(os.path.dirname(ds_path))
    assert os.path.basename(ds_path) in names
    out = str(tmp_path / "d.xml")
    rrdtool.dump(ds_path, out)
    with open(out) as fh:
        assert "<rrd>" in fh.read()


def test_fetch_cb(spark):
    """The python-rrdtool callback contract: kwargs in, dict out
    (rrdtoolmodule.c:1120-1320)."""
    seen = {}

    def cb(filename, cf, start, end, step):
        seen.update(filename=filename, cf=cf, step=step)
        n = (end - start) // step
        return {
            "start": start,
            "step": step,
            "data": {"a": [float(i) for i in range(n)], "b": [None] * n},
        }

    rrdtool.register_fetch_cb(cb)
    try:
        (start, end, step), names, rows = rrdtool.fetch(
            "cb//demo", "AVERAGE", "-r", "300",
            "-s", "1000000000", "-e", "1000003000",
        )
        assert seen["filename"] == "cb//demo" and seen["cf"] == "AVERAGE"
        assert names == ("a", "b") and step == 300
        assert rows[0] == (0.0, None) and rows[1][0] == 1.0
        assert len(rows) == (end - start) // step
        # the DEF layer serves cb// through the same registered callback
        out = rrdtool.xport(
            "-s", "1000000000", "-e", "1000003000", "--step", "300",
            "DEF:v=cb//demo:a:AVERAGE", "XPORT:v:a",
        )
        assert any(r[0] is not None for r in out["data"])
    finally:
        rrdtool.clear_fetch_cb()
    with pytest.raises(rrdtool.OperationalError):
        rrdtool.fetch("cb//demo", "AVERAGE", "-s", "1000000000",
                      "-e", "1000003000")
