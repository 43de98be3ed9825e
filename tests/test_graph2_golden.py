"""Mirror of the reference's tests/graph2 golden (data outputs only — the
cairo-rendered image and pixel coordinates are out of scope): graphv over
the DCOUNTER wh series at step 600 must reproduce the autoscale bounds
(value_min/value_max), the legacy-CF GPRINT strings, and the
--add-jsontime data block, all value-compared against graph2.output."""

from __future__ import annotations

import json
import re

import pytest

from rrdtool_1_x_spark.cli import main

REF = "/root/reference/tests"


def _ref_updates():
    try:
        src = open(f"{REF}/graph2").read()
    except OSError:
        pytest.skip("reference tests not available")
    return re.findall(r"\b(\d{10}:[0-9.]+:[0-9.]+)\b", src)


def _golden_parts():
    raw = open(f"{REF}/graph2.output", "rb").read()
    text_head = raw.split(b"image = BLOB_SIZE:")[0].decode()
    legends = dict(re.findall(r'legend\[(\d+)\] = "([^"]*)"', text_head))
    vmin = re.search(r"value_min = (\S+)", text_head).group(1)
    vmax = re.search(r"value_max = (\S+)", text_head).group(1)
    tail = raw[raw.rfind(b'{ "about"') :].decode()
    return legends, vmin, vmax, json.loads(tail)


def test_graph2_golden(spark, tmp_path, capsys):
    specs = _ref_updates()
    assert len(specs) >= 390
    p = str(tmp_path / "graph2")
    assert main([
        "create", p, "--start", "1300000000", "--step", "60s",
        "DS:dv:DDERIVE:300:U:U", "DS:wh:DCOUNTER:300:0:U",
        "RRA:AVERAGE:0.5:1:600", "RRA:AVERAGE:0.5:10:144",
    ]) == 0
    for lo in range(0, len(specs), 50):
        assert main(["update", p] + specs[lo : lo + 50]) == 0

    legends, vmin, vmax, golden_js = _golden_parts()
    assert main([
        "graphv", "-", "-s", "1300000000", "-e", "1300015200",
        "--step", "600", "--imgformat=PNG", "--add-jsontime",
        f"DEF:wh={p}:wh:AVERAGE",
        "AREA:wh#EA8F007F:5 Minute Average :STACK",
        "GPRINT:wh:LAST:Current\\:%4.2lf",
        "GPRINT:wh:AVERAGE:Average\\:%4.2lf",
        "GPRINT:wh:MAX:Maximum\\:%4.2lf",
    ]) == 0
    out = capsys.readouterr().out
    got_min = re.search(r"value_min = (\S+)", out).group(1)
    got_max = re.search(r"value_max = (\S+)", out).group(1)
    assert float(got_min) == float(vmin) and got_min == vmin
    assert float(got_max) == float(vmax) and got_max == vmax

    prints = re.findall(r'print\[\d+\] = "([^"]*)"', out)
    # golden legend[1..3] are the GPRINT strings rendered into the legend
    assert prints == [legends["1"], legends["2"], legends["3"]], prints

    got_js = json.loads(out[out.index('{ "about"') :])
    for k in ("start", "end", "step"):
        assert got_js["meta"][k] == golden_js["meta"][k], k
    gd, wd = got_js["data"], golden_js["data"]
    assert len(gd) == len(wd)
    for (gt, gv), (wt, wv) in zip(gd, wd):
        assert gt == wt  # quoted epoch strings
        if gv is None or wv is None:
            assert gv is None and wv is None
        else:
            assert abs(gv - wv) <= 5e-9 * max(abs(gv), abs(wv), 1e-12)
