"""Mirror of the reference's tests/xport1 golden script: DDERIVE+DCOUNTER
dataset, 394 updates, xport --json (step-600 reduce) and --enumds -t XML,
value-compared against the committed xport1.json.output / xport1.xml.output
goldens (the reference's DIFF9 compares 9 significant digits; we parse and
compare numerically)."""

from __future__ import annotations

import json
import math
import re

import pytest

from rrdtool_1_x_spark.cli import main

REF = "/root/reference/tests"


def _ref_updates():
    try:
        src = open(f"{REF}/xport1").read()
    except OSError:
        pytest.skip("reference tests not available")
    specs = re.findall(r"\b(\d{10}:[0-9.]+:[0-9.]+)\b", src)
    assert len(specs) >= 390, "xport1 update parse failed"
    return specs


def _close(a, b, tol=5e-7):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if b == 0:
        return abs(a) < tol
    return abs(a - b) <= tol * max(abs(a), abs(b))


@pytest.fixture(scope="module")
def ds_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("xport1") / "xport1")
    assert main([
        "create", p, "--start", "1300000000", "--step", "60s",
        "DS:dv:DDERIVE:300:U:U", "DS:wh:DCOUNTER:300:0:U",
        "RRA:AVERAGE:0.5:1:600", "RRA:AVERAGE:0.5:10:144",
    ]) == 0
    specs = _ref_updates()
    for lo in range(0, len(specs), 50):
        assert main(["update", p] + specs[lo : lo + 50]) == 0
    return p


def test_xport1_json_golden(ds_path, capsys):
    golden = json.load(open(f"{REF}/xport1.json.output"))
    assert main([
        "xport", "--json", "-s", "1300000000", "-e", "1300015200",
        "--step", "600",
        f"DEF:dv={ds_path}:dv:AVERAGE", f"DEF:wh={ds_path}:wh:AVERAGE",
        "XPORT:dv:dv", "XPORT:wh:wh",
    ]) == 0
    got = json.loads(capsys.readouterr().out)
    for k in ("start", "end", "step"):
        assert got["meta"][k] == golden["meta"][k], k
    assert got["meta"]["legend"] == golden["meta"]["legend"]
    assert len(got["data"]) == len(golden["data"])
    for i, (g, w) in enumerate(zip(got["data"], golden["data"])):
        for col, (gv, wv) in enumerate(zip(g, w)):
            assert _close(gv, wv), (i, col, gv, wv)


def test_xport1_xml_golden(ds_path, capsys):
    want = open(f"{REF}/xport1.xml.output").read()
    assert main([
        "xport", "--enumds", "-t", "-s", "1300000000", "-e", "1300015200",
        "--step", "600",
        f"DEF:dv={ds_path}:dv:AVERAGE", f"DEF:wh={ds_path}:wh:AVERAGE",
        "XPORT:dv:dv", "XPORT:wh:wh",
    ]) == 0
    got = capsys.readouterr().out

    def rows(xml: str):
        out = []
        for t, body in re.findall(r"<row><t>(\d+)</t>(.*?)</row>", xml, re.S):
            vals = [
                None if v.strip() in ("NaN", "nan") else float(v)
                for v in re.findall(r"<v\d*>([^<]*)</v\d*>", body)
            ]
            out.append((int(t), vals))
        return out

    gw, ww = rows(got), rows(want)
    assert len(gw) == len(ww) and len(ww) > 0
    for (gt, gv), (wt, wv) in zip(gw, ww):
        assert gt == wt
        assert len(gv) == len(wv)
        for a, b in zip(gv, wv):
            assert _close(a, b), (gt, a, b)
    # --enumds numbers the value tags (v0/v1) and -t emits the epoch column
    assert "<v0>" in want and "<v0>" in got
