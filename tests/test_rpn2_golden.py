"""Mirror of the reference's tests/rpn2 golden: a DCOUNTER series through
17 XPORT columns covering NEWDAY/NEWWEEK/NEWMONTH/NEWYEAR boundaries under
TZ=Europe/Zurich, STEPWIDTH, PREV accumulators (ADDNAN rollover resets),
and the set aggregates AVG/SMIN/SMAX/MEDIAN/PERCENT/STDEV/POW — compared
value-for-value against the committed rpn2.output."""

from __future__ import annotations

import json
import re

import pytest

from rrdtool_1_x_spark.cli import main

REF = "/root/reference/tests"


def _close(a, b, tol=5e-7):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if b == 0:
        return abs(a) < tol
    return abs(a - b) <= tol * max(abs(a), abs(b))


def test_rpn2_golden(spark, tmp_path, capsys, monkeypatch):
    try:
        src = open(f"{REF}/rpn2").read()
        golden = json.load(open(f"{REF}/rpn2.output"))
    except OSError:
        pytest.skip("reference tests not available")
    specs = re.findall(r"\b(\d{10}:[0-9.]+)\b", src)
    assert len(specs) == 19

    p = str(tmp_path / "rpn2")
    assert main([
        "create", p, "--step", "7200", "--start", "1167487000",
        "DS:speed:DCOUNTER:14000:U:U", "RRA:AVERAGE:0.5:1:30",
    ]) == 0
    assert main(["update", p] + specs) == 0

    monkeypatch.setenv("TZ", "Europe/Zurich")
    cdefs = [
        "CDEF:rday=myspeed,POP,NEWDAY",
        "CDEF:rweek=myspeed,POP,NEWWEEK",
        "CDEF:rmonth=myspeed,POP,NEWMONTH",
        "CDEF:ryear=myspeed,POP,NEWYEAR",
        "CDEF:day=myspeed,STEPWIDTH,*,NEWDAY,0,PREV,IF,ADDNAN",
        "CDEF:week=myspeed,STEPWIDTH,*,NEWWEEK,0,PREV,IF,ADDNAN",
        "CDEF:month=myspeed,STEPWIDTH,*,NEWMONTH,0,PREV,IF,ADDNAN",
        "CDEF:year=myspeed,STEPWIDTH,*,NEWYEAR,0,PREV,IF,ADDNAN",
        "CDEF:avg=myspeed,POP,1,1,1,17,4,AVG",
        "CDEF:smin=myspeed,POP,3,4,5,2.2,4,SMIN",
        "CDEF:smax=myspeed,POP,3,4,5,2.2,4,SMAX",
        "CDEF:med1=myspeed,POP,3,4,5,2.2,4,MEDIAN",
        "CDEF:med2=myspeed,POP,3,4,5,2.2,11,5,MEDIAN",
        "CDEF:stdev=myspeed,POP,3,4,5,2.2,4,STDEV",
        "CDEF:p9=myspeed,POP,0.5,1,1,1,1,1,1,1,5,10,100,10,PERCENT",
        "CDEF:pow=myspeed,2,POW",
    ]
    xports = [
        "XPORT:myspeed:myspeed",
        "XPORT:day:day", "XPORT:rday:rday",
        "XPORT:week:week", "XPORT:rweek:rweek",
        "XPORT:month:month", "XPORT:rmonth:rmonth",
        "XPORT:year:year", "XPORT:ryear:ryear",
        "XPORT:avg:avg", "XPORT:smin:smin", "XPORT:smax:smax",
        "XPORT:med1:med1", "XPORT:med2:med2", "XPORT:p9:p9",
        "XPORT:pow:pow", "XPORT:stdev:stdev",
    ]
    assert main([
        "xport", "--json", "--start", "1167487200", "--end", "1167616800",
        f"DEF:myspeed={p}:speed:AVERAGE", *cdefs, *xports,
    ]) == 0
    got = json.loads(capsys.readouterr().out)
    for k in ("start", "end", "step"):
        assert got["meta"][k] == golden["meta"][k], k
    assert got["meta"]["legend"] == golden["meta"]["legend"]
    assert len(got["data"]) == len(golden["data"])
    for i, (g, w) in enumerate(zip(got["data"], golden["data"])):
        assert len(g) == len(w)
        for col, (gv, wv) in enumerate(zip(g, w)):
            assert _close(gv, wv), (i, golden["meta"]["legend"][col], gv, wv)
