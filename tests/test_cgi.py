"""rrdcgi template-expansion tests (cgi.py) — mirrors the rrd_cgi tag
table: variable/env/CV expansion, TIME tags, and the GRAPH→IMG→PRINT
flow over a real rendered PNG."""

from __future__ import annotations

import re

import numpy as np
import pytest

from rrdtool_1_x_spark.cgi import CgiContext, expand_template, _scanargs


def _expand(text, environ=None):
    body, ctx = expand_template(text, CgiContext(environ or {}))
    return body, ctx


def test_scanargs_quoting():
    assert _scanargs('a "b c" d') == ["a", "b c", "d"]
    assert _scanargs("x 'y z'") == ["x", "y z"]
    assert _scanargs("") == []


def test_env_var_cv_tags():
    env = {"QUERY_STRING": "host=alpha&msg=a%20%3Cb%3E", "WHO": "ops"}
    body, _ = _expand(
        "h=<RRD::CV host> q=<RRD::CV::QUOTE msg> e=<RRD::GETENV WHO>"
        "<RRD::SETVAR x 42> x=<RRD::GETVAR x>"
        "<RRD::SETCONSTVAR c 1><RRD::SETVAR c 2> c=<RRD::GETVAR c>",
        env,
    )
    assert "h=alpha" in body
    assert "q=a &lt;b&gt;" in body
    assert "e=ops" in body
    assert "x=42" in body
    assert "c=1" in body  # const wins over the later SETVAR


def test_cv_path_sanitized():
    env = {"QUERY_STRING": "f=../../etc/passwd&g=ok-file_1.rrd"}
    body, _ = _expand("f=<RRD::CV::PATH f> g=<RRD::CV::PATH g>", env)
    assert "f=etcpasswd" in body
    assert "g=ok-file_1.rrd" in body


def test_time_tags():
    body, _ = _expand("<RRD::TIME::NOW %Y>")
    import time

    assert body == time.strftime("%Y")
    body, _ = _expand(
        "<RRD::TIME::STRFTIME START 20080101 20080102 %Y-%m-%d>"
    )
    assert body == "2008-01-01"


def test_goodfor_include_internal(tmp_path):
    inc = tmp_path / "frag.html"
    inc.write_text("FRAGMENT <RRD::GETVAR inner>")
    body, ctx = _expand(
        f"<RRD::SETVAR inner 9><RRD::GOODFOR 300><RRD::INCLUDE {inc}>"
        "v=<RRD::INTERNAL VERSION>"
    )
    assert ctx.goodfor == 300
    assert "FRAGMENT 9" in body  # directives inside includes expand too
    assert "v=rrdtool-1.x-spark" in body
    # self-including template terminates with an error marker
    loop = tmp_path / "loop.html"
    loop.write_text(f"x<RRD::INCLUDE {loop}>")
    body, _ = _expand(f"<RRD::INCLUDE {loop}>")
    assert "nesting too deep" in body


def test_nested_expansion_in_args():
    env = {"QUERY_STRING": "year=2008"}
    body, _ = _expand(
        "<RRD::TIME::STRFTIME START <RRD::CV year>0101 20090102 %Y>", env
    )
    assert body == "2008"


def test_unknown_and_error_tags():
    body, _ = _expand("<RRD::NOPE x> <RRD::PRINT 0>")
    assert "[ERROR: unknown directive RRD::NOPE]" in body
    assert "[ERROR: RRD::PRINT argument error]" in body


def test_graph_img_and_print(tmp_path, spark):
    from rrdtool_1_x_spark.cli import main
    from rrdtool_1_x_spark.datapipe.codecs import decode_png

    ds = str(tmp_path / "t.rrd")
    base = 999_999_900
    assert main(["create", ds, "--start", str(base - 10), "--step", "300",
                 "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"]) == 0
    ups = [f"{base + i * 300}:{i * 10}" for i in range(1, 60)]
    assert main(["update", ds] + ups) == 0
    out = str(tmp_path / "cgi.png")
    tpl = (
        f"<RRD::GRAPH {out} -s {base} -e {base + 59 * 300} -w 120 -h 60 "
        f"DEF:v={ds}:v:AVERAGE LINE1:v#ff0000:val "
        f"VDEF:m=v,MAXIMUM PRINT:m:\"max %.0lf\">"
        f"|<RRD::PRINT 0>|"
    )
    body, ctx = _expand(tpl)
    m = re.search(r'<img src="\./(\S+)" width="(\d+)" height="(\d+)" />', body)
    assert m, body
    assert m.group(1) == out
    img = decode_png(open(out, "rb").read())
    assert img.shape == (int(m.group(3)), int(m.group(2)), 3)
    assert "|max 590|" in body  # RRD::PRINT pulls the graph's PRINT line
