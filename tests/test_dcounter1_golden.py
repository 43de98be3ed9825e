"""Mirror of the reference's tests/dcounter1 golden: the same
DDERIVE+DCOUNTER series as xport1, but read back with ``fetch AVERAGE
-r 600`` — which must select the 10x60 consolidated RRA (CDP-time
averaging with xff, not an xport-time reduce) and match the committed
row values."""

from __future__ import annotations

import math
import re

import pytest

from rrdtool_1_x_spark.cli import main

REF = "/root/reference/tests"


def test_dcounter1_golden(spark, tmp_path, capsys):
    try:
        src = open(f"{REF}/dcounter1").read()
        golden = open(f"{REF}/dcounter1.output").read()
    except OSError:
        pytest.skip("reference tests not available")
    specs = re.findall(r"\b(\d{10}:[0-9.]+:[0-9.]+)\b", src)
    assert len(specs) >= 390

    p = str(tmp_path / "dcounter1")
    assert main([
        "create", p, "--start", "1300000000", "--step", "60s",
        "DS:dv:DDERIVE:300:U:U", "DS:wh:DCOUNTER:300:0:U",
        "RRA:AVERAGE:0.5:1:600", "RRA:AVERAGE:0.5:10:144",
    ]) == 0
    for lo in range(0, len(specs), 50):
        assert main(["update", p] + specs[lo : lo + 50]) == 0

    assert main([
        "fetch", p, "AVERAGE", "-r", "600",
        "-s", "1300000000", "-e", "1300015200",
    ]) == 0
    out = capsys.readouterr().out

    def rows(text):
        got = {}
        for line in text.splitlines():
            m = re.match(r"\s*(1300\d{6,7}):\s+(\S+)\s+(\S+)", line)
            if not m:
                continue
            a, b = float(m.group(2)), float(m.group(3))
            if math.isnan(a) or math.isnan(b):
                continue
            got[int(m.group(1))] = (a, b)
        return got

    got, want = rows(out), rows(golden)
    assert set(got) == set(want), (sorted(set(want) - set(got))[:3],
                                   sorted(set(got) - set(want))[:3])
    for ts, (wa, wb) in want.items():
        ga, gb = got[ts]
        assert abs(ga - wa) <= 5e-7 * max(abs(wa), 1e-12), (ts, ga, wa)
        assert abs(gb - wb) <= 5e-7 * max(abs(wb), 1e-12), (ts, gb, wb)
