"""Cross-engine differential for the AT-style time parser: every
expression is resolved by the REFERENCE build (rrd_parsetime.c via
rrd_fetch -s EXPR -e s+10, step-1 archive so alignment is exact) and by
rrdtool_1_x_spark.timeparse.parse_at_time, and must agree to the second.

now-relative expressions bracket the subprocess call between two clock
reads and accept any resolution within the bracket."""

from __future__ import annotations

import os
import subprocess
import time

import pytest

from rrdtool_1_x_spark.timeparse import parse_at_time

from tests.rrdmini import ensure_binary

EXPRS = [
    # epoch anchors + second/minute/hour/day/week offsets
    "1300000000",
    "1300000000+3600s",
    "1300000000-1day+2h",
    "1300000000+1week",
    "1300000000-2weeks+90min",
    "1300000000+300",
    # the m-ambiguity heuristics (rrd_parsetime.c:95-107)
    "1300000000-5m",
    "1300000000-10m",
    "1300000000-1h30m",
    "1300000000-1y6m",
    "1300000000+2y",
    "1300000000-13mon",
    # TIME DAY forms
    "12:00 20150320",
    "noon 20.03.2015",
    "midnight 03/20/2015",
    "23:59 20150320",
    "teatime 20150320",
    "12:45 19970703",
    "00:00 20150320+1mon",
    "9am 20150320",
    "4pm 20150320",
    # DAY-only forms (midnight of that day)
    "20150320",
    "Mar 20 2015",
    "jan 3 2024",
    "15.03.2024",
    "03/15/2024",
    # DST transition days in Europe/Zurich (2015-03-29, 2015-10-25)
    "02:00 29.03.2015",
    "12:00 29.03.2015-1day",
    "02:30 25.10.2015",
    "12:00 28.03.2015+1day",
    "12:00 31.10.2015+1mon",
    # DAY TIME order (second tod pass)
    "20150320 12:45",
    "19970703 07:30",
    # slash/dot dates without year
    "7/3/1997",
    "03/15",
    "15.03",
    # offset-loop consumption quirks (plus_minus + outer token())
    "1300000000+300-2h",
    "1300000000+300+2h",
    "1300000000+300karl",
    "1300000000+2h3",
    "20150320+",
    "1300000000-1y+7m",
    "jan 2024",
    "1300000000 !!",
    # bare small numbers are HH:00 today
    "14",
    "9",
    # now / day keywords (bracketed)
    "now",
    "now-1day",
    "now+2hours",
    "now-1h30m",
    "n+600s",
    "noon tomorrow",
    "teatime",
    "midnight today",
    "noon yesterday+3h",
    "noon fri",
    "12:00 sun",
    "Mar 20 2015 12:45",
]

# the reference REJECTS these; argv parity means we must too
ERR_EXPRS = [
    "1300000000+300 5m",
    "today",
    "yesterday",
    "tomorrow",
    "fri",
    "20150329+1day",
    "03/15/2024-2h",
    "24",
    "25",
    "123456",
    "12.30",
    "1300000000 fri",
    "now 12:00",
    "start",
    "end+1h x",
    "12:60 20150320",
    "totallyjunk",
]


@pytest.fixture(scope="module")
def env():
    binpath = ensure_binary()
    if binpath is None:
        pytest.skip("reference toolchain unavailable")
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "Europe/Zurich"
    time.tzset()
    rrd = "/tmp/tp_diff.rrd"
    if os.path.exists(rrd):
        os.unlink(rrd)
    subprocess.run(
        [binpath, "create", rrd, "--start", "1000000000", "--step", "1",
         "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:10"],
        check=True, capture_output=True, env=os.environ.copy(),
    )
    yield binpath, rrd
    if old_tz is None:
        del os.environ["TZ"]
    else:
        os.environ["TZ"] = old_tz
    time.tzset()


def _ref_resolve(binpath: str, rrd: str, expr: str) -> tuple[int, int, int]:
    """(resolved_start, clock_before, clock_after) via the reference
    fetch: first printed row ts == start + step (step=1)."""
    t0 = int(time.time())
    p = subprocess.run(
        [binpath, "fetch", rrd, "AVERAGE", "-s", expr, "-e", "s+10"],
        capture_output=True, text=True, env=os.environ.copy(),
    )
    t1 = int(time.time())
    assert p.returncode == 0, f"{expr!r}: {p.stderr.strip()}"
    rows = [l for l in p.stdout.splitlines()[1:] if ":" in l]
    assert rows, f"{expr!r}: no rows\n{p.stdout}"
    return int(rows[0].split(":")[0]) - 1, t0, t1


@pytest.mark.parametrize("expr", EXPRS)
def test_expr_matches_reference(env, expr):
    binpath, rrd = env
    ref, t0, t1 = _ref_resolve(binpath, rrd, expr)
    ours = {parse_at_time(expr, now=t) for t in range(t0, t1 + 1)}
    assert ref in ours, f"{expr!r}: reference {ref}, engine {sorted(ours)}"


@pytest.mark.parametrize("expr", ERR_EXPRS)
def test_error_parity(env, expr):
    binpath, rrd = env
    p = subprocess.run(
        [binpath, "fetch", rrd, "AVERAGE", "-s", expr, "-e", "s+10"],
        capture_output=True, text=True, env=os.environ.copy(),
    )
    assert p.returncode != 0, f"{expr!r}: reference accepted: {p.stdout[:100]}"
    with pytest.raises(Exception):
        parse_at_time(expr, now=int(time.time()))


def test_epoch_keyword_relative_base():
    """'epoch+Ns' resolves as mktime(zeroed tm) + offset — the reference's
    RELATIVE_TO_EPOCH finalization (parse-level check only: the window
    lands before 1980 so fetch refuses it on both engines)."""
    import time as t

    zero = int(t.mktime((1900, 1, 0, 0, 0, 0, 0, 0, -1)))
    assert parse_at_time("epoch+1300000000s") == zero + 1300000000
