"""AT-style time parser (src/rrd_parsetime.c grammar)."""

from __future__ import annotations

from datetime import datetime

import pytest

from rrdtool_1_x_spark.timeparse import TimeParseError, parse_at_time, proc_start_end

NOW = datetime(2024, 3, 15, 14, 30, 0).timestamp()  # Friday


def p(s, **kw):
    return parse_at_time(s, now=NOW, **kw)


def dt(*a):
    return int(datetime(*a).timestamp())


def test_now_and_offsets():
    assert p("now") == int(NOW)
    assert p("n") == int(NOW)
    assert p("now-1day") == int(NOW) - 86400
    assert p("-1d") == int(NOW) - 86400
    assert p("now+2hours") == int(NOW) + 7200
    assert p("now-1h30m") == int(NOW) - 5400  # m after hours = minutes
    assert p("now-1y") == dt(2023, 3, 15, 14, 30)
    assert p("now-1y6m") == dt(2022, 9, 15, 14, 30)  # m after years = months
    assert p("now-10m") == int(NOW) - 600  # |10| >= 6 → minutes
    assert p("now-5m") == dt(2023, 10, 15, 14, 30)  # |5| < 6 → months


def test_day_references():
    assert p("today") == dt(2024, 3, 15)
    assert p("midnight today") == dt(2024, 3, 15)
    assert p("yesterday") == dt(2024, 3, 14)
    assert p("noon tomorrow") == dt(2024, 3, 16, 12, 0)
    assert p("teatime") == dt(2024, 3, 15, 16, 0)
    assert p("12:30 today") == dt(2024, 3, 15, 12, 30)


def test_dates():
    assert p("jan 3 2024") == dt(2024, 1, 3)
    assert p("03/15/2024") == dt(2024, 3, 15)
    assert p("15.03.2024") == dt(2024, 3, 15)
    assert p("20240315") == dt(2024, 3, 15)
    assert p("@1704067200") == 1704067200
    assert p("1704067200") == 1704067200
    assert p("1704067200+1h") == 1704070800


def test_start_end_refs():
    assert p("end-1day", end=1704153600) == 1704153600 - 86400
    assert p("start+6hours", start=1704067200) == 1704067200 + 21600
    s, e = proc_start_end("end-1d", "1704153600", now=NOW)
    assert (s, e) == (1704153600 - 86400, 1704153600)
    with pytest.raises(TimeParseError):
        proc_start_end("end-1d", "start+1d", now=NOW)


def test_errors():
    with pytest.raises(TimeParseError):
        p("gibberish")
    with pytest.raises(TimeParseError):
        p("now-3fortnights")
