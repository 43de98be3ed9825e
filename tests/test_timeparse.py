"""AT-style time parser (src/rrd_parsetime.c grammar).

Expected values here follow the REFERENCE's verified behavior — see
tests/test_timeparse_differential.py, which checks every family below
against the actual reference build, including its quirks (bare day
keywords are invalid, month-name dates keep the current time-of-day,
numeric dates mean midnight, a trailing non-unit word after an offset
number is swallowed as seconds)."""

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
    # day keywords are only valid AFTER a time-of-day spec (the reference
    # rejects bare "today": the main switch has no case for day tokens)
    assert p("midnight today") == dt(2024, 3, 15)
    assert p("noon tomorrow") == dt(2024, 3, 16, 12, 0)
    assert p("midnight yesterday") == dt(2024, 3, 14)
    assert p("teatime") == dt(2024, 3, 15, 16, 0)
    assert p("12:30 today") == dt(2024, 3, 15, 12, 30)
    for bad in ("today", "yesterday", "tomorrow", "fri"):
        with pytest.raises(TimeParseError):
            p(bad)
    # weekday after a time: the same Sun-Sat week (can be in the past);
    # NOW is a Friday
    assert p("noon fri") == dt(2024, 3, 15, 12, 0)
    assert p("noon sun") == dt(2024, 3, 10, 12, 0)  # week starts Sunday
    assert p("noon sat") == dt(2024, 3, 16, 12, 0)


def test_dates():
    # month-name dates keep the CURRENT time-of-day (day() assigns the
    # date; tod() never re-runs for this branch)
    assert p("jan 3 2024") == dt(2024, 1, 3, 14, 30)
    assert p("jan 3 2024 9:15") == dt(2024, 1, 3, 9, 15)
    # numeric dates mean midnight (the second tod() at EOF zeroes hh:mm:ss)
    assert p("03/15/2024") == dt(2024, 3, 15)
    assert p("15.03.2024") == dt(2024, 3, 15)
    assert p("20240315") == dt(2024, 3, 15)
    assert p("20240315 9:15") == dt(2024, 3, 15, 9, 15)
    assert p("9:15 20240315") == dt(2024, 3, 15, 9, 15)
    assert p("@1704067200") == 1704067200  # engine extension
    assert p("1704067200") == 1704067200
    assert p("1704067200+1h") == 1704070800
    # bare 1-2 digit numbers are HH:00 today
    assert p("14") == dt(2024, 3, 15, 14, 0)
    # a numeric date followed by +/- eats the sign (trailing-text error)
    with pytest.raises(TimeParseError):
        p("20240315+1day")
    assert p("00:00 20240315+1day") == dt(2024, 3, 16)


def test_offset_loop_consumption():
    # the token after an offset number is consumed as the unit — a
    # non-multiplier falls to default-seconds and is swallowed, and the
    # op does NOT flip on a swallowed sign
    assert p("1704067200+300-2h") == 1704067200 + 300 + 7200
    assert p("1704067200+300karl") == 1704067200 + 300
    assert p("now-3fortnights") == int(NOW) - 3


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
        p("25")  # month 25
    with pytest.raises(TimeParseError):
        p("123456")  # not a date, not an epoch
    with pytest.raises(TimeParseError):
        p("12:60 20240315")  # MM > 59
