"""AT-style time specification parser.

Reference: src/rrd_parsetime.c (grammar in the BNF comment, lines 36-108).
Parses strings like ``now-1day``, ``end-24h``, ``noon yesterday``,
``-1y6m``, ``midnight tomorrow``, ``jan 3 2024``, ``12:30 03/15/2024``,
``@1704067200``/``1704067200`` into epoch seconds.

Pure driver-side Python (the reference interprets these once per CLI call;
they never touch the data plane). Month/year offsets use calendar
arithmetic via ``struct tm``-like normalization, matching mktime's behavior
in the reference (src/rrd_parsetime.c plus/minus handling).

The 'm' ambiguity heuristics are reproduced: after y/mon/w/d context 'm'
means months; after h/min/s it means minutes; right after the sign it means
months iff |number| < 6 (src/rrd_parsetime.c:95-107).
"""

from __future__ import annotations

import calendar
import re
import time as _time
from datetime import datetime, timedelta

_MONTHS = {
    "jan": 1, "january": 1, "feb": 2, "february": 2, "mar": 3, "march": 3,
    "apr": 4, "april": 4, "may": 5, "jun": 6, "june": 6, "jul": 7, "july": 7,
    "aug": 8, "august": 8, "sep": 9, "september": 9, "oct": 10, "october": 10,
    "nov": 11, "november": 11, "dec": 12, "december": 12,
}
_WDAYS = {
    "sunday": 6, "sun": 6, "monday": 0, "mon": 0, "tuesday": 1, "tue": 1,
    "wednesday": 2, "wed": 2, "thursday": 3, "thu": 3, "friday": 4, "fri": 4,
    "saturday": 5, "sat": 5,
}
_UNITS_LONG = {
    "seconds": "sec", "second": "sec", "sec": "sec",
    "minutes": "min", "minute": "min", "min": "min",
    "hours": "hour", "hour": "hour", "hr": "hour", "h": "hour",
    "days": "day", "day": "day", "d": "day",
    "weeks": "week", "week": "week", "wk": "week", "w": "week",
    "months": "mon", "month": "mon", "mon": "mon",
    "years": "year", "year": "year", "yr": "year", "y": "year",
    "s": "sec",
}


class TimeParseError(ValueError):
    pass


def _add_months(dt: datetime, n: int) -> datetime:
    mo = dt.month - 1 + n
    year = dt.year + mo // 12
    month = mo % 12 + 1
    day = min(dt.day, calendar.monthrange(year, month)[1])
    return dt.replace(year=year, month=month, day=day)


def _apply_offsets(dt: datetime, s: str) -> datetime:
    """OFFSET-SPEC ::= ('+'|'-') NUMBER UNIT { ... } with the 'm' heuristics."""
    i = 0
    last_unit: str | None = None
    sign = 1
    pat = re.compile(r"\s*([+-]?)\s*(\d+)\s*([a-z]+)?", re.I)
    while i < len(s):
        m = pat.match(s, i)
        if not m:
            raise TimeParseError(f"bad offset near {s[i:]!r}")
        sgn, num, unit = m.group(1), int(m.group(2)), (m.group(3) or "").lower()
        if sgn == "-":
            sign = -1
        elif sgn == "+":
            sign = 1
        n = sign * num
        if unit == "m":  # ambiguous: months vs minutes (reference heuristics)
            if last_unit in ("year", "mon", "week", "day"):
                unit = "mon"
            elif last_unit in ("hour", "min", "sec"):
                unit = "min"
            else:
                unit = "mon" if abs(n) < 6 else "min"
        else:
            unit = _UNITS_LONG.get(unit or "sec")
            if unit is None:
                raise TimeParseError(f"unknown time unit in {s!r}")
        if unit == "sec":
            dt += timedelta(seconds=n)
        elif unit == "min":
            dt += timedelta(minutes=n)
        elif unit == "hour":
            dt += timedelta(hours=n)
        elif unit == "day":
            dt += timedelta(days=n)
        elif unit == "week":
            dt += timedelta(weeks=n)
        elif unit == "mon":
            dt = _add_months(dt, n)
        elif unit == "year":
            dt = _add_months(dt, 12 * n)
        last_unit = unit
        i = m.end()
    return dt


def parse_at_time(
    spec: str,
    now: float | None = None,
    start: float | None = None,
    end: float | None = None,
) -> int:
    """Parse an AT-style TIME-SPECIFICATION into epoch seconds.

    ``start``/``end`` resolve the START/END references (used by ``-s end-1d``
    style pairs, src/rrd_parsetime.c grammar)."""
    s = spec.strip().lower()
    if now is None:
        now = _time.time()
    base = datetime.fromtimestamp(int(now))

    if s.startswith("@"):  # @ = seconds since epoch
        rest = s[1:]
        m = re.match(r"^(\d+)(.*)$", rest)
        if not m:
            raise TimeParseError(spec)
        dt = datetime.fromtimestamp(int(m.group(1)))
        return int(_apply_offsets(dt, m.group(2)).timestamp()) if m.group(2) else int(
            dt.timestamp()
        )

    # plain epoch seconds (>= 10 digits like the reference's heuristic for
    # "Seconds since 1970"; 8-digit pure numbers are YYYYMMDD)
    m = re.match(r"^(\d+)([+-].*)?$", s)
    if m:
        num = m.group(1)
        if len(num) == 8:  # YYYYMMDD
            dt = datetime(int(num[:4]), int(num[4:6]), int(num[6:8]))
        else:
            dt = datetime.fromtimestamp(int(num))
        return int(_apply_offsets(dt, m.group(2)).timestamp()) if m.group(2) else int(
            dt.timestamp()
        )

    # split TIME-REFERENCE from OFFSET-SPEC at the first +/- not inside a date
    m = re.match(r"^([a-z0-9:./ ]*?)\s*([+-].*)?$", s)
    ref, offs = (m.group(1) or "").strip(), m.group(2) or ""

    def finish(dt: datetime) -> int:
        return int((_apply_offsets(dt, offs) if offs else dt).timestamp())

    if ref in ("", "now", "n"):
        return finish(base)
    if ref in ("start", "s"):
        if start is None:
            raise TimeParseError("START reference without start value")
        return finish(datetime.fromtimestamp(int(start)))
    if ref in ("end", "e"):
        if end is None:
            raise TimeParseError("END reference without end value")
        return finish(datetime.fromtimestamp(int(end)))

    day0 = base.replace(hour=0, minute=0, second=0, microsecond=0)
    tod: tuple[int, int] | None = None  # (hour, minute)
    words = ref.split()
    rest: list[str] = []
    for w in words:
        mm = re.match(r"^(\d{1,2})[:.](\d{2})(am|pm)?$", w)
        if mm and tod is None:
            h, mi = int(mm.group(1)), int(mm.group(2))
            if mm.group(3) == "pm" and h < 12:
                h += 12
            if mm.group(3) == "am" and h == 12:
                h = 0
            tod = (h, mi)
        elif w == "noon":
            tod = (12, 0)
        elif w == "midnight":
            tod = (0, 0)
        elif w == "teatime":
            tod = (16, 0)
        else:
            rest.append(w)

    dt = day0
    if not rest:
        pass
    elif rest[0] in ("today",):
        pass
    elif rest[0] == "yesterday":
        dt = day0 - timedelta(days=1)
    elif rest[0] == "tomorrow":
        dt = day0 + timedelta(days=1)
    elif rest[0] in _WDAYS:
        # day-of-week: the nearest one not before today (reference scans fwd)
        delta = (_WDAYS[rest[0]] - day0.weekday()) % 7
        dt = day0 + timedelta(days=delta)
    elif rest[0] in _MONTHS and len(rest) >= 2:
        month = _MONTHS[rest[0]]
        day = int(rest[1])
        year = int(rest[2]) if len(rest) >= 3 else day0.year
        if year < 100:
            year += 2000 if year < 38 else 1900
        dt = datetime(year, month, day)
    elif re.match(r"^\d{1,2}/\d{1,2}/\d{2,4}$", rest[0]):  # MM/DD/[YY]YY
        mo, dd, yy = (int(x) for x in rest[0].split("/"))
        if yy < 100:
            yy += 2000 if yy < 38 else 1900
        dt = datetime(yy, mo, dd)
    elif re.match(r"^\d{1,2}\.\d{1,2}\.\d{2,4}$", rest[0]):  # DD.MM.[YY]YY
        dd, mo, yy = (int(x) for x in rest[0].split("."))
        if yy < 100:
            yy += 2000 if yy < 38 else 1900
        dt = datetime(yy, mo, dd)
    else:
        raise TimeParseError(f"cannot parse time reference {ref!r}")

    if tod is not None:
        dt = dt.replace(hour=tod[0], minute=tod[1])
    elif not rest:
        raise TimeParseError(f"cannot parse time reference {ref!r}")
    return finish(dt)


def proc_start_end(
    start_spec: str, end_spec: str, now: float | None = None
) -> tuple[int, int]:
    """Resolve a start/end pair where either side may reference the other
    (reference rrd_proc_start_end: start may use 'end-...', end may use
    'start+...', but not both)."""
    start_refs_end = re.match(r"^\s*(e|end)\b", start_spec.strip().lower())
    end_refs_start = re.match(r"^\s*(s|start)\b", end_spec.strip().lower())
    if start_refs_end and end_refs_start:
        raise TimeParseError("start and end cannot both be relative to each other")
    if start_refs_end:
        end = parse_at_time(end_spec, now=now)
        start = parse_at_time(start_spec, now=now, end=end)
    else:
        start = parse_at_time(start_spec, now=now)
        end = parse_at_time(end_spec, now=now, start=start)
    if start >= end:
        raise TimeParseError(f"start {start} must be before end {end}")
    return start, end
