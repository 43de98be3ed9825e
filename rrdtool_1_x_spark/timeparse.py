"""AT-style time specification parser.

Reference: src/rrd_parsetime.c (grammar in the BNF comment, lines 36-108;
scanner :380-460, tod :575-645, day :685-820, plus_minus :489-570, main
switch :860-985, rrd_proc_start_end :1020-1071). This is a faithful
re-expression of that parser's token flow — including its accidental but
user-visible behaviors, verified token-for-token by
tests/test_timeparse_differential.py against the reference build:

* a DAY spec with no TIME resolves to midnight via the second tod() call
  hitting EOF (which zeroes hh:mm:ss) — EXCEPT month-name dates
  ("Mar 20 2015"), whose branch never re-runs tod() and therefore keeps
  the CURRENT time-of-day;
* a bare numeric date followed by +/- offsets ("20150320+1day") errors
  ("unparsable trailing text"): the second tod() eats the sign token;
  with an explicit time ("00:00 20150320+1mon") offsets work;
* bare "today"/"yesterday"/weekday names are NOT valid specs (day
  keywords only follow a time-of-day);
* bare 1-2 digit numbers are HH:00 today (0-23; 24 = midnight tomorrow;
  25-31 error as month numbers, 32..19700100 error outright);
* month/year/day/week offsets mutate the broken-down time and are
  re-resolved by mktime — with tm_isdst = -1 for 'now'-anchored specs
  but the BASE time's isdst for epoch-number anchors (day() overwrites
  the struct via localtime_r), so month offsets across a DST boundary
  shift by an hour exactly like the reference;
* hour/min/sec offsets accumulate in a separate seconds counter applied
  AFTER mktime;
* the months-vs-minutes 'm' heuristics, with the guess context RESET on
  every explicit +/- sign (src/rrd_parsetime.c:495-533).

Extension kept from earlier rounds: a leading ``@`` epoch form
(``@1704067200``); the reference rejects '@', so no valid reference
spec changes meaning.

Pure driver-side Python (the reference interprets these once per CLI
call; they never touch the data plane).
"""

from __future__ import annotations

import re
import time as _time

_MONTH_WORDS = {
    "jan": 1, "january": 1, "feb": 2, "february": 2, "mar": 3, "march": 3,
    "apr": 4, "april": 4, "may": 5, "jun": 6, "june": 6, "jul": 7, "july": 7,
    "aug": 8, "august": 8, "sep": 9, "september": 9, "oct": 10, "october": 10,
    "nov": 11, "november": 11, "dec": 12, "december": 12,
}
# C tm_wday indexing: Sun=0
_WDAY_WORDS = {
    "sunday": 0, "sun": 0, "monday": 1, "mon": 1, "tuesday": 2, "tue": 2,
    "wednesday": 3, "wed": 3, "thursday": 4, "thu": 4, "friday": 5, "fri": 5,
    "saturday": 6, "sat": 6,
}
_MULTIPLIERS = {
    "second": "sec", "seconds": "sec", "sec": "sec", "s": "sec",
    "minute": "min", "minutes": "min", "min": "min", "m": "m",  # ambiguous
    "hour": "hour", "hours": "hour", "hr": "hour", "h": "hour",
    "day": "day", "days": "day", "d": "day",
    "week": "week", "weeks": "week", "wk": "week", "w": "week",
    "month": "mon", "months": "mon", "mon": "mon",
    "year": "year", "years": "year", "yr": "year", "y": "year",
}

ABSOLUTE, REL_START, REL_END, REL_EPOCH = range(4)


class TimeParseError(ValueError):
    pass


_ASCII_DIGITS = frozenset("0123456789")
_ASCII_ALPHA = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)


def _atoi(s: str) -> int:
    m = re.match(r"[0-9]+", s)
    return int(m.group(0)) if m else 0


class _Scanner:
    """The reference tokenizer: whitespace/'_'/',' skipped; digit runs →
    NUM; alpha runs → WORD; one of ':./+-' → itself; any other character
    terminates the stream (EOF with residual text → trailing error)."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.kind = "BOF"
        self.text = ""
        self.next()

    def snapshot(self):
        return (self.i, self.kind, self.text)

    def restore(self, snap):
        self.i, self.kind, self.text = snap

    def residual(self) -> str:
        return self.text + self.s[self.i:]

    def next(self):
        s, n = self.s, len(self.s)
        i = self.i
        while i < n and (s[i].isspace() or s[i] in "_,"):
            i += 1
        if i >= n:
            self.i, self.kind, self.text = i, "EOF", ""
            return self.kind
        c = s[i]
        # ASCII-only classes: C's isdigit/isalpha in the C locale. Python's
        # str.isdigit also accepts characters int() rejects (e.g. '²'),
        # which must fall through to the junk branch instead.
        if c in _ASCII_DIGITS:
            j = i
            while j < n and s[j] in _ASCII_DIGITS:
                j += 1
            self.i, self.kind, self.text = j, "NUM", s[i:j]
        elif c in _ASCII_ALPHA:
            j = i
            while j < n and s[j] in _ASCII_ALPHA:
                j += 1
            self.i, self.kind, self.text = j, "WORD", s[i:j].lower()
        elif c in ":./+-":
            self.i, self.kind, self.text = i + 1, c, c
        else:
            # junk terminates the token stream (C: sct--; return EOF)
            self.i, self.kind, self.text = i, "EOF", ""
        return self.kind


class _TimeVal:
    """rrd_time_value_t: a broken-down local time (possibly with
    out-of-range members — mktime normalizes), an isdst hint, a separate
    post-mktime seconds offset, and the reference type."""

    __slots__ = ("type", "year", "mon", "mday", "hour", "min", "sec",
                 "isdst", "offset", "now")

    def __init__(self, now: int):
        lt = _time.localtime(now)
        self.type = ABSOLUTE
        self.now = now
        self.year, self.mon, self.mday = lt.tm_year, lt.tm_mon, lt.tm_mday
        self.hour, self.min, self.sec = lt.tm_hour, lt.tm_min, lt.tm_sec
        self.isdst = -1  # mktime can figure dst by default
        self.offset = 0

    def mktime(self) -> int:
        try:
            # seed glibc mktime's internal DST-phase cache with 'now',
            # exactly like the reference CLIs do by parsing their default
            # window ("now") before -s/-e: an AMBIGUOUS wall time (the
            # repeated hour at DST end) then resolves to now's phase
            _time.mktime(_time.localtime(self.now))
            return int(_time.mktime((
                self.year, self.mon, self.mday, self.hour, self.min,
                self.sec, 0, 0, self.isdst,
            )))
        except (OverflowError, ValueError) as e:
            raise TimeParseError(
                "the specified time is incorrect (out of range?)"
            ) from e


_HOUR_SENTINEL = 30
_YEAR_SENTINEL = 30000 + 1900  # tm_year sentinel as a full year


class _Parser:
    def __init__(self, spec: str, now: int):
        self.sc = _Scanner(spec)
        self.tv = _TimeVal(now)
        self.base_wday = _time.localtime(now).tm_wday  # Python: Mon=0
        self.spec = spec

    # -- helpers -----------------------------------------------------
    def _wday_sun0(self) -> int:
        return (self.base_wday + 1) % 7

    def panic(self, msg: str):
        raise TimeParseError(msg)

    # -- tod(): TIME-OF-DAY-SPEC ------------------------------------
    def tod(self):
        sc, tv = self.sc, self.tv
        snap = sc.snapshot()
        if len(sc.text) > 2:
            return
        hour = _atoi(sc.text)
        minute = 0
        sc.next()
        if sc.kind in ("/", "."):
            # guess we are looking at a date
            sc.restore(snap)
            return
        if sc.kind == ":":
            if sc.next() != "NUM":
                self.panic("Parsing HH:MM syntax, expecting MM as number")
            minute = _atoi(sc.text)
            if minute > 59:
                self.panic(f"parsing HH:MM syntax, got MM = {minute} (>59!)")
            sc.next()
        if sc.kind == "WORD" and sc.text in ("am", "pm"):
            if hour > 12:
                self.panic("there cannot be more than 12 AM or PM hours")
            if sc.text == "pm":
                if hour != 12:
                    hour += 12
            else:
                if hour == 12:
                    hour = 0
            sc.next()
        elif hour > 23:
            # guess it was not a time then
            sc.restore(snap)
            return
        tv.hour, tv.min, tv.sec = hour, minute, 0
        if tv.hour == 24:
            tv.hour = 0
            tv.mday += 1

    # -- assign_date() ----------------------------------------------
    def assign_date(self, mday: int, mon: int, year: int):
        """``year`` in tm_year units (yyyy-1900) OR a raw user year —
        exactly the C's double interpretation, which is what makes
        "03/15" (year defaulted from the 30000 sentinel) resolve to the
        year 30000: the sentinel passes the >1970 branch and survives
        the -1900 adjustment instead of being restored."""
        if year > 138:
            if year > 1970:
                year -= 1900
            else:
                self.panic(
                    f"invalid year {year} (should be either 00-99 or >1900)"
                )
        elif 0 <= year < 38:
            year += 100
        if year < 70:
            self.panic("won't handle dates before epoch (01/01/1970), sorry")
        tv = self.tv
        tv.mday, tv.mon, tv.year = mday, mon, year + 1900

    # -- day(): DAY-SPEC --------------------------------------------
    def day(self):
        sc, tv = self.sc, self.tv
        if sc.kind == "WORD" and sc.text in ("yesterday", "today", "tomorrow"):
            if sc.text == "yesterday":
                tv.mday -= 1
            elif sc.text == "tomorrow":
                tv.mday += 1
            sc.next()
        elif sc.kind == "WORD" and sc.text in _MONTH_WORDS:
            mon = _MONTH_WORDS[sc.text]
            if sc.next() != "NUM":
                self.panic("the day of the month should follow month name")
            mday = _atoi(sc.text)
            if sc.next() == "NUM":
                year = _atoi(sc.text)
                sc.next()
            else:
                year = tv.year - 1900  # tm_year units, like the C
            self.assign_date(mday, mon, year)
        elif sc.kind == "WORD" and sc.text in _WDAY_WORDS:
            # particular day of this Sun-Sat week (may be in the past)
            tv.mday += _WDAY_WORDS[sc.text] - self._wday_sun0()
            sc.next()
        elif sc.kind == "NUM":
            # <sec since 1970>, YYYYMMDD, MM/DD/[YY]YY, or DD.MM.[YY]YY
            mon = int(sc.text)
            if mon > 10 * 365 * 24 * 60 * 60:
                lt = _time.localtime(mon)
                tv.year, tv.mon, tv.mday = lt.tm_year, lt.tm_mon, lt.tm_mday
                tv.hour, tv.min, tv.sec = lt.tm_hour, lt.tm_min, lt.tm_sec
                tv.isdst = lt.tm_isdst  # mktime keeps the BASE's dst phase
                self.base_wday = lt.tm_wday
                sc.next()
                return
            if 19700101 < mon < 24000101:  # works between 1900 and 2400
                txt = sc.text
                year, mon, mday = int(txt[:4]), int(txt[4:6]), int(txt[6:8])
                sc.next()
            else:
                year, mday = tv.year - 1900, 0  # tm_year units
                sc.next()
                if mon <= 31 and sc.kind in ("/", "."):
                    sep = sc.kind
                    if sc.next() != "NUM":
                        self.panic(
                            f"there should be {'month' if sep == '.' else 'day'}"
                            f" number after '{sep}'"
                        )
                    mday = _atoi(sc.text)
                    if sc.next() == sep:
                        if sc.next() != "NUM":
                            self.panic(
                                f"there should be year number after '{sep}'"
                            )
                        year = _atoi(sc.text)
                        sc.next()
                    # flip months and days for European timing
                    if sep == ".":
                        mon, mday = mday, mon
            if not 1 <= mon <= 12:
                self.panic(f"did you really mean month {mon}?")
            if not 1 <= mday <= 31:
                self.panic(
                    f"I'm afraid that {mday} is not a valid day of the month"
                )
            self.assign_date(mday, mon, year)

    # -- plus_minus() / OFFSET-SPEC ---------------------------------
    def offsets(self):
        """The C loop's exact token consumption (plus_minus + the outer
        token() at src/rrd_parsetime.c:986-996): whatever token follows
        the number is treated as the unit — a non-multiplier (even a
        second sign: "+300-2h" ≡ "+300+2h") falls to the default-seconds
        case and is SWALLOWED by the loop's own token(); the sign only
        changes when it starts a NUMBER-less-prefetched round, and a
        bare number repeats the previous op."""
        sc, tv = self.sc, self.tv
        op = 1
        prev: str | None = None
        while sc.kind in ("+", "-", "NUM"):
            if sc.kind in ("+", "-"):
                op = 1 if sc.kind == "+" else -1
                if sc.next() != "NUM":
                    self.panic(
                        f"There should be number after '{'+' if op > 0 else '-'}'"
                    )
                prev = None  # reset months-minutes guessing mechanics
            delta = _atoi(sc.text)
            sc.next()  # the "unit" token (any token at all)
            is_word_unit = sc.kind == "WORD" and sc.text in _MULTIPLIERS
            unit = (
                _MULTIPLIERS[sc.text] if is_word_unit
                else "sec"  # C switch default: ANY other token = seconds
            )
            if unit == "m":
                if prev in ("day", "week", "mon", "year"):
                    unit = "mon"
                elif prev in ("sec", "min", "hour"):
                    unit = "min"
                else:
                    unit = "mon" if delta < 6 else "min"
            # C: prev_multiplier = sc_tokid — a non-unit token leaves the
            # 'm' guess in its default-context state
            prev = unit if is_word_unit else "other"
            n = op * delta
            if unit == "year":
                tv.year += n
            elif unit == "mon":
                tv.mon += n
            elif unit == "week":
                tv.mday += 7 * n
            elif unit == "day":
                tv.mday += n
            elif unit == "hour":
                tv.offset += 3600 * n
            elif unit == "min":
                tv.offset += 60 * n
            else:
                tv.offset += n
            # the outer loop's token(): consume the unit-or-other token
            if sc.kind != "EOF":
                sc.next()

    # -- main switch -------------------------------------------------
    def parse(self) -> _TimeVal:
        sc, tv = self.sc, self.tv
        k, w = sc.kind, sc.text
        if k in ("+", "-"):
            pass  # jump straight to OFFSET-SPEC
        elif k == "WORD" and w in ("epoch", "start", "s", "end", "e", "now", "n"):
            if w == "epoch":
                tv.type = REL_EPOCH
            elif w in ("start", "s"):
                tv.type = REL_START
            elif w in ("end", "e"):
                tv.type = REL_END
            if tv.type != ABSOLUTE:
                tv.sec = tv.min = tv.hour = 0
                tv.mday = 0
                tv.mon = 1   # tm_mon = 0
                tv.year = 1900  # tm_year = 0
            sc.next()
            if sc.kind not in ("+", "-"):
                if tv.type != ABSOLUTE:
                    self.panic("'start' or 'end' MUST be followed by +|- offset")
                elif sc.kind != "EOF":
                    self.panic(
                        "if 'now' is followed by a token it must be +|- offset"
                    )
        elif k == "NUM":
            hour_sv, year_sv = tv.hour, tv.year
            tv.hour, tv.year = _HOUR_SENTINEL, _YEAR_SENTINEL
            self.tod()
            self.day()
            if tv.hour == _HOUR_SENTINEL and tv.year != _YEAR_SENTINEL:
                # DAY TIME order — or, at EOF, the zeroing that makes a
                # bare numeric date mean midnight (and eats a +/- sign:
                # "20150320+1day" is a trailing-text error, like it or not)
                self.tod()
            if tv.hour == _HOUR_SENTINEL:
                tv.hour = hour_sv
            if tv.year == _YEAR_SENTINEL:
                tv.year = year_sv
        elif k == "WORD" and w in _MONTH_WORDS:
            # month-name date: day() only — NO tod() re-run, so the
            # current time-of-day is kept unless a time number follows
            self.day()
            if sc.kind == "NUM":
                self.tod()
        elif k == "WORD" and w in ("midnight", "noon", "teatime"):
            tv.hour = {"midnight": 0, "noon": 12, "teatime": 16}[w]
            tv.min = tv.sec = 0
            sc.next()
            self.day()
        else:
            self.panic(f"unparsable time: {self.spec}")

        if sc.kind in ("+", "-"):
            self.offsets()

        # the C checks only the TOKEN kind: junk characters terminate the
        # scanner silently ("1300000000 !!" parses clean), while leftover
        # WORD/NUMBER/sign tokens are trailing-text errors
        if sc.kind != "EOF":
            self.panic(f"unparsable trailing text: '...{sc.residual()}'")
        return tv


def _parse_tv(spec: str, now: int) -> _TimeVal:
    # make the TZ env var authoritative, like a fresh reference CLI
    # process: Python's time.localtime goes through localtime_r, which
    # (unlike localtime/mktime) does NOT re-read TZ by itself — a caller
    # that changed os.environ["TZ"] without tzset would otherwise parse
    # in whatever zone happened to be cached
    if hasattr(_time, "tzset"):
        _time.tzset()
    spec = spec.strip()
    m = re.match(r"^@(\d+)\s*(.*)$", spec)
    if m:
        # extension: @N = epoch N regardless of magnitude (the grammar's
        # own epoch form only recognizes numbers > 10 years); optional
        # trailing OFFSET-SPEC
        p = _Parser(m.group(2), now)
        lt = _time.localtime(int(m.group(1)))
        tv = p.tv
        tv.year, tv.mon, tv.mday = lt.tm_year, lt.tm_mon, lt.tm_mday
        tv.hour, tv.min, tv.sec = lt.tm_hour, lt.tm_min, lt.tm_sec
        tv.isdst = lt.tm_isdst
        if p.sc.kind in ("+", "-"):
            p.offsets()
        if p.sc.kind != "EOF":
            p.panic(f"unparsable trailing text: '...{p.sc.residual()}'")
        return tv
    return _Parser(spec, now).parse()


def _resolve_relative(tv: _TimeVal, base_epoch: int) -> int:
    """rrd_proc_start_end's relative combination: re-init from the base
    epoch via localtime (concrete isdst), add the day/mon/year deltas,
    mktime, then the seconds offset."""
    lt = _time.localtime(int(base_epoch))
    t = _time.mktime((
        lt.tm_year + (tv.year - 1900), lt.tm_mon + (tv.mon - 1),
        lt.tm_mday + tv.mday, lt.tm_hour, lt.tm_min, lt.tm_sec,
        0, 0, lt.tm_isdst,
    ))
    return int(t) + tv.offset


def parse_at_time(
    spec: str,
    now: float | None = None,
    start: float | None = None,
    end: float | None = None,
) -> int:
    """Parse an AT-style TIME-SPECIFICATION into epoch seconds.

    ``start``/``end`` resolve the START/END references (used by
    ``-s end-1d`` style pairs)."""
    s = spec.strip()
    if now is None:
        now = _time.time()

    tv = _parse_tv(s, int(now))
    if tv.type == ABSOLUTE:
        return tv.mktime() + tv.offset
    if tv.type == REL_START:
        if start is None:
            raise TimeParseError("START reference without start value")
        return _resolve_relative(tv, int(start))
    if tv.type == REL_END:
        if end is None:
            raise TimeParseError("END reference without end value")
        return _resolve_relative(tv, int(end))
    # REL_EPOCH: the reference runs mktime over the zeroed struct (plus
    # any day/mon/year deltas) and adds the seconds offset
    return tv.mktime() + tv.offset


def proc_start_end(
    start_spec: str, end_spec: str, now: float | None = None
) -> tuple[int, int]:
    """Resolve a start/end pair where either side may reference the other
    (rrd_proc_start_end, src/rrd_parsetime.c:1020-1071)."""
    if now is None:
        now = _time.time()
    stv = _parse_tv(start_spec, int(now))
    etv = _parse_tv(end_spec, int(now))
    if stv.type == REL_END and etv.type == REL_START:
        raise TimeParseError(
            "the start and end times cannot be specified relative to each other"
        )
    if stv.type == REL_START:
        raise TimeParseError(
            "the start time cannot be specified relative to itself"
        )
    if etv.type == REL_END:
        raise TimeParseError("the end time cannot be specified relative to itself")
    if stv.type == REL_END:
        end = parse_at_time(end_spec, now=now)
        start = _resolve_relative(stv, end)
    else:
        start = parse_at_time(start_spec, now=now)
        end = (
            _resolve_relative(etv, start)
            if etv.type == REL_START
            else parse_at_time(end_spec, now=now)
        )
    if start >= end:
        raise TimeParseError(f"start {start} must be before end {end}")
    return start, end
