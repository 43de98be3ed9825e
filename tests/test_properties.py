"""Property-based robustness (hypothesis): total-function guarantees for
the driver-side parsers — arbitrary input must either parse to an int or
raise TimeParseError/ValueError, never crash with an internal error —
and algebraic invariants of the prefill coverage bookkeeping."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rrdtool_1_x_spark.sources.prefill import _coverage_add
from rrdtool_1_x_spark.timeparse import (
    TimeParseError,
    parse_at_time,
    proc_start_end,
)

NOW = 1_426_860_000  # fixed 'now' keeps runs reproducible


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_parse_total_on_arbitrary_text(s):
    try:
        out = parse_at_time(s, now=NOW, start=NOW - 3600, end=NOW)
    except TimeParseError:
        return
    assert isinstance(out, int)


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet="0123456789:/.+- amonthweksdyjanfebrmpil",
        min_size=1,
        max_size=30,
    )
)
def test_parse_total_on_grammar_alphabet(s):
    """Strings over the grammar's own alphabet — the adversarial corner
    (half-valid tokens, dangling signs, giant numbers)."""
    try:
        out = parse_at_time(s, now=NOW, start=NOW - 3600, end=NOW)
    except TimeParseError:
        return
    assert isinstance(out, int)


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="0123456789:+-sendow ", min_size=1, max_size=20),
    st.text(alphabet="0123456789:+-sendow ", min_size=1, max_size=20),
)
def test_proc_start_end_total(a, b):
    try:
        s, e = proc_start_end(a, b, now=NOW)
    except TimeParseError:
        return
    assert isinstance(s, int) and isinstance(e, int) and s < e


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 1000)), max_size=20
    )
)
def test_coverage_add_invariants(intervals):
    """The reference's add_coverage bookkeeping (rrd_create.c:1663-1800):
    newly-covered counts are exact, the merged list stays disjoint and
    sorted, and re-adding any already-covered interval contributes 0."""
    covered: list = []
    total = 0
    for s, e in intervals:
        n = _coverage_add(covered, s, e)
        assert 0 <= n <= max(0, e - s + 1)
        total += n
        # disjoint + sorted + non-adjacent after merge
        for (a1, b1), (a2, b2) in zip(covered, covered[1:]):
            assert a1 <= b1 and a2 <= b2 and b1 + 1 < a2
    union = set()
    for s, e in intervals:
        union.update(range(s, e + 1))
    assert total == len(union)
    for s, e in intervals:
        assert _coverage_add(covered, s, e) == 0
