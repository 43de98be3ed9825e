"""Parse the reference's committed golden fetch outputs.

Files like /root/reference/tests/pdp-calc1-1-avg-60.output hold
``ts: v1 v2 ...`` rows with a DS-name header; ``nan``/``-nan`` mean unknown.
"""

from __future__ import annotations

import math
import re

REF_TESTS = "/root/reference/tests"


def parse_fetch_output(path: str) -> tuple[list[str], dict[int, list[float | None]]]:
    names: list[str] = []
    rows: dict[int, list[float | None]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            m = re.match(r"^(\d+):\s*(.*)$", line)
            if not m:
                names = line.split()
                continue
            ts = int(m.group(1))
            vals: list[float | None] = []
            for tok in m.group(2).split():
                v = float(tok)
                vals.append(None if math.isnan(v) else v)
            rows[ts] = vals
    return names, rows


def close(a: float | None, b: float | None, sig: int = 7) -> bool:
    """Equality at ``sig`` significant digits (reference tests/functions:17-20)."""
    if a is None or b is None:
        return a is None and b is None
    if a == b:
        return True
    return abs(a - b) <= 10 ** (-sig + 1) * max(abs(a), abs(b), 1e-300)
