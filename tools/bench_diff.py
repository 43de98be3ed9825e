#!/usr/bin/env python3
"""Round-over-round bench triage: compare two BENCH_local_r*.json
artifacts with the noise-band discipline the rounds use by hand.

A query is flagged REGRESSED only when its ratio exceeds
max(1.5, 1.1 * worst recorded noise band of either round) — the same
rule every round's close-out applies (sub-second rows on this host
swing 1.5-2x under contention; the bands make deltas attributable to
code vs host noise, see bench.py's warm-run protocol comment).

Micro-queries with a COMMITTED isolated band (ISOLATED_BANDS.json via
tools/isolated_bands.py, embedded in the artifacts as
"isolated_bands") use the widest of the shared-session and isolated
envelopes — an isolated best-of-5 re-pin that showed the plan
unchanged and the drift inside its own band stays un-flagged in later
rounds instead of re-triaging every diff.

Usage: python tools/bench_diff.py [OLD.json NEW.json]
(defaults to the two most recent BENCH_local_r*.json by round number).
Exit code 1 when regressions are flagged — usable as a pre-commit
check after a bench refresh.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_two() -> tuple[str, str]:
    paths = []
    for p in glob.glob(os.path.join(REPO, "BENCH_local_r*.json")):
        m = re.search(r"BENCH_local_r(\d+)\.json$", p)
        if m:
            paths.append((int(m.group(1)), p))
    paths.sort()
    if len(paths) < 2:
        sys.exit("need two BENCH_local_r*.json artifacts")
    return paths[-2][1], paths[-1][1]


def main() -> int:
    if len(sys.argv) == 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        old_p, new_p = _latest_two()
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    qo, qn = old["queries"], new["queries"]
    no = old.get("noise_worst_over_best", {})
    nn = new.get("noise_worst_over_best", {})
    iso = dict(old.get("isolated_bands", {}))
    iso.update(new.get("isolated_bands", {}))
    iso_path = os.path.join(REPO, "ISOLATED_BANDS.json")
    if os.path.exists(iso_path):
        iso.update(json.load(open(iso_path)).get("queries", {}))
    print(f"{os.path.basename(old_p)} -> {os.path.basename(new_p)}")
    print(f"totals: {old['value']} s ({len(qo)} rows) -> "
          f"{new['value']} s ({len(qn)} rows)")
    regs, imps = [], []
    for k in sorted(qn):
        if k not in qo or qo[k] <= 0.05:
            continue
        ratio = qn[k] / qo[k]
        band = max(
            no.get(k, 1.0),
            nn.get(k, 1.0),
            iso.get(k, {}).get("band_worst_over_best", 1.0),
        )
        if ratio > max(1.5, band * 1.1):
            regs.append((ratio, k, qo[k], qn[k], band))
        elif ratio < 1 / 1.5 and qo[k] > 0.3:
            imps.append((ratio, k, qo[k], qn[k]))
    for label, rows in (("REGRESSED beyond band", sorted(regs, reverse=True)),
                        ("improved >1.5x", sorted(imps))):
        print(f"\n{label}: {len(rows)}")
        for row in rows:
            r, k = row[0], row[1]
            extra = f" band={row[4]}" if len(row) > 4 else ""
            print(f"  {k}: {row[2]} -> {row[3]} s ({r:.2f}x{extra})")
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if added:
        print(f"\nadded rows: {added}")
    if removed:
        print(f"removed rows: {removed}")
    so, sn = old.get("streams", {}), new.get("streams", {})
    if so or sn:
        print("\nstreams:")
        for k in sorted(set(so) | set(sn)):
            a = so.get(k, {}).get("sec")
            b = sn.get(k, {}).get("sec")
            print(f"  {k}: {a} -> {b} s")
    return 1 if regs else 0


if __name__ == "__main__":
    sys.exit(main())
