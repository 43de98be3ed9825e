#!/usr/bin/env python3
"""Measure and COMMIT per-query isolated noise bands.

Some sub-second micro-queries (stratified_sample, pmi_topk, rrf_fuse…)
drift beyond the shared-session noise band round-over-round with an
UNCHANGED plan — host contention inside the 150-query bench session, not
a code regression. The round close-out used to re-pin them by hand with
an isolated best-of-5 run and record the result in prose; this tool
makes that re-pin a committed artifact (`ISOLATED_BANDS.json`) that
`tools/bench_diff.py` consults before flagging and `bench.py` embeds in
every BENCH_local artifact.

Per query: one FRESH bench subprocess (`SPARK_GRAFT_ONLY=<key>
SPARK_GRAFT_RUNS=5 python bench.py`) — nothing else shares the session,
so the recorded (sec, worst/best band) is the query's own envelope.

Usage: python tools/isolated_bands.py [key ...]
(defaults to re-measuring the keys already in ISOLATED_BANDS.json).
Merges into the existing file; other keys are preserved.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "ISOLATED_BANDS.json")


def measure(key: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_ONLY=key, SPARK_GRAFT_RUNS="5")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    return {
        "sec": rec["queries"][key],
        "band_worst_over_best": rec["noise_worst_over_best"][key],
        "runs": 5,
    }


def main() -> int:
    prior = {"queries": {}}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)
    keys = sys.argv[1:] or sorted(prior.get("queries", {}))
    if not keys:
        sys.exit("no keys: pass query names or seed ISOLATED_BANDS.json")
    for k in keys:
        rec = measure(k)
        prior["queries"][k] = rec
        print(f"{k}: {rec['sec']} s, band {rec['band_worst_over_best']}")
    prior["protocol"] = (
        "per key: fresh `SPARK_GRAFT_ONLY=<key> SPARK_GRAFT_RUNS=5 "
        "python bench.py` subprocess (isolated session, warmed "
        "best-of-5); band = worst/best of the warmed runs"
    )
    prior["sf_dir"] = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    with open(OUT, "w") as f:
        json.dump(prior, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
