#!/usr/bin/env python3
"""Generate tests/plan_classes.json — the per-gate plan-shape ledger.

Every driver-registry gate is classified by the physical-plan invariants
`tests/test_plan_shapes.py` regression-asserts:

- ``map_only``      — zero Exchange nodes: the op must stay a pure scan
                      transform (a shuffle appearing later is a regression)
- ``keyed``         — shuffles exist but NO SinglePartition exchange: all
                      repartitioning is on real keys (a SinglePartition
                      corpus funnel appearing later is the global-window
                      anti-pattern regression)
- ``global_merge``  — a SinglePartition exchange exists by design (scalar
                      aggregates, top-k merges, one-row model frames); the
                      universal no-CartesianProduct invariant still holds

Run from the repo root after adding gates: ``python tools/plan_classes.py``
(constructs every gate at sf0.001, ~2-4 min). The test fails on any gate
missing from the ledger (new gates must be classified the round they
land) and on any gate whose live class is WEAKER than the recorded one
(the regression direction). A live class STRONGER than recorded passes —
the ledger then understates the gate until the next regen, which is the
acceptable direction (regenerate to tighten the pin).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def plan_string(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="extended")
    return buf.getvalue()


def classify(plan: str) -> str:
    if plan.count("Exchange ") == 0:
        return "map_only"
    if "SinglePartition" not in plan:
        return "keyed"
    return "global_merge"


def main() -> None:
    from rrdtool_1_x_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("planclasses", cpus=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        df = fn(spark, SF)
        p = plan_string(df)
        out[name] = {
            "class": classify(p),
            "cartesian": "CartesianProduct" in p,
        }
        print(f"{name}: {out[name]['class']}"
              + (" CARTESIAN!" if out[name]["cartesian"] else ""))
    path = os.path.join(REPO, "tests", "plan_classes.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    counts: dict[str, int] = {}
    for v in out.values():
        counts[v["class"]] = counts.get(v["class"], 0) + 1
    print(f"wrote {path}: {len(out)} gates, {counts}")
    ncart = sum(1 for v in out.values() if v["cartesian"])
    print(f"CartesianProduct plans: {ncart}")
    spark.stop()


if __name__ == "__main__":
    main()
