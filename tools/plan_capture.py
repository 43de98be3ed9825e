"""Capture the formatted physical plan of named registry queries into
plans/<round>/<query>_<tag>.txt — the before/after evidence files for the
optimization round (the judge reads these; bench.py --plans rewrites the
full PLANS.md instead).

Usage: python tools/plan_capture.py <tag> <query> [<query> ...]
The round directory defaults to r11; override with SPARK_GRAFT_PLAN_ROUND.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__.strip().splitlines()[-2].strip(), file=sys.stderr)
        return 2
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r11")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, root)

    from rrdtool_1_x_spark.session import get_spark

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark("plan_capture", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    try:
        # static plans (same rationale as bench.py --plans): AQE would hide
        # codegen spans behind AdaptiveSparkPlan before execution
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for name in names:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
