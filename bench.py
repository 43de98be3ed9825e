"""Benchmark the engine's headline queries.

Runs on local[$SPARK_GRAFT_CPUS] over $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (no collect overhead, no
column pruning shortcuts).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from rrdtool_1_x_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench", cpus=cpus)
    queries = entry_mod.queries()
    names = [
        "pdp_gauge",
        "counter_rate",
        "cdp_avg",
        "cdp_max",
        "reduce_avg",
        "rpn_chain",
        "trend",
        "vdef_stats",
        "vdef_percentile",
        "shift_week",
        "xport_pivot",
        "dedup_exact",
        "text_stats",
        "minhash_sig",
        "ann_cosine_top10",
        "near_dup_pairs",
        "dup_groups",
        "embed_near_dup",
        "lsh_topk",
        "fingerprint",
    ]
    # warm-run protocol (BASELINE.md): first execution pays JVM JIT +
    # whole-stage-codegen compilation, which dominates at small SF and
    # amortizes to zero at scale; measure the warmed run.
    times: dict[str, float] = {}
    for name in names:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
