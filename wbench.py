"""W-workload benchmark — the BASELINE.md protocol, reproducible.

Measures the engine on the reference-anchored workloads (600k samples,
3 DSs, RRA set {AVG 1x, AVG 6x, MAX 6x, LAST 24x}, step 300):

* W1 ingest+rollups: samples/s for one batch update() (1 and 100 series).
* W2 fetch-fine: full range at native step, AVERAGE — sec/query.
* W3 fetch-coarse: full range at 10x step (RRA best-match) — sec/query.

W2/W3 are measured on BOTH paths: the distributed fetch() (Spark job,
toPandas sink) and fetch_local() (the interactive pyarrow path — the
engine's analogue of the reference's single-process file read; identical
rows, asserted here). Warm-run median of 5 per BASELINE.md.

With --ref and a buildable reference binary (tests/rrdmini.py), also
measures the reference on the same host for direct comparison.

Prints one JSON line: {"w1_1series": .., "w1_100series": ..,
"w2_spark": .., "w2_local": .., "w3_spark": .., "w3_local": .., ...}.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time

import numpy as np
import pandas as pd

N_SAMPLES = 600_000
STEP = 300
T0 = 999_999_600
N_DS = 3


def _median(fn, n=5):
    fn()  # warm: JIT + codegen compile (amortizes to zero at scale)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 4)


def build_store(spark, path: str, n_series: int):
    from rrdtool_1_x_spark.catalog import DatasetDef, DSDef, RRADef
    from rrdtool_1_x_spark.sources.store import DatasetStore

    n_ts = N_SAMPLES // (N_DS * n_series)
    dsdef = DatasetDef(
        name="wbench",
        step=STEP,
        ds=[DSDef(name=c, dst="GAUGE", heartbeat=600) for c in ("a", "b", "c")],
        rra=[
            RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=n_ts + 10),
            RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=6, row_cnt=n_ts // 6 + 10),
            RRADef(cf="MAX", xff=0.5, pdp_cnt=6, row_cnt=n_ts // 6 + 10),
            RRADef(cf="LAST", xff=0.5, pdp_cnt=24, row_cnt=n_ts // 24 + 10),
        ],
        start=T0,
    )
    store = DatasetStore.create(spark, path, dsdef)
    ts = (T0 + STEP * np.arange(1, n_ts + 1)).astype(np.float64)
    frames = []
    for s in range(n_series):
        for d in ("a", "b", "c"):
            frames.append(
                pd.DataFrame(
                    {
                        "series_id": f"s{s}",
                        "ds_name": d,
                        "ts": ts,
                        "value": np.sin(ts / 9000.0) * 50 + 100 + s,
                    }
                )
            )
    pdf = pd.concat(frames, ignore_index=True)
    samples = spark.createDataFrame(pdf)
    t_start = time.perf_counter()
    store.update(samples)
    dt = time.perf_counter() - t_start
    end = int(ts[-1])
    return store, round(len(pdf) / dt), end


def main() -> None:
    from rrdtool_1_x_spark.session import get_spark

    spark = get_spark("wbench", cpus=32)
    out: dict = {"protocol": "BASELINE.md W1-W3, warm median of 5"}

    root = tempfile.mkdtemp(prefix="wbench_")
    try:
        # warm the session first (JVM JIT, codegen compile, executor spin-up)
        # so the first timed build doesn't absorb one-time session costs —
        # the reference binary pays no analogous per-process warmup at scale
        _warm = tempfile.mkdtemp(prefix="wbench_warm_")
        build_store(spark, f"{_warm}/w", 10)
        shutil.rmtree(_warm, ignore_errors=True)

        store100, rate100, _ = build_store(spark, f"{root}/w100", 100)
        out["w1_100series_samples_per_s"] = rate100
        store, rate1, end = build_store(spark, f"{root}/w1", 1)
        out["w1_1series_samples_per_s"] = rate1

        def w_spark(res):
            df, _ = store.fetch("AVERAGE", T0, end, res)
            return df.toPandas()

        def w_local(res):
            pdf, _ = store.fetch_local("AVERAGE", T0, end, res)
            return pdf

        # the two paths must agree before their timings mean anything
        for res in (STEP, STEP * 10):
            a = w_spark(res).sort_values(["series_id", "ds_name", "ts"]).reset_index(drop=True)
            b = w_local(res).sort_values(["series_id", "ds_name", "ts"]).reset_index(drop=True)
            assert len(a) == len(b) and np.allclose(
                a["value"], b["value"], equal_nan=True
            ), f"spark/local fetch mismatch at res {res}"

        out["w2_spark_sec"] = _median(lambda: w_spark(STEP))
        out["w2_local_sec"] = _median(lambda: w_local(STEP))
        out["w3_spark_sec"] = _median(lambda: w_spark(STEP * 10))
        out["w3_local_sec"] = _median(lambda: w_local(STEP * 10))
        out["w2_rows"] = int(len(w_local(STEP)))
        out["w3_rows"] = int(len(w_local(STEP * 10)))

        if "--ref" in sys.argv:
            out.update(bench_reference())
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


def bench_reference() -> dict:
    """Measure the locally-built reference binary on the same workload."""
    import os
    import subprocess

    from tests.rrdmini import ensure_binary

    binary = ensure_binary()
    if not binary:
        return {"ref": "unavailable"}
    n_ts = N_SAMPLES // N_DS
    d = tempfile.mkdtemp(prefix="wbench_ref_")
    rrd = os.path.join(d, "bw.rrd")
    out: dict = {}
    try:
        subprocess.run(
            [binary, "create", rrd, "--start", str(T0), "--step", str(STEP),
             "DS:a:GAUGE:600:U:U", "DS:b:GAUGE:600:U:U", "DS:c:GAUGE:600:U:U",
             f"RRA:AVERAGE:0.5:1:{n_ts + 10}", f"RRA:AVERAGE:0.5:6:{n_ts // 6 + 10}",
             f"RRA:MAX:0.5:6:{n_ts // 6 + 10}", f"RRA:LAST:0.5:24:{n_ts // 24 + 10}"],
            check=True,
        )
        ts = T0 + STEP * np.arange(1, n_ts + 1)
        vals = np.sin(ts / 9000.0) * 50 + 100
        t0 = time.perf_counter()
        batch = []
        for t, v in zip(ts, vals):
            batch.append(f"{t}:{v}:{v}:{v}")
            if len(batch) == 100:
                subprocess.run([binary, "update", rrd, *batch], check=True)
                batch = []
        if batch:
            subprocess.run([binary, "update", rrd, *batch], check=True)
        out["ref_w1_samples_per_s"] = round(n_ts * N_DS / (time.perf_counter() - t0))
        end = int(ts[-1])

        def run_fetch(res):
            subprocess.run(
                [binary, "fetch", rrd, "AVERAGE", "-r", str(res),
                 "-s", str(T0), "-e", str(end)],
                check=True, capture_output=True,
            )

        out["ref_w2_sec"] = _median(lambda: run_fetch(STEP))
        out["ref_w3_sec"] = _median(lambda: run_fetch(STEP * 10))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


if __name__ == "__main__":
    sys.exit(main())
