#!/usr/bin/env python3
"""Profile ONE curation-stream drain with per-action wall timings.

Replicates bench.bench_curation_stream's setup (3 micro-batches, cold
band index) but instruments the foreachBatch sink: each eager action in
the per-batch pipeline is timed separately so the per-batch fixed cost
decomposes into quality/exact, LSH append, verdict write, and stream
machinery (trigger/checkpoint) — the measurement VERDICT r10 item 1
asks for before touching the stream.

Usage: python tools/probe_curation_stream.py [--mode current|opt]
"""

from __future__ import annotations

import os
import sys
import shutil
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.session import get_spark
    from rrdtool_1_x_spark.datapipe.dedup import write_band_index
    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        start_curation_stream,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("probe_curation_stream", cpus=cpus)

    work = tempfile.mkdtemp(prefix="curprobe_")
    schema = "doc_id bigint, text string"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    n_batches = 3
    src = f"{work}/in"
    for i in range(n_batches):
        docs.filter(F.col("doc_id") % n_batches == i).coalesce(4).write.mode(
            "append"
        ).parquet(src)
    state = f"{work}/state"
    write_band_index(spark.createDataFrame([], schema), f"{state}/lsh")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )

    # wrap the module's batch sink steps with timers via a job-level
    # listener substitute: time.perf_counter around each Spark action is
    # not reachable from outside, so instead instrument with the Python
    # profiler hook the sink already exposes -- simplest reliable probe:
    # monkeypatch DataFrame.localCheckpoint / DataFrameWriter.parquet to
    # log wall time per call while the stream drains.
    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame,
    # which OVERRIDES localCheckpoint — patch the classic class, not the
    # abstract base, or the hook never fires.
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    log: list[tuple[str, float, float]] = []
    t_origin = time.perf_counter()

    orig_ckpt = DataFrame.localCheckpoint

    def timed_ckpt(self, eager=True):
        t0 = time.perf_counter()
        out = orig_ckpt(self, eager=eager)
        t1 = time.perf_counter()
        log.append(("localCheckpoint", t0 - t_origin, t1 - t0))
        return out

    orig_parquet = DataFrameWriter.parquet

    def timed_parquet(self, path, *a, **kw):
        t0 = time.perf_counter()
        out = orig_parquet(self, path, *a, **kw)
        t1 = time.perf_counter()
        log.append((f"write:{os.path.basename(path)}", t0 - t_origin, t1 - t0))
        return out

    DataFrame.localCheckpoint = timed_ckpt
    DataFrameWriter.parquet = timed_parquet

    t0 = time.perf_counter()
    q = start_curation_stream(stream, state, f"{work}/ck")
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("drain exceeded 600s")
    elapsed = time.perf_counter() - t0

    DataFrame.localCheckpoint = orig_ckpt
    DataFrameWriter.parquet = orig_parquet

    vdf = spark.read.parquet(f"{state}/verdicts")
    verdicts = vdf.dropDuplicates(["doc_id"]).count()
    n_actual_batches = vdf.select("batch_id").distinct().count()
    shutil.rmtree(work, ignore_errors=True)

    print(
        f"\n=== drain: {elapsed:.3f} s, {verdicts}/{n} verdicts, "
        f"{n_actual_batches} micro-batches ==="
    )
    acc = 0.0
    for name, start, dur in log:
        acc += dur
        print(f"  +{start:7.3f}s  {dur:7.3f}s  {name}")
    print(f"  sum of instrumented actions: {acc:.3f} s")
    print(f"  un-instrumented (stream machinery + lazy portions): "
          f"{elapsed - acc:.3f} s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
