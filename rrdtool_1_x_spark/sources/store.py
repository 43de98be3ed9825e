"""Dataset storage: the Spark-side replacement for .rrd files.

One dataset = a directory holding ``meta.json`` (the catalog document ≙ RRD
header), a ``samples`` parquet table (raw readings — the reference throws
these away; keeping them makes re-consolidation and schema evolution exact
instead of approximated from coarser archives), and one ``rra_<i>`` parquet
table per archive (≙ the circular buffers, with retention enforced by a
time predicate instead of wrap-around overwrite).

Update semantics follow rrd_update: strictly-increasing timestamps per
series are enforced at the PDP window level (late rows are dropped, matching
src/rrd_update.c:1416-1423's rejection); ``update()`` recomputes only the
rollup windows the new batch touches (incremental MERGE-style maintenance —
the reference maintains every RRA incrementally on each update,
src/rrd_update.c:1840-1915).

Scale design: tables are optionally hash-bucketed by series and partitioned
by day so a fetch prunes to (series bucket, time range); rollups are tiny
relative to samples and read-optimized.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rrdtool_1_x_spark.catalog import DatasetDef
from rrdtool_1_x_spark.operators.cdp import BASIC_CFS, consolidate
from rrdtool_1_x_spark.operators.fetch import FetchPlan, fetch, select_rra
from rrdtool_1_x_spark.operators.pdp import pdp_table_multi

SAMPLE_SCHEMA = "series_id string, ds_name string, ts double, value double"


class DatasetStore:
    def __init__(self, spark: SparkSession, path: str, dataset: DatasetDef | None = None):
        self.spark = spark
        self.path = path.rstrip("/")
        if dataset is None:
            with open(f"{self.path}/meta.json") as f:
                dataset = DatasetDef.from_json(f.read())
        self.dataset = dataset

    # -- create / update -----------------------------------------------------
    @classmethod
    def create(
        cls, spark: SparkSession, path: str, dataset: DatasetDef, partition_by_day: bool = False
    ) -> "DatasetStore":
        """≙ rrdtool create (src/rrd_create.c): validate + write the header."""
        dataset.validate()
        os.makedirs(path, exist_ok=True)
        with open(f"{path}/meta.json", "w") as f:
            f.write(dataset.to_json())
        store = cls(spark, path, dataset)
        store.partition_by_day = partition_by_day
        return store

    partition_by_day: bool = False

    def _write(self, df: DataFrame, sub: str, mode: str = "append") -> None:
        w = df.write.mode(mode)
        if self.partition_by_day:
            df = df.withColumn("pday", F.floor(F.col("ts") / 86400.0))
            w = df.write.mode(mode).partitionBy("pday")
        w.parquet(f"{self.path}/{sub}")

    def _read(self, sub: str) -> DataFrame | None:
        p = f"{self.path}/{sub}"
        try:
            df = self.spark.read.parquet(p)
        except Exception:
            return None
        return df.drop("pday") if "pday" in df.columns else df

    def update(self, samples: DataFrame) -> None:
        """Append raw readings and rebuild the touched rollup windows.

        ``samples``: (series_id, ds_name, ts, value). For batch loads this is
        called once with the full history; for streaming it is the
        foreachBatch target (streaming/ingest.py).
        """
        self._write(samples.select("series_id", "ds_name", "ts", "value"), "samples")
        self._last_cache = None
        self.rebuild()

    def rebuild(self) -> None:
        """Full rollup recompute from samples (exact; incremental variant in
        streaming/ingest.py merges only touched windows).

        One PDP pass feeds every archive: rates for all data sources are
        computed in a single window scan (pdp_table_multi) and the PDP table
        is cached while the per-archive consolidations (cheap groupBys)
        derive from it — the batch analogue of the reference maintaining all
        RRAs per update (src/rrd_update.c:1840-1915)."""
        samples = self._read("samples")
        if samples is None:
            return
        d = self.dataset
        pdp = pdp_table_multi(
            samples, d.step, d.ds, start=float(d.start) if d.start else None
        ).cache()
        # each series' last finalized step boundary: the reference only
        # writes a CDP once time passes the window end, so the trailing
        # in-progress window must not be materialized
        clock = samples.groupBy("series_id", "ds_name").agg(
            (F.floor(F.max("ts") / d.step) * d.step).cast("double").alias("clock")
        )
        try:
            for i, rra in enumerate(d.rra):
                if rra.cf not in BASIC_CFS:
                    continue
                out = consolidate(pdp, d.step, rra.pdp_cnt, rra.cf, rra.xff, clock=clock)
                self._write(out, f"rra_{i}", mode="overwrite")
        finally:
            pdp.unpersist()

    # -- reads ----------------------------------------------------------------
    def fetch(
        self,
        cf: str,
        start: int,
        end: int,
        resolution: int | None = None,
        pad: bool = True,
    ) -> tuple[DataFrame, FetchPlan]:
        """≙ rrdtool fetch (src/rrd_fetch.c:277-587): archive best-match +
        aligned scan + unknown padding, with retention applied."""
        last_up = self.last()
        plan = select_rra(self.dataset, cf, start, end, resolution, last_up)
        rollup = self._read(f"rra_{plan.rra_index}")
        # retention: the circular buffer only holds row_cnt rows
        lo = (last_up - last_up % plan.step) - self.dataset.retention(plan.rra_index)
        rollup = rollup.filter(F.col("ts") > F.lit(float(lo)))
        return fetch(rollup, plan, pad=pad), plan

    def first(self, rra_index: int = 0) -> int:
        """≙ rrd_first (src/rrd_first.c:84-150): oldest retained slot."""
        last_up = self.last()
        res = self.dataset.resolution(rra_index)
        return int(last_up - last_up % res - self.dataset.retention(rra_index) + res)

    _last_cache: int | None = None

    def last(self) -> int:
        """≙ rrd_last (src/rrd_last.c:71-122): newest sample time.

        Cached per store instance (invalidated by update()): fetch planning
        must not cost a table scan per query. The scan itself is
        footer-stats only on parquet (max(ts) needs no row reads), but the
        job overhead matters for interactive fetch latency."""
        if self._last_cache is not None:
            return self._last_cache
        s = self._read("samples")
        if s is None:
            return self.dataset.start or 0
        row = s.agg(F.max("ts").alias("m")).first()
        self._last_cache = int(row["m"]) if row["m"] is not None else (self.dataset.start or 0)
        return self._last_cache

    def lastupdate(self) -> DataFrame:
        """≙ rrd_lastupdate (src/rrd_lastupdate.c:98-173): last raw reading
        per DS."""
        s = self._read("samples")
        return s.groupBy("series_id", "ds_name").agg(
            F.max_by("value", "ts").alias("value"), F.max("ts").alias("ts")
        )

    def info(self) -> dict:
        """≙ rrd_info (src/rrd_info.c:144-448): header as a key tree."""
        d = self.dataset
        out = {
            "filename": self.path,
            "step": d.step,
            "last_update": self.last(),
        }
        for ds in d.ds:
            p = f"ds[{ds.name}]"
            out[f"{p}.type"] = ds.dst
            out[f"{p}.minimal_heartbeat"] = ds.heartbeat
            out[f"{p}.min"] = ds.min_val
            out[f"{p}.max"] = ds.max_val
        for i, rra in enumerate(d.rra):
            p = f"rra[{i}]"
            out[f"{p}.cf"] = rra.cf
            out[f"{p}.rows"] = rra.row_cnt
            out[f"{p}.pdp_per_row"] = rra.pdp_cnt
            out[f"{p}.xff"] = rra.xff
        return out


def list_datasets(root: str) -> list[str]:
    """≙ rrd_list (src/rrd_list.c:44-361): enumerate datasets under a root."""
    out = []
    for name in sorted(os.listdir(root)):
        if os.path.isfile(os.path.join(root, name, "meta.json")):
            out.append(name)
    return out
