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
relative to samples and read-optimized. Rollup rewrites are transactional
snapshot commits (immutable version dirs + an atomically-renamed manifest
pointer — the moral equivalent of an Iceberg/Delta commit on plain
parquet), so concurrent readers during an incremental refresh keep a
consistent pinned snapshot.
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
# optional extra column: raw string — the untouched decimal-string reading,
# kept when present so COUNTER/DERIVE diffs stay exact beyond 2^53
# (≙ pdp_prep.last_ds holding ASCII, src/rrd_format.h:299-315)


def _sample_cols(df: DataFrame) -> list[str]:
    cols = ["series_id", "ds_name", "ts", "value"]
    if "raw" in df.columns:
        cols.append("raw")
    return cols


class DatasetStore:
    def __init__(self, spark: SparkSession, path: str, dataset: DatasetDef | None = None):
        self.spark = spark
        # absolutize: Spark's JVM resolves relative paths against ITS cwd,
        # which os.chdir (the CLI batch mode's `cd`) does not move
        self.path = os.path.abspath(path.rstrip("/"))
        if dataset is None:
            with open(f"{self.path}/meta.json") as f:
                dataset = DatasetDef.from_json(f.read())
        self.dataset = dataset
        self._load_layout()

    def reload_meta(self) -> None:
        """Re-read meta.json into this instance — required after an
        out-of-band tune/rename rewrote the header (e.g. the daemon's TUNE
        applies through a fresh store; this one must not keep parsing
        updates against the stale DS list)."""
        with open(f"{self.path}/meta.json") as f:
            self.dataset = DatasetDef.from_json(f.read())
        self._last_cache = None

    # -- create / update -----------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        dataset: DatasetDef,
        partition_by_day: bool = False,
        series_buckets: int | None = None,
    ) -> "DatasetStore":
        """≙ rrdtool create (src/rrd_create.c): validate + write the header.

        ``partition_by_day`` lays tables out hive-partitioned by
        ``pday = floor(ts/86400)`` so time-range reads prune whole day
        directories at file-listing time; ``series_buckets=N`` adds a
        leading ``pbucket = crc32(series_id) % N`` level so single-series
        reads (the daemon's FETCH) prune to one bucket. The layout choice
        is persisted in ``layout.json`` — a reopened store keeps writing
        the same layout."""
        dataset.validate()
        os.makedirs(path, exist_ok=True)
        with open(f"{path}/meta.json", "w") as f:
            f.write(dataset.to_json())
        if partition_by_day or series_buckets:
            with open(f"{path}/layout.json", "w") as f:
                json.dump(
                    {"partition_by_day": partition_by_day,
                     "series_buckets": series_buckets}, f,
                )
        store = cls(spark, path, dataset)
        return store

    partition_by_day: bool = False
    series_buckets: int | None = None

    def _load_layout(self) -> None:
        try:
            with open(f"{self.path}/layout.json") as f:
                doc = json.load(f)
            self.partition_by_day = bool(doc.get("partition_by_day"))
            self.series_buckets = doc.get("series_buckets")
        except (FileNotFoundError, ValueError):
            pass

    def _partition_cols(self) -> list[str]:
        cols = []
        if self.series_buckets:
            cols.append("pbucket")
        if self.partition_by_day:
            cols.append("pday")
        return cols

    # -- versioned snapshot storage -------------------------------------------
    # Overwrites are transactional: each rewrite lands in a fresh immutable
    # snapshot directory (<sub>/_v/<NNNNNNNN>/) and becomes visible via an
    # atomic manifest-pointer rename (<sub>/_MANIFEST). Readers always
    # resolve the manifest at DataFrame-construction time and then pin an
    # immutable directory — a reader started before a refresh keeps reading
    # its snapshot; it never sees the FAILED_READ of an in-place rewrite.
    # The last KEEP_SNAPSHOTS versions are retained (snapshot expiry, like
    # Iceberg's): a pinned DataFrame older than that may lose its files.
    # Appends (the samples log) go into the current directory — append-only
    # mutation is safe for concurrent listings. On a real lake the
    # os.replace commit becomes the table catalog's atomic swap (HDFS
    # rename / Iceberg-Delta commit); the layout maps 1:1.
    KEEP_SNAPSHOTS = 3

    _df_cache: dict | None = None

    def _current(self, sub: str) -> tuple[int, str]:
        """(version, data dir); version 0 = legacy flat directory."""
        try:
            with open(f"{self.path}/{sub}/_MANIFEST") as f:
                doc = json.load(f)
            return int(doc["version"]), f"{self.path}/{sub}/{doc['dir']}"
        except (FileNotFoundError, NotADirectoryError):
            return 0, f"{self.path}/{sub}"

    def _write(self, df: DataFrame, sub: str, mode: str = "append") -> None:
        pcols = self._partition_cols()
        if self.series_buckets:
            df = df.withColumn(
                "pbucket", F.crc32(F.col("series_id").cast("binary")) % self.series_buckets
            )
        if self.partition_by_day:
            df = df.withColumn("pday", F.floor(F.col("ts") / 86400.0))
        if pcols:
            # cluster rows by partition key before the partitioned write:
            # otherwise every shuffle partition writes its own file into
            # every directory (tasks × dirs small files — the listing cost
            # then eats the pruning win). One file per directory here; at
            # real volume add a file-size salt inside the key.
            df = df.repartition(*[F.col(c) for c in pcols])
        ver, cur = self._current(sub)
        if mode == "overwrite":
            new_ver = ver + 1
            vdir = f"{self.path}/{sub}/_v/{new_ver:08d}"
            w = df.write.mode("overwrite")
            if pcols:
                w = w.partitionBy(*pcols)
            w.parquet(vdir)
            tmp = f"{self.path}/{sub}/_MANIFEST.tmp"
            with open(tmp, "w") as f:
                json.dump({"version": new_ver, "dir": f"_v/{new_ver:08d}"}, f)
            os.replace(tmp, f"{self.path}/{sub}/_MANIFEST")  # the commit point
            self._gc(sub, new_ver)
        else:
            w = df.write.mode("append")
            if pcols:
                w = w.partitionBy(*pcols)
            w.parquet(cur)
        if self._df_cache is not None:
            for k in [k for k in self._df_cache if k[0] == sub]:
                self._df_cache.pop(k, None)

    def _gc(self, sub: str, latest: int) -> None:
        """Expire snapshots beyond KEEP_SNAPSHOTS and retire legacy flat
        files once the first versioned commit exists (best-effort)."""
        import shutil

        root = f"{self.path}/{sub}"
        keep = {f"{latest - k:08d}" for k in range(self.KEEP_SNAPSHOTS)}
        vroot = f"{root}/_v"
        for name in os.listdir(vroot):
            if name not in keep:
                shutil.rmtree(f"{vroot}/{name}", ignore_errors=True)
        for name in os.listdir(root):
            if name == "_v" or name.startswith("_MANIFEST"):
                continue
            full = f"{root}/{name}"
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            else:
                try:
                    os.remove(full)
                except OSError:
                    pass

    def _read(self, sub: str) -> DataFrame | None:
        """Memoized per (store, sub, snapshot version): constructing a
        parquet DataFrame costs a driver-side file listing + schema read
        every call, which dominates interactive fetch planning. A version
        bump naturally misses the cache; appends invalidate explicitly."""
        if self._df_cache is None:
            self._df_cache = {}
        ver, cur = self._current(sub)
        key = (sub, ver)
        if key in self._df_cache:
            return self._df_cache[key]
        try:
            df = self.spark.read.parquet(cur)
        except Exception:
            return None
        df = df.drop(*[c for c in ("pday", "pbucket") if c in df.columns])
        self._df_cache[key] = df
        return df

    def _read_range(
        self, sub: str, lo: float, hi: float, series_id: str | None = None
    ) -> DataFrame | None:
        """Time-bounded read that keeps partition pruning alive: the ts
        bounds become a ``pday`` predicate (and a known series a
        ``pbucket`` one) BEFORE the partition columns are dropped, so
        Catalyst turns them into PartitionFilters — the scan lists only
        the touched day/bucket directories. ``_read`` drops the partition
        columns for schema cleanliness, which would forfeit pruning."""
        pcols = self._partition_cols()
        if not pcols:
            df = self._read(sub)
            return None if df is None else df.filter(
                (F.col("ts") > F.lit(float(lo))) & (F.col("ts") <= F.lit(float(hi)))
            )
        _, cur = self._current(sub)
        try:
            df = self.spark.read.parquet(cur)
        except Exception:
            return None
        if self.partition_by_day and "pday" in df.columns:
            df = df.filter(
                (F.col("pday") >= int(lo // 86400)) & (F.col("pday") <= int(hi // 86400))
            )
        if self.series_buckets and series_id is not None and "pbucket" in df.columns:
            import zlib

            b = zlib.crc32(series_id.encode()) % self.series_buckets
            df = df.filter(F.col("pbucket") == b)
        df = df.drop(*[c for c in ("pday", "pbucket") if c in df.columns])
        return df.filter(
            (F.col("ts") > F.lit(float(lo))) & (F.col("ts") <= F.lit(float(hi)))
        )

    def update(self, samples: DataFrame) -> None:
        """Append raw readings and rebuild the touched rollup windows.

        ``samples``: (series_id, ds_name, ts, value). For batch loads this is
        called once with the full history; for streaming it is the
        foreachBatch target (streaming/ingest.py).
        """
        self._write(samples.select(*_sample_cols(samples)), "samples")
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
            # materialize the shared PDP cache once, then run the archive
            # writes concurrently: each is a tiny groupBy+write job whose
            # wall time is scheduler overhead, not compute — on a cluster
            # these are independent jobs the scheduler interleaves anyway
            pdp.count()
            targets = [
                (i, rra) for i, rra in enumerate(d.rra) if rra.cf in BASIC_CFS
            ]

            def _one(arg):
                i, rra = arg
                out = consolidate(pdp, d.step, rra.pdp_cnt, rra.cf, rra.xff, clock=clock)
                self._write(out, f"rra_{i}", mode="overwrite")

            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(4, len(targets)) or 1) as ex:
                list(ex.map(_one, targets))
            self._rebuild_hw(pdp)
        finally:
            pdp.unpersist()

    # CF -> which hw_predict output column that archive republishes
    _HW_VALUE_COL = {
        "HWPREDICT": "prediction", "MHWPREDICT": "prediction",
        "SEASONAL": "seasonal", "DEVSEASONAL": "devseasonal",
        "DEVPREDICT": "devpredict", "FAILURES": "failures",
    }

    def _rebuild_hw(self, pdp: DataFrame) -> None:
        """Materialize the Holt-Winters family archives from the PDP table
        (≙ the reference maintaining the aberrant RRAs on every update,
        src/rrd_hw_update.c:38-475 via rrd_update's RRA loop) — one
        hw_predict pass (operators/hw.py) serves every dependent archive.
        A ``reset_ts`` stamped by tune --aberrant-reset splits the run:
        state re-bootstraps on the first sample after the watermark, which
        is exactly the reference's voided-coefficients effect; rows before
        it keep their historical values (recomputed, identical)."""
        d = self.dataset
        hw = [(i, r) for i, r in enumerate(d.rra) if r.cf in self._HW_VALUE_COL]
        if not hw:
            return
        prim = next((r for _, r in hw if r.cf in ("HWPREDICT", "MHWPREDICT")), None)
        if prim is None:
            return
        from rrdtool_1_x_spark.operators.hw import fnv32, hw_predict

        seasonal = next((r for _, r in hw if r.cf == "SEASONAL"), None)
        fail = next((r for _, r in hw if r.cf == "FAILURES"), None)
        period = int(prim.params.get("period")
                     or (seasonal.row_cnt if seasonal else 288))
        sp = seasonal.params if seasonal else {}
        fp = fail.params if fail else {}
        kw = dict(
            alpha=float(prim.params.get("alpha", 0.1)),
            beta=float(prim.params.get("beta", 0.0035)),
            gamma=float(sp.get("gamma", prim.params.get("alpha", 0.1))),
            period=period,
            delta_pos=float(fp.get("deltapos", 2.0)),
            delta_neg=float(fp.get("deltaneg", 2.0)),
            threshold=int(fp.get("threshold", 7)),
            window_len=int(fp.get("window", 9)),
            multiplicative=prim.cf == "MHWPREDICT",
            smooth_window=float(sp.get("smoothing_window", 0.0)),
            smooth_idx=fnv32(d.name) % (seasonal.row_cnt if seasonal else period),
            keys=("series_id", "ds_name"),
            step=float(d.step),
            start=float(d.start) if d.start else None,
        )
        reset = prim.params.get("reset_ts")
        if reset is not None:
            pre = pdp.filter(F.col("ts") <= float(reset))
            post = pdp.filter(F.col("ts") > float(reset))
            kw_post = dict(kw, start=None)  # re-bootstrap at the watermark
            out = hw_predict(pre, **kw).unionByName(hw_predict(post, **kw_post))
        else:
            out = hw_predict(pdp, **kw)
        out = out.localCheckpoint(eager=True)  # one pass, up to 6 writes
        for i, rra in hw:
            col = self._HW_VALUE_COL[rra.cf]
            self._write(
                out.filter(F.col(col).isNotNull()).select(
                    "series_id", "ds_name", "ts", F.col(col).alias("value")
                ),
                f"rra_{i}", mode="overwrite",
            )

    # -- reads ----------------------------------------------------------------
    def fetch(
        self,
        cf: str,
        start: int,
        end: int,
        resolution: int | None = None,
        pad: bool = True,
        align_start: bool = False,
    ) -> tuple[DataFrame, FetchPlan]:
        """≙ rrdtool fetch (src/rrd_fetch.c:277-587): archive best-match +
        aligned scan + unknown padding, with retention applied.
        ``align_start`` ≙ -a/--align-start (src/rrd_fetch.c:169-173): shift
        both ends down by start % resolution."""
        if align_start and resolution:
            delta = start % resolution
            start -= delta
            end -= delta
        last_up = self.last()
        plan = select_rra(self.dataset, cf, start, end, resolution, last_up)
        # retention: the circular buffer only holds row_cnt rows. Combined
        # with the plan range it bounds the scan both ways — on a
        # partitioned layout the bounds prune day directories at listing
        # time (_read_range), not per-row
        lo = (last_up - last_up % plan.step) - self.dataset.retention(plan.rra_index)
        rollup = self._read_range(
            f"rra_{plan.rra_index}", max(float(lo), float(plan.start)), float(plan.end)
        )
        if rollup is None:
            # empty archive (fresh/truncated dataset): the reference still
            # serves the all-unknown grid — pad via an explicit series frame
            rollup = self.spark.createDataFrame([], SAMPLE_SCHEMA)
            series = self.spark.createDataFrame(
                [(self.dataset.name, ds.name) for ds in self.dataset.ds],
                "series_id string, ds_name string",
            )
            return fetch(rollup, plan, series=series, pad=pad), plan
        return fetch(rollup, plan, pad=pad), plan

    def fetch_local(
        self,
        cf: str,
        start: int,
        end: int,
        resolution: int | None = None,
        pad: bool = True,
        align_start: bool = False,
        series_id: str | None = None,
        ds_name: str | None = None,
    ):
        """Interactive latency path ≙ the reference's single-process fetch
        (src/rrd_fetch.c: one sequential read of a small file). Plans
        exactly like fetch(), then reads the pruned archive parquet on the
        driver via pyarrow — no Spark job, so no scheduler overhead — and
        pads with a vectorized reindex. Produces the same rows as fetch()
        (tests/test_plans.py asserts equality); use it for human-scale
        windows, and the distributed fetch() for cluster-scale ranges.
        Returns (pandas.DataFrame, FetchPlan)."""
        import numpy as np
        import pandas as pd
        import pyarrow.dataset as pads

        if align_start and resolution:
            delta = start % resolution
            start -= delta
            end -= delta
        last_up = self.last()
        plan = select_rra(self.dataset, cf, start, end, resolution, last_up)
        lo = (last_up - last_up % plan.step) - self.dataset.retention(plan.rra_index)
        cut = max(float(lo), float(plan.start))
        _, data_dir = self._current(f"rra_{plan.rra_index}")
        if not os.path.isdir(data_dir):
            # empty archive: serve the all-unknown grid like the reference
            grid = np.arange(
                plan.start + plan.step, plan.end + plan.step, plan.step,
                dtype=np.float64,
            )
            names = [d.name for d in self.dataset.ds]
            if series_id is None:
                sids = [self.dataset.name]
            else:
                sids = [series_id]
            pdf = pd.DataFrame(
                [(s, n, t, float("nan"))
                 for s in sids for n in names for t in grid],
                columns=["series_id", "ds_name", "ts", "value"],
            )
            return pdf, plan
        dset = pads.dataset(
            data_dir,
            format="parquet",
            partitioning="hive" if self._partition_cols() else None,
        )
        flt = (pads.field("ts") > cut) & (pads.field("ts") <= float(plan.end))
        if self.partition_by_day:
            # partition-level pruning: pyarrow drops whole day fragments
            # before reading any row group
            flt &= (pads.field("pday") >= int(cut // 86400)) & (
                pads.field("pday") <= int(plan.end // 86400)
            )
        if self.series_buckets and series_id is not None:
            import zlib

            flt &= pads.field("pbucket") == (
                zlib.crc32(series_id.encode()) % self.series_buckets
            )
        if series_id is not None:
            flt &= pads.field("series_id") == series_id
        if ds_name is not None:
            # DEF-style single-DS reads (plans.local) prune the scan to
            # one channel — the reference analogue reads whole rows but
            # per-file; here the column-partitioned read is the win
            flt &= pads.field("ds_name") == ds_name
        keys = ["series_id", "ds_name"]
        cols = keys + ["ts", "value"]
        # column pruning: a filter that pins a key to one value makes its
        # column constant — skip decoding it (the two 200k-row string
        # columns cost more to decode than ts+value combined; the
        # reference reads raw doubles and pays no analogous cost)
        fixed: dict[str, str] = {}
        if series_id is not None:
            fixed["series_id"] = series_id
        if ds_name is not None:
            fixed["ds_name"] = ds_name
        read_cols = [c for c in cols if c not in fixed]
        tbl = dset.to_table(filter=flt, columns=read_cols)
        pdf = tbl.to_pandas()
        for k, v in fixed.items():
            pdf[k] = v
        pdf = pdf[cols]
        if not pad:
            return pdf, plan
        s = plan.step
        grid = np.arange(plan.start + s, plan.end + s, s, dtype=np.float64)
        if len(pdf) == 0:
            return pdf.iloc[0:0], plan
        # vectorized pad: ts -> slot index is pure arithmetic, so scatter
        # values into a (group x slot) NaN matrix instead of a per-group
        # pandas reindex (the reindex path was ~3x the pyarrow read cost
        # at 200k rows; this is one fused numpy pass)
        free = [k for k in keys if k not in fixed]
        if free:
            kc = pdf[free[0]].astype(str)
            for k in free[1:]:
                kc = kc + "\x1f" + pdf[k].astype(str)
            codes, uniq = pd.factorize(kc, sort=False)
            parts = [u.split("\x1f", len(free) - 1) for u in uniq]
        else:
            codes = np.zeros(len(pdf), dtype=np.int64)
            uniq, parts = [None], [[]]
        slot = ((pdf["ts"].to_numpy(np.float64) - plan.start) / s - 1).astype(
            np.int64
        )
        ok = (slot >= 0) & (slot < len(grid))
        # duplicate-ts guard: the reindex this replaced raised on a
        # duplicate axis; keep surfacing archive corruption instead of a
        # silent nondeterministic last-write-wins (bincount: O(n), no
        # sort — the count buffer is the same size as the value matrix)
        cell = codes[ok].astype(np.int64) * len(grid) + slot[ok]
        if len(cell) and np.bincount(
            cell, minlength=len(uniq) * len(grid)
        ).max() > 1:
            raise ValueError(
                "fetch_local: duplicate (series, ds, ts) rows in the"
                " archive — cannot reindex from a duplicate axis"
            )
        mat = np.full((len(uniq), len(grid)), np.nan)
        mat[codes[ok], slot[ok]] = pdf["value"].to_numpy(np.float64)[ok]
        data = {
            "ts": np.tile(grid, len(uniq)),
            "value": mat.ravel(),
        }
        for j, k in enumerate(free):
            data[k] = np.repeat(
                np.asarray([p[j] for p in parts], object), len(grid)
            )
        res = pd.DataFrame(data)
        for k, v in fixed.items():
            res[k] = v
        return res[cols], plan

    def _fetch_arrays(
        self,
        cf: str,
        start: int,
        end: int,
        resolution: int | None = None,
        series_id: str | None = None,
        ds_name: str | None = None,
    ):
        """(grid_ts, values, plan) numpy arrays for ONE (series, ds) — the
        plans.local hot path. Skips every pandas frame-assembly cost of
        ``fetch_local`` (same plan, same rows: the LocalQuery differential
        suite pins equality with the distributed path). Contract: the read
        must resolve to a single series — pass ``series_id`` on
        multi-series stores; a collision (more rows than grid slots) is
        detected and raised."""
        import numpy as np
        import pyarrow.dataset as pads

        last_up = self.last()
        plan = select_rra(self.dataset, cf, start, end, resolution, last_up)
        lo = (last_up - last_up % plan.step) - self.dataset.retention(plan.rra_index)
        cut = max(float(lo), float(plan.start))
        s = plan.step
        grid = np.arange(plan.start + s, plan.end + s, s, dtype=np.float64)
        out = np.full(len(grid), np.nan)
        _, data_dir = self._current(f"rra_{plan.rra_index}")
        if not os.path.isdir(data_dir):
            return grid, out, plan
        dset = pads.dataset(
            data_dir,
            format="parquet",
            partitioning="hive" if self._partition_cols() else None,
        )
        flt = (pads.field("ts") > cut) & (pads.field("ts") <= float(plan.end))
        if self.partition_by_day:
            flt &= (pads.field("pday") >= int(cut // 86400)) & (
                pads.field("pday") <= int(plan.end // 86400)
            )
        if self.series_buckets and series_id is not None:
            import zlib

            flt &= pads.field("pbucket") == (
                zlib.crc32(series_id.encode()) % self.series_buckets
            )
        if series_id is not None:
            flt &= pads.field("series_id") == series_id
        if ds_name is not None:
            flt &= pads.field("ds_name") == ds_name
        tbl = dset.to_table(filter=flt, columns=["ts", "value"])
        ts = tbl.column("ts").to_numpy(zero_copy_only=False).astype(np.float64)
        vals = tbl.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        idx = ((ts - plan.start) / s - 1).astype(np.int64)
        ok = (idx >= 0) & (idx < len(grid))
        # collision guard: a slot written twice means either several
        # series matched (pass series_id) or the archive holds duplicate
        # ts rows (corruption) — either way a silent last-write-wins
        # would return nondeterministic values; refuse instead. (Fully
        # disjoint multi-series rows remain undetectable here — the
        # documented single-series contract.)
        if ok.any():
            counts = np.bincount(idx[ok], minlength=len(grid))
            if counts.max() > 1:
                raise ValueError(
                    "_fetch_arrays: slot written twice — multiple series"
                    " match (pass series_id) or duplicate ts rows in the"
                    " archive"
                )
        out[idx[ok]] = vals[ok]
        return grid, out, plan

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
        # a store restored from a reference XML dump carries the source
        # file's exact lastupdate (sources/rrdxml.py) — newer raw samples
        # appended since then supersede it
        restored = None
        try:
            with open(f"{self.path}/restored.json") as f:
                restored = int(json.load(f)["lastupdate"])
        except (FileNotFoundError, KeyError, ValueError):
            pass
        # parquet footer stats carry max(ts) per row group — read them
        # driver-side (no Spark job; planning latency) with a Spark fallback
        try:
            import pyarrow.dataset as pads

            m = None
            for frag in pads.dataset(f"{self.path}/samples", format="parquet").get_fragments():
                md = frag.metadata
                ts_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["ts"]
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ts_idx).statistics
                    if st is not None and st.max is not None:
                        m = st.max if m is None else max(m, st.max)
            if m is not None:
                self._last_cache = max(int(m), restored or 0)
                return self._last_cache
        except Exception:
            pass
        s = self._read("samples")
        if s is None:
            return restored if restored is not None else (self.dataset.start or 0)
        row = s.agg(F.max("ts").alias("m")).first()
        m = int(row["m"]) if row["m"] is not None else (self.dataset.start or 0)
        self._last_cache = max(m, restored or 0)
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


def list_datasets(root: str, recursive: bool = False) -> list[str]:
    """≙ rrd_list (src/rrd_list.c:44-361): enumerate datasets under a root;
    ``recursive`` descends into subdirectories and returns root-relative
    paths (rrd_list_rec, src/rrd_list.c:40-144)."""
    # a dataset path itself lists as its own name (rrd_list on one file)
    if os.path.isfile(os.path.join(root, "meta.json")):
        return [os.path.basename(root.rstrip("/"))]
    out = []
    for name in sorted(os.listdir(root)):
        full = os.path.join(root, name)
        if os.path.isfile(os.path.join(full, "meta.json")):
            out.append(name)
        elif os.path.isdir(full):
            if recursive:
                # recursive mode returns rrd files only (rrd_list_rec)
                out.extend(f"{name}/{sub}" for sub in list_datasets(full, True))
            else:
                # plain mode also shows subdirectories so a user can
                # navigate (tests/list1 "only lists RRDs and directories";
                # the .rrd-suffix skip applies to regular files only,
                # src/rrd_list.c:108-127)
                out.append(name)
    return out
