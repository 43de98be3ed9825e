"""Structured Streaming ingest ≙ rrdcached.

Reference: the caching daemon (src/rrd_daemon.c) accumulates UPDATE values
per file in memory, flushes when entries age past ``-w`` (default 300 s,
src/rrd_daemon.c:285), journals for crash recovery (src/rrd_daemon.c:238-330)
and rejects non-increasing timestamps per file
(src/rrd_update.c:1416-1423).

Spark mapping (SURVEY §2.9):

* micro-batch trigger interval ≙ the daemon's write interval ``-w``;
* checkpointing ≙ the write-ahead journal;
* ``foreachBatch`` merges each batch into the samples table and rebuilds
  ONLY the rollup windows the batch touched — the incremental equivalent of
  the reference maintaining every RRA on each update
  (src/rrd_update.c:1840-1915);
* late rows (at or before the newest stored sample of their series) are
  dropped, mirroring the daemon's rejection; the rejection is per series,
  not global, exactly like per-file monotonicity.

PDP normalization needs the previous sample of each series to rate-convert
and to finalize boundary-crossing steps, so the incremental recompute pulls
a bounded lookback (max(heartbeat, step) seconds) of already-stored samples
before the batch minimum — state lives in the samples table itself rather
than in operator memory, which keeps the sink idempotent under micro-batch
replay (exactly-once on top of at-least-once delivery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rrdtool_1_x_spark.operators.cdp import BASIC_CFS, consolidate
from rrdtool_1_x_spark.operators.pdp import pdp_table
from rrdtool_1_x_spark.sources.store import DatasetStore


class StreamingIngest:
    def __init__(self, store: DatasetStore):
        self.store = store

    # -- the foreachBatch sink ------------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        """Merge one micro-batch of raw readings into the dataset.

        ``batch``: (series_id, ds_name, ts double, value double).
        """
        store = self.store
        existing = store._read("samples")
        if existing is not None:
            # per-series monotonicity: drop rows at or before the newest
            # stored sample of that series (src/rrd_update.c:1416-1423)
            heads = existing.groupBy("series_id", "ds_name").agg(
                F.max("ts").alias("_head")
            )
            batch = (
                batch.join(F.broadcast(heads), ["series_id", "ds_name"], "left")
                .filter(F.col("_head").isNull() | (F.col("ts") > F.col("_head")))
                .drop("_head")
            )
        # truncate lineage BEFORE appending to samples: the monotonicity
        # filter reads the samples table, so a lazy plan re-evaluated after
        # the append would see its own rows and filter the batch empty
        batch = batch.dropDuplicates(["series_id", "ds_name", "ts"]).localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        from rrdtool_1_x_spark.sources.store import _sample_cols

        store._write(batch.select(*_sample_cols(batch)), "samples")
        store._last_cache = None
        self._refresh_rollups(batch)

    def _refresh_rollups(self, batch: DataFrame) -> None:
        """Recompute only the rollup windows the batch can influence."""
        store = self.store
        d = store.dataset
        samples = store._read("samples")
        # a batch row at ts can change PDPs back to its previous sample;
        # bounded by the heartbeat (older gaps are unknown anyway)
        spans = batch.groupBy("series_id", "ds_name").agg(
            F.min("ts").alias("_lo"), F.max("ts").alias("_hi")
        )
        for i, rra in enumerate(d.rra):
            if rra.cf not in BASIC_CFS:
                continue
            res = float(d.step * rra.pdp_cnt)
            lookback = float(max(max(ds.heartbeat for ds in d.ds), d.step)) + res
            win = spans.select(
                "series_id",
                "ds_name",
                (F.floor((F.col("_lo") - lookback) / res) * res).alias("_wlo"),
                (F.ceil(F.col("_hi") / res) * res).alias("_whi"),
            )
            touched = samples.join(F.broadcast(win), ["series_id", "ds_name"]).filter(
                # include the preceding sample for rate conversion
                F.col("ts") > F.col("_wlo") - lookback
            )
            clock = touched.groupBy("series_id", "ds_name").agg(
                (F.floor(F.max("ts") / d.step) * d.step).cast("double").alias("clock")
            )
            parts = []
            for ds in d.ds:
                if ds.dst == "COMPUTE":
                    continue
                pdp = pdp_table(
                    touched.filter(F.col("ds_name") == ds.name),
                    d.step,
                    ds.dst,
                    ds.heartbeat,
                    min_val=ds.min_val,
                    max_val=ds.max_val,
                    start=float(d.start) if d.start else None,
                    raw_col="raw" if "raw" in touched.columns else None,
                )
                parts.append(
                    consolidate(pdp, d.step, rra.pdp_cnt, rra.cf, rra.xff, clock=clock)
                )
            fresh = parts[0]
            for p in parts[1:]:
                fresh = fresh.unionByName(p)
            fresh = fresh.join(F.broadcast(win), ["series_id", "ds_name"]).filter(
                (F.col("ts") > F.col("_wlo")) & (F.col("ts") <= F.col("_whi"))
            ).select("series_id", "ds_name", "ts", "value")

            old = store._read(f"rra_{i}")
            if old is None:
                merged = fresh
            else:
                keep = old.join(F.broadcast(win), ["series_id", "ds_name"], "left").filter(
                    F.col("_wlo").isNull()
                    | (F.col("ts") <= F.col("_wlo"))
                    | (F.col("ts") > F.col("_whi"))
                ).select("series_id", "ds_name", "ts", "value")
                merged = keep.unionByName(fresh)
            # the store's overwrite is a snapshot commit: ``merged`` reads
            # the old snapshot while the new one is written, and readers
            # that resolved the manifest earlier keep their pinned snapshot
            # (MERGE-style transactional refresh; see DatasetStore._write)
            store._write(merged, f"rra_{i}", mode="overwrite")
        if any(rra.cf in store._HW_VALUE_COL for rra in d.rra):
            # the HW recurrence is sequential from the bootstrap, so the
            # table-state path recomputes the family from the full PDP
            # history (exact); the streaming-state variant that carries the
            # scratch incrementally is streaming/stateful.py's hw stage
            from rrdtool_1_x_spark.operators.pdp import pdp_table_multi

            store._rebuild_hw(
                pdp_table_multi(
                    samples, d.step, d.ds,
                    start=float(d.start) if d.start else None,
                )
            )

    # -- stream wiring --------------------------------------------------------
    def start(
        self,
        stream: DataFrame,
        checkpoint: str,
        trigger_seconds: int = 300,
    ):
        """Attach to a streaming DataFrame of raw readings.

        ``trigger_seconds`` ≙ rrdcached -w write interval (default 300 s,
        src/rrd_daemon.c:285); ``checkpoint`` ≙ the journal directory.
        """
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start()
        )


def rate_stream(
    spark: SparkSession,
    source: DataFrame,
) -> DataFrame:
    """Normalize an arbitrary event stream to the ingest schema
    (series_id, ds_name, ts, value)."""
    return source.select(
        F.col("series_id").cast("string"),
        F.col("ds_name").cast("string"),
        F.col("ts").cast("double"),
        F.col("value").cast("double"),
    )
