"""rrdcached command surface: FLUSH / FLUSHALL / PENDING / FORGET / QUEUE /
SUSPEND / RESUME / STATS over the streaming ingest.

Reference: the daemon's command handlers (src/rrd_daemon.c:1478-1626
flush/pending/forget/queue, :2838-2896 suspend/resume, :1426-1476 stats,
help text :3100-3177) and its per-file in-memory value cache
(``cache_tree``; flushed by age via the -w write interval,
src/rrd_daemon.c:285).

Mapping: one .rrd file ≙ one series of the dataset, so the per-file cache
tree becomes a per-series pending buffer in front of
``StreamingIngest.process_batch`` (which already enforces the daemon's
non-increasing-timestamp rejection and merges only touched rollup
windows). Commands operate per series exactly like the daemon's per-file
commands; a SUSPENDED series keeps caching updates in memory until RESUME,
matching the reference's CI_FLAGS_SUSPENDED behavior. The age-based write
thread is modeled by ``write_interval``: any update() first flushes series
whose oldest pending value has aged past it (the -w batching window).
"""

from __future__ import annotations

import time as _time

from pyspark.sql import SparkSession

from rrdtool_1_x_spark.sources.store import SAMPLE_SCHEMA
from rrdtool_1_x_spark.streaming.ingest import StreamingIngest


class IngestDaemon:
    def __init__(self, ingest: StreamingIngest, write_interval: float = 300.0):
        self.ingest = ingest
        self.write_interval = write_interval  # ≙ rrdcached -w
        # series_id -> list of (ds_name, ts, value) pending rows
        self._pending: dict[str, list[tuple]] = {}
        self._first_ts: dict[str, float] = {}  # wall-clock arrival of oldest
        self._suspended: set[str] = set()
        self.stats = {
            "updates_received": 0,
            "flush_received": 0,
            "data_sets_written": 0,
            "queue_length": 0,
        }

    @property
    def spark(self) -> SparkSession:
        return self.ingest.store.spark

    # -- UPDATE ---------------------------------------------------------------
    def update(self, series_id: str, rows: list[tuple]) -> str:
        """≙ the daemon's UPDATE: buffer (ds_name, ts, value) rows for one
        series, then age-flush anything past the write interval."""
        self.stats["updates_received"] += len(rows)
        buf = self._pending.setdefault(series_id, [])
        if not buf:
            self._first_ts[series_id] = _time.monotonic()
        buf.extend(rows)
        self._age_flush()
        return f"{len(rows)} errors, enqueued {len(rows)}"

    def _age_flush(self) -> None:
        now = _time.monotonic()
        due = [
            s
            for s, t0 in self._first_ts.items()
            if now - t0 >= self.write_interval and s not in self._suspended
        ]
        for s in due:
            self.flush(s)

    # -- FLUSH / FLUSHALL -----------------------------------------------------
    def flush(self, series_id: str) -> str:
        """≙ FLUSH <file>: write one series' pending values now."""
        self.stats["flush_received"] += 1
        rows = self._pending.pop(series_id, None)
        self._first_ts.pop(series_id, None)
        if not rows:
            return f"Nothing to flush: {series_id}."
        self._write(series_id, rows)
        return f"Successfully flushed {series_id}."

    def flush_all(self, include_suspended: bool = False) -> str:
        """≙ FLUSHALL: write every series' pending values (the reference's
        flush_old_values(-1) skips suspended files; so does this unless
        ``include_suspended``)."""
        for s in list(self._pending):
            if s in self._suspended and not include_suspended:
                continue
            self.flush(s)
        return "Started flush."

    def _write(self, series_id: str, rows: list[tuple]) -> None:
        df = self.spark.createDataFrame(
            [(series_id, d, float(t), None if v is None else float(v)) for d, t, v in rows],
            SAMPLE_SCHEMA,
        )
        self.ingest.process_batch(df)
        self.stats["data_sets_written"] += len(rows)

    # -- inspection -----------------------------------------------------------
    def pending(self, series_id: str) -> list[tuple]:
        """≙ PENDING <file>: the buffered updates of one series."""
        return list(self._pending.get(series_id, []))

    def queue(self) -> list[tuple[int, str]]:
        """≙ QUEUE: (pending-count, series) for every buffered series."""
        self.stats["queue_length"] = len(self._pending)
        return [(len(v), s) for s, v in self._pending.items() if v]

    # -- FORGET ---------------------------------------------------------------
    def forget(self, series_id: str) -> str:
        """≙ FORGET <file>: drop pending values without writing."""
        if self._pending.pop(series_id, None) is None:
            raise KeyError(f"No such series: {series_id}")
        self._first_ts.pop(series_id, None)
        return "Gone!"

    # -- SUSPEND / RESUME -----------------------------------------------------
    def suspend(self, series_id: str) -> str:
        """≙ SUSPEND <file>: cache in memory until RESUME."""
        if series_id in self._suspended:
            return f"{series_id} already suspended"
        self._suspended.add(series_id)
        return f"{series_id} suspended"

    def resume(self, series_id: str) -> str:
        """≙ RESUME <file>."""
        if series_id not in self._suspended:
            return f"{series_id} not suspended"
        self._suspended.discard(series_id)
        return f"{series_id} resumed"

    def suspend_all(self) -> str:
        for s in self._pending:
            self._suspended.add(s)
        return "Suspended all"

    def resume_all(self) -> str:
        self._suspended.clear()
        return "Resumed all"
