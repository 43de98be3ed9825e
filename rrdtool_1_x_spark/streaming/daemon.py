"""rrdcached command surface: FLUSH / FLUSHALL / PENDING / FORGET / QUEUE /
SUSPEND / RESUME / STATS over the streaming ingest — as an in-process
object (``IngestDaemon``) and over the wire (``DaemonServer``, the
reference's line protocol on a TCP socket).

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

import os as _os
import time as _time

from pyspark.sql import SparkSession

from rrdtool_1_x_spark.sources.store import SAMPLE_SCHEMA
from rrdtool_1_x_spark.streaming.ingest import StreamingIngest


class IngestDaemon:
    def __init__(
        self,
        ingest: StreamingIngest,
        write_interval: float = 300.0,
        journal_dir: str | None = None,
    ):
        """``journal_dir`` enables the write-ahead journal: every buffered
        UPDATE (and FORGET) is appended to an on-disk journal before it is
        acknowledged, and a restarting daemon replays outstanding journals
        back into its buffers (src/rrd_daemon.c:238-330 journal_write /
        journal_replay). Replay is idempotent the same way the reference's
        is: rows that already reached the store are rejected by the
        per-series non-increasing-timestamp rule on the next flush."""
        self.ingest = ingest
        self.write_interval = write_interval  # ≙ rrdcached -w
        # series_id -> list of (ds_name, ts, value) pending rows
        self._pending: dict[str, list[tuple]] = {}
        self._first_ts: dict[str, float] = {}  # wall-clock arrival of oldest
        self._suspended: set[str] = set()
        # series → StreamingIngest for sibling datasets (the reference
        # daemon fronts many .rrd files; see ingest_for)
        self._routes: dict[str, StreamingIngest] = {}
        self.stats = {
            "updates_received": 0,
            "flush_received": 0,
            "data_sets_written": 0,
            "journals_replayed": 0,
            "queue_length": 0,
        }
        self._journal_dir = journal_dir
        self._journal = None
        self._journal_seq = 0
        if journal_dir is not None:
            _os.makedirs(journal_dir, exist_ok=True)
            self._journal_replay()
            self._journal_open()

    # -- write-ahead journal --------------------------------------------------
    # File-per-generation like the reference's rrd.journal.<time> files;
    # a generation rotates out once every buffered value it covers has been
    # flushed (the reference's journal_rotate after flush_old_values).
    @staticmethod
    def _j_val(v) -> str:
        return "U" if v is None else repr(float(v))

    def _journal_open(self) -> None:
        self._journal_seq += 1
        path = f"{self._journal_dir}/rrd.journal.{self._journal_seq:08d}"
        self._journal = open(path, "a")

    def _journal_write(self, line: str) -> None:
        if self._journal is None:
            return
        self._journal.write(line + "\n")
        self._journal.flush()
        _os.fsync(self._journal.fileno())

    def _journal_files(self) -> list[str]:
        return sorted(
            f"{self._journal_dir}/{n}"
            for n in _os.listdir(self._journal_dir)
            if n.startswith("rrd.journal.")
        )

    def _journal_replay(self) -> None:
        """Re-buffer every journaled command, in write order. Updates that
        were flushed before the crash re-enter the buffer too; the ingest's
        monotonicity filter drops them at flush time — the same recovery
        contract as the reference (replayed updates hit rrd_update's
        'illegal attempt to update' rejection and are skipped)."""
        files = self._journal_files()
        for path in files:
            with open(path) as f:
                for raw in f:
                    parts = raw.rstrip("\n").split(" ")
                    if len(parts) < 2:
                        continue
                    cmd, series = parts[0], parts[1]
                    if cmd == "UPDATE":
                        rows = []
                        for tok in parts[2:]:
                            ds, ts, val = tok.split(":")
                            rows.append(
                                (ds, float(ts), None if val == "U" else float(val))
                            )
                        buf = self._pending.setdefault(series, [])
                        if not buf:
                            self._first_ts[series] = _time.monotonic()
                        buf.extend(rows)
                    elif cmd == "FORGET":
                        self._pending.pop(series, None)
                        self._first_ts.pop(series, None)
            self._journal_seq = max(
                self._journal_seq, int(path.rsplit(".", 1)[1])
            )
        self.stats["journals_replayed"] = len(files)

    def _journal_rotate(self) -> None:
        """Once nothing is buffered, everything journaled so far is durable
        in the store — start a fresh generation and drop the old files."""
        if self._journal is None or any(self._pending.values()):
            return
        self._journal.close()
        old = self._journal_files()
        self._journal_open()
        for path in old:
            try:
                _os.remove(path)
            except OSError:
                pass

    @property
    def spark(self) -> SparkSession:
        return self.ingest.store.spark

    # -- series → store routing ----------------------------------------------
    def ingest_for(self, series_id: str) -> StreamingIngest:
        """Resolve the wire protocol's <file> argument like rrdcached does
        (one daemon fronts many .rrd files, src/rrd_daemon.c cache_tree
        keyed by filename): a sibling dataset directory named after the
        series routes to its own ingest (created lazily, cached); any other
        name is a row-level series inside the primary store."""
        store = self.ingest.store
        if series_id and series_id != _os.path.basename(store.path):
            sib = _os.path.join(_os.path.dirname(store.path), series_id)
            if _os.path.exists(_os.path.join(sib, "meta.json")):
                ing = self._routes.get(series_id)
                if ing is None:
                    from rrdtool_1_x_spark.sources.store import DatasetStore

                    ing = StreamingIngest(DatasetStore(store.spark, sib))
                    self._routes[series_id] = ing
                return ing
        return self.ingest

    def store_for(self, series_id: str):
        return self.ingest_for(series_id).store

    # -- UPDATE ---------------------------------------------------------------
    def update(self, series_id: str, rows: list[tuple]) -> str:
        """≙ the daemon's UPDATE: buffer (ds_name, ts, value) rows for one
        series, then age-flush anything past the write interval."""
        self.stats["updates_received"] += len(rows)
        self._journal_write(
            f"UPDATE {series_id} "
            + " ".join(f"{d}:{t}:{self._j_val(v)}" for d, t, v in rows)
        )
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
        self._journal_rotate()
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
        self.ingest_for(series_id).process_batch(df)
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
        self._journal_write(f"FORGET {series_id}")
        self._journal_rotate()
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


class DaemonServer:
    """The rrdcached network protocol over a TCP socket.

    Line protocol and response framing follow the reference
    (src/rrd_daemon.c:479-545 ``send_response``, command table
    :3100-3177): every reply starts with a status line ``<code> <message>``
    where a non-negative code is the number of detail lines that follow and
    a negative code is an error. Commands mirror the daemon's:

    UPDATE <series> <ts:v1[:v2...]>... / FLUSH / FLUSHALL / PENDING /
    FORGET / QUEUE / STATS / SUSPEND / RESUME / SUSPENDALL / RESUMEALL /
    BATCH (dot-terminated, src/rrd_daemon.c:2904-2960) /
    FETCH <series> <CF> [start [end]] (text variant, :3080-3092 — the
    header lines Start/End/Step/DSCount/DSName then one ``ts: v...`` row
    per step) / HELP / QUIT.

    Concurrency: the listener is a threading TCP server (the reference
    runs a listen-thread pool over one shared cache tree,
    src/rrd_daemon.c:2993-3056); all command execution is serialized on one
    lock because the underlying ``IngestDaemon`` buffers aren't
    thread-safe — correct first, and the Spark write it fronts is the real
    cost. FETCH serves from ``DatasetStore.fetch_local`` (driver-side
    pyarrow — the daemon answers human-scale windows, not cluster scans).
    """

    def __init__(
        self,
        daemon: IngestDaemon,
        host: str = "127.0.0.1",
        port: int = 0,
        unix_path: str | None = None,
        flush_timer: bool = True,
    ):
        """``unix_path`` switches to a UNIX-domain socket — the reference
        daemon's default transport (rrdcached -l unix:/path,
        src/rrd_daemon.c listen-socket setup); TCP host:port otherwise.

        ``flush_timer`` runs the reference's age-based write thread
        (flush_old_values on the -w interval, src/rrd_daemon.c:1070-1140):
        values older than ``daemon.write_interval`` flush even when no
        further commands arrive. Ticks take the command lock, so timer
        flushes and client commands never interleave."""
        import socketserver
        import threading

        self.daemon = daemon
        self._lock = threading.Lock()
        self._flush_timer = flush_timer
        self._stop_evt = threading.Event()
        outer = self

        class _Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                while True:
                    raw = self.rfile.readline()
                    if not raw:
                        return
                    line = raw.decode("utf-8", "replace").strip()
                    if not line:
                        continue
                    if line.split()[0].upper() == "BATCH":
                        # the go-ahead MUST be written before reading the
                        # batched lines (the client waits for it); only the
                        # execution itself takes the lock
                        self.wfile.write(
                            outer._reply(
                                0, "Go ahead.  End with dot '.' on its own line."
                            ).encode()
                        )
                        self.wfile.flush()
                        batch: list[str] = []
                        while True:
                            braw = self.rfile.readline()
                            if not braw:
                                return
                            bline = braw.decode("utf-8", "replace").strip()
                            if bline == ".":
                                break
                            if bline:
                                batch.append(bline)
                        with outer._lock:
                            reply = outer._batch(batch)
                        self.wfile.write(reply.encode())
                        self.wfile.flush()
                        continue
                    with outer._lock:
                        quit_, reply = outer._dispatch(line)
                    # FETCHBIN replies carry raw binary sections
                    self.wfile.write(
                        reply if isinstance(reply, bytes) else reply.encode()
                    )
                    self.wfile.flush()
                    if quit_:
                        return

        if unix_path is not None:

            class _Server(socketserver.ThreadingUnixStreamServer):
                daemon_threads = True

            self._server = _Server(unix_path, _Handler)
        else:

            class _Server(socketserver.ThreadingTCPServer):
                allow_reuse_address = True
                daemon_threads = True

            self._server = _Server((host, port), _Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    # -- lifecycle ------------------------------------------------------------
    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address

    def start(self) -> "DaemonServer":
        self._thread.start()
        if self._flush_timer:
            import threading

            def tick() -> None:
                # poll at a fraction of the write interval (the reference's
                # thread sleeps until the next file is due); bounded so
                # tests with tiny intervals stay responsive
                period = min(max(self.daemon.write_interval / 10.0, 0.2), 30.0)
                while not self._stop_evt.wait(period):
                    with self._lock:
                        try:
                            self.daemon._age_flush()
                        except Exception:
                            pass  # a failed flush must not kill the timer

            self._timer = threading.Thread(target=tick, daemon=True)
            self._timer.start()
        return self

    def stop(self) -> None:
        self._stop_evt.set()
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "DaemonServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- protocol -------------------------------------------------------------
    @staticmethod
    def _reply(code: int, msg: str, lines: list[str] | None = None) -> str:
        body = "".join(f"{ln}\n" for ln in (lines or []))
        return f"{code} {msg}\n{body}"

    def _dispatch(self, line: str) -> tuple[bool, str]:
        parts = line.split()
        cmd, args = parts[0].upper(), parts[1:]
        try:
            if cmd == "QUIT":
                return True, ""
            return False, self._command(cmd, args)
        except KeyError as e:
            return False, self._reply(-1, str(e).strip("'\""))
        except Exception as e:  # malformed input must not kill the listener
            return False, self._reply(-1, f"{type(e).__name__}: {e}")

    def _command(self, cmd: str, args: list[str]) -> str:
        d = self.daemon
        if cmd == "UPDATE":
            if len(args) < 2:
                return self._reply(-1, "Usage: UPDATE <series> <values> [<values> ...]")
            rows = self._parse_updates(args[0], args[1:])
            d.update(args[0], rows)
            return self._reply(0, "errors, enqueued {}".format(len(rows)))
        if cmd == "CREATE":
            # ≙ handle_request_create (src/rrd_daemon.c:3119-3178): parse
            # <file> [-b start] [-s step] [-O] DS:... RRA:... and run
            # rrd_create. The dataset lands as a sibling of the primary
            # store, where LIST finds it and ingest_for routes to it.
            from rrdtool_1_x_spark.cli import cmd_create

            if not args or not any(a.startswith("DS:") for a in args[1:]):
                return self._reply(
                    -1, "Usage: CREATE <series> [-b start] [-s step] [-O] DS:... RRA:..."
                )
            name = args[0]
            base = _os.path.dirname(d.ingest.store.path.rstrip("/"))
            # a freshly created dataset must not absorb updates buffered
            # under its name before it existed, nor reuse a stale route
            d._pending.pop(name, None)
            d._first_ts.pop(name, None)
            d._routes.pop(name, None)
            cmd_create([_os.path.join(base, name)] + args[1:])
            return self._reply(0, "RRD created OK")
        if cmd == "FLUSH":
            return self._reply(0, d.flush(args[0]))
        if cmd == "FLUSHALL":
            return self._reply(0, d.flush_all())
        if cmd == "PENDING":
            lines = self._pending_lines(args[0])
            return self._reply(len(lines), "updates pending", lines)
        if cmd == "FORGET":
            return self._reply(0, d.forget(args[0]))
        if cmd == "QUEUE":
            q = [f"{n} {s}" for n, s in d.queue()]
            return self._reply(len(q), "in queue.", q)
        if cmd == "STATS":
            st = [f"{k}: {v}" for k, v in d.stats.items()]
            return self._reply(len(st), "Statistics follow", st)
        if cmd == "SUSPEND":
            return self._reply(0, d.suspend(args[0]))
        if cmd == "RESUME":
            return self._reply(0, d.resume(args[0]))
        if cmd == "SUSPENDALL":
            return self._reply(0, d.suspend_all())
        if cmd == "RESUMEALL":
            return self._reply(0, d.resume_all())
        if cmd == "DUMP":
            # ≙ handle_request_dump (src/rrd_daemon.c:2992-2996): flush the
            # series, then stream the reference-format XML dump as the
            # reply body
            import os
            import tempfile

            from rrdtool_1_x_spark.sources.rrdxml import dump_xml

            if not args:
                return self._reply(-1, "Usage: DUMP <series>")
            d.flush(args[0])
            fd, tmp = tempfile.mkstemp(suffix=".xml")
            os.close(fd)
            try:
                dump_xml(d.store_for(args[0]), tmp, series_id=args[0])
                with open(tmp) as f:
                    lines = f.read().splitlines()
            finally:
                os.remove(tmp)
            return self._reply(len(lines), "XML dump follows", lines)
        if cmd == "TUNE":
            # ≙ the daemon's TUNE (src/rrd_daemon.c command table wrapping
            # rrd_tune): flush the series, then apply the tune argv to the
            # store through the CLI's parser — same grammar both ways
            from rrdtool_1_x_spark.cli import cmd_tune

            if not args:
                return self._reply(-1, "Usage: TUNE <series> <options>")
            d.flush(args[0])
            target = d.store_for(args[0])
            rc = cmd_tune([target.path] + args[1:])
            if rc != 0:
                return self._reply(-1, "tune failed")
            # cmd_tune rewrote meta.json through a fresh store; reload it
            # here or subsequent UPDATEs parse against the stale DS list
            # (writing rows under renamed/removed ds_names, invisible to
            # fetch)
            target.reload_meta()
            return self._reply(0, "Tuned.")
        if cmd == "PING":
            # ≙ handle_request_ping (src/rrd_daemon.c:3328)
            return self._reply(0, "PONG")
        if cmd == "FIRST":
            # ≙ handle_request_first (src/rrd_daemon.c:2400-2416): series
            # plus an optional RRA index
            idx = int(args[1]) if len(args) > 1 else 0
            st = d.store_for(args[0]) if args else d.ingest.store
            return self._reply(0, str(st.first(idx)))
        if cmd == "LAST":
            # ≙ handle_request_last: flush pending, then the newest time
            d.flush(args[0]) if args else None
            st = d.store_for(args[0]) if args else d.ingest.store
            return self._reply(0, str(st.last()))
        if cmd == "FETCH":
            return self._fetch(args)
        if cmd == "FETCHBIN":
            return self._fetchbin(args)
        if cmd == "LIST":
            # ≙ the daemon's LIST [RECURSIVE] (src/rrd_daemon.c:2655-2700
            # wrapping rrd_list): datasets under the store's root directory
            import os

            from rrdtool_1_x_spark.sources.store import list_datasets

            recursive = bool(args) and args[0].upper() == "RECURSIVE"
            names = list_datasets(
                os.path.dirname(d.ingest.store.path.rstrip("/")),
                recursive=recursive,
            )
            return self._reply(len(names), "datasets", names)
        if cmd == "INFO":
            st = d.store_for(args[0]) if args else d.ingest.store
            info = [f"{k} = {v}" for k, v in st.info().items()]
            return self._reply(len(info), "Info follows", info)
        if cmd == "HELP":
            cmds = (
                "UPDATE CREATE FLUSH FLUSHALL PENDING FORGET QUEUE STATS "
                "SUSPEND RESUME SUSPENDALL RESUMEALL BATCH FETCH FETCHBIN "
                "LIST INFO FIRST LAST PING TUNE DUMP HELP QUIT"
            ).split()
            return self._reply(len(cmds), "Command overview", cmds)
        return self._reply(-1, f"Unknown command: {cmd}")

    def _parse_updates(self, series_id: str, values: list[str]) -> list[tuple]:
        """``<ts:v1[:v2...]>`` update strings → (ds_name, ts, value) rows
        in the target dataset's DS order (the reference's update value
        grammar, src/rrd_update.c:701-760; 'U' is unknown)."""
        ds_names = [ds.name for ds in self.daemon.store_for(series_id).dataset.ds]
        rows: list[tuple] = []
        for v in values:
            fields = v.split(":")
            # 'N' means now, like rrd_update's at-time shorthand
            ts = _time.time() if fields[0].upper() == "N" else float(fields[0])
            vals = fields[1:]
            if len(vals) != len(ds_names):
                # the reference daemon rejects a mismatched reading count
                # ("expected %i data source readings", handle_request_update)
                raise ValueError(
                    f"expected {len(ds_names)} data source readings (got "
                    f"{len(vals)}) in {v!r}"
                )
            for name, sval in zip(ds_names, vals):
                rows.append((name, ts, None if sval.upper() == "U" else float(sval)))
        return rows

    def _pending_lines(self, series_id: str) -> list[str]:
        """Buffered updates re-serialized as ``ts:v...`` lines (one per
        distinct timestamp, values in DS order — PENDING's reply shape,
        src/rrd_daemon.c:1551-1578)."""
        ds_order = {
            ds.name: i
            for i, ds in enumerate(self.daemon.store_for(series_id).dataset.ds)
        }
        by_ts: dict[float, dict[int, str]] = {}
        for ds_name, ts, val in self.daemon.pending(series_id):
            s = "U" if val is None else repr(float(val))
            by_ts.setdefault(ts, {})[ds_order[ds_name]] = s
        lines = []
        for ts in sorted(by_ts):
            vals = [by_ts[ts].get(i, "U") for i in range(len(ds_order))]
            lines.append(f"{ts:.0f}:" + ":".join(vals[: max(by_ts[ts]) + 1]))
        return lines

    def _fetch_parse(self, args: list[str]):
        """Shared FETCH/FETCHBIN parse (handle_request_fetch_parse,
        src/rrd_daemon.c:1989-2173): series, CF, optional start/end,
        optional DS-name column selection; flush-before-read; returns the
        pivoted frame plus plan."""
        series, cf = args[0], args[1].upper()
        store = self.daemon.store_for(series)
        last = store.last()
        end = int(float(args[3])) if len(args) > 3 else last
        start = int(float(args[2])) if len(args) > 2 else end - 3600
        all_ds = [ds.name for ds in store.dataset.ds]
        fields = args[4:] or all_ds
        for f in fields:
            if f not in all_ds:
                raise KeyError(f"field {f} not found")
        # the reference daemon flushes the file before serving FETCH
        # (src/rrd_daemon.c:3084: flush_file before rrd_fetch_r)
        self.daemon.flush(series)
        # series pushdown: on a bucketed layout this prunes to one pbucket
        pdf, plan = store.fetch_local(cf, start, end, series_id=series)
        wide = pdf.pivot_table(
            index="ts", columns="ds_name", values="value", dropna=False
        )
        return wide, plan, fields

    @staticmethod
    def _fetch_header(plan, n_fields: int) -> list[str]:
        return [
            "FlushVersion: 1",
            f"Start: {plan.start}",
            f"End: {plan.end}",
            f"Step: {plan.step}",
            f"DSCount: {n_fields}",
        ]

    def _fetch(self, args: list[str]) -> str:
        if len(args) < 2:
            return self._reply(-1, "Usage: FETCH <series> <CF> [start [end] [ds...]]")
        wide, plan, fields = self._fetch_parse(args)
        header = self._fetch_header(plan, len(fields))
        header.append("DSName: " + " ".join(fields))
        rows = []
        for ts, r in wide.iterrows():
            # reference row format: "%10lu:" then " %0.17e" per value
            # (handle_request_fetch, src/rrd_daemon.c:2196-2206); unknown
            # prints as nan like the C printf of DNAN
            vals = " ".join(
                f"{(float('nan') if _isnan(r.get(n)) else float(r.get(n))):.17e}"
                for n in fields
            )
            rows.append(f"{int(ts):10d}: {vals}")
        lines = header + rows
        return self._reply(len(lines), f"Success (rows: {len(rows)})", lines)

    def _fetchbin(self, args: list[str]) -> bytes:
        """FETCHBIN: header lines then, per DS, one
        ``DSName-<name>: BinaryData <records> <rsize> <endian>`` line
        followed by the raw doubles and a newline (add_binary_response_info
        src/rrd_daemon.c:783-810, handle_request_fetchbin :2221-2275)."""
        import struct
        import sys

        if len(args) < 2:
            return self._reply(-1, "Usage: FETCHBIN <series> <CF> [start [end] [ds...]]").encode()
        wide, plan, fields = self._fetch_parse(args)
        grid = list(range(plan.start + plan.step, plan.end + plan.step, plan.step))
        endian = "BIG" if sys.byteorder == "big" else "LITTLE"
        out = [self._reply(len(fields) + 5, "Success").encode()]
        for ln in self._fetch_header(plan, len(fields)):
            out.append((ln + "\n").encode())
        for name in fields:
            col = wide[name] if name in wide.columns else None
            vals = [
                float("nan")
                if col is None or t not in wide.index or _isnan(col.get(t))
                else float(col.get(t))
                for t in grid
            ]
            out.append(
                f"DSName-{name}: BinaryData {len(vals)} 8 {endian}\n".encode()
            )
            out.append(struct.pack(f"<{len(vals)}d" if endian == "LITTLE" else f">{len(vals)}d", *vals))
            out.append(b"\n")
        return b"".join(out)

    def _batch(self, pending: list[str]) -> str:
        """BATCH execution: the dot-terminated command list, one combined
        error report with 1-based line indices (src/rrd_daemon.c:2904-2960).
        The handler has already sent the go-ahead and collected the lines —
        sending it before reading is what makes the protocol deadlock-free."""
        # the reference daemon only accepts update-ish commands in batch
        # context (its command table marks batchable entries); FETCH/FETCHBIN
        # replies aren't line-framed (FETCHBIN is raw bytes) so they must be
        # rejected per-line, not executed
        _unbatchable = {"BATCH", "FETCH", "FETCHBIN", "QUIT", "HELP"}
        errors: list[str] = []
        for i, cmdline in enumerate(pending, start=1):
            parts = cmdline.split()
            cmd = parts[0].upper()
            if cmd in _unbatchable:
                errors.append(f"{i} Command is not valid inside batch: {cmd}")
                continue
            try:
                reply = self._command(cmd, parts[1:])
            except Exception as e:
                reply = self._reply(-1, str(e))
            if reply.startswith("-"):
                errors.append(f"{i} {reply.split(' ', 1)[1].strip()}")
        return self._reply(len(errors), "errors", errors)


class DaemonClient:
    """Client side of the wire protocol ≙ librrd's rrdc_* functions
    (src/rrd_client.c: rrdc_connect :478-568, rrdc_update :1284-1340,
    rrdc_fetch :198-420, rrdc_flush :1046-1070). Addresses use the
    reference grammar: ``unix:/path`` (or a bare path starting with /)
    for a UNIX socket, ``host[:port]`` for TCP."""

    def __init__(self, addr: str, timeout: float = 30.0):
        import socket

        if addr.startswith("unix:") or addr.startswith("/"):
            path = addr[5:] if addr.startswith("unix:") else addr
            self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self.sock.settimeout(timeout)
            self.sock.connect(path)
        else:
            host, _, port = addr.rpartition(":")
            if not host:
                host, port = addr, "42217"  # the reference's default port
            self.sock = socket.create_connection((host, int(port)), timeout=timeout)
        self._f = self.sock.makefile("rwb")

    def close(self) -> None:
        try:
            self._f.write(b"QUIT\n")
            self._f.flush()
        except OSError:
            pass
        self._f.close()
        self.sock.close()

    def __enter__(self) -> "DaemonClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def command(self, line: str) -> tuple[int, str, list[str]]:
        """Send one command, read the ``<code> <message>`` framed reply
        (negative code raises, like rrdc_command's status handling)."""
        self._f.write((line + "\n").encode())
        self._f.flush()
        status = self._f.readline().decode().rstrip("\n")
        code_s, _, msg = status.partition(" ")
        code = int(code_s)
        if code < 0:
            raise RuntimeError(f"rrdcached: {msg}")
        lines = [self._f.readline().decode().rstrip("\n") for _ in range(code)]
        return code, msg, lines

    # -- the rrdc_* surface the CLI routes through ----------------------------
    def update(self, series: str, value_specs: list[str]) -> None:
        """≙ rrdc_update: ship the raw ``ts:v[:v...]`` strings."""
        self.command(f"UPDATE {series} " + " ".join(value_specs))

    def flush(self, series: str) -> None:
        """≙ rrdc_flush."""
        self.command(f"FLUSH {series}")

    def fetch(
        self, series: str, cf: str, start: int | None = None, end: int | None = None
    ):
        """≙ rrdc_fetch: returns (start, end, step, ds_names, rows) where
        rows is ``[(ts, {ds: value})]`` parsed from the daemon's text
        framing (Start/End/Step/DSCount/DSName headers then ts: v... rows,
        src/rrd_daemon.c:3080-3092)."""
        cmd = f"FETCH {series} {cf}"
        if start is not None:
            cmd += f" {start}"
            if end is not None:
                cmd += f" {end}"
        _, _, lines = self.command(cmd)
        hdr: dict[str, str] = {}
        rows: list[tuple[int, dict[str, float]]] = []
        ds_names: list[str] = []
        for ln in lines:
            key, _, rest = ln.partition(":")
            if key in ("FlushVersion", "Start", "End", "Step", "DSCount"):
                hdr[key] = rest.strip()
            elif key == "DSName":
                ds_names = rest.split()
            else:
                vals = [float(v) for v in rest.split()]
                rows.append((int(key), dict(zip(ds_names, vals))))
        return (
            int(hdr["Start"]), int(hdr["End"]), int(hdr["Step"]), ds_names, rows
        )


def _isnan(x) -> bool:
    import math

    try:
        return x is None or math.isnan(float(x))
    except (TypeError, ValueError):
        return True
