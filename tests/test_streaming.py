"""Streaming ingest ≙ rrdcached (fixture F7): micro-batched ingestion must
produce rollups identical to a one-shot batch load, and late rows are
rejected per series."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.catalog import DSDef, RRADef, create
from rrdtool_1_x_spark.sources.store import DatasetStore
from rrdtool_1_x_spark.streaming.ingest import StreamingIngest

UPDATES = [
    (920804700, 12345), (920805000, 12357), (920805300, 12363), (920805600, 12363),
    (920805900, 12363), (920806200, 12373), (920806500, 12383), (920806800, 12393),
    (920807100, 12399), (920807400, 12405), (920807700, 12411), (920808000, 12415),
    (920808300, 12420), (920808600, 12422), (920808900, 12423),
]
SCHEMA = "series_id string, ds_name string, ts double, value double"


def _dataset():
    return create(
        "speed",
        step=300,
        ds=[DSDef(name="speed", dst="COUNTER", heartbeat=600)],
        rra=[
            RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=24),
            RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=6, row_cnt=10),
        ],
        start=920804400,
    )


def _rows(spark, updates):
    return spark.createDataFrame(
        [("speed", "speed", float(t), float(v)) for t, v in updates], SCHEMA
    )


def _rollup_map(store, i):
    return {
        (r["series_id"], r["ds_name"], r["ts"]): round(r["value"], 12)
        for r in store._read(f"rra_{i}").collect()
    }


def test_microbatch_equals_batch(spark, tmp_path):
    batch_store = DatasetStore.create(spark, str(tmp_path / "batch"), _dataset())
    batch_store.update(_rows(spark, UPDATES))

    stream_store = DatasetStore.create(spark, str(tmp_path / "stream"), _dataset())
    ing = StreamingIngest(stream_store)
    for lo in range(0, len(UPDATES), 4):  # 4 samples per micro-batch
        ing.process_batch(_rows(spark, UPDATES[lo : lo + 4]), lo)

    for i in range(2):
        assert _rollup_map(stream_store, i) == _rollup_map(batch_store, i), f"rra_{i}"


def test_concurrent_reader_during_refresh(spark, tmp_path):
    """Snapshot isolation: a DataFrame resolved before an incremental
    refresh keeps reading its pinned (immutable) snapshot while and after
    new versions commit; a fresh read sees the new data."""
    store = DatasetStore.create(spark, str(tmp_path / "txn"), _dataset())
    ing = StreamingIngest(store)
    ing.process_batch(_rows(spark, UPDATES[:8]))
    pinned = store._read("rra_0")
    rows_before = pinned.count()
    # refreshes within the snapshot-retention window (each a commit that
    # supersedes rra_0): the pinned reader still scans its old snapshot —
    # same rows, no FAILED_READ from an in-place rewrite
    for k, lo in enumerate(range(8, len(UPDATES), 2)):
        ing.process_batch(_rows(spark, UPDATES[lo : lo + 2]), lo)
        if k < store.KEEP_SNAPSHOTS - 1:
            assert pinned.count() == rows_before
    fresh = store._read("rra_0")
    assert fresh.count() > rows_before
    # the manifest advanced and old snapshots were expired to the cap
    import json
    import os

    with open(f"{store.path}/rra_0/_MANIFEST") as f:
        ver = json.load(f)["version"]
    assert ver >= 2
    kept = os.listdir(f"{store.path}/rra_0/_v")
    assert len(kept) <= store.KEEP_SNAPSHOTS


def test_late_rows_rejected(spark, tmp_path):
    store = DatasetStore.create(spark, str(tmp_path / "late"), _dataset())
    ing = StreamingIngest(store)
    ing.process_batch(_rows(spark, UPDATES[:8]))
    head = store.last()
    # replay old rows + a duplicate: all must be dropped
    ing.process_batch(_rows(spark, [(920805000, 99999), (920806800, 1)]))
    assert store.last() == head
    assert store._read("samples").count() == 8
    # a genuinely new row still lands
    ing.process_batch(_rows(spark, [UPDATES[8]]))
    assert store._read("samples").count() == 9


def test_real_stream_available_now(spark, tmp_path):
    """End-to-end writeStream path with a file source and AvailableNow."""
    src = tmp_path / "incoming"
    src.mkdir()
    _rows(spark, UPDATES).coalesce(1).write.json(str(src / "b1"))
    store = DatasetStore.create(spark, str(tmp_path / "ds"), _dataset())
    ing = StreamingIngest(store)
    stream = (
        spark.readStream.schema(SCHEMA).json(str(src / "b1"))
    )
    q = (
        stream.writeStream.foreachBatch(ing.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert store._read("samples").count() == len(UPDATES)
    got = {r["ts"]: r["value"] for r in store._read("rra_0").collect()}
    assert round(got[920805000.0], 9) == 0.04


def test_partitioned_store_roundtrip(spark, tmp_path):
    """partition_by_day=True: day-partitioned parquet layout (partition
    pruning for time-range fetches) must behave identically."""
    store = DatasetStore.create(
        spark, str(tmp_path / "pd"), _dataset(), partition_by_day=True
    )
    store.update(_rows(spark, UPDATES))
    import os

    days = [d for d in os.listdir(str(tmp_path / "pd" / "samples")) if d.startswith("pday=")]
    assert days, "expected pday= partition directories"
    df, plan = store.fetch("AVERAGE", 920804400, 920808900, 300)
    got = {int(r["ts"]): r["value"] for r in df.collect()}
    assert round(got[920805000], 9) == 0.04


def test_bucketed_partitioned_store_pruning(spark, tmp_path):
    """(series bucket, day) layout: the persisted layout survives reopen,
    fetch results are identical to the flat layout, and the plans/readers
    actually PRUNE — PartitionFilters on pday in the Spark scan, one
    pbucket fragment set for the daemon's single-series pyarrow read."""
    import os

    flat = DatasetStore.create(spark, str(tmp_path / "flat"), _dataset())
    part = DatasetStore.create(
        spark, str(tmp_path / "part"), _dataset(),
        partition_by_day=True, series_buckets=4,
    )
    rows = [
        (sid, "speed", float(t), float(v))
        for sid in ("s1", "s2", "s3")
        for t, v in UPDATES
    ]
    for st in (flat, part):
        st.update(spark.createDataFrame(rows, SCHEMA))

    # layout: pbucket is the leading level, pday nested under it
    top = os.listdir(str(tmp_path / "part" / "samples"))
    assert any(d.startswith("pbucket=") for d in top)
    b0 = [d for d in top if d.startswith("pbucket=")][0]
    assert any(
        d.startswith("pday=")
        for d in os.listdir(str(tmp_path / "part" / "samples" / b0))
    )

    # a REOPENED store must keep the layout (layout.json round-trip)
    reopened = DatasetStore(spark, str(tmp_path / "part"))
    assert reopened.partition_by_day and reopened.series_buckets == 4

    # distributed fetch: identical rows, and the scan plan prunes on pday
    a, _ = flat.fetch("AVERAGE", 920804400, 920808900, 300)
    b, _ = reopened.fetch("AVERAGE", 920804400, 920808900, 300)
    key = lambda df: {
        (r["series_id"], r["ts"]): r["value"] for r in df.collect()
    }
    assert key(a) == key(b)
    plan_txt = b._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_txt and "pday" in plan_txt

    # fetch_local with series pushdown: same rows as the flat read
    pa, _ = flat.fetch_local("AVERAGE", 920804400, 920808900)
    pa = pa[pa["series_id"] == "s2"]
    pb, _ = reopened.fetch_local(
        "AVERAGE", 920804400, 920808900, series_id="s2"
    )
    import math

    norm = lambda v: None if (isinstance(v, float) and math.isnan(v)) else v
    ka = {(r.series_id, r.ts): norm(r.value) for r in pa.itertuples()}
    kb = {(r.series_id, r.ts): norm(r.value) for r in pb.itertuples()}
    assert ka == kb and len(kb) > 0


def test_store_materializes_hw_archives(spark, tmp_path):
    """A store holding Holt-Winters RRAs materializes them on update, so
    ``fetch HWPREDICT/SEASONAL/DEVPREDICT/FAILURES`` serves rows like the
    reference (the RRA loop in rrd_update maintains aberrant archives,
    src/rrd_hw_update.c:38-475) — values identical to a direct hw_predict
    run with the header's parameters; incremental ingest stays consistent."""
    from rrdtool_1_x_spark.operators.hw import fnv32, hw_predict
    from rrdtool_1_x_spark.operators.pdp import pdp_table

    period = 12
    ds = create(
        "hws",
        step=300,
        ds=[DSDef(name="v", dst="GAUGE", heartbeat=600)],
        rra=[
            RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=500),
            RRADef(cf="HWPREDICT", pdp_cnt=1, row_cnt=500,
                   params={"alpha": 0.1, "beta": 0.0035, "period": period}),
            RRADef(cf="SEASONAL", pdp_cnt=1, row_cnt=period,
                   params={"gamma": 0.1}),
            RRADef(cf="DEVSEASONAL", pdp_cnt=1, row_cnt=period,
                   params={"gamma": 0.1}),
            RRADef(cf="DEVPREDICT", pdp_cnt=1, row_cnt=500),
            RRADef(cf="FAILURES", pdp_cnt=1, row_cnt=9,
                   params={"threshold": 7, "window": 9}),
        ],
        start=920804400,
    )
    st = DatasetStore.create(spark, str(tmp_path / "hws"), ds)
    import math

    n = period * 6
    rows = [
        ("hws", "v", float(920804400 + 300 * (i + 1)),
         50.0 + 10.0 * math.sin(2 * math.pi * i / period))
        for i in range(n)
    ]
    st.update(spark.createDataFrame(rows, SCHEMA))

    # direct operator run with the same header parameters
    raw = spark.createDataFrame(rows, SCHEMA)
    pdp = pdp_table(
        raw, 300, "GAUGE", 600.0, keys=("series_id", "ds_name"),
        start=920804400.0,
    )
    want_df = hw_predict(
        pdp, alpha=0.1, beta=0.0035, gamma=0.1, period=period,
        threshold=7, window_len=9,
        smooth_idx=fnv32("hws") % period,
        keys=("series_id", "ds_name"), step=300.0, start=920804400.0,
    )
    want = {int(r["ts"]): r for r in want_df.collect()}

    end = 920804400 + 300 * n
    for cf, col in [("HWPREDICT", "prediction"), ("SEASONAL", "seasonal"),
                    ("DEVPREDICT", "devpredict"), ("FAILURES", "failures")]:
        df, _ = st.fetch(cf, 920804400, end - 1, 300, pad=False)
        got = {int(r["ts"]): r["value"] for r in df.collect()}
        assert got, f"{cf}: no rows materialized"
        for ts, v in got.items():
            wv = want[ts][col]
            assert wv is not None and abs(v - wv) < 1e-9, (cf, ts, v, wv)

    # incremental streaming ingest keeps the HW archives current
    extra = [
        ("hws", "v", float(end + 300 * (i + 1)), 50.0 + i)
        for i in range(3)
    ]
    StreamingIngest(st).process_batch(spark.createDataFrame(extra, SCHEMA))
    df, _ = st.fetch("HWPREDICT", end, end + 900, 300, pad=False)
    assert df.count() == 3


def test_daemon_command_surface(spark, tmp_path):
    """rrdcached command parity (src/rrd_daemon.c:1478-1626, 2838-2896):
    FLUSH/FLUSHALL/PENDING/FORGET/QUEUE/SUSPEND/RESUME over the buffered
    ingest."""
    import pytest as _pytest

    from rrdtool_1_x_spark.streaming.daemon import IngestDaemon

    store = DatasetStore.create(spark, str(tmp_path / "d"), _dataset())
    d = IngestDaemon(StreamingIngest(store), write_interval=1e9)

    rows = [("speed", float(t), float(v)) for t, v in UPDATES[:6]]
    d.update("speed_ds", rows[:4])
    d.update("other_ds", [("speed", 920805000.0, 1.0)])
    # PENDING/QUEUE inspect the buffer; nothing written yet
    assert len(d.pending("speed_ds")) == 4
    assert sorted(d.queue()) == [(1, "other_ds"), (4, "speed_ds")]
    assert store._read("samples") is None

    # FLUSH one series writes it through the ingest
    assert d.flush("speed_ds").startswith("Successfully flushed")
    assert store._read("samples").filter(F.col("series_id") == "speed_ds").count() == 4
    assert d.pending("speed_ds") == []
    assert d.flush("speed_ds") == "Nothing to flush: speed_ds."

    # SUSPEND caches through FLUSHALL until RESUME
    d.update("speed_ds", rows[4:6])
    assert d.suspend("speed_ds") == "speed_ds suspended"
    assert d.suspend("speed_ds") == "speed_ds already suspended"
    d.flush_all()
    assert len(d.pending("speed_ds")) == 2  # suspended: still cached
    assert store._read("samples").filter(F.col("series_id") == "other_ds").count() == 1
    assert d.resume("speed_ds") == "speed_ds resumed"
    d.flush_all()
    assert store._read("samples").filter(F.col("series_id") == "speed_ds").count() == 6

    # FORGET drops without writing
    d.update("tmp_ds", [("speed", 920805300.0, 2.0)])
    assert d.forget("tmp_ds") == "Gone!"
    with _pytest.raises(KeyError):
        d.forget("tmp_ds")
    assert store._read("samples").filter(F.col("series_id") == "tmp_ds").count() == 0

    # late rows still rejected by the ingest underneath (daemon semantics)
    head = store.last()
    d.update("speed_ds", [("speed", 920805000.0, 99.0)])
    d.flush("speed_ds")
    assert store.last() == head
    assert d.stats["updates_received"] == 9


def test_daemon_journal_replay(spark, tmp_path):
    """Write-ahead journal crash recovery (src/rrd_daemon.c:238-330): kill
    the daemon mid-buffer, restart over the same journal dir, and no
    buffered update is lost — while replay of already-flushed rows stays
    idempotent via the ingest's monotonicity rejection."""
    import os

    from rrdtool_1_x_spark.streaming.daemon import IngestDaemon

    jdir = str(tmp_path / "journal")
    store = DatasetStore.create(spark, str(tmp_path / "d"), _dataset())
    d = IngestDaemon(StreamingIngest(store), write_interval=1e9, journal_dir=jdir)
    rows = [("speed", float(t), float(v)) for t, v in UPDATES[:6]]

    # flushed data rotates the journal: the old generation is gone
    d.update("speed_ds", rows[:2])
    d.flush("speed_ds")
    files = [n for n in os.listdir(jdir) if n.startswith("rrd.journal.")]
    assert len(files) == 1

    # buffer more, forget one series, then "crash" (no flush, no shutdown)
    d.update("speed_ds", rows[2:5])
    d.update("tmp_ds", [("speed", 920806000.0, 7.0)])
    d.forget("tmp_ds")
    del d

    d2 = IngestDaemon(StreamingIngest(store), write_interval=1e9, journal_dir=jdir)
    assert d2.stats["journals_replayed"] >= 1
    assert len(d2.pending("speed_ds")) == 3  # nothing lost
    assert d2.pending("tmp_ds") == []  # FORGET journaled too
    d2.flush_all()
    got = store._read("samples").filter(F.col("series_id") == "speed_ds").count()
    assert got == 5  # 2 pre-crash + 3 replayed, no duplicates
    # all durable now: journal rotated down to one fresh empty generation
    files = sorted(n for n in os.listdir(jdir) if n.startswith("rrd.journal."))
    assert len(files) == 1 and os.path.getsize(f"{jdir}/{files[0]}") == 0

    # replayed rows that were already flushed pre-crash are dropped, not
    # double-written: crash between flush and rotate
    d3 = IngestDaemon(StreamingIngest(store), write_interval=1e9, journal_dir=jdir)
    d3.update("speed_ds", [("speed", float(UPDATES[5][0]), float(UPDATES[5][1]))])
    d3._write("speed_ds", d3._pending["speed_ds"])  # flushed but journal kept
    del d3
    d4 = IngestDaemon(StreamingIngest(store), write_interval=1e9, journal_dir=jdir)
    assert len(d4.pending("speed_ds")) == 1  # replayed
    d4.flush_all()
    assert (
        store._read("samples").filter(F.col("series_id") == "speed_ds").count() == 6
    )  # monotonicity dropped the replayed duplicate


def test_daemon_age_flush_timer(spark, tmp_path):
    """The server's background write thread (≙ rrdcached's -w flush thread,
    src/rrd_daemon.c:1070-1140): buffered values older than the write
    interval reach the store with NO further client activity."""
    import time

    from rrdtool_1_x_spark.streaming.daemon import DaemonServer, IngestDaemon

    store = DatasetStore.create(spark, str(tmp_path / "d"), _dataset())
    daemon = IngestDaemon(StreamingIngest(store), write_interval=1.0)
    with DaemonServer(daemon) as srv:
        c = _Client(srv.address)
        code, _, _ = c.send("UPDATE speed_ds 920804700:12345 920805000:12357")
        assert code == 0
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            s = store._read("samples")
            if s is not None and s.count() == 2:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("age flush never fired")
        c.close()


class _Client:
    """Minimal line-protocol client for DaemonServer tests."""

    def __init__(self, addr):
        import socket

        self.sock = socket.create_connection(addr, timeout=30)
        self.f = self.sock.makefile("rwb")

    def send(self, line: str) -> tuple[int, str, list[str]]:
        self.f.write((line + "\n").encode())
        self.f.flush()
        return self.read_reply()

    def read_reply(self) -> tuple[int, str, list[str]]:
        status = self.f.readline().decode().rstrip("\n")
        code_s, _, msg = status.partition(" ")
        code = int(code_s)
        lines = [
            self.f.readline().decode().rstrip("\n") for _ in range(max(code, 0))
        ]
        return code, msg, lines

    def send_raw(self, line: str) -> None:
        self.f.write((line + "\n").encode())
        self.f.flush()

    def close(self):
        self.f.close()
        self.sock.close()


def test_daemon_socket_protocol(spark, tmp_path):
    """The rrdcached network protocol end-to-end over a real TCP socket:
    UPDATE/PENDING/QUEUE buffer, FLUSH writes through the ingest, STATS /
    HELP / errors use the reference's <code> <message> framing, BATCH is
    dot-terminated, and FETCH serves header + rows from the store
    (src/rrd_daemon.c:3080-3092, :479-545)."""
    from rrdtool_1_x_spark.streaming.daemon import DaemonServer, IngestDaemon

    store = DatasetStore.create(spark, str(tmp_path / "d"), _dataset())
    daemon = IngestDaemon(StreamingIngest(store), write_interval=1e9)
    with DaemonServer(daemon) as srv:
        c = _Client(srv.address)
        # UPDATE buffers; PENDING and QUEUE see it; nothing written yet
        vals = " ".join(f"{t}:{v}" for t, v in UPDATES[:4])
        code, msg, _ = c.send(f"UPDATE speed_ds {vals}")
        assert code == 0 and "enqueued 4" in msg
        code, msg, lines = c.send("PENDING speed_ds")
        assert code == 4 and len(lines) == 4
        assert lines[0] == f"{UPDATES[0][0]}:{float(UPDATES[0][1])!r}"
        code, _, lines = c.send("QUEUE")
        assert code == 1 and lines == ["4 speed_ds"]
        assert store._read("samples") is None

        # FLUSH writes through the ingest
        code, msg, _ = c.send("FLUSH speed_ds")
        assert code == 0 and "Successfully flushed" in msg
        assert store._read("samples").count() == 4
        code, _, lines = c.send("PENDING speed_ds")
        assert code == 0 and lines == []

        # STATS framing: code == number of detail lines
        code, msg, lines = c.send("STATS")
        assert msg == "Statistics follow" and code == len(lines) >= 4
        stats = dict(ln.split(": ") for ln in lines)
        assert stats["updates_received"] == "4"

        # errors are negative codes, and malformed input doesn't kill the
        # listener
        code, msg, _ = c.send("FORGET nosuch")
        assert code < 0 and "nosuch" in msg
        code, _, _ = c.send("NOSUCHCOMMAND")
        assert code < 0
        code, _, _ = c.send("UPDATE speed_ds not_a_number")
        assert code < 0

        # SUSPEND caches through FLUSHALL until RESUME
        vals = " ".join(f"{t}:{v}" for t, v in UPDATES[4:6])
        c.send(f"UPDATE speed_ds {vals}")
        assert c.send("SUSPEND speed_ds")[0] == 0
        c.send("FLUSHALL")
        assert c.send("PENDING speed_ds")[0] == 2  # still cached
        assert c.send("RESUME speed_ds")[0] == 0
        c.send("FLUSHALL")
        assert store._read("samples").count() == 6

        # BATCH: dot-terminated, one combined error report
        code, msg, _ = c.send("BATCH")
        assert code == 0 and msg.startswith("Go ahead")
        c.send_raw(f"UPDATE speed_ds {UPDATES[6][0]}:{UPDATES[6][1]}")
        c.send_raw("FORGET nosuch2")
        c.send_raw(".")
        code, msg, lines = c.read_reply()
        assert code == 1 and msg == "errors"
        assert lines[0].startswith("2 ")  # 1-based index of the failing cmd
        assert c.send("PENDING speed_ds")[0] == 1

        # FETCH flushes first, then serves header + "%10lu: %0.17e" rows
        code, msg, lines = c.send(
            f"FETCH speed_ds AVERAGE {UPDATES[0][0]} {UPDATES[6][0]}"
        )
        assert code == len(lines) and code > 6
        hdr = dict(ln.split(": ", 1) for ln in lines[:6])
        assert hdr["Step"] == "300" and hdr["DSCount"] == "1"
        assert hdr["DSName"] == "speed"
        rows = lines[6:]
        assert len(rows) >= 5
        # the known COUNTER rates appear on the wire (first full step 0.04)
        vals = [float(ln.split(":")[1]) for ln in rows]
        assert any(abs(v - 0.04) < 1e-12 for v in vals if v == v)
        assert c.send("PENDING speed_ds")[0] == 0  # FETCH flushed the buffer

        # FETCHBIN: same header, per-DS BinaryData sections of raw doubles
        import struct

        c.send_raw(f"FETCHBIN speed_ds AVERAGE {UPDATES[0][0]} {UPDATES[6][0]}")
        status = c.f.readline().decode().rstrip()
        n = int(status.split(" ", 1)[0])
        assert n == 1 + 5  # field_cnt + 5 header lines
        hdr = dict(
            c.f.readline().decode().rstrip().split(": ", 1) for _ in range(5)
        )
        assert hdr["DSCount"] == "1" and hdr["Step"] == "300"
        dsline = c.f.readline().decode().rstrip()
        name, meta = dsline.split(": ", 1)
        assert name == "DSName-speed"
        tag, records, rsize, endian = meta.split()
        assert tag == "BinaryData" and rsize == "8"
        raw = c.f.read(int(records) * 8)
        assert c.f.read(1) == b"\n"
        fmt = ("<" if endian == "LITTLE" else ">") + f"{records}d"
        bvals = struct.unpack(fmt, raw)
        # binary payload agrees with the text FETCH rows
        assert len(bvals) == len(vals)
        for a, b in zip(bvals, vals):
            assert (a != a and b != b) or abs(a - b) < 1e-12

        # LIST enumerates datasets under the store root; INFO dumps the header
        code, _, lines = c.send("LIST")
        assert code == 1 and lines == ["d"]
        code, _, lines = c.send("INFO")
        info = dict(ln.split(" = ", 1) for ln in lines)
        assert info["step"] == "300" and info["ds[speed].type"] == "COUNTER"

        # TUNE over the wire applies the CLI grammar against the store
        code, msg, _ = c.send("TUNE speed_ds --heartbeat speed:1200")
        assert code == 0 and msg == "Tuned."
        reopened = DatasetStore(spark, str(tmp_path / "d"))
        assert reopened.dataset.ds[0].heartbeat == 1200
        assert c.send("TUNE speed_ds --heartbeat nosuchds:5")[0] < 0

        # DUMP streams the XML document (handle_request_dump :2992-2996):
        # flush-first, restorable content
        code, msg, lines = c.send("DUMP speed_ds")
        assert code == len(lines) > 20 and "XML dump" in msg
        assert lines[0].startswith("<?xml") and lines[-1] == "</rrd>"
        import tempfile

        from rrdtool_1_x_spark.sources.rrdxml import restore_xml

        xml_path = str(tmp_path / "wire.xml")
        with open(xml_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        rst = restore_xml(
            spark, xml_path, str(tmp_path / "wire_rst"), series_id="speed_ds"
        )
        assert rst.dataset.step == 300

        # PING/FIRST/LAST (handle_request_ping :3328, _first :2400-2416)
        assert c.send("PING") == (0, "PONG", [])
        code, msg, _ = c.send("LAST speed_ds")
        assert code == 0 and int(msg) == store.last()
        code, msg, _ = c.send("FIRST speed_ds 0")
        assert code == 0 and int(msg) == store.first(0)

        # HELP and a second concurrent client
        assert c.send("HELP")[0] > 0
        c2 = _Client(srv.address)
        assert c2.send("STATS")[0] > 0
        c2.close()
        c.send_raw("QUIT")
        c.close()


def test_daemon_unix_socket(spark, tmp_path):
    """The daemon protocol over its reference-default transport: a
    UNIX-domain socket."""
    import socket

    from rrdtool_1_x_spark.streaming.daemon import DaemonServer, IngestDaemon

    store = DatasetStore.create(spark, str(tmp_path / "d"), _dataset())
    sock_path = str(tmp_path / "rrdcached.sock")
    with DaemonServer(
        IngestDaemon(StreamingIngest(store), write_interval=1e9),
        unix_path=sock_path,
    ) as srv:
        assert srv.address == sock_path
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.settimeout(30)
        s.connect(sock_path)
        f = s.makefile("rwb")
        f.write(b"UPDATE speed_ds 920804700:12345\n")
        f.flush()
        assert f.readline().decode().startswith("0 ")
        f.write(b"STATS\n")
        f.flush()
        head = f.readline().decode()
        n = int(head.split(" ", 1)[0])
        lines = [f.readline().decode() for _ in range(n)]
        assert any(ln.startswith("updates_received: 1") for ln in lines)
        s.close()


def test_daemon_batch_and_update_grammar(spark, tmp_path):
    """Reference daemon grammar corners: FETCH/FETCHBIN are rejected
    per-line inside BATCH (their replies aren't line-framed), UPDATE maps
    an 'N' timestamp to now, and a reading count that doesn't match the
    data-source count is an error — not a silent zip-truncate
    (handle_request_update's "expected %i data source readings")."""
    from rrdtool_1_x_spark.streaming.daemon import DaemonServer, IngestDaemon

    store = DatasetStore.create(spark, str(tmp_path / "d"), _dataset())
    daemon = IngestDaemon(StreamingIngest(store), write_interval=1e9)
    with DaemonServer(daemon) as srv:
        c = _Client(srv.address)
        # FETCHBIN inside BATCH: per-line error, connection survives
        code, msg, _ = c.send("BATCH")
        assert code == 0 and msg.startswith("Go ahead")
        c.send_raw("UPDATE speed_ds 920804700:100")
        c.send_raw("FETCHBIN speed_ds AVERAGE")
        c.send_raw("FETCH speed_ds AVERAGE")
        c.send_raw(".")
        code, msg, lines = c.read_reply()
        assert code == 2 and msg == "errors"
        assert lines[0].startswith("2 ") and "FETCHBIN" in lines[0]
        assert lines[1].startswith("3 ") and "FETCH" in lines[1]
        # the valid line 1 was executed
        assert c.send("PENDING speed_ds")[0] == 1

        # UPDATE N:<v> stamps wall-clock now
        import time

        before = time.time()
        code, _, _ = c.send("UPDATE now_ds N:7")
        after = time.time()
        assert code == 0
        (ds_name, ts, val) = daemon.pending("now_ds")[0]
        assert before - 1 <= ts <= after + 1 and val == 7.0

        # wrong reading count is an error (dataset has exactly one DS)
        code, msg, _ = c.send("UPDATE speed_ds 920805000:1:2")
        assert code < 0 and "expected 1 data source readings" in msg
        code, msg, _ = c.send("UPDATE speed_ds 920805000:")
        assert code < 0
        c.send_raw("QUIT")
        c.close()


def test_daemon_create_and_routing(spark, tmp_path):
    """Daemon CREATE ≙ handle_request_create (src/rrd_daemon.c:3119-3178):
    a dataset provisioned through the socket appears in LIST, and
    UPDATE/FLUSH/FETCH route to it like rrdcached routes per-file — while
    plain series names keep living inside the primary store."""
    from rrdtool_1_x_spark.streaming.daemon import DaemonServer, IngestDaemon

    store = DatasetStore.create(spark, str(tmp_path / "d"), _dataset())
    daemon = IngestDaemon(StreamingIngest(store), write_interval=1e9)
    with DaemonServer(daemon) as srv:
        c = _Client(srv.address)
        code, msg, _ = c.send(
            "CREATE web2 -b 920804400 -s 300 "
            "DS:req:GAUGE:600:U:U RRA:AVERAGE:0.5:1:100"
        )
        assert code == 0 and "created" in msg, (code, msg)

        code, _, names = c.send("LIST")
        assert code >= 2 and {"d", "web2"} <= set(names), names

        # UPDATE parses against web2's DS list (1 DS) and flushes into the
        # sibling store, not the primary
        code, _, _ = c.send("UPDATE web2 920804700:5 920805000:7")
        assert code == 0
        code, _, _ = c.send("FLUSH web2")
        assert code == 0
        sib = DatasetStore(spark, str(tmp_path / "web2"))
        s = sib._read("samples")
        assert s is not None and s.count() == 2
        assert store._read("samples") is None  # primary untouched

        # FETCH routes too: AVERAGE rra of web2 has the two readings
        code, _, lines = c.send("FETCH web2 AVERAGE 920804400 920805000")
        assert code > 0, lines
        vals = [ln for ln in lines if ":" in ln and not ln[0].isalpha()]
        assert any("5" in v or "7" in v for v in vals), lines

        # LAST / INFO route to the sibling header
        code, msg, _ = c.send("LAST web2")
        assert code == 0 and msg.strip() == "920805000"

        # recreate without -O truncates; with -O errors (file exists)
        code, msg, _ = c.send(
            "CREATE web2 -O -b 920804400 -s 300 DS:req:GAUGE:600:U:U "
            "RRA:AVERAGE:0.5:1:100"
        )
        assert code == -1 and "exists" in msg.lower(), (code, msg)
        code, _, _ = c.send(
            "CREATE web2 -b 920804400 -s 300 DS:req:GAUGE:600:U:U "
            "RRA:AVERAGE:0.5:1:100"
        )
        assert code == 0
        sib2 = DatasetStore(spark, str(tmp_path / "web2"))
        assert sib2._read("samples") is None  # truncated fresh

        # malformed spec errors without destroying the existing dataset
        c.send("UPDATE web2 920804700:5")
        c.send("FLUSH web2")
        code, msg, _ = c.send("CREATE web2 DS:bogus RRA:AVERAGE:0.5:1:100")
        assert code == -1
        sib3 = DatasetStore(spark, str(tmp_path / "web2"))
        assert sib3._read("samples").count() == 1  # old data intact
        c.close()


def test_daemon_tune_reloads_store(spark, tmp_path):
    """TUNE through the daemon must refresh the daemon's own header view:
    a data-source-rename immediately re-keys subsequent UPDATE parsing
    (stale-DS writes were invisible to fetch)."""
    from rrdtool_1_x_spark.streaming.daemon import DaemonServer, IngestDaemon

    store = DatasetStore.create(spark, str(tmp_path / "d"), _dataset())
    daemon = IngestDaemon(StreamingIngest(store), write_interval=1e9)
    with DaemonServer(daemon) as srv:
        c = _Client(srv.address)
        c.send("UPDATE d 920804700:12345 920805000:12357")
        code, _, _ = c.send("TUNE d --data-source-rename speed:velocity")
        assert code == 0
        assert [ds.name for ds in daemon.ingest.store.dataset.ds] == ["velocity"]
        # new updates land under the renamed DS and are fetchable
        c.send("UPDATE d 920805300:12363")
        c.send("FLUSH d")
        rows = store._read("samples").filter(F.col("ts") == 920805300.0).collect()
        assert [r["ds_name"] for r in rows] == ["velocity"]
        code, _, lines = c.send("FETCH d AVERAGE 920804700 920805300 velocity")
        assert code > 0
        c.close()


def test_dedup_stream_restart_does_not_reemit(spark, tmp_path):
    """start_dedup_stream's state store survives a restart: a second
    drain over NEW files with the SAME checkpoint emits only hashes the
    first drain never saw, and the union equals the batch distinct."""
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.streaming.datapipe_stream import start_dedup_stream

    src = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    rows1 = [(i, f"doc {i % 4}") for i in range(8)]       # 4 distinct
    rows2 = [(i + 8, f"doc {i % 6}") for i in range(12)]  # adds 2 new
    spark.createDataFrame(rows1, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src)

    def drain():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_dedup_stream(stream, sink, ck)
        assert q.awaitTermination(300), "drain did not finish in 300s"

    drain()
    first = {r["h"] for r in spark.read.parquet(sink).collect()}
    assert len(first) == 4
    spark.createDataFrame(rows2, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src)
    drain()
    both = [r["h"] for r in spark.read.parquet(sink).collect()]
    assert len(both) == 6  # no re-emission: 4 + the 2 genuinely new
    batch = {
        r["h"]
        for r in spark.read.parquet(src)
        .select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
        .collect()
    }
    assert set(both) == batch


def test_interval_join_stream_batch_equality_and_late_drop(spark, tmp_path):
    """Single-batch drain == batch interval join; a second drain whose
    new file is entirely behind the advanced watermark + interval horizon
    joins nothing (the state-eviction semantics that bound this at
    scale)."""
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.streaming.joins import start_interval_join_stream

    base = 1_700_000_000_000_000  # epoch micros
    MIN = 60_000_000

    def frames(rows_c, rows_v, cdir, vdir):
        c = spark.createDataFrame(
            [(i, u, base + m * MIN) for i, u, m in rows_c],
            "click_id long, user_id long, tus long",
        ).select("click_id", "user_id",
                 F.timestamp_micros("tus").alias("ts"),
                 F.col("tus").alias("cts_us"))
        v = spark.createDataFrame(
            [(i, u, base + m * MIN) for i, u, m in rows_v],
            "view_id long, user_id long, tus long",
        ).select("view_id", "user_id",
                 F.timestamp_micros("tus").alias("ts"),
                 F.col("tus").alias("vts_us"))
        c.coalesce(1).write.mode("append").parquet(cdir)
        v.coalesce(1).write.mode("append").parquet(vdir)

    cdir, vdir = str(tmp_path / "c"), str(tmp_path / "v")
    sink, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    # clicks at minute 20/30; views at 12..25 — 10-min backward interval
    frames([(1, 7, 20), (2, 7, 30)],
           [(10, 7, 12), (11, 7, 18), (12, 7, 25)], cdir, vdir)

    def drain():
        cs = spark.readStream.schema(
            "click_id bigint, user_id bigint, ts timestamp, cts_us bigint"
        ).parquet(cdir)
        vs = spark.readStream.schema(
            "view_id bigint, user_id bigint, ts timestamp, vts_us bigint"
        ).parquet(vdir)
        q = start_interval_join_stream(cs, vs, sink, ck,
                                       interval="10 minutes",
                                       watermark="10 minutes")
        assert q.awaitTermination(300), "drain did not finish"

    drain()
    got = {(r["click_id"], r["view_id"])
           for r in spark.read.parquet(sink).collect()}
    # click@20 matches views in [10,20] -> 10,11; click@30 matches [20,30] -> 12
    assert got == {(1, 10), (1, 11), (2, 12)}
    # second drain: a click far behind the watermark (max ts 30min - 10min
    # delay = 20min horizon; this click is at minute 2) must join nothing
    frames([(3, 7, 2)], [], cdir, vdir)
    drain()
    got2 = {(r["click_id"], r["view_id"])
            for r in spark.read.parquet(sink).collect()}
    assert got2 == got, f"late click must be dropped, got {got2 - got}"


def test_sketch_stream_restart_and_replay_converge(spark, tmp_path):
    """start_sketch_stream: the drained registers equal the batch
    one-shot sketch; a restarted drain over new files (same checkpoint)
    folds them in; and re-folding already-seen data cannot move any
    estimate (register max-merge idempotence — the crash/replay story)."""
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.sketch import (
        append_hll_registers,
        hll_distinct,
        hll_index_distinct,
    )
    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        start_sketch_stream,
    )

    src = str(tmp_path / "in")
    regs = str(tmp_path / "regs")
    ck = str(tmp_path / "ck")
    rows1 = [("a" if i % 2 else "b", f"tok{i % 37}") for i in range(300)]
    rows2 = [("a", f"new{i % 11}") for i in range(50)]
    spark.createDataFrame(rows1, "g string, tok string").coalesce(
        1
    ).write.mode("append").parquet(src)

    def drain():
        stream = (
            spark.readStream.schema("g string, tok string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_sketch_stream(stream, regs, ck, "tok", ["g"])
        assert q.awaitTermination(300), "drain did not finish in 300s"

    drain()
    est1 = {r["g"]: r["hll_est"] for r in hll_index_distinct(spark, regs).collect()}
    batch1 = spark.createDataFrame(rows1, "g string, tok string")
    want1 = {
        r["g"]: r["hll_est"]
        for r in hll_distinct(batch1, F.col("tok"), ["g"]).collect()
    }
    assert est1 == want1
    # restart over an appended file: folds in, still == one-shot batch
    spark.createDataFrame(rows2, "g string, tok string").coalesce(
        1
    ).write.mode("append").parquet(src)
    drain()
    est2 = {r["g"]: r["hll_est"] for r in hll_index_distinct(spark, regs).collect()}
    full = spark.read.parquet(src)
    want2 = {
        r["g"]: r["hll_est"]
        for r in hll_distinct(full, F.col("tok"), ["g"]).collect()
    }
    assert est2 == want2
    # replay: re-folding batch 1 wholesale changes nothing
    append_hll_registers(batch1, regs, F.col("tok"), ["g"])
    est3 = {r["g"]: r["hll_est"] for r in hll_index_distinct(spark, regs).collect()}
    assert est3 == est2


def test_quantile_stream_snapshot_commits_replay_safe(spark, tmp_path):
    """start_quantile_stream: the drained sketch equals the batch
    one-shot; a restarted drain over an appended file (same checkpoint)
    folds it in; and a batch-id COLLISION (fresh checkpoint over the
    same sketch dir — the harshest replay shape for a non-idempotent
    addition merge) recomputes snapshots from their predecessors
    instead of double-applying."""
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.sketch import logq_sketch
    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        quantile_stream_sketch,
        start_quantile_stream,
    )

    src = str(tmp_path / "in")
    sk = str(tmp_path / "sk")
    rows1 = [("a" if i % 2 else "b", 10 + (i * 7) % 900) for i in range(300)]
    rows2 = [("a", 5000 + i) for i in range(50)]
    spark.createDataFrame(rows1, "g string, v long").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain(ck):
        stream = (
            spark.readStream.schema("g string, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_quantile_stream(stream, sk, ck, "v", ["g"])
        assert q.awaitTermination(300), "drain did not finish in 300s"

    def stored():
        return {
            (r["g"], r["bucket"]): r["cnt"]
            for r in quantile_stream_sketch(spark, sk).collect()
        }

    def oneshot(df):
        return {
            (r["g"], r["bucket"]): r["cnt"]
            for r in logq_sketch(df, F.col("v"), ["g"]).collect()
        }

    ck1 = str(tmp_path / "ck1")
    drain(ck1)
    b1 = spark.createDataFrame(rows1, "g string, v long")
    assert stored() == oneshot(b1)
    # restart, appended file, SAME checkpoint: folds in exactly once
    spark.createDataFrame(rows2, "g string, v long").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain(ck1)
    assert stored() == oneshot(spark.read.parquet(src))
    # fresh checkpoint, same sketch dir: batch ids restart at 0 and
    # every snapshot recomputes from its predecessor — the final state
    # equals the one-shot again (NOT doubled), per the documented
    # sketch_path+checkpoint_path unit contract
    drain(str(tmp_path / "ck2"))
    assert stored() == oneshot(spark.read.parquet(src))


def test_quantile_stream_fresh_generation_clears_stale_snapshots(
    spark, tmp_path
):
    """A fresh checkpoint over an existing sketch dir restarts batch ids
    at 0; if the new generation runs FEWER batches than the old one, the
    old generation's higher-id snapshots must not shadow the new state
    at read time (the reader keys on max snapshot id). The first batch
    of a generation deletes snapshots with id >= its own."""
    from pyspark.sql import functions as F

    from rrdtool_1_x_spark.datapipe.sketch import logq_sketch
    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        quantile_stream_sketch,
        start_quantile_stream,
    )

    sk = str(tmp_path / "sk")

    def drain(src, ck, per_trigger):
        reader = spark.readStream.schema("g string, v long")
        if per_trigger:
            reader = reader.option("maxFilesPerTrigger", 1)
        q = start_quantile_stream(reader.parquet(src), sk, ck, "v", ["g"])
        assert q.awaitTermination(300), "drain did not finish in 300s"

    def stored():
        return {
            (r["g"], r["bucket"]): r["cnt"]
            for r in quantile_stream_sketch(spark, sk).collect()
        }

    # generation 1: three files, one per micro-batch -> snaps 0,1,2
    src1 = str(tmp_path / "in1")
    for lo in (0, 300, 600):
        spark.createDataFrame(
            [("a", 10 + i) for i in range(lo, lo + 300)], "g string, v long"
        ).coalesce(1).write.mode("append").parquet(src1)
    drain(src1, str(tmp_path / "ck1"), per_trigger=True)
    # generation 2: different (smaller) input, fresh checkpoint, ONE
    # batch -> writes only snap_0; stale snaps 1,2 must be gone
    src2 = str(tmp_path / "in2")
    gen2 = spark.createDataFrame(
        [("b", 7), ("b", 9), ("a", 5)], "g string, v long"
    )
    gen2.coalesce(1).write.parquet(src2)
    drain(src2, str(tmp_path / "ck2"), per_trigger=False)
    want = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in logq_sketch(gen2, F.col("v"), ["g"]).collect()
    }
    assert stored() == want
