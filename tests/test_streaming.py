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
