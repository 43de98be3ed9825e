"""Schema evolution + dump/restore: tune / modify / resize equivalents.

Reference: ``rrdtool tune`` (src/rrd_tune.c), ``rrdtool modify``'s DS
add/remove and RRA add/remove/resize (src/rrd_modify.c:1311-1415, grow
backfill src/rrd_modify.c:407-561), ``rrdtool resize`` (src/rrd_resize.c),
``rrdtool dump/restore`` (src/rrd_dump.c:56-497, src/rrd_restore.c).

The tall-table + kept-raw-samples design makes most of these METADATA-ONLY
or exact recomputations, where the reference must approximate:

* add DS: pure metadata (new ds_name rows simply start appearing; history
  is unknown — the reference backfills NaN, same semantics for free).
* remove DS: metadata + a filter-rewrite of stored rows.
* add/grow RRA: exact recompute from raw samples — the reference can only
  backfill NaN or re-consolidate from a finer RRA when one exists
  (populate_row, src/rrd_modify.c:407-561). Keeping samples beats that.
* resize (row_cnt): retention metadata change only; shrink trims lazily.
* tune heartbeat/min/max/xff: metadata + exact recompute of affected
  archives (the reference applies new params only to future updates —
  we match that by default with ``recompute=False``).
* dump/restore: meta.json + samples round-trip through JSON; restore
  rebuilds every archive exactly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from rrdtool_1_x_spark.catalog import DatasetDef, DSDef, RRADef
from rrdtool_1_x_spark.sources.store import DatasetStore


def _save_meta(store: DatasetStore) -> None:
    with open(f"{store.path}/meta.json", "w") as f:
        f.write(store.dataset.to_json())


def add_ds(store: DatasetStore, ds: DSDef, recompute: bool = False) -> None:
    """≙ rrdtool tune DS:add — history for the new DS is unknown."""
    ds.validate()
    if any(d.name == ds.name for d in store.dataset.ds):
        raise ValueError(f"DS {ds.name} already exists")
    store.dataset.ds.append(ds)
    _save_meta(store)
    if recompute:
        store.rebuild()


def del_ds(store: DatasetStore, name: str) -> None:
    """≙ rrdtool tune DEL:<ds> — drops the channel and its stored rows."""
    if not any(d.name == name for d in store.dataset.ds):
        raise ValueError(f"no DS {name}")
    store.dataset.ds = [d for d in store.dataset.ds if d.name != name]
    if not store.dataset.ds:
        raise ValueError("cannot delete the last DS")
    _save_meta(store)
    samples = store._read("samples")
    if samples is not None:
        kept = samples.filter(F.col("ds_name") != name).localCheckpoint(eager=True)
        store._write(kept, "samples", mode="overwrite")
    store.rebuild()


def add_rra(store: DatasetStore, rra: RRADef) -> int:
    """≙ rrdtool modify RRA add — exact backfill from raw samples (the
    reference approximates from finer archives, src/rrd_modify.c:407-561)."""
    rra.validate()
    store.dataset.rra.append(rra)
    _save_meta(store)
    store.rebuild()
    return len(store.dataset.rra) - 1


def del_rra(store: DatasetStore, index: int) -> None:
    """≙ rrdtool modify DELRRA:<idx>."""
    if not (0 <= index < len(store.dataset.rra)):
        raise ValueError(f"no RRA {index}")
    if len(store.dataset.rra) == 1:
        raise ValueError("cannot delete the last RRA")
    store.dataset.rra.pop(index)
    # shift stored archives down
    import shutil

    for i in range(index, len(store.dataset.rra) + 1):
        p = f"{store.path}/rra_{i}"
        if os.path.isdir(p):
            shutil.rmtree(p)
    _save_meta(store)
    store.rebuild()


def resize_rra(store: DatasetStore, index: int, delta_rows: int) -> None:
    """≙ rrdtool resize GROW/SHRINK: retention is metadata; history up to
    the new retention is already exact (we keep samples)."""
    rra = store.dataset.rra[index]
    if rra.row_cnt + delta_rows <= 0:
        raise ValueError("row_cnt must stay positive")
    rra.row_cnt += delta_rows
    _save_meta(store)


def tune_ds(
    store: DatasetStore,
    name: str,
    heartbeat: int | None = None,
    min_val: float | None = ...,
    max_val: float | None = ...,
    recompute: bool = False,
) -> None:
    """≙ rrdtool tune --heartbeat/--minimum/--maximum.

    Like the reference, new parameters affect only future updates unless
    ``recompute=True`` (which the reference cannot do — it has no raw
    history)."""
    ds = next((d for d in store.dataset.ds if d.name == name), None)
    if ds is None:
        raise ValueError(f"no DS {name}")
    if heartbeat is not None:
        ds.heartbeat = heartbeat
    if min_val is not ...:
        ds.min_val = min_val
    if max_val is not ...:
        ds.max_val = max_val
    ds.validate()
    _save_meta(store)
    if recompute:
        store.rebuild()


def dump(store: DatasetStore, path: str) -> None:
    """≙ rrdtool dump: full-fidelity export (header + data) as a JSON doc +
    JSONL samples."""
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w") as f:
        f.write(store.dataset.to_json())
    samples = store._read("samples")
    if samples is not None:
        samples.orderBy("series_id", "ds_name", "ts").coalesce(1).write.mode(
            "overwrite"
        ).json(f"{path}/samples")


def restore(spark: SparkSession, dump_path: str, target_path: str) -> DatasetStore:
    """≙ rrdtool restore: rebuild a dataset (schema + all archives) from a
    dump."""
    with open(f"{dump_path}/meta.json") as f:
        dataset = DatasetDef.from_json(f.read())
    store = DatasetStore.create(spark, target_path, dataset)
    if os.path.isdir(f"{dump_path}/samples"):
        samples = spark.read.schema(
            "series_id string, ds_name string, ts double, value double"
        ).json(f"{dump_path}/samples")
        store.update(samples)
    return store


def dump_equal(spark: SparkSession, a: str, b: str) -> bool:
    """Round-trip comparison helper (≙ tests/dump-restore's dump diff)."""
    with open(f"{a}/meta.json") as f1, open(f"{b}/meta.json") as f2:
        if json.load(f1) != json.load(f2):
            return False
    sa = spark.read.json(f"{a}/samples").orderBy("series_id", "ds_name", "ts")
    sb = spark.read.json(f"{b}/samples").orderBy("series_id", "ds_name", "ts")
    return [r.asDict() for r in sa.collect()] == [r.asDict() for r in sb.collect()]
