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


def rename_ds(store: DatasetStore, old: str, new: str) -> None:
    """≙ rrdtool tune -r/--data-source-rename old:new
    (src/rrd_tune.c data-source-rename handling): header rename plus a
    rewrite of the stored rows' ds_name — the engine's tall tables carry
    the name per row where the reference only stores it in the header."""
    if not any(d.name == old for d in store.dataset.ds):
        raise ValueError(f"no DS {old}")
    if any(d.name == new for d in store.dataset.ds):
        raise ValueError(f"DS {new} already exists")
    for d in store.dataset.ds:
        if d.name == old:
            d.name = new
    _save_meta(store)
    renamed = F.when(F.col("ds_name") == old, new).otherwise(F.col("ds_name"))
    subs = ["samples"] + [f"rra_{i}" for i in range(len(store.dataset.rra))]
    for sub in subs:
        t = store._read(sub)
        if t is not None:
            store._write(
                t.withColumn("ds_name", renamed).localCheckpoint(eager=True),
                sub, mode="overwrite",
            )


def retype_ds(
    store: DatasetStore, name: str, dst: str, recompute: bool = True
) -> None:
    """≙ rrdtool tune -d/--data-source-type ds:DST (src/rrd_tune.c:330-360).

    The reference just rewrites the header and voids the PDP scratch —
    past archive rows keep their old-type rates. With raw samples kept,
    ``recompute=True`` (default) re-derives every archive under the new
    type exactly; pass False for the reference's future-only behavior."""
    ds = next((d for d in store.dataset.ds if d.name == name), None)
    if ds is None:
        raise ValueError(f"no DS {name}")
    ds.dst = dst.upper()
    ds.validate()
    _save_meta(store)
    if recompute:
        store.rebuild()


# which CFs each rrd_tune HW option applies to (set_hwarg/set_hwsmootharg,
# src/rrd_tune.c:360-460): alpha/beta hit HWPREDICT else MHWPREDICT,
# gamma hits SEASONAL, gamma-deviation DEVSEASONAL, the violation knobs
# FAILURES, smoothing windows their respective seasonal archives.
_HW_TUNE_TARGETS = {
    "alpha": (("HWPREDICT", "MHWPREDICT"), "alpha"),
    "beta": (("HWPREDICT", "MHWPREDICT"), "beta"),
    "gamma": (("SEASONAL",), "gamma"),
    "gamma_deviation": (("DEVSEASONAL",), "gamma"),
    "deltapos": (("FAILURES",), "deltapos"),
    "deltaneg": (("FAILURES",), "deltaneg"),
    "failure_threshold": (("FAILURES",), "threshold"),
    "window_length": (("FAILURES",), "window"),
    "smoothing_window": (("SEASONAL",), "smoothing_window"),
    "smoothing_window_deviation": (("DEVSEASONAL",), "smoothing_window"),
}


def tune_hw(store: DatasetStore, **updates: float) -> None:
    """≙ rrdtool tune --alpha/--beta/--gamma/--gamma-deviation/--deltapos/
    --deltaneg/--failure-threshold/--window-length/--smoothing-window[-
    deviation]: update the Holt-Winters parameters in the matching RRA
    headers. Like the reference, the new values take effect from the next
    derivation on — this engine derives the HW archives from raw samples
    (operators/hw.py reads these params), so the change applies to the
    whole recomputation rather than mid-stream."""
    # validate everything BEFORE touching any header so a rejected option
    # leaves the dataset unchanged (≙ set_hwarg range check,
    # src/rrd_tune.c:372-378; tests/tune2 "out of range beta error")
    for key, val in updates.items():
        if key not in _HW_TUNE_TARGETS:
            raise ValueError(f"unknown HW tune parameter {key!r}")
        if key in ("alpha", "beta", "gamma", "gamma_deviation") and not (
            0.0 <= float(val) <= 1.0
        ):
            raise ValueError(f"{key} must be between 0 and 1")
    for key, val in updates.items():
        cfs, pkey = _HW_TUNE_TARGETS[key]
        hit = False
        for rra in store.dataset.rra:
            if rra.cf in cfs:
                rra.params[pkey] = (
                    int(val) if pkey in ("threshold", "window") else float(val)
                )
                hit = True
                break  # the reference updates the first matching RRA
        if not hit:
            raise ValueError(f"no RRA accepts {key} (needs one of {cfs})")
    _save_meta(store)


def aberrant_reset(store: DatasetStore, name: str) -> int:
    """≙ rrdtool tune -b/--aberrant-reset ds
    (reset_aberrant_coefficients, src/rrd_hw.c): void the HW state so the
    smoother re-bootstraps. This engine keeps no persisted HW scratch —
    the coefficients are re-derived from raw samples on every
    ``operators.hw.hw_predict`` run — so the reset is a recorded
    watermark: ``reset_ts`` (now = the newest sample) is stamped into the
    HW RRA params, and a derivation that honors it feeds only samples at
    or after the watermark (exactly the reference's effect: unknown
    coefficients, re-bootstrap from the reset point). Returns the stamp."""
    if not any(d.name == name for d in store.dataset.ds):
        raise ValueError(f"no DS {name}")
    ts = store.last()
    hit = False
    for rra in store.dataset.rra:
        if rra.cf in ("HWPREDICT", "MHWPREDICT", "SEASONAL", "DEVSEASONAL",
                      "DEVPREDICT", "FAILURES"):
            rra.params["reset_ts"] = int(ts)
            hit = True
    if not hit:
        raise ValueError("no Holt-Winters RRAs to reset")
    _save_meta(store)
    return int(ts)


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
