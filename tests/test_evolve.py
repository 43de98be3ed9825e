"""Schema evolution + dump/restore (fixture F5; reference tests/modify1-5,
tune1-2, dump-restore)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.catalog import DSDef, RRADef, create
from rrdtool_1_x_spark.sources import evolve
from rrdtool_1_x_spark.sources.store import DatasetStore

UPDATES = [(920804400 + 300 * i, float(v)) for i, v in enumerate(
    [10, 12, 14, 16, 18, 20, 18, 16, 14, 12, 10, 8], start=1)]


@pytest.fixture()
def store(spark, tmp_path):
    ds = create(
        "g",
        step=300,
        ds=[DSDef(name="g1", dst="GAUGE", heartbeat=600),
            DSDef(name="g2", dst="GAUGE", heartbeat=600)],
        rra=[RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=100)],
        start=920804400,
    )
    st = DatasetStore.create(spark, str(tmp_path / "g"), ds)
    rows = [("g", n, float(t), v) for t, v in UPDATES for n in ("g1", "g2")]
    st.update(spark.createDataFrame(rows, "series_id string, ds_name string, ts double, value double"))
    return st


def test_add_del_ds(store):
    evolve.add_ds(store, DSDef(name="g3", dst="GAUGE", heartbeat=600))
    assert [d.name for d in store.dataset.ds] == ["g1", "g2", "g3"]
    with pytest.raises(ValueError):
        evolve.add_ds(store, DSDef(name="g1", dst="GAUGE"))
    evolve.del_ds(store, "g2")
    assert [d.name for d in store.dataset.ds] == ["g1", "g3"]
    assert store._read("samples").filter(F.col("ds_name") == "g2").count() == 0
    # reload from disk sees the evolved schema
    st2 = DatasetStore(store.spark, store.path)
    assert [d.name for d in st2.dataset.ds] == ["g1", "g3"]


def test_add_rra_exact_backfill(store):
    idx = evolve.add_rra(store, RRADef(cf="MAX", xff=0.5, pdp_cnt=4, row_cnt=50))
    got = {int(r["ts"]): r["value"] for r in
           store._read(f"rra_{idx}").filter(F.col("ds_name") == "g1").collect()}
    # MAX over 4 PDPs, window end aligned to 1200s grid — exact from samples
    assert got[920806800] == 20.0  # covers PDPs 16,18,20,18
    evolve.del_rra(store, idx)
    assert len(store.dataset.rra) == 1


def test_resize_and_tune(store):
    evolve.resize_rra(store, 0, +50)
    assert store.dataset.rra[0].row_cnt == 150
    evolve.tune_ds(store, "g1", heartbeat=1200, max_val=15.0, recompute=True)
    # clamp now voids rates above 15 for g1 only
    vals = {r["ds_name"]: r for r in store._read("rra_0").filter(
        F.col("ts") == 920805600.0).collect()}
    assert vals["g2"]["value"] == 16.0
    assert "g1" not in vals  # unknown rows are not materialized


def test_dump_restore_roundtrip(spark, store, tmp_path):
    d1 = str(tmp_path / "dump1")
    evolve.dump(store, d1)
    st2 = evolve.restore(spark, d1, str(tmp_path / "restored"))
    d2 = str(tmp_path / "dump2")
    evolve.dump(st2, d2)
    assert evolve.dump_equal(spark, d1, d2)
    # restored archives equal the originals
    a = {(r["ds_name"], r["ts"]): r["value"] for r in store._read("rra_0").collect()}
    b = {(r["ds_name"], r["ts"]): r["value"] for r in st2._read("rra_0").collect()}
    assert a == b
