"""Stateful streaming PDP (applyInPandasWithState) must equal the batch
normalizer — state machine unit-checked on the pdp-calc1 fixture and the
random differential generator, plumbing checked with a real stream."""

from __future__ import annotations

import random

import pytest

from rrdtool_1_x_spark.operators.pdp import pdp_table
from rrdtool_1_x_spark.streaming.stateful import _process_series, stateful_pdp_stream

from tests.goldens import close
from tests.test_pdp import DS_SPECS, START, STEP, UPDATES


def _batch_pdp(spark, rows, step, dst, hb, mn, mx, start):
    df = spark.createDataFrame(
        [("s", "x", float(t), None if v is None else float(v)) for t, v in rows],
        "series_id string, ds_name string, ts double, value double",
    )
    p = pdp_table(df, step, dst, hb, min_val=mn, max_val=mx, start=start)
    return {int(r["ts"]): r["value"] for r in p.collect()}


def _stateful(rows, step, dst, hb, mn, mx, start, chunks=4):
    st = None
    out = {}
    n = max(1, len(rows) // chunks)
    for k in range(0, len(rows), n):
        emitted, st = _process_series(
            [(float(t), None if v is None else float(v)) for t, v in rows[k : k + n]],
            st, float(step), dst, float(hb), mn, mx, start,
        )
        for ts, v in emitted:
            out[int(ts)] = v
    return out


@pytest.mark.parametrize("col,name", [(1, "Gauge"), (2, "Counter"), (3, "Absolute")])
def test_state_machine_matches_batch_fixture(spark, col, name):
    spec = DS_SPECS[name]
    rows = [(u[0], u[col]) for u in UPDATES]
    batch = _batch_pdp(spark, rows, STEP, spec["dst"], spec["heartbeat"],
                       spec.get("min_val"), spec.get("max_val"), float(START))
    stream = _stateful(rows, STEP, spec["dst"], spec["heartbeat"],
                       spec.get("min_val"), spec.get("max_val"), float(START))
    assert set(stream) == set(batch), (
        f"{name}: extra={sorted(set(stream)-set(batch))} missing={sorted(set(batch)-set(stream))}"
    )
    for ts, v in batch.items():
        assert close(stream[ts], v), (name, ts, stream[ts], v)


@pytest.mark.parametrize("seed", range(4))
def test_state_machine_matches_batch_random(spark, seed):
    from tests.test_pdp_differential import _gen_updates, START as DSTART

    rng = random.Random(100 + seed)
    dst = rng.choice(["GAUGE", "COUNTER", "ABSOLUTE"])
    hb = rng.choice([65, 400, 1800])
    rows = _gen_updates(rng, 60, dst)
    batch = _batch_pdp(spark, rows, 60, dst, hb, None, None, float(DSTART))
    stream = _stateful(rows, 60, dst, hb, None, None, float(DSTART), chunks=7)
    assert set(stream) == set(batch)
    for ts, v in batch.items():
        assert close(stream[ts], v), (seed, dst, hb, ts, stream[ts], v)


def test_stateful_stream_end_to_end(spark, tmp_path):
    rows = [(u[0], u[1]) for u in UPDATES]
    src = tmp_path / "in"
    df = spark.createDataFrame(
        [("s", "x", float(t), None if v is None else float(v)) for t, v in rows],
        "series_id string, ds_name string, ts double, value double",
    )
    df.coalesce(1).write.json(str(src))
    stream = spark.readStream.schema(
        "series_id string, ds_name string, ts double, value double"
    ).json(str(src))
    pdps = stateful_pdp_stream(stream, STEP, "GAUGE", 3600, min_val=0.0,
                               max_val=10.0, start=float(START))
    q = (
        pdps.writeStream.format("memory")
        .queryName("pdps")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {int(r["ts"]): r["value"] for r in spark.sql("select * from pdps").collect()}
    want = _batch_pdp(spark, rows, STEP, "GAUGE", 3600, 0.0, 10.0, float(START))
    assert set(got) == set(want)
    for ts, v in want.items():
        assert close(got[ts], v), (ts, got[ts], v)
