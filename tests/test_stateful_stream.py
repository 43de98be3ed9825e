"""Stateful streaming PDP (applyInPandasWithState) must equal the batch
normalizer — state machine unit-checked on the pdp-calc1 fixture and the
random differential generator, plumbing checked with a real stream."""

from __future__ import annotations

import random

import pandas as pd

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


# ---------------------------------------------------------------- CDP state


def _batch_cdp(spark, pdp_rows, step, pdp_cnt, cf, xff, exact):
    from rrdtool_1_x_spark.operators.cdp import consolidate

    df = spark.createDataFrame(
        [("s", float(t), float(v)) for t, v in pdp_rows],
        "series_id string, ts double, value double",
    )
    # clock: suppress the trailing in-progress window, like streaming state
    last = max(t for t, _ in pdp_rows)
    clock = spark.createDataFrame([("s", float(last))], "series_id string, clock double")
    c = consolidate(df, step, pdp_cnt, cf, xff, keys=("series_id",),
                    exact=exact, clock=clock)
    # the batch clock rule admits ts <= clock; streaming only flushes once a
    # strictly later PDP arrives, so drop the window ending exactly at the
    # final PDP for comparison
    return {int(r["ts"]): r["value"] for r in c.collect() if r["ts"] < last
            or (last % (step * pdp_cnt)) != 0}


def _stateful_cdp(pdp_rows, step, pdp_cnt, cf, xff, exact, chunks=4):
    from rrdtool_1_x_spark.streaming.stateful import _cdp_series

    st, out = None, {}
    n = max(1, len(pdp_rows) // chunks)
    for k in range(0, len(pdp_rows), n):
        emitted, st = _cdp_series(
            [(float(t), float(v)) for t, v in pdp_rows[k : k + n]],
            st, float(step), pdp_cnt, cf, xff, exact, 1e6,
        )
        for ts, v in emitted:
            out[int(ts)] = v
    return out


@pytest.mark.parametrize("cf", ["AVERAGE", "MIN", "MAX", "LAST"])
@pytest.mark.parametrize("seed", range(3))
def test_cdp_state_machine_matches_batch(spark, cf, seed):
    rng = random.Random(300 + seed)
    step, pdp_cnt, xff = 60, 4, rng.choice([0.0, 0.5, 0.9])
    # gappy PDP table: ~70% of steps known, quantized to 1e-6
    rows = [
        (920804400 + i * step, round(rng.uniform(0, 100), 6))
        for i in range(1, 80)
        if rng.random() < 0.7
    ]
    exact = cf == "AVERAGE"
    batch = _batch_cdp(spark, rows, step, pdp_cnt, cf, xff, exact)
    stream = _stateful_cdp(rows, step, pdp_cnt, cf, xff, exact, chunks=5)
    # windows the stream has not flushed yet (trailing) were dropped from
    # batch too; everything else must agree exactly
    assert set(stream) == set(batch), (
        cf, xff, sorted(set(stream) ^ set(batch)))
    for ts, v in batch.items():
        assert close(stream[ts], v), (cf, ts, stream[ts], v)


def test_cdp_identity_when_single_pdp():
    rows = [(60.0, 1.5), (120.0, 2.5)]
    out = _stateful_cdp(rows, 60, 4, "AVERAGE", 0.5, False, chunks=1)
    assert 120 in out or len(out) <= 1  # only first window can flush


def test_stateful_cdp_stream_end_to_end(spark, tmp_path):
    from rrdtool_1_x_spark.streaming.stateful import stateful_cdp_stream

    rng = random.Random(7)
    step, pdp_cnt = 60, 4
    rows = [
        (920804400 + i * step, round(rng.uniform(0, 100), 6))
        for i in range(1, 50)
        if rng.random() < 0.8
    ]
    src = tmp_path / "pdps_in"
    spark.createDataFrame(
        [("s", "x", float(t), float(v)) for t, v in rows],
        "series_id string, ds_name string, ts double, value double",
    ).coalesce(1).write.json(str(src))
    stream = spark.readStream.schema(
        "series_id string, ds_name string, ts double, value double"
    ).json(str(src))
    cdps = stateful_cdp_stream(stream, step, pdp_cnt, "AVERAGE", 0.5, exact=True)
    q = (
        cdps.writeStream.format("memory")
        .queryName("cdps")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {int(r["ts"]): r["value"] for r in spark.sql("select * from cdps").collect()}
    want = _batch_cdp(spark, rows, step, pdp_cnt, "AVERAGE", 0.5, True)
    assert set(got) == set(want)
    for ts, v in want.items():
        assert close(got[ts], v), (ts, got[ts], v)


# ----------------------------------------------------------------- HW state


def _hw_input(n=120, period=12, gaps=True):
    import math as m

    rows = []
    for i in range(1, n + 1):
        if gaps and i % 17 == 0:
            rows.append((i * 60.0, None))
        else:
            rows.append((i * 60.0, 50 + 20 * m.sin(2 * m.pi * i / period) + (i % 5)))
    return rows


@pytest.mark.parametrize("mult,smooth", [(False, 0.0), (False, 0.05), (True, 0.0)])
def test_hw_loop_chunked_equals_oneshot(mult, smooth):
    """Carrying (i, a, b, k, S, D, viol) across chunk boundaries must be
    exactly equivalent to one pass — the streaming correctness core."""
    import numpy as np

    from rrdtool_1_x_spark.operators.hw import _hw_loop

    rows = _hw_input()
    ts = np.array([r[0] for r in rows])
    vals = np.array([np.nan if r[1] is None else r[1] for r in rows])
    args = (0.5, 0.3, 0.4, 12, 2.0, 2.0, 3, 5, mult, smooth)
    one, _ = _hw_loop(ts, vals, *args, state=None)
    st = None
    parts = []
    for k in range(0, len(rows), 23):
        out, st = _hw_loop(ts[k : k + 23], vals[k : k + 23], *args, state=st)
        parts.append(out)
    import pandas as pd

    chunked = pd.concat(parts, ignore_index=True)
    for col in one.columns:
        a, b = one[col].to_numpy(), chunked[col].to_numpy()
        assert ((a == b) | (pd.isna(a) & pd.isna(b))).all(), col


def test_stateful_hw_stream_end_to_end(spark, tmp_path):
    import numpy as np

    from rrdtool_1_x_spark.operators.hw import _hw_loop
    from rrdtool_1_x_spark.streaming.stateful import stateful_hw_stream

    rows = _hw_input(n=96)
    src = tmp_path / "hw_in"
    spark.createDataFrame(
        [("s", t, v) for t, v in rows], "series_id string, ts double, value double"
    ).coalesce(1).write.json(str(src))
    stream = spark.readStream.schema(
        "series_id string, ts double, value double").json(str(src))
    out = stateful_hw_stream(stream, 0.5, 0.3, 0.4, 12, threshold=3, window_len=5)
    q = (
        out.writeStream.format("memory").queryName("hw")
        .option("checkpointLocation", str(tmp_path / "ckhw"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination(120)
    got = {int(r["ts"]): r for r in spark.sql("select * from hw").collect()}
    want, _ = _hw_loop(
        np.array([r[0] for r in rows]),
        np.array([np.nan if r[1] is None else r[1] for r in rows]),
        0.5, 0.3, 0.4, 12, 2.0, 2.0, 3, 5, False, 0.0, state=None,
    )
    assert len(got) == len(rows)
    for i, t in enumerate(want["ts"]):
        for col in ("prediction", "seasonal", "devpredict", "devseasonal", "failures"):
            w = want[col][i]
            g = got[int(t)][col]
            ok = (g is None and pd.isna(w)) or (g is not None and close(g, w))
            assert ok, (int(t), col, g, w)
