"""Differential property test: random update sequences through BOTH the
reference engine (local build) and this engine must produce identical PDP
and CDP series.

This is the strongest correctness instrument in the suite: it explores the
irregular-interval / unknown / heartbeat / min-max / multi-step edge space
far beyond the committed fixtures.
"""

from __future__ import annotations

import math
import random
import subprocess

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.operators.cdp import consolidate
from rrdtool_1_x_spark.operators.pdp import pdp_table

from tests.goldens import close, parse_fetch_output
from tests.rrdmini import ensure_binary

BIN = ensure_binary()
pytestmark = pytest.mark.skipif(BIN is None, reason="reference build unavailable")

STEP = 60
START = 1000000020  # on the step grid


def _run_reference(tmp, dst, hb, mn, mx, updates, cf, res, row_cnt=5000, xff=0.5):
    # row_cnt must exceed the whole update span so circular retention never
    # drops rows (the engine has no such cap; fetch would pad NaN there)
    rrd = f"{tmp}/d.rrd"
    mnx = "U" if mn is None else str(mn)
    mxx = "U" if mx is None else str(mx)
    subprocess.run(
        [BIN, "create", rrd, "--start", str(START), "--step", str(STEP),
         f"DS:x:{dst}:{hb}:{mnx}:{mxx}",
         f"RRA:AVERAGE:0.5:1:{row_cnt}", f"RRA:{cf}:{xff}:{res}:{row_cnt}"],
        check=True, capture_output=True,
    )
    args = [f"{t}:{'U' if v is None else v}" for t, v in updates]
    for k in range(0, len(args), 50):
        subprocess.run([BIN, "update", rrd] + args[k : k + 50], check=True,
                       capture_output=True)
    end = updates[-1][0]
    out1 = subprocess.run(
        [BIN, "fetch", rrd, "AVERAGE", "-r", str(STEP), "-s", str(START),
         "-e", str(end)], check=True, capture_output=True, text=True).stdout
    out2 = subprocess.run(
        [BIN, "fetch", rrd, cf, "-r", str(STEP * res), "-s", str(START),
         "-e", str(end)], check=True, capture_output=True, text=True).stdout
    import os

    with open(f"{tmp}/f1", "w") as f:
        f.write(out1)
    with open(f"{tmp}/f2", "w") as f:
        f.write(out2)
    _, fine = parse_fetch_output(f"{tmp}/f1")
    _, coarse = parse_fetch_output(f"{tmp}/f2")
    os.remove(rrd)
    return fine, coarse


def _gen_updates(rng, n, dst):
    t = START
    counter = rng.randint(0, 1000)
    out = []
    for _ in range(n):
        t += rng.choice([5, 17, 30, 59, 60, 61, 120, 200, 301, 523, 900, 2000])
        if rng.random() < 0.12:
            out.append((t, None))
            continue
        if dst in ("COUNTER", "DERIVE"):
            counter += rng.randint(0, 500)
            out.append((t, counter))
        elif dst in ("DCOUNTER", "DDERIVE"):
            # float counter; occasional decrease = DCOUNTER reset
            counter += rng.uniform(-50, 300)
            out.append((t, round(counter, 4)))
        elif dst == "ABSOLUTE":
            out.append((t, rng.randint(0, 400)))
        else:
            out.append((t, round(rng.uniform(-5, 105), 3)))
    return out


@pytest.mark.parametrize("seed", range(12))
def test_differential_random(spark, tmp_path, seed):
    rng = random.Random(seed)
    dst = rng.choice(["GAUGE", "COUNTER", "DERIVE", "ABSOLUTE", "DCOUNTER", "DDERIVE"])
    hb = rng.choice([65, 120, 400, 1800])
    mn, mx = (0.0, 100.0) if (dst == "GAUGE" and rng.random() < 0.5) else (None, None)
    cf = rng.choice(["AVERAGE", "MIN", "MAX", "LAST"])
    res = rng.choice([4, 6])
    xff = rng.choice([0.0, 0.3, 0.5, 0.9])
    updates = _gen_updates(rng, 80, dst)

    fine_ref, coarse_ref = _run_reference(
        str(tmp_path), dst, hb, mn, mx, updates, cf, res, xff=xff)

    df = spark.createDataFrame(
        [("s", "x", float(t), None if v is None else float(v)) for t, v in updates],
        "series_id string, ds_name string, ts double, value double",
    )
    pdp = pdp_table(df, STEP, dst, hb, min_val=mn, max_val=mx, start=float(START)).cache()
    mine_fine = {int(r["ts"]): r["value"] for r in pdp.collect()}
    # as in DatasetStore.refresh: suppress the trailing in-progress window
    clock = df.groupBy("series_id", "ds_name").agg(
        (F.floor(F.max("ts") / STEP) * STEP).cast("double").alias("clock")
    )
    cdp = consolidate(pdp, STEP, res, cf, xff, clock=clock)
    mine_coarse = {int(r["ts"]): r["value"] for r in cdp.collect()}

    bad = []
    for ts, vals in fine_ref.items():
        got = mine_fine.get(ts)
        if not close(got, vals[0]):
            bad.append(("fine", ts, got, vals[0]))
    for ts, vals in coarse_ref.items():
        got = mine_coarse.get(ts)
        if not close(got, vals[0]):
            bad.append((cf, ts, got, vals[0]))
    assert not bad, (
        f"seed={seed} dst={dst} hb={hb} cf={cf} res={res} xff={xff}: "
        f"{len(bad)} mismatches, first 5: {bad[:5]}"
    )
    assert len(fine_ref) > 20


def test_counter_wrap_healing(spark, tmp_path):
    """32-bit counter wrap: the reference heals negative diffs by adding
    2^32-1 (src/rrd_update.c:1489-1498); engine must agree."""
    ups = [
        (START + 300, 4294960000),
        (START + 600, 4294966000),
        (START + 900, 2000),      # wrapped past 2^32
        (START + 1200, 8000),
        (START + 1500, 4000),     # wraps again (looks like reset)
    ]
    fine_ref, _ = _run_reference(
        str(tmp_path), "COUNTER", 1800, None, None, ups, "AVERAGE", 4
    )
    df = spark.createDataFrame(
        [("s", "x", float(t), float(v)) for t, v in ups],
        "series_id string, ds_name string, ts double, value double",
    )
    pdp = pdp_table(df, STEP, "COUNTER", 1800, start=float(START))
    mine = {int(r["ts"]): r["value"] for r in pdp.collect()}
    for ts, vals in fine_ref.items():
        assert close(mine.get(ts), vals[0]), (ts, mine.get(ts), vals[0])
    # sanity: the wrap row healed to (2^32-1 - 4294966000 + 2000 + 1)/300
    want = (4294967295 - 4294966000 + 2000) / 300.0
    assert close(mine[START + 900], want)


@pytest.mark.parametrize("seed,dst", [(0, "GAUGE"), (1, "COUNTER"), (2, "ABSOLUTE")])
def test_differential_subsecond(spark, tmp_path, seed, dst):
    """Sub-second update timestamps: the fractional pre/post interval split
    must match the reference. Gapless by construction (all values known,
    intervals ≤ heartbeat) and intervals stay ≤ one step (elapsed ≤ 1), so
    neither of the reference's two integer truncations of sub-second time
    triggers: unknown-second flooring (src/rrd_update.c:1667, 1822) needs
    unknowns, and the JKammler open-PDP split truncates pre_int to whole
    seconds ((unsigned long) cast, src/rrd_update.c:1184) but only runs at
    elapsed > 1. Within this envelope the reference is exact in doubles and
    the engine must match. Timestamps are dyadic fractions (k/8 s) so their
    decimal strings round-trip to the same doubles."""
    rng = random.Random(400 + seed)
    hb = 1800
    t = float(START)
    counter = 500
    updates = []
    for i in range(90):
        # first interval pinned: COUNTER/DERIVE have no baseline, so their
        # first rate is unknown — 59.875 s puts the unknown mass clearly
        # past step/2 on BOTH sides of the reference's floor() (59 and
        # 59.875 are both > 30), keeping the window unknown in both engines
        # instead of straddling the threshold (where the floor() divergence
        # is real and documented)
        t += 59.875 if i == 0 else rng.choice(
            [5.25, 17.5, 23.75, 30.125, 44.5, 51.375, 59.875])
        if dst == "COUNTER":
            counter += rng.randint(0, 500)
            updates.append((t, counter))
        elif dst == "ABSOLUTE":
            updates.append((t, rng.randint(0, 400)))
        else:
            updates.append((t, round(rng.uniform(-5, 105), 3)))

    rrd = f"{tmp_path}/s.rrd"
    subprocess.run(
        [BIN, "create", rrd, "--start", str(START), "--step", str(STEP),
         f"DS:x:{dst}:{hb}:U:U", "RRA:AVERAGE:0.5:1:5000"],
        check=True, capture_output=True)
    args = [f"{t!r}:{v}" for t, v in updates]
    for k in range(0, len(args), 50):
        subprocess.run([BIN, "update", rrd] + args[k : k + 50], check=True,
                       capture_output=True)
    end = int(updates[-1][0])
    out = subprocess.run(
        [BIN, "fetch", rrd, "AVERAGE", "-r", str(STEP), "-s", str(START),
         "-e", str(end)], check=True, capture_output=True, text=True).stdout
    with open(f"{tmp_path}/sf", "w") as f:
        f.write(out)
    _, ref = parse_fetch_output(f"{tmp_path}/sf")

    df = spark.createDataFrame(
        [("s", "x", t, float(v)) for t, v in updates],
        "series_id string, ds_name string, ts double, value double",
    )
    pdp = pdp_table(df, STEP, dst, hb, start=float(START))
    mine = {int(r["ts"]): r["value"] for r in pdp.collect()}
    last_final = int(updates[-1][0] // STEP * STEP)
    bad = [
        (ts, mine.get(ts), vals[0])
        for ts, vals in ref.items()
        if ts <= last_final and not close(mine.get(ts), vals[0])
    ]
    assert not bad, f"dst={dst}: {len(bad)} mismatches, first 5: {bad[:5]}"
    assert sum(1 for ts in ref if ts <= last_final and ref[ts][0] is not None) > 30
