"""PDP normalization + CDP consolidation vs the reference's committed
goldens (tests/pdp-calc1-1-*.output) — fixture F2 in FIXTURES.md.

The golden files were produced by the reference engine itself, so passing
these means bit-level (7 significant digits) parity on the normalization
oracle: irregular timestamps, unknowns, heartbeat edge cases, three DST
types, xff effects.
"""

from __future__ import annotations

import pytest

from rrdtool_1_x_spark.operators.cdp import consolidate
from rrdtool_1_x_spark.operators.pdp import pdp_table

from tests.goldens import REF_TESTS, close, parse_fetch_output

START = 1548500640
STEP = 60
LAST_UP = 1548502510
# (ts, Gauge, Counter, Absolute); None = 'U'
UPDATES = [
    (1548500700, 0, 0, 0),
    (1548500760, 1, 60, 60),
    (1548500790, 0, 60, 0),
    (1548501000, 1, 270, 210),
    (1548501070, 2, 390, 120),
    (1548501101, None, None, None),
    (1548501300, 1, 1000, 199),
    (1548501800, 1, 1500, 500),
    (1548501839, 10, 1890, 390),
    (1548502200, 0, 1890, 0),
    (1548502210, 2, 1910, 20),
    (1548502410, 4, 2710, 800),
    (1548502510, 5, 3210, 500),
]
DS_SPECS = {
    "Gauge": dict(dst="GAUGE", heartbeat=3600, min_val=0.0, max_val=10.0),
    "Counter": dict(dst="COUNTER", heartbeat=3600, min_val=0.0),
    "Absolute": dict(dst="ABSOLUTE", heartbeat=3600, min_val=0.0),
}


@pytest.fixture(scope="module")
def pdp_rows(spark):
    """dict[(ds_name, ts)] -> value for all known PDPs of the fixture."""
    out = {}
    for i, (name, spec) in enumerate(DS_SPECS.items(), start=1):
        rows = [
            ("s1", name, float(u[0]), None if u[i] is None else float(u[i])) for u in UPDATES
        ]
        df = spark.createDataFrame(rows, "series_id string, ds_name string, ts double, value double")
        pdp = pdp_table(df, STEP, start=float(START), **spec)
        for r in pdp.collect():
            out[(name, int(r["ts"]))] = r["value"]
    return out


def _retention_window(last_up: int, res: int, row_cnt: int) -> tuple[int, int]:
    end = last_up - last_up % res
    return end - res * row_cnt, end  # valid ts: (start, end]


def test_pdp_avg_60_golden(pdp_rows):
    names, golden = parse_fetch_output(f"{REF_TESTS}/pdp-calc1-1-avg-60.output")
    lo, hi = _retention_window(LAST_UP, 60, 30)
    checked = 0
    for ts, vals in golden.items():
        if not (lo < ts <= hi):
            continue  # outside circular retention the reference pads NaN
        for name, want in zip(names, vals):
            got = pdp_rows.get((name, ts))
            assert close(got, want), f"{name}@{ts}: got {got}, want {want}"
            checked += 1
    assert checked >= 85


@pytest.mark.parametrize(
    "golden_file,cf",
    [("pdp-calc1-1-avg-300.output", "AVERAGE"), ("pdp-calc1-1-max-300.output", "MAX")],
)
def test_cdp_300_golden(spark, pdp_rows, golden_file, cf):
    names, golden = parse_fetch_output(f"{REF_TESTS}/{golden_file}")
    lo, hi = _retention_window(LAST_UP, 300, 6)
    pdp_df = spark.createDataFrame(
        [("s1", name, float(ts), v) for (name, ts), v in pdp_rows.items()],
        "series_id string, ds_name string, ts double, value double",
    )
    cdp = consolidate(pdp_df, STEP, 5, cf, xff=0.5)
    got_map = {(r["ds_name"], int(r["ts"])): r["value"] for r in cdp.collect()}
    checked = 0
    for ts, vals in golden.items():
        if not (lo < ts <= hi):
            continue
        for name, want in zip(names, vals):
            got = got_map.get((name, ts))
            assert close(got, want), f"{cf} {name}@{ts}: got {got}, want {want}"
            checked += 1
    assert checked >= 15


def test_hb_split_left_step_survives(spark):
    """Verified against a build of the reference: a heartbeat-violating
    interval still lets the partially-filled first step emit a value when
    its split share (sec_open) is under the heartbeat
    (src/rrd_update.c:1180-1253)."""
    df = spark.createDataFrame(
        [("s", "g", 1000000050.0, 1.0), ("s", "g", 1000000250.0, 7.0)],
        "series_id string, ds_name string, ts double, value double",
    )
    pdp = pdp_table(df, 60, "GAUGE", heartbeat=70, start=1000000000.0)
    got = {int(r["ts"]): r["value"] for r in pdp.collect()}
    # reference output: 1000000020 nan (create gap 40s > 30), 1000000080 = 1.0,
    # rest nan (interval-L = 170 > hb)
    assert got == {1000000080: 1.0}


def test_hb_ok_multi_step(spark):
    df = spark.createDataFrame(
        [("s", "g", 1000000050.0, 1.0), ("s", "g", 1000000250.0, 7.0)],
        "series_id string, ds_name string, ts double, value double",
    )
    pdp = pdp_table(df, 60, "GAUGE", heartbeat=300, start=1000000000.0)
    got = {int(r["ts"]): r["value"] for r in pdp.collect()}
    # reference output: 080 = (1*30 + 7*30)/60 = 4.0; 140/200 = 7.0
    assert set(got) == {1000000080, 1000000140, 1000000200}
    assert abs(got[1000000080] - 4.0) < 1e-9
    assert got[1000000140] == 7.0 and got[1000000200] == 7.0


def test_pod_example(spark):
    """doc/rrd_pdpcalc.pod example, values verified against the reference
    build (which post-dates the pod's hand calculations)."""
    ups = [(3, 8), (6, 1), (17, 6), (20, 7), (21, 7), (22, 4), (23, 3),
           (36, 1), (37, 2), (38, 3), (39, 3), (42, 5)]
    base = 1000000000
    df = spark.createDataFrame(
        [("s", "m", float(base + t), float(v)) for t, v in ups],
        "series_id string, ds_name string, ts double, value double",
    )
    pdp = pdp_table(df, 5, "GAUGE", heartbeat=20, min_val=0, max_val=100, start=float(base))
    got = {int(r["ts"]) - base: r["value"] for r in pdp.collect()}
    want = {5: 5.2, 10: 5.0, 15: 6.0, 20: 6.6, 25: 3.2, 30: 1.0, 35: 1.0, 40: 2.8}
    assert set(got) == set(want)
    for k, v in want.items():
        assert close(got[k], v), f"step {k}: got {got[k]}, want {v}"


def test_compute_ds(spark):
    """DST=COMPUTE: per-step RPN over sibling DSs (src/rrd_update.c:1785-1815)."""
    from rrdtool_1_x_spark.catalog import DSDef
    from rrdtool_1_x_spark.operators.pdp import pdp_table_multi

    rows = [("s", "g", 300.0 * i, float(i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "series_id string, ds_name string, ts double, value double")
    specs = [
        DSDef(name="g", dst="GAUGE", heartbeat=600),
        DSDef(name="double_g", dst="COMPUTE", cdef="g,2,*"),
    ]
    pdp = pdp_table_multi(df, 300, specs, start=0.0)
    got = {(r["ds_name"], int(r["ts"])): r["value"] for r in pdp.collect()}
    assert got[("g", 600)] == 2.0
    assert got[("double_g", 600)] == 4.0
    assert ("double_g", 300) in got  # first step known for gauge → computed
