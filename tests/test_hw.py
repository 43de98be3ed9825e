"""Holt-Winters family vs goldens produced by a build of the reference
(fixture F6: sine-diurnal signal + anomaly burst + a gap, period 48,
alpha .1, beta .0035, gamma .1, FAILURES 7-of-9, smoothing-window=0)."""

from __future__ import annotations

import pytest

from rrdtool_1_x_spark.operators.hw import hw_predict

from tests.goldens import close, parse_fetch_output

D = "tests/data"
PERIOD = 48


@pytest.fixture(scope="module")
def hw_out(spark):
    _, avg = parse_fetch_output(f"{D}/hw_AVERAGE.golden")
    rows = [
        ("s", float(ts), v[0]) for ts, v in sorted(avg.items()) if v[0] is not None
    ]
    pdp = spark.createDataFrame(rows, "series_id string, ts double, value double")
    out = hw_predict(
        pdp,
        alpha=0.1,
        beta=0.0035,
        gamma=0.1,
        period=PERIOD,
        threshold=7,
        window_len=9,
        keys=("series_id",),
        step=300.0,
        start=1000000200.0 - 300.0,
    )
    return {int(r["ts"]): r for r in out.collect()}


@pytest.mark.parametrize(
    "golden,col",
    [
        ("hw_HWPREDICT.golden", "prediction"),
        ("hw_DEVPREDICT.golden", "devpredict"),
        ("hw_FAILURES.golden", "failures"),
        ("hw_SEASONAL.golden", "seasonal"),
        ("hw_DEVSEASONAL.golden", "devseasonal"),
    ],
)
def test_hw_golden(hw_out, golden, col):
    _, want = parse_fetch_output(f"{D}/{golden}")
    known = [ts for ts, v in want.items() if v[0] is not None]
    # SEASONAL/DEVSEASONAL archives retain only one period of rows; compare
    # where the golden has data
    assert len(known) >= 40, f"golden {golden} too sparse"
    checked = 0
    for ts in known:
        got = hw_out.get(ts)
        assert got is not None, f"missing output at {ts}"
        assert close(got[col], want[ts][0]), (
            f"{col}@{ts}: got {got[col]}, want {want[ts][0]}"
        )
        checked += 1
    assert checked == len(known)


def test_hw_failures_flag_anomaly(hw_out):
    # the anomaly burst at i in (120..122) → ts 1000036200.. should trip
    # violations shortly after; at least one failure in the run
    assert any(r["failures"] == 1.0 for r in hw_out.values())
