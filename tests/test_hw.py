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


def test_seasonal_smoother(spark):
    """apply_smoother math: circular centered moving average + baseline
    recentering into the intercept (src/rrd_hw.c:128-282). Scheduling
    parity is filename-hash-dependent in the reference; the math is checked
    directly on a full-cycle run."""
    import math as m

    period = 12
    rows = [
        ("s", 300.0 * (i + 1), 10.0 + 5 * m.sin(2 * m.pi * i / period) + (2.0 if i % period == 3 else 0.0))
        for i in range(period * 4)
    ]
    pdp = spark.createDataFrame(rows, "series_id string, ts double, value double")
    out_ns = hw_predict(pdp, alpha=0.5, gamma=0.5, period=period, keys=("series_id",),
                        step=300.0, start=0.0, smooth_window=0.0)
    out_sm = hw_predict(pdp, alpha=0.5, gamma=0.5, period=period, keys=("series_id",),
                        step=300.0, start=0.0, smooth_window=0.4)
    s_ns = [r["seasonal"] for r in out_ns.orderBy("ts").collect()][-period:]
    s_sm = [r["seasonal"] for r in out_sm.orderBy("ts").collect()][-period:]
    # smoothing reduces the total variation of the seasonal coefficients
    tv = lambda xs: sum(abs(xs[i] - xs[i - 1]) for i in range(1, len(xs)))
    assert tv(s_sm) < tv(s_ns)
    # and recenters them near zero mean
    assert abs(sum(s_sm) / len(s_sm)) < abs(sum(s_ns) / len(s_ns)) + 1e-9


@pytest.fixture(scope="module")
def hwm_out(spark):
    """Multiplicative Holt-Winters run (MHWPREDICT golden set)."""
    _, avg = parse_fetch_output(f"{D}/hwm_AVERAGE.golden")
    rows = [("s", float(ts), v[0]) for ts, v in sorted(avg.items()) if v[0] is not None]
    pdp = spark.createDataFrame(rows, "series_id string, ts double, value double")
    out = hw_predict(
        pdp, alpha=0.1, beta=0.0035, gamma=0.1, period=PERIOD,
        threshold=7, window_len=9, multiplicative=True,
        keys=("series_id",), step=300.0, start=1000000200.0 - 300.0,
    )
    return {int(r["ts"]): r for r in out.collect()}


@pytest.mark.parametrize(
    "golden,col",
    [
        ("hwm_MHWPREDICT.golden", "prediction"),
        ("hwm_DEVPREDICT.golden", "devpredict"),
        ("hwm_FAILURES.golden", "failures"),
        ("hwm_SEASONAL.golden", "seasonal"),
        ("hwm_DEVSEASONAL.golden", "devseasonal"),
    ],
)
def test_hw_multiplicative_golden(hwm_out, golden, col):
    _, want = parse_fetch_output(f"{D}/{golden}")
    known = [ts for ts, v in want.items() if v[0] is not None]
    assert len(known) >= 40, f"golden {golden} too sparse"
    for ts in known:
        got = hwm_out.get(ts)
        assert got is not None, f"missing output at {ts}"
        assert close(got[col], want[ts][0]), (
            f"{col}@{ts}: got {got[col]}, want {want[ts][0]}"
        )
