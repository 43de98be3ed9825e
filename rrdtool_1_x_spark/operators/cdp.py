"""CDP consolidation: PDP step table → archive rollup tables.

Reference semantics (update_cdp / initialize_cdp_val,
src/rrd_update.c:2006-2141):

* A CDP window covers ``pdp_cnt`` consecutive PDPs, aligned so the window
  END is a multiple of ``pdp_cnt*step`` (the RRA row grid).
* unknown_pdps = PDPs in the window that are unknown; the CDP is unknown iff
  ``unknown_pdps > pdp_cnt * xff`` (src/rrd_update.c:2040-2045).
* AVERAGE = Σ(known)/(pdp_cnt − unknown_pdps) — i.e. the mean of the known
  PDPs; MIN/MAX over the known PDPs; LAST is the literal PDP of the window's
  final step (unknown stays unknown even when xff passes) —
  ``initialize_cdp_val`` CF_LAST assigns pdp_temp_val unconditionally.

Spark design: a single groupBy on the window end — partial aggregation
(map-side combine) makes this one shuffle of pre-reduced data. The PDP table
omits unknown steps, so unknown_pdps = pdp_cnt − count(present rows); present
rows are never NULL by construction.

Retention (the RRA's row_cnt ≙ circular capacity) is a time predicate
``ts > now − row_cnt*resolution`` applied at read/vacuum time instead of a
wrap-around overwrite — see catalog.RRADef.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rrdtool_1_x_spark.operators.dst import SERIES_KEYS

BASIC_CFS = ("AVERAGE", "MIN", "MAX", "LAST")


def consolidate(
    pdp: DataFrame,
    step: int,
    pdp_cnt: int,
    cf: str = "AVERAGE",
    xff: float = 0.5,
    keys: tuple[str, ...] = SERIES_KEYS,
    ts_col: str = "ts",
    value_col: str = "value",
    exact: bool = False,
    exact_scale: float = 1e6,
    clock: DataFrame | None = None,
) -> DataFrame:
    """pdp(keys..., ts=step end, value) → (keys..., ts=window end, value).

    Unknown CDPs are not materialized (same convention as the PDP table).
    ``pdp_cnt == 1`` short-circuits to the identity for every CF — matching
    the reference rule that a 1-pdp RRA of any basic CF serves any other
    (src/rrd_fetch.c:350-372).

    ``clock``: optional (keys..., clock double) frame giving each series'
    last finalized step boundary (= floor(last raw update / step) * step).
    The reference only writes a CDP once time passes the window end
    (write_to_rras, src/rrd_update.c:2333-2411); without the clock the
    trailing in-progress window would be emitted from its partial PDPs
    (visible at high xff). The storage layer passes it; ad-hoc callers may
    omit it when the trailing window is acceptable.
    """
    cf = cf.upper()
    if cf not in BASIC_CFS:
        raise ValueError(f"consolidate handles {BASIC_CFS}, got {cf!r}")
    if pdp_cnt == 1:
        return pdp.select(*keys, F.col(ts_col).alias("ts"), F.col(value_col).alias("value"))

    res = float(step * pdp_cnt)
    ts, val = F.col(ts_col), F.col(value_col)
    # window END on the row grid: smallest multiple of res that is >= ts
    win_end = (F.ceil(ts / F.lit(res)) * F.lit(res)).alias("ts")

    grouped = pdp.groupBy(*keys, win_end)
    if cf == "LAST":
        # literal final-step PDP; if the final step is unknown (absent) the
        # when() never fires and the max is NULL
        value_expr = F.max(F.when(ts == F.ceil(ts / F.lit(res)) * F.lit(res), val))
    elif cf == "AVERAGE":
        if exact:
            # bitwise-reproducible mean: fixed-point integer summation is
            # associative, so the result is identical across partitionings,
            # re-runs and engines (floating sums are not), and the half-up
            # rounding happens in the integer domain (floor((2S+N)/2N)) so
            # no decimal-tie ambiguity survives to the float output. Inputs
            # must be quantized at 1/exact_scale.
            s = F.sum(F.round(val * F.lit(exact_scale)).cast("long"))
            n = F.count(val)
            value_expr = (
                F.floor((s * 2 + n).cast("double") / (n * 2).cast("double")).cast("double")
                / F.lit(exact_scale)
            )
        else:
            value_expr = F.avg(val)
    elif cf == "MIN":
        value_expr = F.min(val)
    else:
        value_expr = F.max(val)
    out = grouped.agg(value_expr.alias("value"), F.count(val).alias("_known"))

    unknown = F.lit(pdp_cnt) - F.col("_known")
    out = out.filter(unknown <= F.lit(float(pdp_cnt) * xff)).drop("_known")
    out = out.filter(F.col("value").isNotNull())
    if clock is not None:
        out = out.join(F.broadcast(clock), list(keys), "left").filter(
            F.col("clock").isNull() | (F.col("ts") <= F.col("clock"))
        ).drop("clock")
    return out


def rollup_all(
    pdp: DataFrame,
    step: int,
    rras: list,
    keys: tuple[str, ...] = SERIES_KEYS,
) -> dict[int, DataFrame]:
    """Materialize every basic-CF RRA of a dataset from one PDP table.

    Returns {rra_index: DataFrame}. The write-time pre-aggregation cascade of
    the reference (every update maintains all RRAs,
    src/rrd_update.c:1840-1915) becomes N independent rollup plans over one
    cached PDP scan.
    """
    out = {}
    for i, rra in enumerate(rras):
        if rra.cf in BASIC_CFS:
            out[i] = consolidate(pdp, step, rra.pdp_cnt, rra.cf, rra.xff, keys=keys)
    return out
