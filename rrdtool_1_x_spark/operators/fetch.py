"""fetch: archive selection + aligned time-range read + unknown padding.

Reference: rrd_fetch_fn (src/rrd_fetch.c:277-587).

* Candidate archives: exact CF match, or any 1-pdp archive when both the
  requested and stored CF are in {AVERAGE,MIN,MAX,LAST}
  (src/rrd_fetch.c:348-371).
* Best match: among archives whose retention covers the requested start,
  the one with the smallest |resolution − wished step|; otherwise the one
  covering the most of the range, tie-broken by step difference
  (src/rrd_fetch.c:373-441).
* The request is aligned outward: start down to a step multiple, end up to
  the NEXT step multiple (end always moves, src/rrd_fetch.c:446-447), and
  rows missing from the archive come back as unknown
  (src/rrd_fetch.c:514-535).

Spark design: archive selection is driver-side catalog logic (cheap Python —
this is the reference's "resolution pruning", our rollup-table planner).
The read is a partition-pruned scan with the time predicate pushed to
parquet; padding joins a generated time grid against the scan — the grid is
``range × series`` and broadcast-sized for any human-scale fetch window.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rrdtool_1_x_spark.catalog import DatasetDef
from rrdtool_1_x_spark.operators.dst import SERIES_KEYS

_SUBSTITUTABLE = {"AVERAGE", "MIN", "MAX", "LAST"}


@dataclass
class FetchPlan:
    rra_index: int
    step: int  # resolution of the chosen archive
    start: int  # aligned: start - start % step
    end: int  # aligned: end + (step - end % step)


def select_rra(
    dataset: DatasetDef,
    cf: str,
    start: int,
    end: int,
    step_wish: int | None,
    last_up: int,
) -> FetchPlan:
    """Pick the best archive for (cf, [start,end], wished step).

    Mirrors src/rrd_fetch.c:343-441 including the coverage computation from
    ``last_up`` (the dataset's newest sample time).
    """
    cf = cf.upper()
    wish = step_wish if step_wish is not None else dataset.step
    best_full = None  # (step_diff, idx)
    best_part = None  # (-coverage, step_diff, idx)
    for i, rra in enumerate(dataset.rra):
        rcf = rra.cf.upper()
        if not (
            rcf == cf
            or (rra.pdp_cnt == 1 and cf in _SUBSTITUTABLE and rcf in _SUBSTITUTABLE)
        ):
            continue
        res = dataset.step * rra.pdp_cnt
        cal_end = last_up - (last_up % res)
        cal_start = cal_end - res * rra.row_cnt
        step_diff = abs(wish - res)
        if cal_start <= start:
            if best_full is None or step_diff < best_full[0]:
                best_full = (step_diff, i)
        else:
            coverage = (end - start) - (cal_start - start)
            cand = (-coverage, step_diff, i)
            if best_part is None or cand[:2] < best_part[:2]:
                best_part = cand
    if best_full is not None:
        idx = best_full[1]
    elif best_part is not None:
        idx = best_part[2]
    else:
        raise ValueError(f"no RRA matching CF {cf}")
    step = dataset.step * dataset.rra[idx].pdp_cnt
    a_start = start - (start % step)
    a_end = end + (step - end % step)
    return FetchPlan(rra_index=idx, step=step, start=a_start, end=a_end)


def time_grid(
    spark: SparkSession,
    series: DataFrame,
    start: int,
    end: int,
    step: int,
) -> DataFrame:
    """All (series, ts) slots for ts in (start, end] on the step grid.

    ``series`` is a small distinct-keys frame; the grid stays broadcastable
    for interactive fetch windows (rows = series × range/step).
    """
    grid = spark.range(start // step + 1, end // step + 1).select(
        (F.col("id") * step).cast("double").alias("ts")
    )
    return series.crossJoin(grid)


def _gap_fill(scan: DataFrame, plan: FetchPlan, keys: tuple[str, ...]) -> DataFrame:
    """Pad missing slots from the scan itself: one window pass per series
    generates NULL rows for the slot-index gaps (head/tail included) and
    unions them with the scanned rows — no grid table, no distinct-keys
    job, no join shuffle. A series with zero rows in range contributes
    nothing (pass an explicit ``series`` frame to fetch() to pad those)."""
    from pyspark.sql import Window

    s = float(plan.step)
    lo_i = plan.start // plan.step  # exclusive start slot index
    hi_i = plan.end // plan.step  # inclusive end slot index
    w = Window.partitionBy(*keys).orderBy("ts")
    base = scan.select(*keys, "ts", "value")
    g = (
        scan.withColumn("_i", (F.col("ts") / F.lit(s)).cast("long"))
        .withColumn("_pi", F.coalesce(F.lag("_i").over(w), F.lit(int(lo_i))))
        .withColumn("_last", F.lead("_i").over(w).isNull())
    )
    gap = F.col("_i") - F.col("_pi") > 1
    tail = F.col("_last") & (F.col("_i") < int(hi_i))
    empty = F.slice(F.array(F.lit(0).cast("long")), 1, 0)
    idxs = F.concat(
        F.when(gap, F.sequence(F.col("_pi") + 1, F.col("_i") - 1)).otherwise(empty),
        F.when(tail, F.sequence(F.col("_i") + 1, F.lit(int(hi_i)))).otherwise(empty),
    )
    missing = (
        g.filter(gap | tail)
        .select(*keys, idxs.alias("_idxs"))  # pre-project before the generator
        .select(*keys, F.explode("_idxs").alias("_slot"))
        .select(
            *keys,
            (F.col("_slot") * F.lit(s)).alias("ts"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    return base.unionByName(missing)


def fetch(
    rollup: DataFrame,
    plan: FetchPlan,
    series: DataFrame | None = None,
    pad: bool = True,
    keys: tuple[str, ...] = SERIES_KEYS,
    sort: bool = False,
) -> DataFrame:
    """Read the chosen archive over the aligned range, optionally padding
    missing slots with NULL (reference NaN padding).

    ``rollup``: the archive table (keys..., ts, value), ts = window end.
    ``sort=True`` adds the presentation-order global sort (a full range
    shuffle — leave it off when the consumer aggregates anyway).

    Padding: with no explicit ``series`` frame the missing slots are
    gap-filled from the scan in a single window pass (no grid join, no
    distinct-keys job); series entirely absent from the range then produce
    no rows. Pass ``series`` to force the grid outer-join path that pads
    all-unknown series too.
    """
    scan = rollup.filter(
        (F.col("ts") > F.lit(float(plan.start))) & (F.col("ts") <= F.lit(float(plan.end)))
    )
    if pad:
        if series is None:
            scan = _gap_fill(scan, plan, keys)
        else:
            grid = time_grid(rollup.sparkSession, series, plan.start, plan.end, plan.step)
            scan = grid.join(scan, [*keys, "ts"], "left")
    return scan.orderBy(*keys, "ts") if sort else scan


def reduce_data(
    df: DataFrame,
    cur_step: int,
    wish_step: int,
    cf: str = "AVERAGE",
    keys: tuple[str, ...] = SERIES_KEYS,
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """Re-consolidate fetched rows to a coarser step.

    Reference: rrd_reduce_data (src/rrd_graph.c:786-956). NaN-skipping for
    every CF (LAST here means last *known* in the window — unlike write-time
    CDP LAST); destination windows are aligned to the new step on the
    window-END grid.

    Boundary rule (src/rrd_graph.c:840-861): a destination window only
    PARTIALLY inside the source's fetched range (start, end] is forced
    unknown — the reference writes DNAN for it and DISCARDS its partial
    source rows rather than consolidating them. Pass ``start``/``end``
    (the source's aligned fetch range, e.g. FetchPlan.start/.end) to get
    that rule; rows whose destination window is partial are dropped, so
    the boundary windows simply lack rows here (absent = unknown) and
    callers padding onto the reduced universe see NULL. Without
    ``start``/``end`` every source row consolidates (legacy behavior —
    only correct when the range is aligned to the new step).

    Input must be an UNPADDED step table (absent row = unknown); reduce of a
    padded frame also works since NULL values are skipped.
    """
    import math

    factor = math.ceil(wish_step / cur_step)
    if factor <= 1:
        return df
    new_step = float(cur_step * factor)
    win_end_c = F.ceil(F.col("ts") / F.lit(new_step)) * F.lit(new_step)
    if start is not None:
        df = df.filter(win_end_c - F.lit(new_step) >= F.lit(float(start)))
    if end is not None:
        df = df.filter(win_end_c <= F.lit(float(end)))
    win_end = win_end_c.alias("ts")
    cf = cf.upper()
    val = F.col("value")
    if cf in ("AVERAGE", "HWPREDICT", "MHWPREDICT", "SEASONAL", "DEVSEASONAL", "DEVPREDICT"):
        expr = F.avg(val)
    elif cf == "MIN":
        expr = F.min(val)
    elif cf in ("MAX", "FAILURES"):
        expr = F.max(val)
    elif cf == "LAST":
        expr = F.max_by(val, F.when(val.isNotNull(), F.col("ts")))
    else:
        raise ValueError(f"unknown CF {cf!r}")
    out = df.groupBy(*keys, win_end).agg(expr.alias("value"))
    return out.filter(F.col("value").isNotNull())
