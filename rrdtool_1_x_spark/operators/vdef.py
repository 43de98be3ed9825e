"""VDEF: series → scalar aggregations (with extremum timestamps).

Reference: vdef_parse (src/rrd_graph.c:5760-5860), vdef_calc
(src/rrd_graph.c:5863-6119), enum vdef_op (src/rrd_graph.h:71-84).

Semantics notes carried over exactly:

* STDEV is the *population* stddev (÷cnt, src/rrd_graph.c:5985-5997).
* TOTAL = sum(known) * step — rate→volume integration.
* PERCENT sorts ALL steps with unknown lowest and picks nearest-rank
  round(p·(n−1)/100); PERCENTNAN does the same over known values only.
* MAXIMUM/MINIMUM/FIRST/LAST return the extremum's timestamp too:
  MAXIMUM/MINIMUM/LAST report the interval END, FIRST the interval START
  (src/rrd_graph.c:6029-6063). Ties resolve to the earliest step (the
  reference scans forward with a strict comparison).
* LSLSLOPE/LSLINT/LSLCORREL regress value against the 0-based step index,
  skipping unknown rows but keeping their x positions
  (src/rrd_graph.c:6065-6115).
* AVERAGE/STDEV/TOTAL and the LSL family skip NON-FINITE slots (finite()
  in the reference's scan loops, src/rrd_graph.c:5971,6079): ±inf is
  excluded like NaN. MIN/MAX/FIRST/LAST/PERCENT use isnan-only rules, so
  ±inf participates there (PERCENT's compar: NaN < -INF < finite < INF).

The input is expected to be a complete padded step grid per series (what
``fetch`` returns), so row positions match the reference's array indexing.

Spark design: one groupBy per VDEF over the series keys; everything is a
built-in aggregate (struct-ordering tricks give "earliest argmax" without a
second pass). PERCENT/PERCENTNAN select by window row_number at the integer
nearest-rank — no per-group array, no collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VDEF_OPS = (
    "MAXIMUM",
    "MINIMUM",
    "AVERAGE",
    "STDEV",
    "TOTAL",
    "FIRST",
    "LAST",
    "PERCENT",
    "PERCENTNAN",
    "LSLSLOPE",
    "LSLINT",
    "LSLCORREL",
)


def vdef(
    df: DataFrame,
    op: str,
    param: float | None = None,
    step: float | None = None,
    keys: tuple[str, ...] = (),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Compute one VDEF over ``df`` per group of ``keys``.

    Returns (keys..., value double, when double|null). ``step`` is required
    for TOTAL and FIRST.
    """
    op = op.upper()
    if op not in VDEF_OPS:
        raise ValueError(f"unknown VDEF {op!r}")
    ts, val = F.col(ts_col).cast("double"), F.col(value_col)
    gb = list(keys)
    none_when = F.lit(None).cast("double")

    if op in ("MAXIMUM", "MINIMUM", "FIRST", "LAST"):
        # MAXIMUM/MINIMUM seed with the FIRST known slot (which may be
        # ±inf — the isnan-only prefix scan), then improve over FINITE
        # slots only (the finite() gate inside the comparison loop,
        # src/rrd_graph.c:5940-5963, 6005-6028): a ±inf that is not the
        # seed never wins. Result = extremum of {seed} ∪ {finite}.
        known = val.isNotNull() & ~F.isnan(val)
        fin_cond = known & (F.abs(val) != F.lit(float("inf")))
        if op in ("MAXIMUM", "MINIMUM"):
            seed = F.min(F.when(known, F.struct(ts.alias("t"), val.alias("v"))))
            if op == "MAXIMUM":
                # earliest argmax among finite: order by (value, -ts), max
                best = F.max(
                    F.when(fin_cond, F.struct(val.alias("v"), (-ts).alias("nts")))
                )
                agg = df.groupBy(*gb).agg(seed.alias("_s"), best.alias("_f"))
                win = F.col("_f").isNotNull() & (
                    F.col("_f.v") > F.col("_s.v")
                )
                return agg.select(
                    *gb,
                    F.when(win, F.col("_f.v"))
                    .otherwise(F.col("_s.v"))
                    .alias("value"),
                    F.when(win, -F.col("_f.nts"))
                    .otherwise(F.col("_s.t"))
                    .alias("when"),
                )
            best = F.min(F.when(fin_cond, F.struct(val.alias("v"), ts.alias("t"))))
            agg = df.groupBy(*gb).agg(seed.alias("_s"), best.alias("_f"))
            win = F.col("_f").isNotNull() & (F.col("_f.v") < F.col("_s.v"))
            return agg.select(
                *gb,
                F.when(win, F.col("_f.v")).otherwise(F.col("_s.v")).alias("value"),
                F.when(win, F.col("_f.t")).otherwise(F.col("_s.t")).alias("when"),
            )
        if op == "FIRST":
            if step is None:
                raise ValueError("FIRST needs step (reports interval start)")
            s = F.min(F.when(val.isNotNull(), F.struct(ts.alias("t"), val.alias("v"))))
            agg = df.groupBy(*gb).agg(s.alias("_s"))
            return agg.select(
                *gb,
                F.col("_s.v").alias("value"),
                (F.col("_s.t") - F.lit(float(step))).alias("when"),
            )
        s = F.max(F.when(val.isNotNull(), F.struct(ts.alias("t"), val.alias("v"))))
        agg = df.groupBy(*gb).agg(s.alias("_s"))
        return agg.select(*gb, F.col("_s.v").alias("value"), F.col("_s.t").alias("when"))

    # vdef_calc gates AVERAGE/STDEV/TOTAL and the least-squares family on
    # finite(), not just !isnan (src/rrd_graph.c:5971-5976, 6079): a ±inf
    # slot (reachable via CDEF LOG over a 0) is skipped, not propagated.
    # MIN/MAX/FIRST/LAST/PERCENT keep their isnan-only rules above.
    finite = (
        val.isNotNull() & ~F.isnan(val) & (F.abs(val) != F.lit(float("inf")))
    )
    fin = F.when(finite, val)

    if op in ("AVERAGE", "STDEV", "TOTAL"):
        if op == "AVERAGE":
            expr = F.avg(fin)
        elif op == "STDEV":
            expr = F.stddev_pop(fin)
        else:
            if step is None:
                raise ValueError("TOTAL needs step")
            expr = F.sum(fin) * F.lit(float(step))
        return df.groupBy(*gb).agg(expr.alias("value")).select(
            *gb, "value", none_when.alias("when")
        )

    if op in ("PERCENT", "PERCENTNAN"):
        if param is None:
            raise ValueError(f"{op} needs a percentile parameter")
        # rank-based nearest-rank selection — no per-group array ever
        # materializes (collect_list would hold the whole series in one
        # aggregation buffer; a multi-million-row series OOMs an executor).
        # PERCENT ranks over ALL steps with unknown lowest: idx0 =
        # round(p*(n-1)/100); if idx0 falls among the unknowns the result is
        # unknown, else it is the (idx0-n_null)-th (0-based) smallest known.
        # PERCENTNAN does the same over known values only.
        # single window pass, no join: ranking ascending with NULLS FIRST is
        # exactly the reference's "sort with unknown lowest"; per-group
        # counts ride the same partitioning, and the final groupBy reuses
        # the window's exchange.
        src, g = df, gb
        if not g:
            src, g = df.withColumn("_g", F.lit(1)), ["_g"]
        w_ord = Window.partitionBy(*g).orderBy(val.asc_nulls_first())
        w_all = Window.partitionBy(*g)
        ranked = src.select(
            *g,
            val.alias("_v"),
            F.row_number().over(w_ord).alias("_rn"),
            F.count(F.lit(1)).over(w_all).alias("_n"),
            F.count(val).over(w_all).alias("_m"),
        )
        if op == "PERCENT":
            # idx0 = round(p*(n-1)/100) over ALL steps; if the target rank
            # lands among the unknowns the picked _v is NULL → result NULL
            target = (
                F.round(F.lit(param) * (F.col("_n") - 1).cast("double") / 100.0).cast("long") + 1
            )
            pick = F.col("_rn") == target
        else:
            target = F.when(
                F.col("_m") > 0,
                F.round(F.lit(param) * (F.col("_m") - 1).cast("double") / 100.0).cast("long") + 1,
            )
            pick = F.col("_v").isNotNull() & (
                F.col("_rn") - (F.col("_n") - F.col("_m")) == target
            )
        out = ranked.groupBy(*g).agg(F.max(F.when(pick, F.col("_v"))).alias("value"))
        return out.select(*gb, "value", none_when.alias("when"))

    # least-squares family: x = 0-based step index over the padded grid;
    # non-finite rows are skipped but keep their x positions (finite()
    # filter inside the scan loop, src/rrd_graph.c:6079).
    w = Window.partitionBy(*gb).orderBy(ts)
    x = (F.row_number().over(w) - 1).cast("double")
    d = df.withColumn("_x", x).filter(finite)
    agg = d.groupBy(*gb).agg(
        F.count(val).alias("cnt"),
        F.sum("_x").alias("sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_x") * val).alias("sxy"),
        F.sum(val).alias("sy"),
        F.sum(val * val).alias("syy"),
    )
    cnt = F.col("cnt").cast("double")
    slope = (F.col("sx") * F.col("sy") - cnt * F.col("sxy")) / (
        F.col("sx") * F.col("sx") - cnt * F.col("sxx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / cnt
    correl = (F.col("sxy") - F.col("sx") * F.col("sy") / cnt) / F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / cnt)
        * (F.col("syy") - F.col("sy") * F.col("sy") / cnt)
    )
    expr = {"LSLSLOPE": slope, "LSLINT": intercept, "LSLCORREL": correl}[op]
    return agg.select(
        *gb, F.nanvl(expr, none_when).alias("value"), none_when.alias("when")
    )
