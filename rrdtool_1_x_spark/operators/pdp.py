"""PDP normalization: per-interval rates → fixed-step primary data points.

Reference semantics (src/rrd_update.c:1599-1830 + the multi-step split at
src/rrd_update.c:1178-1253, spec doc/rrd_pdpcalc.pod). Since the 2018
"JKammler" fix, a boundary-crossing update no longer smears one value across
all crossed steps: the partially-open first step is finalized separately with
a proportional share of the update's rate·seconds, and the remaining steps
get the interval's uniform rate. The net effect — verified against a build
of the reference on tests/pdp-calc1 goldens and targeted experiments — is a
clean **per-step** rule. For a step S = (b, b+step]:

* ``known(S)``  = Σ rate·overlap_sec over known-rate interval pieces in S.
* ``unk(S)``    = Σ overlap_sec of unknown-rate pieces + uncovered head gap
  (before dataset start; rrd_create seeds PDP_unkn_sec_cnt = last_up % step).
* ``unk_pre(S)``= like unk(S) but excluding the piece of the interval that
  *finalizes* S (process_pdp_st counts that piece as ``pre_unknown`` in the
  denominator only, src/rrd_update.c:1795-1806).
* The finalizer of S is the interval (t0, t1] with t0 < b+step ≤ t1; its
  heartbeat verdict depends on how the reference split it
  (src/rrd_update.c:1180-1253): with k = crossed boundaries and L = seconds
  from t0 up to the first boundary (0 when t0 sits on the grid),
  - k == 1 or L == 0: violated iff (t1-t0) > heartbeat,
  - k ≥ 2, L > 0, S is the first crossed step: violated iff L > heartbeat,
  - k ≥ 2, L > 0, later steps: violated iff (t1-t0-L) > heartbeat.
* value(S) = NaN if hb-violated, or unk_pre(S) > step/2, or no known
  seconds; else known(S) / (step − unk(S)).

Spark design — no UDFs, and the aggregation is a plain per-step groupBy
(map-side combinable, one shuffle on (series, step)):

1. ``lag`` over (series, ds) gave each sample its interval upstream
   (``dst.with_rates``).
2. ``sequence`` + ``explode`` fans each interval onto the steps it overlaps.
   Unknown-rate intervals only materialize their first and last overlapped
   steps — their interior steps are unknown by construction and unknown
   steps are never stored (``fetch`` pads them back, mirroring
   src/rrd_fetch.c:514-535). A week-long outage costs 2 rows, not 100k.
   Known intervals are bounded by the heartbeat, so fan-out ≤ hb/step + 1.
3. groupBy(series, step) computes the formula above.

A step's canonical timestamp is the END of the interval it covers, matching
``rrdtool fetch`` row timestamps ((t-step, t] convention).

Divergence note (sub-second timestamps only): the reference truncates
sub-second time to whole seconds in two places — unknown-second accounting
(floor(), src/rrd_update.c:1667 and 1822, flagged "not really accurate" in
its own comment) and the JKammler open-PDP split, which casts pre_int to
unsigned long before taking the step remainder (src/rrd_update.c:1184).
We keep exact floats in both. Identical results for whole-second
timestamps (all reference tests) and for sub-second timestamps whenever no
unknown mass straddles the xff threshold and no multi-step gap has a
fractional open PDP (tests/test_pdp_differential.py
test_differential_subsecond exercises the exact envelope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rrdtool_1_x_spark.operators.dst import SERIES_KEYS


def pdp_normalize(
    rated: DataFrame,
    step: int,
    heartbeat,
    keys: tuple[str, ...] = SERIES_KEYS,
) -> DataFrame:
    """rated(keys..., ts, prev_ts, interval, rate) → (keys..., ts, value).

    Input is the output of ``dst.with_rates``; output has one row per step
    whose PDP is known, ``ts`` = epoch seconds of the step's end.
    ``heartbeat`` may be a float or the NAME of a column of ``rated``
    holding a per-row heartbeat (multi-DS single-pass normalization, see
    ``pdp_table_multi``).
    """
    kcols = [F.col(k) for k in keys]
    stp = F.lit(float(step))
    per_row_hb = isinstance(heartbeat, str)
    hb = F.col("_hb") if per_row_hb else F.lit(float(heartbeat))

    s = rated.filter(F.col("prev_ts").isNotNull()).select(
        *keys,
        F.col("prev_ts").alias("t0"),
        F.col("ts").alias("t1"),
        F.col("interval"),
        F.col("rate"),
        *([F.col(heartbeat).alias("_hb")] if per_row_hb else []),
    )
    first_end = (F.floor(F.col("t0") / stp) + 1).cast("double") * stp
    last_end = F.ceil(F.col("t1") / stp).cast("double") * stp  # last overlapped step end
    occu = F.floor(F.col("t1") / stp).cast("double") * stp  # last finalized step end
    k_steps = ((occu - first_end) / stp + 1).cast("long")  # boundaries crossed (may be 0)
    sec_open = first_end - F.col("t0")  # seconds to first boundary
    l_split = F.when(sec_open < stp, sec_open).otherwise(F.lit(0.0))  # L: 0 if t0 on grid

    s = (
        s.withColumn("first_end", first_end)
        .withColumn("last_end", last_end)
        .withColumn("occu", occu)
        .withColumn("k", k_steps)
        .withColumn("L", l_split)
    )

    # step ends this interval overlaps; unknown-rate intervals skip their
    # interior (those steps stay unknown and are never stored)
    known = F.col("rate").isNotNull()
    ends = F.when(
        known,
        F.sequence(
            (F.col("first_end") / stp).cast("long"), (F.col("last_end") / stp).cast("long")
        ),
    ).otherwise(
        F.array_distinct(
            F.array((F.col("first_end") / stp).cast("long"), (F.col("last_end") / stp).cast("long"))
        )
    )
    p = s.select(*kcols, "t0", "t1", "interval", "rate", "first_end", "occu", "k", "L",
                 *(["_hb"] if per_row_hb else []),
                 F.explode(ends).alias("_e"))
    e = (F.col("_e") * stp).cast("double")
    overlap = F.least(F.col("t1"), e) - F.greatest(F.col("t0"), e - stp)
    is_final = e <= F.col("occu")  # this interval finalizes step e
    # heartbeat verdict of the finalizing interval for this step
    hb_viol = F.when(
        (F.col("k") >= 2) & (F.col("L") > 0),
        F.when(e == F.col("first_end"), F.col("L") > hb).otherwise(
            (F.col("interval") - F.col("L")) > hb
        ),
    ).otherwise(F.col("interval") > hb)

    p = p.select(
        *kcols,
        e.alias("step_end"),
        overlap.alias("sec"),
        F.col("rate"),
        is_final.alias("is_final"),
        (is_final & hb_viol).alias("hb_viol"),
    ).filter(F.col("sec") > 0)

    rate_known = F.col("rate").isNotNull()
    agg = p.groupBy(*keys, "step_end").agg(
        F.sum(F.when(rate_known, F.col("rate") * F.col("sec")).otherwise(0.0)).alias("known_rs"),
        F.sum(F.when(~rate_known, F.col("sec")).otherwise(0.0)).alias("unk_sec"),
        F.sum(F.when(~rate_known & ~F.col("is_final"), F.col("sec")).otherwise(0.0)).alias(
            "unk_pre_sec"
        ),
        F.sum("sec").alias("covered_sec"),
        F.max(F.when(F.col("is_final") & F.col("hb_viol"), 1).otherwise(0)).alias("viol"),
        F.max(F.when(F.col("is_final"), 1).otherwise(0)).alias("finalized"),
    )

    gap = stp - F.col("covered_sec")  # uncovered head seconds (before start)
    unk_all = F.col("unk_sec") + gap
    unk_pre = F.col("unk_pre_sec") + gap
    denom = stp - unk_all
    value = F.when(
        (F.col("viol") == 1) | (unk_pre > stp / 2.0) | (denom <= 0), F.lit(None)
    ).otherwise(F.col("known_rs") / denom)

    return (
        agg.filter(F.col("finalized") == 1)
        .select(*kcols, F.col("step_end").alias("ts"), value.alias("value"))
        .filter(F.col("value").isNotNull())
    )


def pdp_table(
    samples: DataFrame,
    step: int,
    dst: str,
    heartbeat: float,
    min_val: float | None = None,
    max_val: float | None = None,
    start: float | None = None,
    keys: tuple[str, ...] = SERIES_KEYS,
    raw_col: str | None = None,
) -> DataFrame:
    """samples(keys..., ts, value) → PDP step table, composing
    ``dst.with_rates`` + ``pdp_normalize``. ``raw_col``: optional
    decimal-string readings for the exact >2^53 counter path."""
    from rrdtool_1_x_spark.operators.dst import with_rates

    rated = with_rates(
        samples, dst, heartbeat, min_val=min_val, max_val=max_val, start=start,
        keys=keys, raw_col=raw_col,
    )
    return pdp_normalize(rated, step, heartbeat, keys=keys)


def pdp_table_multi(
    samples: DataFrame,
    step: int,
    specs: list,
    start: float | None = None,
    keys: tuple[str, ...] = SERIES_KEYS,
) -> DataFrame:
    """Single-pass PDP normalization for EVERY data source of a dataset.

    ``specs``: list of catalog.DSDef. One window pass computes all rates
    (per-DS DST/heartbeat/clamps selected by ``ds_name`` CASE chains) and
    one per-step aggregation normalizes them — instead of #DS separate
    scans. This is what makes write-time rollup maintenance O(one scan):
    the reference updates all archives per sample for the same reason
    (src/rrd_update.c:1840-1915).
    ``keys`` must contain ``ds_name``.
    """
    from pyspark.sql import Window

    from rrdtool_1_x_spark.operators.dst import rate_expr

    w = Window.partitionBy(*keys).orderBy("ts")
    prev_ts = F.lag("ts").over(w)
    if start is not None:
        prev_ts = F.coalesce(prev_ts, F.lit(float(start)))
    out = samples.withColumn("prev_ts", prev_ts).withColumn(
        "prev_value", F.lag("value").over(w)
    )
    # optional decimal-string readings → exact >2^53 COUNTER/DERIVE diffs
    has_raw = "raw" in samples.columns
    if has_raw:
        out = out.withColumn("prev_raw", F.lag("raw").over(w))
    out = out.filter(F.col("prev_ts").isNull() | (F.col("ts") > F.col("prev_ts")))
    out = out.withColumn(
        "interval", F.when(F.col("prev_ts").isNotNull(), F.col("ts") - F.col("prev_ts"))
    )
    rate = None
    hb = None
    for ds in specs:
        if ds.dst == "COMPUTE":
            continue
        r = rate_expr(
            ds.dst,
            F.col("value"),
            F.col("prev_value"),
            F.col("interval"),
            ds.heartbeat,
            ds.min_val,
            ds.max_val,
            raw_value=F.col("raw") if has_raw else None,
            prev_raw=F.col("prev_raw") if has_raw else None,
        )
        cond = F.col("ds_name") == ds.name
        rate = r if rate is None else F.when(cond, r).otherwise(rate)
        hbv = F.lit(float(ds.heartbeat))
        hb = hbv if hb is None else F.when(cond, hbv).otherwise(hb)
    rate = F.when(F.col("interval").isNull(), F.lit(None)).otherwise(rate)
    out = out.withColumn("rate", rate).withColumn("hb", hb)
    pdp = pdp_normalize(out, step, "hb", keys=keys)

    # COMPUTE data sources: per-step RPN over the sibling DSs' PDP values
    # (src/rrd_update.c:1785-1815; parse blacklist src/rrd_rpncalc.c:274-293).
    computes = [ds for ds in specs if ds.dst == "COMPUTE"]
    if computes:
        from rrdtool_1_x_spark.rpn import RpnContext, compile_rpn

        other = [k for k in keys if k != "ds_name"]
        names = [ds.name for ds in specs if ds.dst != "COMPUTE"]
        wide = pdp.groupBy(*other, "ts").pivot("ds_name", names).agg(F.first("value"))
        ctx = RpnContext(ts=F.col("ts"), step=float(step), keys=tuple(other))
        env = {n: F.col(n) for n in names}
        parts = [pdp]
        for ds in computes:
            col = compile_rpn(ds.cdef, env, ctx)
            parts.append(
                wide.select(
                    *other,
                    F.lit(ds.name).alias("ds_name"),
                    F.col("ts"),
                    col.alias("value"),
                ).filter(F.col("value").isNotNull())
            )
        out_pdp = parts[0]
        for p_ in parts[1:]:
            out_pdp = out_pdp.unionByName(p_.select(*pdp.columns))
        return out_pdp
    return pdp
