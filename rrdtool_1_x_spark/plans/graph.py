"""The query graph: DEF / CDEF / VDEF / XPORT / PRINT → one DataFrame DAG.

Reference: rrd_graph_script builds a flat ``gdes`` array with vname
references (src/rrd_graph_helper.c:1953-2083, src/rrd_graph.h:209);
data_fetch + data_calc then interpret it (src/rrd_graph.c:962-1318).

Spark design — the gdes array becomes a declarative plan:

* every DEF is a fetch (archive selection → partition-pruned scan → optional
  reduce to the query step, src/rrd_graph.c:1055-1070);
* the implicit join of the reference (pointer alignment at the LCD step,
  src/rrd_graph.c:1100-1116 rrd_lcd, src/rrd_rpncalc.c:650-677
  sample-and-hold) becomes an equi-join of each DEF onto the common time
  grid, with coarse series repeated for the fine steps inside their
  interval;
* identical DEFs share one scan (the reference dedups fetches via a hash
  map, src/rrd_graph.c:973-987; Catalyst reuses the subplan, and the
  builder also memoizes);
* VDEFs evaluate first and are folded into dependent CDEFs as literal
  numbers — exactly the reference's constant substitution
  (src/rrd_graph.c:1201-1210);
* CDEFs compile to Columns over the aligned frame (rpn.compile_rpn);
* XPORT is the final projection; PRINT/GPRINT format VDEF scalars.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rrdtool_1_x_spark.operators import vdef as vdef_mod
from rrdtool_1_x_spark.operators.fetch import FetchPlan, fetch, reduce_data, select_rra
from rrdtool_1_x_spark.rpn import RpnContext, compile_rpn


def rrd_lcd(steps: list[int]) -> int:
    """The reference's 'lowest common denominator' — actually a GCD fold
    (src/rrd_graph.c:1100-1116)."""
    out = steps[0]
    for s in steps[1:]:
        out = math.gcd(out, s)
    return out


@dataclass
class _Def:
    vname: str
    rollups: dict[int, DataFrame]
    dataset: object  # catalog.DatasetDef
    ds_name: str
    cf: str
    step_wish: int | None
    last_up: int
    reduce_cf: str | None = None  # DEF :reduce= (src/rrd_graph_helper.c:644)
    series_id: str | None = None  # engine extension: pick one series of a
    # multi-series store (the reference's file IS the series)


@dataclass
class _CDef:
    vname: str
    rpn: str


@dataclass
class _VDef:
    vname: str
    source: str
    op: str
    param: float | None


@dataclass
class QueryResult:
    frame: DataFrame  # ts double + one column per xport vname
    legends: list[str]
    scalars: dict[str, dict]  # vname -> {value, when}
    prints: list[str]
    start: int
    end: int
    step: int
    # autoscale bounds (value_min, value_max) when the query carries
    # LINE/AREA/TICK/STACK elements (rrd_graph_v's info keys)
    bounds: tuple[float, float] | None = None
    # per-element plotted values + fill bases (ts, <plot_i>, base_i, ...)
    # and the element list itself — what the renderer consumes
    plots: DataFrame | None = None
    elements: list[GraphElement] | None = None


class Query:
    """Build and execute one xport/graph-style query.

    ``start``/``end`` are epoch seconds (use timeparse.parse_at_time for
    AT-style strings); ``step`` is the wished output step (the reference's
    --step, defaulting to the finest DEF resolution).
    """

    def __init__(
        self,
        start: int,
        end: int,
        step: int | None = None,
        tz: str = "UTC",
        maxrows: int | None = None,
    ):
        self.start = int(start)
        self.end = int(end)
        self.step_wish = step
        self.tz = tz
        # --maxrows ≙ the graph width cap: each DEF is reduced at fetch time
        # so the output has at most this many rows (rrd_xport.c:100,140-147,
        # data_fetch reduce src/rrd_graph.c:1055-1070)
        self.maxrows = maxrows
        self._defs: list[_Def] = []
        self._frame_defs: list[tuple[str, DataFrame, int]] = []
        self._cdefs: list[_CDef] = []
        self._vdefs: list[_VDef] = []
        self._xports: list[tuple[str, str]] = []  # (vname, legend)
        self._elements: list[GraphElement] = []
        self._prints: list[tuple[str, str]] = []  # (vname, fmt)
        self._order: list[str] = []

    # -- statements ---------------------------------------------------------
    def def_(
        self,
        vname: str,
        rollups: dict[int, DataFrame],
        dataset,
        ds_name: str,
        cf: str = "AVERAGE",
        step: int | None = None,
        last_up: int | None = None,
        reduce_cf: str | None = None,
        series_id: str | None = None,
    ) -> "Query":
        """DEF:vname=<dataset>:<ds>:<CF>[:step=s][:reduce=CF]
        (src/rrd_graph_helper.c:1252-1316; reduce at :644).

        ``rollups`` maps rra index → rollup DataFrame (what the storage
        layer materializes); ``last_up`` defaults to the query end;
        ``reduce_cf`` overrides the CF used when re-consolidating the
        fetched rows down to a coarser step."""
        self._defs.append(
            _Def(vname, rollups, dataset, ds_name, cf.upper(), step,
                 last_up or self.end,
                 reduce_cf=None if reduce_cf is None else reduce_cf.upper(),
                 series_id=series_id)
        )
        self._order.append(vname)
        return self

    def def_frame(self, vname: str, frame: DataFrame, step: int) -> "Query":
        """DEF over a pre-fetched (ts, value) frame at a known step — the
        pseudo-path sources (``sql//`` / ``cb//``, src/rrd_fetch.c:310-318
        via sources.external.fetch_pseudo) plug in here: rrd_fetch_fn
        returns their rows through the same interface as archive fetches,
        and everything downstream (alignment, CDEF, VDEF, xport) is
        source-agnostic."""
        self._frame_defs.append((vname, frame.select("ts", "value"), int(step)))
        self._order.append(vname)
        return self

    def cdef(self, vname: str, rpn: str) -> "Query":
        self._cdefs.append(_CDef(vname, rpn))
        self._order.append(vname)
        return self

    def vdef(self, vname: str, rpn: str) -> "Query":
        """VDEF:vname=source,OP (vdef_parse, src/rrd_graph.c:5760-5860)."""
        parts = rpn.split(",")
        if len(parts) == 2:
            src, op, param = parts[0], parts[1].upper(), None
        elif len(parts) == 3:  # e.g. v,95,PERCENT
            src, param, op = parts[0], float(parts[1]), parts[2].upper()
        else:
            raise ValueError(f"bad VDEF {rpn!r}")
        if op in ("PERCENT", "PERCENTNAN") and param is None:
            raise ValueError(f"VDEF {op} needs a parameter")
        self._vdefs.append(_VDef(vname, src, op, param))
        self._order.append(vname)
        return self

    def xport(self, vname: str, legend: str = "") -> "Query":
        self._xports.append((vname, legend))
        return self

    def element(
        self,
        kind: str,
        source,
        legend: str = "",
        stack: bool = False,
        skipscale: bool = False,
        color: str | None = None,
        width: float = 1.0,
        fraction: float = 0.1,
        dashes: tuple | None = None,
        dash_offset: float = 0.0,
        color2: str | None = None,
        gradheight: float = 50.0,
    ) -> "Query":
        """A LINE/AREA/TICK/STACK graph statement — resolved through
        data_proc at execute time so the result carries the autoscale
        bounds (rrd_graph_v's value_min/value_max). ``color``/``width``/
        ``fraction``/``dashes`` only matter to the renderer."""
        self._elements.append(
            GraphElement(kind.upper(), source, stack=stack,
                         skipscale=skipscale, legend=legend,
                         color=color, width=width, fraction=fraction,
                         dashes=dashes, dash_offset=dash_offset,
                         color2=color2, gradheight=gradheight)
        )
        return self

    _PRINT_MODES = ("strftime", "valstrftime", "valstrfduration")

    def print_(self, vname: str, fmt: str = "%lf", mode: str | None = None) -> "Query":
        """PRINT:vname:format[:strftime|:valstrftime|:valstrfduration] —
        a trailing mode suffix in ``fmt`` is split off like the reference's
        PRINT parser (src/rrd_graph_helper.c gprint parsing)."""
        if mode is None and ":" in fmt:
            head, _, tail = fmt.rpartition(":")
            if tail in self._PRINT_MODES:
                fmt, mode = head, tail
        # '\:' protects a literal colon from the argv splitter
        # (rrd_graph_helper parsing; tests/graph2 GPRINT:...:'Current\:%4.2lf')
        self._prints.append((vname, fmt.replace("\\:", ":"), mode))
        return self

    # -- execution ----------------------------------------------------------
    def _fetch_defs(self) -> tuple[dict[str, DataFrame], dict[str, int]]:
        """Fetch every DEF at its own archive resolution (unpadded).

        Side effect: ``self._def_ranges[vname] = (fetch_start, fetch_end)``
        — each DEF's ALIGNED fetch universe (src/rrd_fetch.c:447-448:
        ``*start -= *start %% *step; *end += *step - *end %% *step`` — the
        end alignment is STRICT, so an on-grid end still gains one
        trailing row). VDEFs evaluate over this padded universe, exactly
        like vdef_calc's ``steps = (src->end - src->start) / src->step``
        (src/rrd_graph.c:5875) counts fetched rows including NaN padding;
        the xport/plot grid stays trimmed to (start, end] as the
        reference's output loop is."""
        frames: dict[str, DataFrame] = {}
        steps: dict[str, int] = {}
        self._def_ranges: dict[str, tuple[int, int]] = {}
        memo: dict[tuple, tuple[DataFrame, int, int, int]] = {}
        min_step = None
        if self.maxrows:
            min_step = math.ceil((self.end - self.start) / self.maxrows)
        for d in self._defs:
            # the global --step is a fetch-resolution hint for every DEF,
            # maxed with the per-DEF :step= option (rrd_graph.c data_fetch:
            # gdes[i].step = max(gdes[i].step, im->step)) — NOT merely an
            # output-grid wish; fetching fine data and sampling it onto a
            # coarse grid would hold instantaneous points where the
            # reference returns consolidated ones
            wish = max(d.step_wish or 0, self.step_wish or 0) or None
            if min_step is not None:
                wish = max(wish or 0, min_step)
            key = (id(d.rollups), d.ds_name, d.cf, wish, d.reduce_cf, d.series_id)
            if key not in memo:
                plan: FetchPlan = select_rra(
                    d.dataset, d.cf, self.start, self.end, wish, d.last_up
                )
                src = d.rollups[plan.rra_index]
                # DEF:x=<file>:<ds>:<CF> addresses ONE data source — on a
                # multi-DS archive the scan must project that column's rows
                # or every DEF sees every DS (and the grid join fans out)
                if "ds_name" in src.columns:
                    src = src.filter(F.col("ds_name") == d.ds_name)
                if d.series_id is not None and "series_id" in src.columns:
                    src = src.filter(F.col("series_id") == d.series_id)
                scan = fetch(src, plan, pad=False, keys=())
                step = plan.step
                fstart, fend = plan.start, plan.end
                if wish and wish > step:
                    # boundary rule: partial edge windows are forced
                    # unknown (rrd_reduce_data discards their rows)
                    scan = reduce_data(
                        scan, step, wish, d.reduce_cf or d.cf, keys=(),
                        start=fstart, end=fend,
                    )
                    step = step * math.ceil(wish / step)
                    # re-consolidated range re-aligns to the coarser step
                    fstart = fstart - fstart % step
                    fend = fend + ((step - fend % step) % step)
                memo[key] = (scan.select("ts", "value"), step, fstart, fend)
            frames[d.vname], steps[d.vname], fs, fe = memo[key]
            self._def_ranges[d.vname] = (fs, fe)
        for vname, frame, step in self._frame_defs:
            frames[vname], steps[vname] = frame, step
        return frames, steps

    def execute(self, spark: SparkSession) -> QueryResult:
        if not self._defs and not self._frame_defs:
            raise ValueError("query needs at least one DEF")
        frames, steps = self._fetch_defs()

        # common step = GCD of DEF steps, final range aligned to it.
        # rrd_fetch alignment: start down, end UP only when unaligned; rows
        # run (a_start, a_end] with ts = interval end, so the result's
        # start is the FIRST ROW's ts (a_start + step — what the xport
        # meta publishes, tests/xport1.json.output meta.start)
        step = self.step_wish or min(steps.values())
        step = rrd_lcd([*steps.values(), step])
        a_start = self.start - self.start % step
        a_end = self.end + ((step - self.end % step) % step)
        grid = spark.range(a_start // step + 1, a_end // step + 1).select(
            (F.col("id") * step).cast("double").alias("ts")
        )

        # align every DEF onto the grid: fine ts → owning coarse interval end
        # (sample-and-hold upsampling, src/rrd_rpncalc.c:650-677)
        wide = grid
        for vname, df in frames.items():
            s = steps[vname]
            src_ts = (F.ceil(F.col("ts") / F.lit(float(s))) * F.lit(float(s))).alias("_src_ts")
            right = df.select(F.col("ts").alias("_src_ts"), F.col("value").alias(vname))
            wide = (
                wide.withColumn("_src_ts", src_ts)
                .join(F.broadcast(right), "_src_ts", "left")
                .drop("_src_ts")
            )

        # VDEF scalars (over the source's own resolution frame). Evaluation
        # is DEFERRED: each VDEF's 1-row frame is built lazily and pending
        # frames are unioned into ONE driver job at flush time — N VDEFs in
        # a query cost one Spark job, not N sequential .first() jobs. A
        # flush is forced only when a later CDEF constant-folds a pending
        # VDEF scalar (src/rrd_graph.c:1201-1210), which genuinely
        # sequentializes the plan.
        scalars: dict[str, dict] = {}
        cdef_by_name = {c.vname: c for c in self._cdefs}
        done_cdefs: set[str] = set()
        env: dict[str, Column] = {v: F.col(v) for v in frames}
        ctx = RpnContext(ts=F.col("ts"), step=float(step), keys=(), tz=self.tz)
        pending_vdefs: list[tuple[str, DataFrame]] = []

        def flush_vdefs() -> None:
            if not pending_vdefs:
                return
            u = None
            for vname, vdf in pending_vdefs:
                one = vdf.select(
                    F.lit(vname).alias("_vname"),
                    F.col("value").cast("double").alias("value"),
                    F.col("when").cast("double").alias("when"),
                )
                u = one if u is None else u.unionByName(one)
            for r in u.collect():
                scalars[r["_vname"]] = {"value": r["value"], "when": r["when"]}
                env[r["_vname"]] = F.lit(r["value"]).cast("double")
            pending_vdefs.clear()

        # tokens the compiled evaluator can pre-materialize as helper
        # columns for a PREV-carrying (sequential) CDEF — per-row values
        # that depend only on the timestamp, not on the recurrence
        _TIME_TOKENS = {
            "NEWDAY", "NEWWEEK", "NEWMONTH", "NEWYEAR",
            "STEPWIDTH", "TIME", "LTIME", "COUNT",
        }

        def seq_cdef(c) -> None:
            """A CDEF whose RPN references PREV (self) is a sequential
            recurrence (src/rrd_rpncalc.c rpnstack runs rows in order):
            pre-compute time-derived tokens as compiled helper columns,
            then run rpn_seq.eval_sequential over the aligned grid and
            join the result back as the CDEF's column."""
            from rrdtool_1_x_spark.rpn_seq import eval_sequential

            nonlocal wide
            toks = c.rpn.split(",")
            new_toks: list[str] = []
            var_cols: dict[str, str] = {}
            base = wide
            n_h = 0
            for tok in toks:
                up = tok.upper()
                if up in _TIME_TOKENS and up != "STEPWIDTH":
                    h = f"__h{n_h}"
                    n_h += 1
                    base = base.withColumn(h, compile_rpn(tok, env, ctx))
                    var_cols[h] = h
                    new_toks.append(h)
                elif up.startswith("PREV(") and up.endswith(")"):
                    var_cols[tok[5:-1]] = tok[5:-1]
                    new_toks.append(tok)
                elif tok in env:
                    if tok not in base.columns:
                        base = base.withColumn(tok, env[tok])
                    var_cols[tok] = tok
                    new_toks.append(tok)
                else:
                    new_toks.append(tok)
            res = eval_sequential(
                base.select("ts", *dict.fromkeys(var_cols.values())),
                ",".join(new_toks),
                var_cols,
                keys=(),
                step=float(step),
                out_col=c.vname,
            )
            wide = wide.join(res, "ts", "left")

        resolving_cdefs: set[str] = set()

        def ensure_cdef(name: str) -> None:
            if name in frames or name in done_cdefs or name not in cdef_by_name:
                return
            if name in resolving_cdefs:
                raise ValueError(f"circular CDEF reference involving {name!r}")
            resolving_cdefs.add(name)
            nonlocal wide
            c = cdef_by_name[name]
            toks = c.rpn.split(",")
            if any(t in {v for v, _ in pending_vdefs} for t in toks):
                flush_vdefs()
            for tok in toks:
                ensure_cdef(tok)
            if any(t.upper() == "PREV" for t in toks):
                seq_cdef(c)
            else:
                wide = wide.withColumn(c.vname, compile_rpn(c.rpn, env, ctx))
            env[c.vname] = F.col(c.vname)
            resolving_cdefs.discard(c.vname)
            done_cdefs.add(c.vname)

        for name in self._order:
            if name in cdef_by_name:
                ensure_cdef(name)
            vd = next((v for v in self._vdefs if v.vname == name), None)
            if vd is not None:
                ensure_cdef(vd.source)
                if vd.source in frames:
                    vstep = steps[vd.source]
                    src_df = frames[vd.source]
                    rng = self._def_ranges.get(vd.source)
                    if rng is not None:
                        # pad to the DEF's full fetch universe: vdef_calc
                        # iterates every fetched slot incl. NaN padding
                        # (the strict end alignment adds a trailing NaN
                        # row even for an on-grid end) — rank-sensitive
                        # ops (PERCENT: unknown sorts lowest) see it
                        fs, fe = rng
                        uni = src_df.sparkSession.range(
                            fs // vstep + 1, fe // vstep + 1
                        ).select(
                            (F.col("id") * vstep).cast("double").alias("ts")
                        )
                        # no broadcast hint: the fetched series can be
                        # arbitrarily long (fine-step, long-range DEF), so
                        # forcing it driver-side would strain the cluster.
                        # The slot count is known here — hint only when the
                        # universe is provably small, else let AQE choose.
                        rhs = src_df.select("ts", "value")
                        if (fe - fs) // vstep <= 100_000:
                            rhs = F.broadcast(rhs)
                        src_df = uni.join(rhs, "ts", "left")
                else:
                    vstep = step
                    src_df = wide.select("ts", F.col(vd.source).alias("value"))
                pending_vdefs.append(
                    (
                        name,
                        vdef_mod.vdef(
                            src_df.select("ts", "value"),
                            vd.op,
                            param=vd.param,
                            step=vstep,
                        ),
                    )
                )
        flush_vdefs()

        cols = [F.col("ts")]
        legends = []
        for vname, legend in self._xports:
            ensure_cdef(vname)
            cols.append(F.col(vname))
            legends.append(legend or vname)
        frame = wide.select(*cols).filter(
            (F.col("ts") > self.start) & (F.col("ts") <= a_end)
        ).orderBy("ts")

        prints = [
            _format_print(fmt, scalars[v]["value"], scalars[v]["when"], mode)
            for v, fmt, mode in self._prints
        ]
        bounds = None
        plots = None
        if self._elements:
            for el in self._elements:
                if isinstance(el.source, str):
                    ensure_cdef(el.source)
            ranged = wide.filter(
                (F.col("ts") > self.start) & (F.col("ts") <= a_end)
            )
            plots, scale = data_proc(ranged, self._elements, with_bases=True)
            plots = plots.orderBy("ts")
            r = scale.first()
            bounds = (r["value_min"], r["value_max"])
        return QueryResult(
            frame=frame,
            legends=legends,
            scalars=scalars,
            prints=prints,
            start=a_start + step,  # first row's ts (rows are interval ENDS)
            end=a_end,
            step=step,
            bounds=bounds,
            plots=plots,
            elements=list(self._elements),
        )


@dataclass
class GraphElement:
    """One plottable graph statement: LINE / AREA / TICK / STACK.

    ``source`` is a vname (column of the aligned frame) or a number (the
    reference's yrule path — LINE2:42 plots a constant). ``STACK`` kind
    inherits the previous element's kind with stack=True, mirroring the
    parser (rrd_graph_helper.c turns STACK into LINE/AREA before data_proc;
    src/rrd_graph.c:1455-1459 asserts it)."""

    kind: str  # LINE | AREA | TICK | STACK
    source: str | float
    stack: bool = False
    skipscale: bool = False
    legend: str = ""
    # rendering attributes (ignored by the data path): #RRGGBB[AA] or None
    # (an uncolored element is plotted invisibly, like the reference),
    # LINE<width>, the TICK fraction (negative draws downward), and the
    # LINE dash pattern (on/off pixel runs + starting offset)
    color: str | None = None
    width: float = 1.0
    fraction: float = 0.1
    dashes: tuple | None = None
    dash_offset: float = 0.0
    # gradient AREA (AREA:v#col#col2[:gradheight=H], rrd_graph.c
    # gfx_add_rect_fadey): screen-space fade — color at the top of each
    # span toward color2 over gradheight px downward (<=0: whole span),
    # like the reference's cairo linear pattern
    color2: str | None = None
    gradheight: float = 50.0


def data_proc(
    frame: DataFrame,
    elements: list[GraphElement],
    ts_col: str = "ts",
    with_bases: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The reference's data_proc (src/rrd_graph.c:1365-1471): resolve each
    LINE/AREA/TICK element to its *plotted* value — stacked elements ride on
    a running paint total that resets at each non-stacked element — and
    derive the graph's autoscale bounds.

    Semantics carried over exactly:

    * unknown plots as unknown (NULL here, DNAN there) but does NOT break
      the stack — the paint total is retained, so the next stacked element
      sits on the pre-gap base (paintval is only advanced on known values);
    * TICK and skipscale elements never contribute to the scale bounds;
    * empty/all-unknown graphs scale to [0, 1] (the reference's dummy
      bounds for the non-logarithmic case).

    Spark-first: the whole resolution is column arithmetic over the aligned
    wide frame — one narrow projection, no shuffle, no UDF; the bounds are
    a single global aggregate. Returns (plots, scale) where ``plots`` is
    ts + one column per element (legend or plot{i}) and ``scale`` is one
    row (value_min, value_max).
    """
    paint: Column = F.lit(0.0)
    cols: list[Column] = [F.col(ts_col)]
    scale_names: list[str] = []
    prev_kind: str | None = None
    names: set[str] = set()
    for i, el in enumerate(elements):
        kind, stacked = el.kind.upper(), el.stack
        if kind == "STACK":
            if prev_kind is None:
                raise ValueError("STACK needs a preceding LINE/AREA/TICK")
            kind, stacked = prev_kind, True
        elif kind not in ("LINE", "AREA", "TICK"):
            raise ValueError(f"unknown graph element kind {el.kind!r}")
        prev_kind = kind
        val = (
            F.col(el.source).cast("double")
            if isinstance(el.source, str)
            else F.lit(float(el.source))
        )
        base = paint if stacked else F.lit(0.0)
        name = el.legend or f"plot{i}"
        if name in names:
            # repeated legends are legal (an AREA plus its LINE outline may
            # share one label, rrd_graph.c keys elements by index); only the
            # internal column name needs to stay unique
            name = f"{name}#plot{i}"
        names.add(name)
        cols.append((base + val).alias(name))
        if with_bases:
            # the fill/stack base each element sits on — what a renderer
            # paints an AREA from (graph_paint, src/rrd_graph.c:2245-2380)
            cols.append(base.alias(f"base{i}"))
        paint = base + F.coalesce(val, F.lit(0.0))
        if kind != "TICK" and not el.skipscale:
            scale_names.append(name)
    plots = frame.select(*cols)
    if scale_names:
        mins = [F.min(n) for n in scale_names]
        maxs = [F.max(n) for n in scale_names]
        mn = F.least(*mins) if len(mins) > 1 else mins[0]
        mx = F.greatest(*maxs) if len(maxs) > 1 else maxs[0]
        agg = plots.agg(mn.alias("_mn"), mx.alias("_mx"))
    else:
        agg = plots.sparkSession.range(1).select(
            F.lit(None).cast("double").alias("_mn"),
            F.lit(None).cast("double").alias("_mx"),
        )
    missing = F.col("_mn").isNull() | F.col("_mx").isNull()
    scale = agg.select(
        F.when(missing, F.lit(0.0)).otherwise(F.col("_mn")).alias("value_min"),
        F.when(missing, F.lit(1.0)).otherwise(F.col("_mx")).alias("value_max"),
    )
    return plots, scale


def _strfduration(fmt: str, duration: float) -> str:
    """The reference's duration formatter (strfduration,
    src/rrd_graph.c:1684-1800): %[0][w][.p] of W/d/D/h/H/m/M/s/S/f over a
    MILLISECOND duration, each value truncated (not rounded) to the
    precision; lowercase units are remainders, uppercase totals."""
    import math
    import re as _re

    seconds = abs(duration) / 1000.0
    minutes, hours = seconds / 60.0, seconds / 3600.0
    days, weeks = hours / 24.0, hours / (24.0 * 7)
    conv = {
        "W": weeks,
        "d": days - math.trunc(weeks) * 7.0,
        "D": days,
        "h": hours - math.trunc(days) * 24.0,
        "H": hours,
        "m": minutes - math.trunc(hours) * 60.0,
        "M": minutes,
        "s": seconds - math.trunc(minutes) * 60.0,
        "S": seconds,
        "f": abs(duration) - math.trunc(seconds) * 1000.0,
    }
    out = [] if duration >= 0 else ["-"]

    def sub(m):
        zpad, width, prec, unit = m.groups()
        if unit == "%":
            return "%"
        w, p = int(width or 0), int(prec or 0)
        val = math.trunc(conv[unit] * 10**p) / 10**p
        return f"%{'0' if zpad else ''}{w}.{p}f" % val

    out.append(_re.sub(r"%(0?)(\d*)(?:\.(\d+))?([%WdDhHmMsSf])", sub, fmt))
    return "".join(out)


def _format_print(fmt: str, value, when, mode: str | None = None) -> str:
    """printf-ish PRINT formatting (print_calc, src/rrd_graph.c:1832-2113):
    %lf/%le/%lg + %s/%S SI autoscaling; %c strftime of the VDEF time.

    ``mode`` selects the reference's value formatters
    (src/rrd_graph.c:1929-2000 + tests/vformatter1): ``strftime`` formats
    the VDEF's sampling TIME (never-found → the rendered format with every
    digit blanked to '-', time_clean's effect), ``valstrftime`` treats the
    VALUE as an epoch timestamp, ``valstrfduration`` as a millisecond
    duration through strfduration."""
    import math
    import time as _t

    if mode == "strftime":
        never = when is None or (
            isinstance(when, float) and not math.isfinite(when)
        )
        if never:  # vf.never: blank the digits (time_clean)
            import re as _re

            return _re.sub(r"\d", "-", _t.strftime(fmt, _t.gmtime(0)))
        return _t.strftime(fmt, _t.gmtime(when))
    if mode == "valstrftime":
        v = float("nan") if value is None else float(value)
        if not math.isfinite(v):
            return "%.0f" % v
        return _t.strftime(fmt or "%Y-%m-%d %H:%M:%S", _t.gmtime(v))
    if mode == "valstrfduration":
        v = float("nan") if value is None else float(value)
        if not math.isfinite(v):
            return "%f" % v
        return _strfduration(fmt or "%H:%02m:%02s", v)
    out = fmt
    if "%c" in out and when is not None:
        import time as _t

        out = out.replace("%c", _t.strftime("%a %b %e %H:%M:%S %Y", _t.gmtime(when)))
    v = float("nan") if value is None else float(value)
    if "%s" in out or "%S" in out:
        magnitude = 0
        sv = v
        while sv and abs(sv) >= 1000 and magnitude < 6:
            sv /= 1000.0
            magnitude += 1
        while sv and abs(sv) < 1 and sv == sv and magnitude > -6:
            sv /= 0.001
            magnitude -= 1
        sym = {0: "", 1: "k", 2: "M", 3: "G", 4: "T", 5: "P", 6: "E",
               -1: "m", -2: "u", -3: "n", -4: "p", -5: "f", -6: "a"}[magnitude]
        out = out.replace("%s", sym).replace("%S", sym)
        v = sv
    # map C double formats to Python
    out = (
        out.replace("%lf", "%f").replace("%le", "%e").replace("%lg", "%g")
    )
    import re as _re

    def sub(m):
        return m.group(0).replace("l", "")

    out = _re.sub(r"%[-0-9.# +]*l[efg]", sub, out)
    try:
        return out % v if "%" in out.replace("%%", "") else out
    except TypeError:
        return out
