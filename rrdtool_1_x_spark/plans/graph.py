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
        self._cdefs: list[_CDef] = []
        self._vdefs: list[_VDef] = []
        self._xports: list[tuple[str, str]] = []  # (vname, legend)
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
    ) -> "Query":
        """DEF:vname=<dataset>:<ds>:<CF> (src/rrd_graph_helper.c:1252-1316).

        ``rollups`` maps rra index → rollup DataFrame (what the storage
        layer materializes); ``last_up`` defaults to the query end."""
        self._defs.append(
            _Def(vname, rollups, dataset, ds_name, cf.upper(), step, last_up or self.end)
        )
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

    def print_(self, vname: str, fmt: str = "%lf") -> "Query":
        self._prints.append((vname, fmt))
        return self

    # -- execution ----------------------------------------------------------
    def _fetch_defs(self) -> tuple[dict[str, DataFrame], dict[str, int]]:
        """Fetch every DEF at its own archive resolution (unpadded)."""
        frames: dict[str, DataFrame] = {}
        steps: dict[str, int] = {}
        memo: dict[tuple, tuple[DataFrame, int]] = {}
        min_step = None
        if self.maxrows:
            min_step = math.ceil((self.end - self.start) / self.maxrows)
        for d in self._defs:
            wish = d.step_wish
            if min_step is not None:
                wish = max(wish or 0, min_step)
            key = (id(d.rollups), d.ds_name, d.cf, wish)
            if key not in memo:
                plan: FetchPlan = select_rra(
                    d.dataset, d.cf, self.start, self.end, wish, d.last_up
                )
                scan = fetch(d.rollups[plan.rra_index], plan, pad=False, keys=())
                step = plan.step
                if wish and wish > step:
                    scan = reduce_data(scan, step, wish, d.cf, keys=())
                    step = step * math.ceil(wish / step)
                memo[key] = (scan.select("ts", "value"), step)
            frames[d.vname], steps[d.vname] = memo[key]
        return frames, steps

    def execute(self, spark: SparkSession) -> QueryResult:
        if not self._defs:
            raise ValueError("query needs at least one DEF")
        frames, steps = self._fetch_defs()

        # common step = GCD of DEF steps, final range aligned to it
        step = self.step_wish or min(steps.values())
        step = rrd_lcd([*steps.values(), step])
        a_start = self.start - self.start % step
        a_end = self.end + (step - self.end % step)
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

        # VDEF scalars (over the source's own resolution frame)
        scalars: dict[str, dict] = {}
        cdef_by_name = {c.vname: c for c in self._cdefs}
        done_cdefs: set[str] = set()
        env: dict[str, Column] = {v: F.col(v) for v in frames}
        ctx = RpnContext(ts=F.col("ts"), step=float(step), keys=(), tz=self.tz)

        def ensure_cdef(name: str) -> None:
            if name in frames or name in done_cdefs or name not in cdef_by_name:
                return
            nonlocal wide
            c = cdef_by_name[name]
            for tok in c.rpn.split(","):
                ensure_cdef(tok)
            wide = wide.withColumn(c.vname, compile_rpn(c.rpn, env, ctx))
            env[c.vname] = F.col(c.vname)
            done_cdefs.add(c.vname)

        for name in self._order:
            if name in cdef_by_name:
                ensure_cdef(name)
            vd = next((v for v in self._vdefs if v.vname == name), None)
            if vd is not None:
                ensure_cdef(vd.source)
                src_df = (
                    frames[vd.source]
                    if vd.source in frames
                    else wide.select("ts", F.col(vd.source).alias("value"))
                )
                if vd.source in frames:
                    vstep = steps[vd.source]
                else:
                    vstep = step
                row = vdef_mod.vdef(
                    src_df.select("ts", "value"), vd.op, param=vd.param, step=vstep
                ).first()
                scalars[name] = {"value": row["value"], "when": row["when"]}
                # constant-fold into later CDEFs (src/rrd_graph.c:1201-1210)
                env[name] = F.lit(scalars[name]["value"]).cast("double")

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
            _format_print(fmt, scalars[v]["value"], scalars[v]["when"])
            for v, fmt in self._prints
        ]
        return QueryResult(
            frame=frame,
            legends=legends,
            scalars=scalars,
            prints=prints,
            start=a_start,
            end=a_end,
            step=step,
        )


def _format_print(fmt: str, value, when) -> str:
    """printf-ish PRINT formatting (print_calc, src/rrd_graph.c:1832-2113):
    %lf/%le/%lg + %s/%S SI autoscaling; %c strftime of the VDEF time."""
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
