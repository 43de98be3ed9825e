"""External series sources: SQL (JDBC) and callback pseudo-datasets.

Reference: the libdbi SQL source (``DEF:x=sql//driver/host=.../sql=...``,
src/rrd_fetch_libdbi.c:446-786, dispatched at src/rrd_fetch.c:310-315) and
the application-registered callback source (``cb//`` pseudo-files,
src/rrd_fetch_cb.c:8-150, dispatch src/rrd_fetch.c:316-318).

Spark mapping: both produce the engine's tall sample/step frame so every
downstream operator (normalization, consolidation, CDEF/VDEF, xport) works
unchanged on external data.

* ``jdbc_source``: a thin wrapper over ``spark.read.jdbc`` with predicate
  pushdown for the time range and optional server-side pre-consolidation —
  the libdbi source likewise pushes min/max/avg into SQL.
* ``CallbackRegistry``: user functions keyed by a pseudo-path, returning a
  DataFrame for (start, end, step) — the DataSource-V2-lite equivalent of
  rrd_fetch_cb_register.
"""

from __future__ import annotations

import re as _re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    ts_col: str,
    value_col: str,
    series_expr: str = "'jdbc'",
    ds_name: str = "value",
    start: float | None = None,
    end: float | None = None,
    consolidate: str | None = None,
    step: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a series from an RDBMS into the engine's sample schema.

    ``consolidate`` in {'avg','min','max'} with ``step`` pushes a
    server-side GROUP BY onto the time bucket (≙ the libdbi source's
    min/max/avg consolidation, src/rrd_fetch_libdbi.c:446-786); the
    time-range predicate is part of the pushed query either way.
    """
    preds = []
    if start is not None:
        preds.append(f"{ts_col} > {start}")
    if end is not None:
        preds.append(f"{ts_col} <= {end}")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    if consolidate:
        if step is None:
            raise ValueError("consolidate needs step")
        agg = {"avg": "AVG", "min": "MIN", "max": "MAX"}[consolidate.lower()]
        inner = (
            f"(SELECT {series_expr} AS series_id, "
            f"CEIL({ts_col} / {step}) * {step} AS ts, "
            f"{agg}({value_col}) AS value FROM {table}{where} "
            f"GROUP BY {series_expr}, CEIL({ts_col} / {step}) * {step}) t"
        )
    else:
        inner = (
            f"(SELECT {series_expr} AS series_id, {ts_col} AS ts, "
            f"{value_col} AS value FROM {table}{where}) t"
        )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", inner)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load().select(
        F.col("series_id").cast("string"),
        F.lit(ds_name).alias("ds_name"),
        F.col("ts").cast("double"),
        F.col("value").cast("double"),
    )


FetchCallback = Callable[[SparkSession, int, int, int], DataFrame]


class CallbackRegistry:
    """≙ rrd_fetch_cb_register: pseudo-datasets served by user callables.

    A callback receives (spark, start, end, step) and returns a DataFrame
    with columns (series_id, ds_name, ts, value) — already step-aligned or
    raw (callers can normalize with operators.pdp)."""

    def __init__(self) -> None:
        self._cbs: dict[str, FetchCallback] = {}
        # the reference registers ONE process-global callback serving every
        # cb// path (rrd_fetch_cb_register) — the default slot mirrors
        # that; per-path registrations take precedence. The default
        # callable additionally receives the path (the reference passes
        # the filename through).
        self._default = None

    def register(self, path: str, cb: FetchCallback) -> None:
        self._cbs[path] = cb

    def register_default(self, cb) -> None:
        self._default = cb

    def clear_default(self) -> None:
        self._default = None

    def fetch(
        self, spark: SparkSession, path: str, start: int, end: int, step: int
    ) -> DataFrame:
        if path not in self._cbs:
            if self._default is None:
                raise KeyError(f"no callback source registered for {path!r}")
            df = self._default(spark, path, start, end, step)
        else:
            df = self._cbs[path](spark, start, end, step)
        required = {"series_id", "ds_name", "ts", "value"}
        missing = required - set(df.columns)
        if missing:
            raise ValueError(f"callback source missing columns {sorted(missing)}")
        return df.select("series_id", "ds_name", "ts", "value")


def _unescape(s: str) -> str:
    """%XX hex-unescape (the reference's _inline_unescape,
    src/rrd_fetch_libdbi.c:406-443)."""
    return _re.sub(
        "%([0-9a-fA-F]{2})", lambda m: chr(int(m.group(1), 16)), s
    )


@dataclass
class SqlDefSpec:
    """A parsed ``sql//`` DEF pseudo-path (rrd_fetch_fn_libdbi's argument
    grammar, src/rrd_fetch_libdbi.c:486-660):

      sql//driver[/key=value...]//table[+table...]/tscol/valcol[/term...]

    ``sql||`` switches the separator to ``|``. libdbi key=value args before
    the double separator: ``rrdminstepsize`` / ``rrdfillmissing`` /
    ``rrdderivemaxstep`` are engine knobs, everything else is a connection
    parameter. A leading ``*`` on the timestamp column marks a DATETIME
    column (epoch otherwise). Trailing segments: the literal ``derive``
    flag, or WHERE terms ANDed together. All segments are %XX-unescaped."""

    driver: str
    params: dict[str, str] = field(default_factory=dict)
    tables: list[str] = field(default_factory=list)
    ts_col: str = "ts"
    ts_is_datetime: bool = False
    value_col: str = "value"
    where_terms: list[str] = field(default_factory=list)
    derive: int = 0
    minstep: int = 300
    fillmissing: int = 0


# the five derived columns every sql// DEF exposes
# (src/rrd_fetch_libdbi.c:660-670)
SQL_DS_NAMES = ("min", "avg", "max", "count", "sigma")


def parse_sql_path(path: str) -> SqlDefSpec:
    if not path.startswith("sql") or len(path) < 6 or path[3] != path[4]:
        raise ValueError(f"formatstring wrong - {path}")
    sep = path[3]
    body = path[5:]
    dbl = body.find(sep + sep)
    if dbl < 0:
        raise ValueError(f"formatstring wrong - no {sep}{sep} in {path}")
    head_parts = body[:dbl].split(sep)
    spec = SqlDefSpec(driver=head_parts[0])
    derive_max = 0
    for a in head_parts[1:]:
        if not a:
            continue
        k, eq, v = a.partition("=")
        if not eq:
            raise ValueError(f"formatstring wrong for db arguments - {a!r}")
        v = _unescape(v)
        if k == "rrdminstepsize":
            if int(v) > 0:
                spec.minstep = int(v)
        elif k == "rrdfillmissing":
            if int(v) > 0:
                spec.fillmissing = int(v)
        elif k == "rrdderivemaxstep":
            if int(v) > 0:
                derive_max = int(v)
        else:
            spec.params[k] = v
    tail = body[dbl + 2 :].split(sep)
    if len(tail) < 3:
        raise ValueError(f"formatstring wrong - {path}")
    spec.tables = [_unescape(t) for t in tail[0].split("+")]
    ts = tail[1]
    if ts.startswith("*"):
        spec.ts_is_datetime = True
        ts = ts[1:]
    spec.ts_col = _unescape(ts)
    spec.value_col = _unescape(tail[2])
    derive_flag = False
    for a in tail[3:]:
        if a == "derive":
            derive_flag = True
        elif a in ("prediction", "sigma"):
            raise ValueError(
                f"argument {a} is no longer supported in a DEF - "
                "use new generic CDEF-functions instead"
            )
        elif a:
            spec.where_terms.append(_unescape(a))
    if derive_flag:
        spec.derive = derive_max or 600
    return spec


# driver name -> provider(spark, spec, start, end) returning the raw
# (ts double, value double) rows with the time-range predicate applied
# server-side. "jdbc" is built in; tests and apps can register others
# (≙ libdbi's pluggable database drivers).
SqlDriver = Callable[[SparkSession, SqlDefSpec, int, int], DataFrame]
SQL_DRIVERS: dict[str, SqlDriver] = {}


def _jdbc_driver(
    spark: SparkSession, spec: SqlDefSpec, start: int, end: int
) -> DataFrame:
    """The libdbi connection mapped onto spark.read.jdbc: ``url=`` is the
    JDBC url, remaining params become reader options; WHERE terms and the
    time range push into the server-side query, multiple ``+``-joined
    tables become a UNION ALL."""
    url = spec.params.get("url")
    if url is None:
        raise ValueError("sql// jdbc driver needs a url=jdbc:... parameter")
    terms = list(spec.where_terms)
    if spec.ts_is_datetime:
        # DATETIME column: range-filter client-side after epoch conversion
        pass
    else:
        terms.append(f"{start} < {spec.ts_col} AND {spec.ts_col} < {end}")
    where = (" WHERE " + " AND ".join(terms)) if terms else ""
    selects = [
        f"SELECT {spec.ts_col} AS ts, {spec.value_col} AS value FROM {t}{where}"
        for t in spec.tables
    ]
    inner = "(" + " UNION ALL ".join(selects) + ") t"
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", inner)
    for k, v in spec.params.items():
        if k != "url":
            reader = reader.option(k, v)
    df = reader.load()
    if spec.ts_is_datetime:
        df = df.withColumn("ts", F.unix_timestamp("ts").cast("double")).filter(
            (F.col("ts") > start) & (F.col("ts") < end)
        )
    return df.select(F.col("ts").cast("double"), F.col("value").cast("double"))


SQL_DRIVERS["jdbc"] = _jdbc_driver


def sql_def_frame(
    spark: SparkSession, spec: SqlDefSpec, start: int, end: int, step: int | None
) -> tuple[DataFrame, int, int, int]:
    """The sql// fetch: bucket raw rows into steps and derive the five
    columns min/avg/max/count/sigma (src/rrd_fetch_libdbi.c:660-786).

    Returns (frame, start, end, step) after the reference's adjustments
    (step clamped up to rrdminstepsize, start/end aligned down). The frame
    has one row per step with ``ts`` = interval END (the engine's fetch
    convention); ``count`` is 0 for empty bins, the others NULL. ``derive``
    converts to positive per-second rates against the previous raw row
    first; ``rrdfillmissing`` forward-fills up to N seconds of empty bins.
    Sigma is the sample stddev for count>2 and NULL otherwise (where the
    reference reads an uninitialized local, src/rrd_fetch_libdbi.c:745-752).

    Scale note: the groupBy is a map-side-combinable aggregation over the
    time-pruned source scan; the only sequential parts are the derive lag
    and the fill window, both over the queried range only (≤ rows of the
    final output, not the source table)."""
    step = max(step or 1, spec.minstep)
    start, end = start - start % step, end - end % step
    nbins = (end - start) // step
    raw = SQL_DRIVERS[spec.driver](spark, spec, start, end)
    if spec.derive:
        # Scale-safe lag: bucket the range so a multi-year derive query
        # doesn't serialize into ONE window task (the reference is a single
        # SQL cursor anyway, src/rrd_fetch_libdbi.c:446-786, but a 100 TB
        # source table deserves a partitioned plan). Bucket ≥ 2*derive
        # makes the stitch EXACT: each bucket's first row takes its
        # previous row from the preceding bucket's last row, and any true
        # gap spanning ≥2 buckets necessarily fails dts < 2*derive, so
        # missing it changes nothing.
        bucket = float(max(86400, 2 * spec.derive))
        b = raw.withColumn("_b", F.floor(F.col("ts") / F.lit(bucket)))
        wb = Window.partitionBy("_b").orderBy("ts")
        b = b.withColumn("_pts", F.lag("ts").over(wb)).withColumn(
            "_pv", F.lag("value").over(wb)
        )
        # one row per bucket: its last reading, keyed as the NEXT bucket's
        # boundary predecessor (broadcast-small: one row per day of range)
        bnd = (
            b.groupBy("_b")
            .agg(F.max("ts").alias("_bts"), F.max_by("value", "ts").alias("_bv"))
            .select((F.col("_b") + 1).alias("_b"), "_bts", "_bv")
        )
        b = b.join(F.broadcast(bnd), "_b", "left")
        pts = F.coalesce("_pts", "_bts")
        pv = F.coalesce("_pv", "_bv")
        dts = F.col("ts") - pts
        dv = F.col("value") - pv
        raw = b.select(
            "ts",
            F.when((dts > 0) & (dts < 2 * spec.derive) & (dv > 0), dv / dts)
            .alias("value"),
        )
    agg = (
        raw.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy(F.floor((F.col("ts") - start) / step).alias("_idx"))
        .agg(
            F.min("value").alias("min"),
            F.sum("value").alias("_sum"),
            F.max("value").alias("max"),
            F.count("value").alias("count"),
            F.sum(F.col("value") * F.col("value")).alias("_sumsq"),
        )
    )
    grid = spark.range(nbins).select(F.col("id").alias("_idx"))
    out = grid.join(agg, "_idx", "left").select(
        "_idx",
        ((F.col("_idx") + 1) * step + start).cast("double").alias("ts"),
        "min",
        (F.col("_sum") / F.col("count")).alias("avg"),
        "max",
        F.coalesce(F.col("count"), F.lit(0)).cast("double").alias("count"),
        F.when(
            F.col("count") > 2,
            F.sqrt(
                (F.col("count") * F.col("_sumsq") - F.col("_sum") * F.col("_sum"))
                / (F.col("count") * (F.col("count") - 1))
            ),
        ).alias("sigma"),
    )
    fill = spec.fillmissing // step
    if fill > 0:
        w = Window.orderBy("_idx").rowsBetween(Window.unboundedPreceding, 0)
        last_real = F.last(
            F.when(F.col("count") > 0, F.col("_idx")), ignorenulls=True
        ).over(w)
        ok = (F.col("count") == 0) & (F.col("_idx") - last_real <= fill)
        cols = {}
        for c in ("min", "avg", "max", "count", "sigma"):
            carried = F.last(
                F.when(F.col("count") > 0, F.col(c)), ignorenulls=True
            ).over(w)
            cols[c] = F.when(ok, carried).otherwise(F.col(c)).alias(c)
        out = out.select("_idx", "ts", *cols.values())
    return out.drop("_idx"), start, end, step


# process-global callback registry for cb// DEF paths ≙ the reference's
# single registered rrd_fetch_cb_register callback (src/rrd_fetch_cb.c:8-35)
CALLBACKS = CallbackRegistry()


def fetch_pseudo(
    spark: SparkSession,
    path: str,
    ds_name: str,
    start: int,
    end: int,
    step: int | None,
) -> tuple[DataFrame, int, int, int]:
    """Dispatch a DEF pseudo-path the way rrd_fetch_fn does
    (src/rrd_fetch.c:310-318): ``sql//``/``sql||`` → the SQL source,
    ``cb//`` → the registered callback. Returns ((ts, value), start, end,
    step) for the requested DS column."""
    if path.startswith(("sql//", "sql||")):
        spec = parse_sql_path(path)
        if ds_name not in SQL_DS_NAMES:
            raise KeyError(
                f"sql// DS must be one of {'/'.join(SQL_DS_NAMES)}, got {ds_name!r}"
            )
        frame, start, end, step = sql_def_frame(spark, spec, start, end, step)
        return frame.select("ts", F.col(ds_name).alias("value")), start, end, step
    if path.startswith("cb//"):
        step = step or 300
        start, end = start - start % step, end - end % step
        key = path if path in CALLBACKS._cbs else path[4:]
        df = CALLBACKS.fetch(spark, key, start, end, step)
        return (
            df.filter(F.col("ds_name") == ds_name).select("ts", "value"),
            start,
            end,
            step,
        )
    raise ValueError(f"not a pseudo-path: {path!r}")


def is_pseudo_path(path: str) -> bool:
    return path.startswith(("sql//", "sql||", "cb//"))


def empty_source(
    spark: SparkSession, start: int, end: int, step: int, ds_name: str = "value"
) -> DataFrame:
    """≙ rrd_fetch_empty (src/rrd_fetch.c:237-275): an all-unknown series
    over the aligned range (used when a DS is allowed to be missing)."""
    a_start = start - start % step
    a_end = end + (step - end % step)
    return spark.range(a_start // step + 1, a_end // step + 1).select(
        F.lit("empty").alias("series_id"),
        F.lit(ds_name).alias("ds_name"),
        (F.col("id") * step).cast("double").alias("ts"),
        F.lit(None).cast("double").alias("value"),
    )
