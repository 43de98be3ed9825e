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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
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

    def register(self, path: str, cb: FetchCallback) -> None:
        self._cbs[path] = cb

    def fetch(
        self, spark: SparkSession, path: str, start: int, end: int, step: int
    ) -> DataFrame:
        if path not in self._cbs:
            raise KeyError(f"no callback source registered for {path!r}")
        df = self._cbs[path](spark, start, end, step)
        required = {"series_id", "ds_name", "ts", "value"}
        missing = required - set(df.columns)
        if missing:
            raise ValueError(f"callback source missing columns {sorted(missing)}")
        return df.select("series_id", "ds_name", "ts", "value")


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
