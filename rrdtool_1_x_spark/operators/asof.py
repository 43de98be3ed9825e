"""As-of and range joins — the time-series join primitives Spark lacks
as built-ins, expressed as pure DataFrame compositions (no UDF, no
driver loop) so Catalyst/AQE keep optimizing them.

* ``asof_join``: pandas ``merge_asof`` / kdb ``aj`` semantics — attach to
  every left row the latest right row at-or-before its timestamp per key
  — via the tag-union-window trick: ONE shuffle on (key, ts) replaces a
  per-row range probe. No join node at all, so there is no skew blowup:
  a hot key costs one window partition, not a quadratic join.
* ``range_join``: point-in-interval equi-join via bucket co-location —
  intervals explode to the fixed-width buckets they overlap, points key
  to their single bucket, and the theta join becomes an equi-join on
  (key, bucket) plus a residual filter. Output is exactly the inclusive
  theta-join semantics; each (point, interval) pair appears once because
  a point lives in exactly one bucket.

Timestamps are integer microseconds throughout (exact comparisons and
arithmetic on both engines — float epoch seconds would tie results to
rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "tus",
    by: list[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: every left row gains the right row with the
    greatest ``ts_col`` <= its own (per ``by`` key), or NULLs when none
    qualifies (or the match is older than ``tolerance`` microseconds).

    Tie rule, exact on every engine: right rows at the same (key, ts)
    resolve to the greatest payload tuple in column order — put a unique
    column (an id) first in ``right`` to make that a plain id tie-break.

    Plan shape: union the tagged sides, ONE window over (key) ordered by
    (ts, side, payload) with ``last(ignorenulls)`` carrying the newest
    right payload forward into the left rows. One shuffle on the by-key;
    hot keys cost a window partition (linear), never a range-join fanout.
    """
    by = list(by or [])
    rcols = [c for c in right.columns if c not in by]
    lcols = [c for c in left.columns if c not in by]
    payload = F.struct(*[F.col(c) for c in rcols]).alias("_p")
    lrow = F.struct(*[F.col(c) for c in lcols]).alias("_l")
    tag_r = right.select(
        *by,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        payload,
        F.lit(None).cast(
            left.select(lrow).schema["_l"].dataType.simpleString()
        ).alias("_l"),
    )
    tag_l = left.select(
        *by,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(payload).schema["_p"].dataType.simpleString()
        ).alias("_p"),
        lrow,
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc("_p"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = tag_r.unionByName(tag_l).withColumn(
        "_m", F.last("_p", ignorenulls=True).over(w)
    )
    matched = F.col("_m")
    if tolerance is not None:
        matched = F.when(
            F.col("_m")[ts_col] >= F.col("_ts") - F.lit(int(tolerance)),
            F.col("_m"),
        )
    out = u.filter(F.col("_side") == 1).select(
        *by,
        *[F.col("_l")[c].alias(c) for c in lcols],
        # rcols already excludes by-columns, so only left-column names
        # can collide and need the suffix
        *[
            matched[c].alias(c + suffix if c in set(lcols) else c)
            for c in rcols
        ],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "tus",
    start_col: str = "start_us",
    end_col: str = "end_us",
    by: list[str] | None = None,
    bucket: int = 3_600_000_000,
) -> DataFrame:
    """Inclusive point-in-interval join (``start <= ts <= end`` per
    ``by`` key) via bucket co-location. Returns the cross columns of both
    frames for every qualifying pair — exactly the theta-join semantics,
    but planned as an equi-join: intervals explode to the fixed-width
    buckets they overlap (bounded by interval length / bucket), points
    hash to their single bucket.

    Pick ``bucket`` near the typical interval length: too small explodes
    intervals into many buckets, too large degrades toward the full
    cross product per key. At cluster scale both sides can be
    bucketBy-written on (key, bucket) to make this a shuffle-free
    sort-merge join.
    """
    by = list(by or [])
    b_pts = points.withColumn(
        "_bkt", F.floor(F.col(ts_col) / F.lit(int(bucket))).cast("long")
    )
    b_iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(int(bucket))).cast("long"),
                F.floor(F.col(end_col) / F.lit(int(bucket))).cast("long"),
            )
        ),
    )
    return (
        b_pts.join(b_iv, by + ["_bkt"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_bkt")
    )
