"""rrdtool NaN ("unknown") semantics as Column combinators.

The reference engine uses IEEE NaN as its NULL (src/rrd_rpncalc.c:692-694).
Spark treats NaN as an orderable double, which silently breaks min/max/avg
semantics, so at every boundary we normalize NaN → SQL NULL and then encode
each operator's unknown-propagation rule explicitly, per the tables in
src/rrd_rpncalc.c:745-1446.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nan_to_null(c: Column) -> Column:
    """Normalize IEEE NaN to NULL at ingest (rrdtool 'unknown')."""
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def addnan(a: Column, b: Column) -> Column:
    """ADDNAN: NaN+x=x, x+NaN=x, NaN+NaN=NaN (src/rrd_rpncalc.c:751-764)."""
    return F.when(a.isNull() & b.isNull(), F.lit(None)).otherwise(
        F.coalesce(a, F.lit(0.0)) + F.coalesce(b, F.lit(0.0))
    )


def min_nan_contaminating(a: Column, b: Column) -> Column:
    """MIN: unknown if either side unknown (src/rrd_rpncalc.c:929-937)."""
    return F.when(a.isNull() | b.isNull(), F.lit(None)).otherwise(F.least(a, b))


def max_nan_contaminating(a: Column, b: Column) -> Column:
    """MAX: unknown if either side unknown (src/rrd_rpncalc.c:947-955)."""
    return F.when(a.isNull() | b.isNull(), F.lit(None)).otherwise(F.greatest(a, b))


def limit(v: Column, lo: Column, hi: Column) -> Column:
    """LIMIT: v if lo<=v<=hi else unknown (src/rrd_rpncalc.c:965-977)."""
    return F.when(v.isNull() | lo.isNull() | hi.isNull(), F.lit(None)).otherwise(
        F.when((v >= lo) & (v <= hi), v)
    )


def cmp_nan(a: Column, b: Column, op: str) -> Column:
    """LT/LE/GT/GE/EQ/NE: 1.0/0.0, unknown-propagating
    (src/rrd_rpncalc.c:860-919)."""
    ops = {
        "LT": a < b,
        "LE": a <= b,
        "GT": a > b,
        "GE": a >= b,
        "EQ": a == b,
        "NE": a != b,
    }
    return F.when(a.isNull() | b.isNull(), F.lit(None)).otherwise(ops[op].cast("double"))


def if_nan(c: Column, t: Column, f: Column) -> Column:
    """IF: condition unknown or 0 → f, else t (src/rrd_rpncalc.c:920-928)."""
    return F.when(c.isNotNull() & (c != 0.0), t).otherwise(f)
