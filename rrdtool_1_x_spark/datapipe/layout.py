"""Z-order (Morton) data layout: multi-dimensional clustering so parquet
min/max statistics prune 2-D range predicates.

A 100 TB event store is physically ordered by ONE key (usually arrival
time). A range query on (user, time) then reads every file: each file's
user_id min/max spans the whole domain. Interleaving the bits of both
bucketized dimensions into one sort key (Morton 1966; the layout behind
Delta/Iceberg Z-ORDER clustering) makes every file a tight box in BOTH
dimensions, so the scan planner's row-group/file statistics skip
everything outside the query box — the same pruning mechanism the W7
bucketed-store benchmark measures for the series dimension, generalized
to two axes.

All arithmetic is integer shift/mask built as ONE JVM-parsed expression
string (py4j tree construction is the bottleneck for wide expressions,
not evaluation), so the z-value computation lives inside whole-stage
codegen; the layout write is a repartitionByRange on the z-value — one
shuffle, globally range-partitioned output files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_sql(col: str, lo: int, hi: int, bits: int = 16) -> str:
    """SQL string bucketizing an integer column from [lo, hi] onto
    [0, 2^bits) with exact BIGINT arithmetic (identical in any engine —
    no float scaling): clamp, then (v - lo) * 2^bits DIV (hi - lo + 1)."""
    return (
        f"CAST((least(greatest(CAST({col} AS BIGINT), {lo}), {hi}) - {lo})"
        f" * {1 << bits} DIV {hi - lo + 1} AS BIGINT)"
    )


def zorder_bucket(col: str, lo: int, hi: int, bits: int = 16) -> Column:
    """Column form of :func:`bucket_sql`."""
    return F.expr(bucket_sql(col, lo, hi, bits))


def zorder_expr(x: str, y: str, bits: int = 16) -> Column:
    """Morton interleave of two bucketized dimensions (x gets the even
    bits, y the odd): sum over i of x_i<<2i | y_i<<(2i+1). ``x``/``y`` are
    SQL expression strings already in [0, 2^bits); shift/mask builtins
    only, so the whole key stays in codegen."""
    terms = []
    for i in range(bits):
        terms.append(
            f"shiftleft(shiftright(CAST({x} AS BIGINT), {i}) & 1, {2 * i})"
        )
        terms.append(
            f"shiftleft(shiftright(CAST({y} AS BIGINT), {i}) & 1, {2 * i + 1})"
        )
    return F.expr(" | ".join(terms))


def hilbert_xy2d(bits: int, x: int, y: int) -> int:
    """Reference Python Hilbert index (order-``bits`` curve over the
    2^bits x 2^bits grid) — the public-domain per-quadrant rotate/flip
    walk (Hilbert 1891; iterative form as on the Wikipedia "Hilbert
    curve" page). Used by tests and as the spec the SQL expression and
    the DuckDB oracle both mirror."""
    n = 1 << bits
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:  # rotate quadrant (reflect when rx, then swap)
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_expr(x: str, y: str, bits: int = 16) -> Column:
    """Hilbert index of two bucketized dimensions as ONE SQL aggregate
    fold over the bit levels — same locality budget as ``zorder_expr``
    (2*bits key bits) but with the curve's no-jump adjacency: every
    consecutive key step moves one grid cell, so range boxes splinter
    into fewer key intervals than under Morton's quadrant jumps
    (measured in BASELINE.md via ``rowgroup_hit_fraction``).

    ``x``/``y`` are SQL expression strings already in [0, 2^bits). The
    per-level rotate/flip state machine rides a named_struct accumulator
    inside ``aggregate(sequence(...))`` — integer shift/mask/xor
    builtins only, whole-stage codegen, engine-portable (the DuckDB
    oracle runs the identical recurrence as a recursive CTE)."""
    n = 1 << bits
    fold = (
        f"aggregate(sequence({bits - 1}, 0, -1),"
        f" named_struct('x', CAST({x} AS BIGINT),"
        f" 'y', CAST({y} AS BIGINT), 'd', CAST(0 AS BIGINT)),"
        " (a, i) -> named_struct("
        "'x', CASE WHEN (a.y & shiftleft(1L, i)) = 0 THEN"
        f" (CASE WHEN (a.x & shiftleft(1L, i)) > 0 THEN {n - 1} - a.y"
        " ELSE a.y END) ELSE a.x END,"
        "'y', CASE WHEN (a.y & shiftleft(1L, i)) = 0 THEN"
        f" (CASE WHEN (a.x & shiftleft(1L, i)) > 0 THEN {n - 1} - a.x"
        " ELSE a.x END) ELSE a.y END,"
        "'d', a.d + shiftleft(1L, i) * shiftleft(1L, i) *"
        " ((3 * (CASE WHEN (a.x & shiftleft(1L, i)) > 0 THEN 1 ELSE 0 END))"
        " ^ (CASE WHEN (a.y & shiftleft(1L, i)) > 0 THEN 1 ELSE 0 END))),"
        " a -> a.d)"
    )
    return F.expr(fold)


def with_hilbert(df: DataFrame, x: str, y: str, bits: int, out: str) -> DataFrame:
    """``df`` with the Hilbert index of (``x``, ``y``) appended as ``out``
    — the same rotate/flip recurrence as :func:`hilbert_expr`, UNROLLED
    into one chained projection per curve level instead of an
    ``aggregate(sequence(...))`` fold.

    The HOF fold evaluates its lambda in interpreted mode per level per
    row (the named_struct accumulator blocks codegen) — measured ~9x the
    Morton key's cost on the same rows. Each unrolled level's (x, y, d)
    is a named column referenced several times by the next level, so
    CollapseProject keeps the projections separate and every level is
    computed exactly once inside a single whole-stage-codegen span
    (bit-identical to the fold; pinned by test_with_hilbert_matches_expr).
    """
    n1 = (1 << bits) - 1
    keep = df.columns
    if out in keep:
        raise ValueError(f"with_hilbert: output column {out!r} already exists")
    clash = sorted({"_hx", "_hy", "_hd"} & set(keep))
    if clash:
        # the chained projections reference the temps by name; a same-named
        # input column would be silently shadowed and break level refs
        raise ValueError(f"with_hilbert: input columns collide with temps {clash}")
    cur = df.select(
        "*",
        F.expr(f"CAST({x} AS BIGINT)").alias("_hx"),
        F.expr(f"CAST({y} AS BIGINT)").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for i in range(bits - 1, -1, -1):
        bit = 1 << i
        rx = F.col("_hx").bitwiseAND(F.lit(bit)) > 0
        ry = F.col("_hy").bitwiseAND(F.lit(bit)) > 0
        d2 = F.col("_hd") + F.lit(bit * bit) * (
            F.when(rx, F.lit(3))
            .otherwise(F.lit(0))
            .bitwiseXOR(F.when(ry, F.lit(1)).otherwise(F.lit(0)))
        ).cast("long")
        x2 = F.when(
            ~ry, F.when(rx, F.lit(n1) - F.col("_hy")).otherwise(F.col("_hy"))
        ).otherwise(F.col("_hx"))
        y2 = F.when(
            ~ry, F.when(rx, F.lit(n1) - F.col("_hx")).otherwise(F.col("_hx"))
        ).otherwise(F.col("_hy"))
        cur = cur.select(*keep, x2.alias("_hx"), y2.alias("_hy"), d2.alias("_hd"))
    return cur.select(*keep, F.col("_hd").alias(out))


def write_hilbert_layout(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    bits: int = 16,
    num_files: int = 32,
) -> None:
    """``write_zorder_layout`` with the Hilbert key: one range shuffle on
    the curve index, locally sorted, key dropped — the files are the
    same tight 2-D boxes, packed along a curve with no quadrant jumps."""
    (
        with_hilbert(
            df, bucket_sql(x, *x_range, bits), bucket_sql(y, *y_range, bits),
            bits, "_h",
        )
        .repartitionByRange(num_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_h")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zorder_layout(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    bits: int = 16,
    num_files: int = 32,
) -> None:
    """Write ``df`` as ``num_files`` parquet files globally range-
    partitioned by the z-value of (x, y) — each output file (and its row
    groups) covers a tight rectangle in both dimensions, which is exactly
    what file/row-group min/max pruning needs. The z column is dropped
    before the write: the ORDER is the product; pruning reads the
    original columns' statistics.

    At cluster scale ``num_files`` is sized so each file lands near the
    row-group/partition target (128 MiB); the one range shuffle replaces
    the full-sort a global orderBy would need (range partitioning + local
    sort gives the same file-level boxes without a total order)."""
    z = zorder_expr(
        bucket_sql(x, *x_range, bits), bucket_sql(y, *y_range, bits), bits
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_hit_fraction(path: str, box: dict[str, tuple]) -> float:
    """Fraction of row groups whose min/max statistics intersect ``box``
    (col -> (lo, hi)) — the physical pruning measurement: a scan with
    those predicates must read exactly the intersecting row groups. Pure
    parquet-footer metadata (pyarrow), no data pages touched."""
    import glob

    import pyarrow.parquet as pq

    total = hit = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        pf = pq.ParquetFile(f)
        names = pf.schema_arrow.names
        for rg in range(pf.metadata.num_row_groups):
            meta = pf.metadata.row_group(rg)
            total += 1
            ok = True
            for col, (lo, hi) in box.items():
                st = meta.column(names.index(col)).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> cannot prune -> counts as hit
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            hit += ok
    return hit / total if total else 1.0
