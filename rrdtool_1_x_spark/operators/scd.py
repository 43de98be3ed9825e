"""Type-2 slowly-changing-dimension merge — the warehouse history
pattern (Kimball SCD2): a dimension row is never overwritten; when an
attribute changes, the open row is CLOSED (``valid_to`` = change time)
and a new open row starts, so every fact can be joined to the attribute
values that were true at its own timestamp (the as-of join upstairs in
``operators.asof`` is the read side of exactly this table shape).

Shape at scale: one full-outer join of the OPEN slice (≤ one row per
key) with the deduplicated update batch, keyed by the dimension key —
dimension-sized, not fact-sized; closed history is untouched (appended
verbatim). Attribute comparison is null-safe (``<=>``), so NULL→value
and value→NULL transitions version correctly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply one update batch (one row per key: ``(key, *attrs, ts)``)
    to an SCD2 dimension ``(key, *attrs, valid_from, valid_to)`` where
    ``valid_to IS NULL`` marks the open row. Returns the merged table:

    - closed history rows pass through verbatim;
    - an open row with no update, or whose attributes all match the
      update (null-safely), stays open;
    - a changed open row is closed at the update's ts AND a new open
      row starts there;
    - a brand-new key inserts an open row at its ts.

    Guarded preconditions (both enforced here, not assumed):

    - a batch with SEVERAL rows per key is reduced to the latest-ts row
      first (ties broken by attribute values, descending) — duplicate
      keys would otherwise fan out the full-outer join;
    - a LATE update (``ts <= valid_from`` of the open row) is rejected
      as a no-op: closing at that ts would emit an inverted validity
      interval (``valid_to < valid_from``) that corrupts downstream
      as-of joins. Out-of-order history must be replayed in ts order.
    """
    open_rows = dim.filter(F.col(to_col).isNull())
    closed = dim.filter(F.col(to_col).isNotNull())
    # latest-ts row per key (max over (ts, attrs...) struct: exact for
    # the documented one-row-per-key batch, deterministic beyond it)
    u = (
        updates.groupBy(F.col(key).alias("_uk"))
        .agg(
            F.max(
                F.struct(
                    F.col(ts_col).alias("_uts"),
                    *[F.col(a).alias(f"_u_{a}") for a in attrs],
                )
            ).alias("_u")
        )
        .select("_uk", "_u.*")
    )
    j = open_rows.join(u, open_rows[key] == F.col("_uk"), "full_outer")
    same = None
    for a in attrs:
        eq = F.col(a).eqNullSafe(F.col(f"_u_{a}"))
        same = eq if same is None else same & eq
    # late/out-of-order update against the open row: rejected (no-op)
    late = F.col("_uts") <= F.col(from_col)
    # open row survives unchanged: no update, update equals it, or the
    # update is late (guard against inverted validity intervals)
    keep_open = j.filter(
        F.col("_uk").isNull()
        | (F.col(key).isNotNull() & (same | late))
    ).select(key, *attrs, from_col, to_col)
    # changed open row → closed at the update ts
    changed = j.filter(
        F.col(key).isNotNull() & F.col("_uk").isNotNull() & ~same & ~late
    )
    now_closed = changed.select(
        key, *attrs, from_col, F.col("_uts").alias(to_col)
    )
    # new open rows: changed keys take the update attrs; brand-new keys too
    new_open = (
        j.filter(
            F.col("_uk").isNotNull()
            & (F.col(key).isNull() | (~same & ~late))
        )
        .select(
            F.col("_uk").alias(key),
            *[F.col(f"_u_{a}").alias(a) for a in attrs],
            F.col("_uts").alias(from_col),
            F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
        )
    )
    return (
        closed.select(key, *attrs, from_col, to_col)
        .unionByName(keep_open)
        .unionByName(now_closed)
        .unionByName(new_open)
    )
