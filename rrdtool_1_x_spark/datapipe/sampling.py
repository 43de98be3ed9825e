"""Deterministic sampling, splitting, and corpus-composition operators.

Training-data pipelines need reproducible sampling: the same corpus must
produce the same train/val split on every run, on any engine, at any
parallelism. Everything here keys off md5(id) — content-addressed, order-
independent, partition-independent — never off ``rand()`` (non-reproducible
across retries/speculative tasks) or ``monotonically_increasing_id``
(partition-layout dependent).

Scale notes:
* ``hash_split`` / ``hash_sample`` are map-only: no shuffle, no state —
  a filter pushed onto the scan. The split decision is a pure function of
  the id, so re-running on an appended corpus never reassigns old rows
  (critical: a train document must not silently move into val after an
  append).
* ``stratified_sample`` shuffles once on the strata key (the window rank
  over the hash order is map-side combinable up to the per-stratum top-n).
* ``token_budget_sample`` is the "data mixing" primitive: fill a per-group
  token quota in deterministic hash order — one shuffle on the group key,
  running totals via a window (no driver-side loop, no collect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_u01(id_col: Column, seed: str = "split") -> Column:
    """Deterministic uniform-[0,1) draw from an id: the first 8 hex digits
    of md5(seed || ':' || id) scaled by 2^-32.

    Portable: any engine with md5 + hex parsing reproduces it exactly
    (the DuckDB oracles rebuild it nibble-by-nibble)."""
    h = F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(float(2**32))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights.

    Returns the input plus a ``split`` column. Deterministic in the id
    alone: appends never reassign existing rows, and every engine computes
    the same assignment. Map-only — the assignment is a scan-time
    expression, no shuffle (.explain shows no Exchange).
    """
    total = sum(weights.values())
    u = hash_u01(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows with u01(id) < p.

    Unlike ``df.sample`` this is stable across runs, engines, retries and
    repartitioning, and composable: ``hash_sample(df, 0.1, seed=s)`` is a
    subset of ``hash_sample(df, 0.2, seed=s)`` (nested samples for scaling-
    law curves)."""
    return df.filter(hash_u01(F.col(id_col), seed) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: str = "strat",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen in deterministic hash order.

    One shuffle on the strata key; the rank is a top-n window (map-side
    partial sort at scale). Hash order makes the selection a uniform draw
    while staying reproducible."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")).cast("binary")),
        F.col(id_col),
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    token_col: str = "token_cnt",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Data-mixing primitive: fill each group's token budget in hash order.

    ``budgets`` maps group value → max tokens. Documents are taken in
    deterministic hash order until the group's RUNNING token total would
    exceed the budget; a document is kept iff the total *through it* fits.
    Groups absent from ``budgets`` are dropped. Output adds ``tokens_before``
    (tokens taken by earlier kept-or-not rows — the running total excluding
    this row), which downstream mixers use for curriculum ordering.

    One shuffle on the group key; the running sum is a window — no driver
    loop, no collect, scales to any number of groups.
    """
    order = [
        F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")).cast("binary")),
        F.col(id_col),
    ]
    w = Window.partitionBy(group_col).orderBy(*order)
    budget_map = F.create_map(
        *[x for k, v in budgets.items() for x in (F.lit(k), F.lit(int(v)))]
    )
    running = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_budget", budget_map[F.col(group_col)])
        .filter(F.col("_budget").isNotNull())
        .withColumn("_run", running)
        .filter(F.col("_run") <= F.col("_budget"))
        .withColumn("tokens_before", (F.col("_run") - F.col(token_col)).cast("long"))
        .drop("_budget", "_run")
    )
