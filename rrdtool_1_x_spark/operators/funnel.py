"""Ordered-funnel analysis — the product-analytics staple: how far does
each key progress through an ordered sequence of event types, taking at
every stage the EARLIEST occurrence that strictly follows the previous
stage (and optionally stays inside a conversion window from stage 1).

Planned as one filtered aggregate per stage joined on the key — k small
(key, ts) frames for a k-step funnel, each a map-side-combinable min.
No per-key event collection, no window over raw events, no UDF: hot keys
cost k aggregate rows, not a sorted array in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    by: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "tus",
    within: int | None = None,
) -> DataFrame:
    """Per-key funnel: ``(by, ts_1..ts_k, steps_completed)``.

    ``ts_i`` is the earliest ``steps[i-1]`` event strictly after
    ``ts_{i-1}`` (greedy-earliest matching — the standard funnel
    definition; strictly-after keeps a single event from satisfying two
    stages). ``within`` bounds the WHOLE funnel to ``ts_1 + within``
    microseconds. Keys that never reach stage 1 are absent; later
    unreached stages are NULL.
    """
    if not steps:
        raise ValueError("funnel: need at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(by)
        .agg(F.min(ts_col).alias("ts_1"))
    )
    for i, st in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == st).select(
            F.col(by), F.col(ts_col).alias("_t")
        )
        prev_cols = [f"ts_{j}" for j in range(1, i)]
        cond = F.col("_t") > F.col(f"ts_{i - 1}")
        if within is not None:
            cond = cond & (F.col("_t") <= F.col("ts_1") + F.lit(int(within)))
        cur = (
            cur.join(nxt, by, "left")
            .groupBy(by, *prev_cols)
            .agg(F.min(F.when(cond, F.col("_t"))).alias(f"ts_{i}"))
        )
    reached = F.lit(1)
    for j in range(2, len(steps) + 1):
        reached = reached + F.when(F.col(f"ts_{j}").isNotNull(), 1).otherwise(0)
    return cur.select(
        by,
        *[f"ts_{j}" for j in range(1, len(steps) + 1)],
        reached.cast("int").alias("steps_completed"),
    )
