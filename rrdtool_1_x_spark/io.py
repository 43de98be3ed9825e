"""Input helpers: balanced parquet reads for small-file inputs.

A parquet scan parallelizes at ROW-GROUP granularity: a single-row-group
file is one task no matter how many cores the session has, so every
map-heavy operator downstream (shingling, hashing, per-row folds) runs on
one core. That is the classic small-input/interactive case — exactly where
per-core work matters most. At cluster scale the same scan has thousands
of row groups and the planner's native file splitting is strictly better
than a forced shuffle.

``read_parquet_balanced`` bridges the two: it reads, checks the scan's
planned partition count, and repartitions ONLY when the scan is badly
under-parallelized (below ``min_fraction`` of the session's default
parallelism). The repartition cost is one shuffle of the small input
(by definition small, or the scan would have split it); on a big input the
branch never fires and the plan is untouched — no shuffle, scan-native
partitioning preserved.

Use it only when downstream semantics are partition-order-independent
(per-row maps, integer/min/max/count aggregates). Float SUM/AVG pipelines
that are hash-gated against another engine should keep the scan order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet_balanced(
    spark: SparkSession,
    path: str,
    min_fraction: float = 0.5,
) -> DataFrame:
    """Read parquet; repartition to the session's default parallelism when
    the scan plans fewer than ``min_fraction`` of it."""
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_fraction)):
        df = df.repartition(target)
    return df
