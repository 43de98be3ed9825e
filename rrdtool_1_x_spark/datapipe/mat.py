"""Materialization strategy for multi-consumer corpus-sized frames.

Several pipelines materialize a shared intermediate exactly once so AQE
stage re-planning and multi-consumer fan-out cannot re-run the producing
pass per consumer. Two mechanisms exist and they trade differently:

- ``localCheckpoint(eager=True)`` (the default here): severs lineage and
  pins executor storage, but every fresh construction RECOMPUTES. That
  recomputation is what makes benchmark timings honest: Spark's
  CacheManager substitutes a previously persisted identical plan into a
  NEW DataFrame's physical plan, so with ``persist`` a re-built query
  reads the previous run's cache instead of computing (measured on this
  host: an identical 2M-row md5 chain re-built and re-executed runs
  1.0-1.4 s per run under localCheckpoint and 0.3 s — a cache READ, not
  a computation — under persist).

- ``persist(StorageLevel.MEMORY_AND_DISK)``: keeps lineage, so on a long
  100 TB run an executor loss recomputes the lost partitions instead of
  failing the whole query, and storage falls back to disk under memory
  pressure instead of pinning the heap. The right production trade for
  frames that are unbounded in corpus size.

``SPARK_GRAFT_MATERIALIZE=persist`` selects the production behavior;
the default stays checkpoint so local benchmarks time real
recomputation per run (keeping the driver's bench comparable across
rounds, per the optimization-round contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize a multi-consumer, corpus-sized frame once.

    See the module docstring for the checkpoint-vs-persist trade; both
    modes return an eagerly materialized frame whose consumers read
    stored rows instead of re-running the producing pass.
    """
    if os.environ.get("SPARK_GRAFT_MATERIALIZE", "checkpoint") == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()  # force materialization like the eager checkpoint
        return out
    return df.localCheckpoint(eager=True)
