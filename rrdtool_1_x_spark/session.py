"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the config below is chosen so the same plans
scale to a multi-executor cluster: AQE handles skew/coalescing at runtime,
shuffle partitions sized for the local box but overridable, Arrow enabled for
the few pandas-UDF operators (Holt-Winters, multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "rrdtool_1_x_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # shuffle sizing: fixed to the core count for interactive/small inputs
    # (extra map-side buckets are pure scheduling overhead there). For
    # scale-up runs set SPARK_GRAFT_INITIAL_PARTITIONS high — AQE then
    # coalesces down by actual bytes, so the same plans keep enough
    # parallelism on a big input without over-splitting a small one
    # (bench.py --scale sets it).
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    initial = os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if initial is not None:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", initial
        )
    return builder.getOrCreate()
