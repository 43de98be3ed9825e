"""Callback + empty sources (§2.1); the JDBC wrapper is covered by query
assembly (no RDBMS in the test environment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.sources.external import CallbackRegistry, empty_source


def test_callback_source(spark):
    reg = CallbackRegistry()

    def cb(s, start, end, step):
        return s.range(3).select(
            F.lit("cb").alias("series_id"),
            F.lit("v").alias("ds_name"),
            (F.lit(float(start)) + (F.col("id") + 1) * step).cast("double").alias("ts"),
            (F.col("id") * 1.0).alias("value"),
        )

    reg.register("cb://demo", cb)
    df = reg.fetch(spark, "cb://demo", 0, 900, 300)
    assert [int(r["ts"]) for r in df.orderBy("ts").collect()] == [300, 600, 900]
    with pytest.raises(KeyError):
        reg.fetch(spark, "cb://missing", 0, 1, 1)

    def bad(s, start, end, step):
        return s.range(1).select(F.lit("x").alias("series_id"))

    reg.register("cb://bad", bad)
    with pytest.raises(ValueError, match="missing columns"):
        reg.fetch(spark, "cb://bad", 0, 1, 1)


def test_empty_source(spark):
    df = empty_source(spark, 100, 700, 300)
    rows = df.orderBy("ts").collect()
    assert [int(r["ts"]) for r in rows] == [300, 600, 900]
    assert all(r["value"] is None for r in rows)
