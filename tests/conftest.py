import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.appName("rrdtool_1_x_spark-tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # one JVM hosts the WHOLE suite: ~850 tests including the
        # 150+-gate oracle replay, whose cached/localCheckpoint()ed
        # blocks accumulate faster than the ContextCleaner reclaims
        # them — the 1g default heap OOMed at the r7 gate count
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    yield s
    s.stop()
